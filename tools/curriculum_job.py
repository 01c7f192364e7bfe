"""Curriculum build job entrypoint — the `ray job submit` surface for
pipelines/curriculum.build_curriculum (documents in, packed token
shards + JSON manifest out).

On a real cluster:
    ray job submit --working-dir . -- python tools/curriculum_job.py \\
        --docs s3://bucket/documents/*.parquet --out s3://bucket/shards \\
        --merges 32000 --pack-budget 4096 --shards 4096

In this sandbox it runs against the testdata documents table on a local
ray session. The script owns its Ray session only when none exists
(ray job submit provides one). Prints ONE JSON line: the build manifest
minus the merge list, plus wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="/tmp/curriculum_shards")
    ap.add_argument("--quality-min", type=float, default=0.25)
    ap.add_argument("--length-mad-c", type=float, default=4.0)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--fraction", type=float, default=1.0,
                    help="default per-language keep fraction")
    ap.add_argument("--lang-fraction", action="append", default=[],
                    metavar="LANG=FRAC",
                    help="per-language override, repeatable")
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--pack-budget", type=int, default=512)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.pipelines import curriculum
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )

    fractions = {}
    for spec in args.lang_fraction:
        lang, _, frac = spec.partition("=")
        fractions[lang] = float(frac)
    cfg = curriculum.CurriculumConfig(
        out_dir=args.out, quality_min=args.quality_min,
        length_mad_c=args.length_mad_c,
        neardup_threshold=args.neardup_threshold,
        lang_fractions=fractions, default_fraction=args.fraction,
        sample_seed=args.seed, num_merges=args.merges,
        pack_budget=args.pack_budget, n_shards=args.shards)

    t0 = time.monotonic()
    manifest = curriculum.build_curriculum(
        read_parquet_clean(args.docs), cfg)
    wall = round(time.monotonic() - t0, 2)
    out = {k: v for k, v in manifest.items() if k != "merges"}
    out["wall_sec"] = wall
    out["out_dir"] = args.out
    print(json.dumps(out, sort_keys=True))
    if owns:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
