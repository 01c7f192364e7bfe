"""Ops CLI for the partial-column (patch) CDC engine — the cell-grain
sibling of tools/cdc_job.py. One JSON line per action.

    # generate a patch binlog and ingest it (LSM delta mode):
    python tools/patch_job.py --generate --epochs 3 \
        --events-per-epoch 200000 --compact-interval 2

    # exact-key point read (pruned to the key's partition files):
    python tools/patch_job.py --lake-dir L --get org1/proj src/a.py

    # cell-grain change feed summary for epochs [FROM, TO]:
    python tools/patch_job.py --lake-dir L --feed 1 2
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
    ap.add_argument("--binlog-dir", default="/tmp/patch_job_binlog")
    ap.add_argument("--lake-dir", default="/tmp/patch_job_lake")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--events-per-epoch", type=int, default=100_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--merge-concurrency", type=int, default=8)
    ap.add_argument("--compact-interval", type=int, default=1)
    ap.add_argument("--generate", action="store_true",
                    help="materialize the patch binlog epochs first")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--get", nargs=2, metavar=("REPO", "PATH"), default=None,
                    help="pruned point read instead of ingesting")
    ap.add_argument("--feed", nargs="+", metavar="EPOCH", default=None,
                    help="cell-grain change feed summary for [FROM [TO]]")
    ap.add_argument("--read-epoch", type=int, default=None,
                    help="row count of the live state at EPOCH")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.read_op_min_num_blocks = 32

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, patch

    if args.get is not None:
        eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
            lake_dir=args.lake_dir, num_partitions=args.partitions))
        t = eng.point_read([tuple(args.get)])
        rows = t.to_pylist()
        print(json.dumps({"key": args.get, "found": bool(rows),
                          **({k: v for k, v in rows[0].items()
                              if k != "content"} if rows else {})}))
        ray.shutdown()
        return 0

    if args.feed is not None:
        from e_commerce_batch_etl_pipeline_ray.cdc import patch_feed
        frm = int(args.feed[0])
        to = int(args.feed[1]) if len(args.feed) > 1 else None
        ds = patch_feed.cell_change_feed(args.lake_dir, frm, to)
        df = ds.to_pandas()
        by_type = df["_change_type"].value_counts().to_dict()
        changed = (df.loc[df["changed_cols"].notna(), "changed_cols"]
                   .str.split(",").explode().value_counts().to_dict())
        print(json.dumps({"from_epoch": frm, "to_epoch": to,
                          "rows": len(df), "by_type": by_type,
                          "cells_changed": changed}))
        ray.shutdown()
        return 0

    if args.read_epoch is not None:
        eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
            lake_dir=args.lake_dir, num_partitions=args.partitions))
        n = eng.read(epoch=args.read_epoch).count()
        print(json.dumps({"epoch": args.read_epoch, "rows": n}))
        ray.shutdown()
        return 0

    spec = binlog.BinlogSpec(
        events_per_epoch=args.events_per_epoch,
        n_repos=max(20, args.events_per_epoch // 2000),
        paths_per_repo=500, evolution_epoch=1)
    if args.generate:
        import pyarrow.parquet as pq
        os.makedirs(args.binlog_dir, exist_ok=True)
        for ep in range(args.epochs):
            p = os.path.join(args.binlog_dir, f"epoch-{ep:04d}.parquet")
            if not os.path.exists(p):
                pq.write_table(patch.gen_patch_epoch_table(spec, ep), p,
                               row_group_size=max(10_000,
                                                  args.events_per_epoch // 32))

    eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=args.lake_dir, num_partitions=args.partitions,
        merge_concurrency=args.merge_concurrency,
        compact_interval=args.compact_interval))

    if args.resume:
        start = eng.resume_point()
    else:
        if eng.last_committed_epoch() is not None:
            print(json.dumps({"error": "lake not empty; pass --resume"}))
            return 2
        start = 0

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    t0 = time.perf_counter()
    total = 0
    for ep in range(start, args.epochs):
        p = os.path.join(args.binlog_dir, f"epoch-{ep:04d}.parquet")
        m = eng.ingest_epoch(
            read_parquet_clean(p, override_num_blocks=32), ep)
        total += args.events_per_epoch
        print(json.dumps({"epoch": ep, **m.get("metrics", {})}))
    elapsed = time.perf_counter() - t0
    rows = eng.read().count()
    print(json.dumps({
        "epochs": args.epochs - start, "events": total,
        "elapsed_s": round(elapsed, 3),
        "events_per_sec": int(total / elapsed) if elapsed else None,
        "final_rows": rows,
        "compact_interval": args.compact_interval}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
