"""End-to-end curriculum build (pipelines/curriculum.py): layout
invariance of the FULL output (counts, token content, pack ids),
gate monotonicity, pack-budget invariants, shard readability."""

from __future__ import annotations

import glob
import json
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.pipelines import curriculum


def _docs(n: int = 120, seed: int = 4) -> pa.Table:
    rng = np.random.default_rng(seed)
    words_en = ["the", "quick", "brown", "fox", "data", "pipeline",
                "training", "corpus", "quality", "shard"]
    words_de = ["der", "hund", "und", "die", "katze", "haus", "unter",
                "tisch", "ball", "schlafen"]
    rows = []
    for i in range(n):
        w = words_en if i % 3 else words_de
        k = int(rng.integers(20, 120))
        txt = " ".join(rng.choice(w, k))
        if i % 17 == 0 and i > 0:
            txt = rows[i - 1]["text"]            # exact dups
        if i % 23 == 1 and i > 1:
            txt = rows[i - 2]["text"] + " tail"  # near dups
        rows.append({"doc_id": i, "text": txt})
    return pa.Table.from_pylist(rows)


def _build(t: pa.Table, parts: int) -> tuple[dict, "pa.Table"]:
    cfg = curriculum.CurriculumConfig(
        out_dir=tempfile.mkdtemp(prefix="curr_test_"),
        num_merges=12, pack_budget=128, n_shards=3,
        quality_min=0.05, default_fraction=0.9, sample_seed=3)
    m = curriculum.build_curriculum(
        ray.data.from_arrow(t).repartition(parts), cfg)
    files = sorted(glob.glob(cfg.out_dir + "/shard=*/*.parquet"))
    out = pa.concat_tables([pq.read_table(f) for f in files])
    disk = json.load(open(cfg.out_dir + "/manifest.json"))
    assert disk["counts"] == m["counts"]
    return m, out.sort_by("doc_id")


def test_curriculum_layout_invariant_and_invariants():
    t = _docs()
    m1, o1 = _build(t, 1)
    m2, o2 = _build(t, 7)
    assert m1["counts"] == m2["counts"]
    assert m1["merges"] == m2["merges"]
    assert m1["tokens_total"] == m2["tokens_total"]
    assert o1.equals(o2)                          # full output identical
    c = m1["counts"]
    assert (c["input"] >= c["quality_gate"] >= c["length_gate"]
            >= c["exact_dedup"] >= c["near_dedup"] >= c["mixture"]
            == c["tokenized"])
    assert c["exact_dedup"] < c["length_gate"]    # planted dups removed
    assert c["mixture"] < c["near_dedup"]         # de-mixture at 0.9
    # no doc appears twice; token counts match list lengths
    ids = o1["doc_id"].to_pylist()
    assert len(ids) == len(set(ids)) == c["tokenized"]
    toks = o1["tokens"].to_pylist()
    assert all(len(x) == n for x, n in zip(toks, o1["n_tokens"].to_pylist()))
    assert sum(map(len, toks)) == m1["tokens_total"]
    # pack budget: non-oversize packs fit; every pack id present in shards
    import collections
    fill = collections.Counter()
    singles: dict = collections.Counter()
    for pid, n in zip(o1["pack_id"].to_pylist(), o1["n_tokens"].to_pylist()):
        fill[pid] += n
        singles[pid] += 1
    for pid, tot in fill.items():
        assert tot <= 128 or singles[pid] == 1    # oversize = singleton
