"""Incremental exact dedup with persistent state: cross-epoch suppression,
within-epoch lowest-id winner, crash/resume idempotency, novel() reads."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import dedup_state, lake


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)


E1 = [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")]
E2 = [(10, "beta"), (11, "delta"), (12, "delta"), (13, "alpha"),
      (14, "epsilon")]


def _eng(tmp_path):
    return dedup_state.IncrementalDedup(dedup_state.IncDedupConfig(
        state_dir=str(tmp_path / "state"), num_partitions=4))


def test_incremental_matches_global_dedup(tmp_path):
    eng = _eng(tmp_path)
    m1 = eng.ingest(_docs(E1), 0)
    assert m1["novel_rows"] == 3 and m1["dup_rows"] == 1
    m2 = eng.ingest(_docs(E2), 1)
    assert m2["novel_rows"] == 2          # delta, epsilon
    assert m2["dup_rows"] == 3            # beta, alpha, second delta
    got1 = {r["doc_id"] for r in eng.novel(0).take_all()}
    got2 = {r["doc_id"] for r in eng.novel(1).take_all()}
    assert got1 == {1, 2, 4}              # lowest id per text in epoch 0
    assert got2 == {11, 14}               # 11 < 12 for delta
    assert eng.seen_count() == 5          # distinct texts overall


def test_crash_resume_rewrites_identically(tmp_path):
    eng = _eng(tmp_path)
    eng.ingest(_docs(E1), 0)
    # simulate crash AFTER epoch-1 data write but BEFORE manifest commit:
    # run epoch 1, then delete its manifest and stray dir, and re-run
    eng.ingest(_docs(E2), 1)
    before = sorted(r["doc_id"] for r in eng.novel(1).take_all())
    import os
    os.remove(lake._manifest_path(str(tmp_path / "state"), 1))
    assert eng.resume_point() == 1        # cleans the orphan epoch dir
    eng.ingest(_docs(E2), 1)
    after = sorted(r["doc_id"] for r in eng.novel(1).take_all())
    assert after == before == [11, 14]
    assert eng.seen_count() == 5


def test_epoch_order_guard_and_empty_epoch(tmp_path):
    eng = _eng(tmp_path)
    eng.ingest(_docs(E1), 0)
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest(_docs(E2), 5)
    # an all-duplicate epoch commits cleanly and yields no novel rows
    eng.ingest(_docs([(99, "alpha"), (100, "beta")]), 1)
    assert eng.novel(1).count() == 0
    assert eng.seen_count() == 3


def test_novel_untouched_partition_not_reread(tmp_path):
    """novel(N) must only surface files written AT epoch N, even though
    untouched partitions carry forward their state files."""
    eng = _eng(tmp_path)
    eng.ingest(_docs(E1), 0)
    eng.ingest(_docs([(50, "zeta")]), 1)
    got = {r["doc_id"] for r in eng.novel(1).take_all()}
    assert got == {50}


def teardown_module(module):
    shutil.rmtree("/tmp/_incdedup_scratch", ignore_errors=True)


# -- hypothesis: split-invariance of the epoch-aware dedup rule ------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

docs_strategy = st.lists(
    st.sampled_from(["t0", "t1", "t2", "t3", "t4"]),
    min_size=1, max_size=12).map(
    lambda texts: [(i, t) for i, t in enumerate(texts)])


@settings(max_examples=8, deadline=None)
@given(docs_strategy, st.integers(0, 12))
def test_any_split_matches_epoch_aware_rule(tmp_path_factory, rows, k):
    """For ANY split of the doc stream into two epochs, the union of the
    per-epoch novel sets equals the epoch-aware global rule: per distinct
    text, the min-id doc of the EARLIEST epoch containing it."""
    k = min(k, len(rows))
    e1, e2 = rows[:k], rows[k:]
    eng = dedup_state.IncrementalDedup(dedup_state.IncDedupConfig(
        state_dir=str(tmp_path_factory.mktemp("hyp")), num_partitions=2))
    got = set()
    for ep, batch in enumerate(b for b in (e1, e2) if b):
        eng.ingest(_docs(batch), ep)
        got |= {r["doc_id"] for r in eng.novel(ep).take_all()}
    exp = set()
    for text in {t for _, t in rows}:
        for batch in (e1, e2):
            ids = [i for i, t in batch if t == text]
            if ids:
                exp.add(min(ids))
                break
    assert got == exp


def test_vacuum_keeps_latest_novel_files(tmp_path):
    """lake.vacuum on a dedup state keeps the kept manifests' novel files
    (they are committed outputs), while reclaiming older epochs' files."""
    eng = _eng(tmp_path)
    eng.ingest(_docs(E1), 0)
    eng.ingest(_docs(E2), 1)
    res = lake.vacuum(str(tmp_path / "state"), keep_last=1)
    assert res["files_removed"] > 0          # epoch-0 state superseded
    assert sorted(r["doc_id"] for r in eng.novel(1).take_all()) == [11, 14]


def test_lsm_deltas_and_compaction_boundary(tmp_path):
    """compact_interval=3: epochs 0,1 append deltas (no base rewrite),
    epoch 2 compacts; novel sets stay exact across the boundary and the
    compacted manifest has no deltas."""
    eng = dedup_state.IncrementalDedup(dedup_state.IncDedupConfig(
        state_dir=str(tmp_path / "state"), num_partitions=4,
        compact_interval=3))
    batches = [
        [(1, "a"), (2, "b")],
        [(10, "a"), (11, "c")],           # a dup, c novel (delta epoch)
        [(20, "c"), (21, "d"), (22, "b")],  # compact epoch: only d novel
        [(30, "d"), (31, "e")],           # delta again after compaction
    ]
    exp_novel = [{1, 2}, {11}, {21}, {31}]
    for ep, rows in enumerate(batches):
        eng.ingest(_docs(rows), ep)
        assert {r["doc_id"] for r in eng.novel(ep).take_all()} \
            == exp_novel[ep], ep
    m1 = lake.read_manifest(str(tmp_path / "state"), 1)
    assert any(r.get("deltas") for r in m1["partitions"].values())
    m2 = lake.read_manifest(str(tmp_path / "state"), 2)
    # partitions TOUCHED by the compact epoch fold their deltas into a
    # fresh base; untouched partitions carry forward (the lake contract)
    touched = [r for r in m2["partitions"].values()
               if r.get("file") and "epoch=0002" in r["file"]]
    assert touched and all(not r.get("deltas") for r in touched)
    assert eng.seen_count() == 5
