"""Incremental KMV synopsis state (cdc/kmv_state.py): multi-epoch LSM
state == one-shot synopsis, crash/resume rewrites byte-identical state,
duplicate delivery is a no-op (union-truncate idempotence), the k-row
state bound after compaction, guards, and the maintained cross-corpus
overlap use."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import kmv_state, lake
from e_commerce_batch_etl_pipeline_ray.stages import sketch

K = 64


def _data(n: int = 6000, seed: int = 9) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 2500, size=n)
    g = ["abc"[i % 3] for i in range(n)]
    return pa.table({"g": pa.array(g),
                     "user_id": pa.array(ids, pa.int64())})


def _cfg(tmp: str, compact_interval: int = 2) -> kmv_state.IncKMVConfig:
    return kmv_state.IncKMVConfig(
        state_dir=tmp, col="user_id", by=["g"], k=K, num_partitions=4,
        compact_interval=compact_interval)


def _ingest_epochs(eng, t: pa.Table, cuts: list[tuple[int, int]],
                   start: int = 0) -> None:
    for ep, (lo, hi) in enumerate(cuts, start=start):
        eng.ingest(ray.data.from_arrow(t.slice(lo, hi - lo)).repartition(3),
                   ep)


def _one_shot(t: pa.Table) -> "pa.Table":
    return sketch.kmv_synopsis(ray.data.from_arrow(t), "user_id",
                               by=["g"], k=K)


def test_multi_epoch_equals_one_shot():
    t = _data()
    eng = kmv_state.IncrementalKMV(_cfg(tempfile.mkdtemp(prefix="kmv_t1_")))
    _ingest_epochs(eng, t, [(0, 2000), (2000, 4500), (4500, 6000)])
    state = eng.synopsis().to_pandas()
    solo = _one_shot(t).to_pandas()
    assert state.reset_index(drop=True).equals(solo[state.columns])


def test_crash_resume_byte_identical():
    t = _data()
    sd = tempfile.mkdtemp(prefix="kmv_t2_")
    eng = kmv_state.IncrementalKMV(_cfg(sd))
    _ingest_epochs(eng, t, [(0, 3000), (3000, 6000)])
    before = eng.synopsis().to_pandas()
    os.remove(os.path.join(sd, "manifests", "epoch-0001.json"))
    eng2 = kmv_state.IncrementalKMV(_cfg(sd))
    assert eng2.resume_point() == 1
    _ingest_epochs(eng2, t, [(3000, 6000)], start=1)
    assert eng2.synopsis().to_pandas().equals(before)


def test_duplicate_delivery_noop_and_state_bound():
    t = _data()
    eng = kmv_state.IncrementalKMV(
        _cfg(tempfile.mkdtemp(prefix="kmv_t3_"), compact_interval=1))
    _ingest_epochs(eng, t, [(0, 6000)])
    before = eng.synopsis().to_pandas()
    _ingest_epochs(eng, t, [(0, 3000)], start=1)   # replayed slice
    after = eng.synopsis().to_pandas()
    assert after.equals(before)
    # compact_interval=1: every epoch compacts — the persisted state is
    # EXACTLY the synopsis: <= groups x k rows
    assert len(after) <= 3 * K
    man = lake.read_manifest(eng.cfg.state_dir, 1)
    total = sum(r["rows_total"] for r in man["partitions"].values())
    assert total <= 3 * K


def test_guards():
    t = _data(500)
    sd = tempfile.mkdtemp(prefix="kmv_t4_")
    eng = kmv_state.IncrementalKMV(_cfg(sd))
    _ingest_epochs(eng, t, [(0, 500)])
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest(ray.data.from_arrow(t.slice(0, 10)), 5)
    bad = _cfg(sd)
    bad.num_partitions = 16
    with pytest.raises(ValueError, match="num_partitions"):
        kmv_state.IncrementalKMV(bad).ingest(
            ray.data.from_arrow(t.slice(0, 10)), 1)
    bad2 = _cfg(sd)
    bad2.k = 32
    with pytest.raises(ValueError, match="k="):
        kmv_state.IncrementalKMV(bad2).ingest(
            ray.data.from_arrow(t.slice(0, 10)), 1)


def test_maintained_overlap_between_two_states():
    """The contamination monitor: two INDEPENDENTLY maintained synopses
    (train arriving in 2 epochs, eval in 1) estimate Jaccard within the
    KMV bound of the true id-space overlap — no join ever runs."""
    n = 4000
    train = pa.table({"user_id": pa.array(np.arange(n), pa.int64())})
    ev = pa.table({"user_id": pa.array(np.arange(n // 2, n + n // 2),
                                       pa.int64())})       # true j = 1/3
    k = 512
    ca = kmv_state.IncKMVConfig(
        state_dir=tempfile.mkdtemp(prefix="kmv_a_"), col="user_id",
        by=[], k=k, num_partitions=2, compact_interval=2)
    cb = kmv_state.IncKMVConfig(
        state_dir=tempfile.mkdtemp(prefix="kmv_b_"), col="user_id",
        by=[], k=k, num_partitions=2, compact_interval=2)
    ea, eb = kmv_state.IncrementalKMV(ca), kmv_state.IncrementalKMV(cb)
    ea.ingest(ray.data.from_arrow(train.slice(0, n // 2)), 0)
    ea.ingest(ray.data.from_arrow(train.slice(n // 2)), 1)
    eb.ingest(ray.data.from_arrow(ev), 0)
    out = sketch.kmv_overlap(ea.synopsis()["h"].to_numpy(),
                             eb.synopsis()["h"].to_numpy(), k)
    j = 1 / 3
    assert abs(out["jaccard"] - j) <= 4 * (j * (1 - j) / k) ** 0.5
    # per-side NDV exactness path also flows through the state
    assert abs(ea.ndv()["ndv"][0].as_py() - n) <= 4 / (k - 2) ** 0.5 * n
