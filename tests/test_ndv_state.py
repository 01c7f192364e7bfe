"""Incremental NDV state (cdc/ndv_state.py): multi-epoch LSM state ==
one-shot registers, crash/resume rewrites byte-identical state,
duplicate delivery is a no-op (merge idempotence), epoch-order and
modulus guards."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake, ndv_state
from e_commerce_batch_etl_pipeline_ray.stages import sketch

P = 12


def _data(n: int = 6000, seed: int = 9) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 2500, size=n)
    g = ["abc"[i % 3] for i in range(n)]
    return pa.table({"g": pa.array(g),
                     "user_id": pa.array(ids, pa.int64())})


def _cfg(tmp: str, compact_interval: int = 2) -> ndv_state.IncNDVConfig:
    return ndv_state.IncNDVConfig(
        state_dir=tmp, col="user_id", by=["g"], p=P, num_partitions=4,
        compact_interval=compact_interval)


def _ingest_epochs(eng, t: pa.Table, cuts: list[tuple[int, int]],
                   start: int = 0) -> None:
    for ep, (lo, hi) in enumerate(cuts, start=start):
        eng.ingest(ray.data.from_arrow(t.slice(lo, hi - lo)).repartition(3),
                   ep)


def test_multi_epoch_equals_one_shot():
    t = _data()
    eng = ndv_state.IncrementalNDV(
        _cfg(tempfile.mkdtemp(prefix="ndv_t1_")))
    _ingest_epochs(eng, t, [(0, 2000), (2000, 4500), (4500, 6000)])
    state = eng.registers().to_pandas()
    solo = (sketch.hll_registers(ray.data.from_arrow(t), "user_id",
                                 by=["g"], p=P)
            .to_pandas().sort_values(["g", "idx"]).reset_index(drop=True))
    assert state.reset_index(drop=True).equals(solo[state.columns])


def test_crash_resume_byte_identical():
    t = _data()
    sd = tempfile.mkdtemp(prefix="ndv_t2_")
    eng = ndv_state.IncrementalNDV(_cfg(sd))
    _ingest_epochs(eng, t, [(0, 3000), (3000, 6000)])
    before = eng.registers().to_pandas()
    # crash AFTER epoch-1 data wrote but BEFORE its manifest committed
    os.remove(os.path.join(sd, "manifests", "epoch-0001.json"))
    eng2 = ndv_state.IncrementalNDV(_cfg(sd))
    assert eng2.resume_point() == 1
    _ingest_epochs(eng2, t, [(3000, 6000)], start=1)
    assert eng2.registers().to_pandas().equals(before)


def test_duplicate_delivery_noop():
    """Max-merge idempotence: re-delivering an epoch's DATA in a later
    epoch leaves the registers unchanged — redelivery safety no other
    incremental state gets for free."""
    t = _data()
    eng = ndv_state.IncrementalNDV(
        _cfg(tempfile.mkdtemp(prefix="ndv_t3_")))
    _ingest_epochs(eng, t, [(0, 6000)])
    before = eng.registers().to_pandas()
    _ingest_epochs(eng, t, [(0, 3000)], start=1)   # replayed slice
    assert eng.registers().to_pandas().equals(before)


def test_guards():
    t = _data(500)
    sd = tempfile.mkdtemp(prefix="ndv_t4_")
    eng = ndv_state.IncrementalNDV(_cfg(sd))
    _ingest_epochs(eng, t, [(0, 500)])
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest(ray.data.from_arrow(t.slice(0, 10)), 5)
    bad = _cfg(sd)
    bad.num_partitions = 16
    with pytest.raises(ValueError, match="num_partitions"):
        ndv_state.IncrementalNDV(bad).ingest(
            ray.data.from_arrow(t.slice(0, 10)), 1)


def test_estimate_and_untouched_partitions():
    t = _data()
    eng = ndv_state.IncrementalNDV(
        _cfg(tempfile.mkdtemp(prefix="ndv_t5_"), compact_interval=8))
    _ingest_epochs(eng, t, [(0, 6000)])
    # epoch 1: a tiny slice that misses some partitions — carried state
    # must survive the manifest carry-forward
    _ingest_epochs(eng, t, [(0, 5)], start=1)
    ndv = eng.ndv().to_pandas().set_index("g")["ndv"]
    import duckdb
    exact = duckdb.sql(
        "SELECT g, COUNT(DISTINCT user_id) n FROM t GROUP BY 1"
    ).df().set_index("g")["n"]
    for g in exact.index:
        err = abs(ndv[g] - exact[g]) / exact[g]
        assert err <= 4 * 1.04 / (1 << P) ** 0.5, (g, ndv[g], exact[g])
    assert lake.last_committed_epoch(eng.cfg.state_dir) == 1
