"""Incremental histogram state (cdc/hist_state.py + sketch.hist_*):
exact-bin parity with a numpy replay at any layout, multi-epoch LSM
state == one-shot bins (slicing confluence), crash/resume does NOT
double count (protocol, not algebra), quantile estimates within one bin
width of exact, under/overflow bins, delta-state row bound."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import hist_state, lake
from e_commerce_batch_etl_pipeline_ray.stages import sketch

LO, HI, NBINS = 0, 1024, 64
STEP = (HI - LO) // NBINS


def _data(n: int = 6000, seed: int = 17) -> pa.Table:
    rng = np.random.default_rng(seed)
    x = np.concatenate([
        rng.integers(-50, 1100, size=n - 4),         # spills both edges
        np.array([LO, HI - 1, -1, HI])])             # exact boundaries
    g = ["abc"[i % 3] for i in range(n)]
    return pa.table({"g": pa.array(g), "x": pa.array(x, pa.int64())})


def _brute_bins(t: pa.Table) -> dict:
    out: dict = {}
    for g, x in zip(t["g"].to_pylist(), t["x"].to_pylist()):
        if x is None:
            continue
        b = -1 if x < LO else (NBINS if x >= HI else (x - LO) // STEP)
        out[(g, b)] = out.get((g, b), 0) + 1
    return out


def _as_dict(bins: pa.Table) -> dict:
    return {(g, b): c for g, b, c in zip(bins["g"].to_pylist(),
                                         bins["bin"].to_pylist(),
                                         bins["cnt"].to_pylist())}


def _cfg(tmp: str, compact_interval: int = 2) -> hist_state.IncHistConfig:
    return hist_state.IncHistConfig(
        state_dir=tmp, col="x", by=["g"], lo=LO, hi=HI, nbins=NBINS,
        num_partitions=4, compact_interval=compact_interval)


def test_partial_matches_brute_any_layout():
    t = _data()
    whole = sketch.hist_partial(t, "x", ["g"], LO, HI, NBINS)
    assert _as_dict(whole) == _brute_bins(t)
    # slicing confluence of the pure kernel
    parts = [sketch.hist_partial(t.slice(o, 997), "x", ["g"], LO, HI, NBINS)
             for o in range(0, t.num_rows, 997)]
    merged = hist_state._sum_merge(pa.concat_tables(parts), ["g"])
    assert _as_dict(merged) == _brute_bins(t)


def test_nulls_ignored_and_bad_config_rejected():
    t = pa.table({"g": ["a", "a"], "x": pa.array([5, None], pa.int64())})
    out = sketch.hist_partial(t, "x", ["g"], LO, HI, NBINS)
    assert out["cnt"].to_pylist() == [1]
    with pytest.raises(ValueError):
        sketch.hist_check(0, 1000, 64)       # 64 does not divide 1000
    with pytest.raises(ValueError):
        hist_state.IncHistConfig(state_dir="/tmp/x", col="x",
                                 lo=10, hi=10, nbins=4)


def test_multi_epoch_equals_one_shot(ray_session):
    t = _data()
    tmp = tempfile.mkdtemp(prefix="hist_state_", dir="/tmp")
    eng = hist_state.IncrementalHist(_cfg(tmp, compact_interval=2))
    cuts = [(0, 2000), (2000, 4000), (4000, 6000)]
    for ep, (lo, hi) in enumerate(cuts):
        eng.ingest(ray.data.from_arrow(t.slice(lo, hi - lo)).repartition(3),
                   ep)
    assert _as_dict(eng.bins()) == _brute_bins(t)
    # mass conservation: every non-null row counted exactly once
    n_valid = sum(1 for v in t["x"].to_pylist() if v is not None)
    assert sum(eng.bins()["cnt"].to_pylist()) == n_valid


def test_crash_resume_does_not_double_count(ray_session):
    t = _data()
    tmp = tempfile.mkdtemp(prefix="hist_crash_", dir="/tmp")
    eng = hist_state.IncrementalHist(_cfg(tmp, compact_interval=2))
    eng.ingest(ray.data.from_arrow(t.slice(0, 3000)).repartition(3), 0)
    eng.ingest(ray.data.from_arrow(t.slice(3000, 3000)).repartition(3), 1)
    # crash: epoch 1's manifest never committed
    os.remove(os.path.join(tmp, "manifests", "epoch-0001.json"))
    eng2 = hist_state.IncrementalHist(_cfg(tmp, compact_interval=2))
    assert eng2.resume_point() == 1
    eng2.ingest(ray.data.from_arrow(t.slice(3000, 3000)).repartition(3), 1)
    assert _as_dict(eng2.bins()) == _brute_bins(t)
    with pytest.raises(ValueError):          # committed epochs refuse replay
        eng2.ingest(ray.data.from_arrow(t.slice(0, 10)), 1)


def test_quantiles_within_one_bin_width(ray_session):
    rng = np.random.default_rng(3)
    x = rng.integers(LO, HI, size=20000)
    t = pa.table({"g": pa.array(["a"] * len(x)), "x": pa.array(x, pa.int64())})
    tmp = tempfile.mkdtemp(prefix="hist_q_", dir="/tmp")
    eng = hist_state.IncrementalHist(_cfg(tmp))
    eng.ingest(ray.data.from_arrow(t).repartition(4), 0)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = eng.quantiles(qs, group=("a",))
    exact = np.quantile(x, qs)
    assert np.all(np.abs(est - exact) <= STEP + 1e-9)


def test_delta_state_bounded_and_compaction_folds(ray_session):
    t = _data()
    tmp = tempfile.mkdtemp(prefix="hist_lsm_", dir="/tmp")
    eng = hist_state.IncrementalHist(_cfg(tmp, compact_interval=3))
    for ep, (lo, hi) in enumerate([(0, 2000), (2000, 4000), (4000, 6000)]):
        eng.ingest(ray.data.from_arrow(t.slice(lo, hi - lo)).repartition(3),
                   ep)
    # epoch 2 compacted: no deltas left, bases bounded by groups x bins
    m = lake.read_manifest(tmp, 2)
    rows = 0
    for rec in m["partitions"].values():
        assert rec["deltas"] == []
        rows += rec["rows_total"]
    assert rows <= 3 * (NBINS + 2)
    assert _as_dict(eng.bins()) == _brute_bins(t)
