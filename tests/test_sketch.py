"""HyperLogLog sketch (stages/sketch.py): merge exactness under arbitrary
block splits, estimate error bounds vs exact NDV, SQL register parity
(the q117 oracle shape), and input validation."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import sketch

P = 12
M = 1 << P


def _regs_dict(t: pa.Table) -> dict:
    return dict(zip(t["idx"].to_pylist(), t["reg"].to_pylist()))


def _table(ids: np.ndarray, groups: list[str] | None = None) -> pa.Table:
    cols = {"user_id": pa.array(ids, pa.int64())}
    if groups is not None:
        cols["g"] = pa.array(groups)
    return pa.table(cols)


def test_partial_merge_equals_single_pass():
    """max-merging per-split partials == one partial over the whole
    input, for EVERY split point (associativity/idempotence of the
    register state — the property that makes retries/epochs safe)."""
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 50_000, size=4_000)
    whole = _regs_dict(sketch.hll_partial(_table(ids), "user_id", p=P))
    for cut in (1, 137, 2_000, 3_999):
        a = _regs_dict(sketch.hll_partial(_table(ids[:cut]), "user_id", p=P))
        b = _regs_dict(sketch.hll_partial(_table(ids[cut:]), "user_id", p=P))
        merged: dict = dict(a)
        for k, v in b.items():
            merged[k] = max(merged.get(k, 0), v)
        assert merged == whole


def test_estimate_error_bound():
    """|est - exact| within 4 sigma (sigma = 1.04/sqrt(m)) across three
    NDV regimes, including the linear-counting small range."""
    rng = np.random.default_rng(11)
    for ndv in (50, 2_000, 60_000):
        ids = rng.choice(np.arange(ndv, dtype=np.int64) * 7919 + 13,
                         size=max(ndv * 2, 10_000))
        exact = len(np.unique(ids))
        t = sketch.hll_partial(_table(ids), "user_id", p=P)
        est = sketch.hll_estimate(t["idx"].to_numpy(), t["reg"].to_numpy(),
                                  P)
        assert abs(est - exact) <= 4 * (1.04 / math.sqrt(M)) * exact + 1, \
            (ndv, est, exact)


def test_grouped_registers_and_ndv():
    """Grouped registers equal per-group single-pass registers, and the
    distributed approx_ndv matches the driver-side estimate."""
    rng = np.random.default_rng(3)
    n = 6_000
    ids = rng.integers(0, 3_000, size=n)
    groups = [("ab"[i % 2]) for i in range(n)]
    ds = ray.data.from_arrow(_table(ids, groups)).repartition(5)
    merged = sketch.hll_registers(ds, "user_id", by=["g"], p=P).to_pandas()
    out = sketch.approx_ndv(ds, "user_id", by=["g"], p=P).to_pandas()
    for g in ("a", "b"):
        mask = np.array(groups) == g
        solo = sketch.hll_partial(_table(ids[mask]), "user_id", p=P)
        got = merged[merged.g == g]
        assert _regs_dict(solo) == dict(zip(got.idx, got.reg))
        est = sketch.hll_estimate(solo["idx"].to_numpy(),
                                  solo["reg"].to_numpy(), P)
        exact = len(np.unique(ids[mask]))
        assert float(out[out.g == g].ndv.iloc[0]) == pytest.approx(est)
        assert abs(est - exact) <= 4 * (1.04 / math.sqrt(M)) * exact + 1


def test_sql_register_parity():
    """The engine's registers equal DuckDB's replay of the same hash —
    the q117 oracle contract, pinned here at a different p."""
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 10_000, size=3_000)
    t = sketch.hll_partial(_table(ids), "user_id", p=P)
    con = duckdb.connect()
    con.register("ev", _table(ids))
    frag = sketch.hll_rank_sql("user_id", P)
    got = con.execute(
        f"WITH h AS (SELECT {frag} FROM ev) "
        f"SELECT idx, MAX(reg) AS reg FROM h GROUP BY idx").df()
    assert _regs_dict(t) == dict(zip(got.idx, got.reg))


def test_p_validation():
    with pytest.raises(ValueError):
        sketch.hll_partial(_table(np.arange(4)), "user_id", p=10)
    with pytest.raises(ValueError):
        sketch.hll_partial(_table(np.arange(4)), "user_id", p=19)


def test_merge_property_hypothesis():
    """Hypothesis: for ANY int64 id list and ANY cut point, max-merging
    the two partials equals the whole-input partial (register-state
    confluence — the block-layout invariance the engine relies on)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                    min_size=1, max_size=300),
           st.integers(min_value=0, max_value=300))
    def prop(ids, cut):
        ids = np.asarray(ids, np.int64)
        cut = min(cut, len(ids))
        whole = _regs_dict(sketch.hll_partial(_table(ids), "user_id", p=P))
        merged: dict = {}
        for part in (ids[:cut], ids[cut:]):
            if not len(part):
                continue
            for k, v in _regs_dict(
                    sketch.hll_partial(_table(part), "user_id",
                                       p=P)).items():
                merged[k] = max(merged.get(k, 0), v)
        assert merged == whole

    prop()
