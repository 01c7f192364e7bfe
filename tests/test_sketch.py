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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) synopsis


K = 64


def _kmv(ids: np.ndarray, k: int = K) -> np.ndarray:
    return sketch.kmv_partial(_table(ids), "user_id", k=k)["h"].to_numpy()


def test_kmv_merge_equals_single_pass():
    """Union-merging per-split synopses (k smallest of the concat) ==
    one synopsis over the whole input, for every split point."""
    rng = np.random.default_rng(17)
    ids = rng.integers(0, 5_000, size=3_000)
    whole = _kmv(ids)
    for cut in (1, 500, 1_500, 2_999):
        merged = np.unique(np.concatenate([_kmv(ids[:cut]),
                                           _kmv(ids[cut:])]))[:K]
        assert np.array_equal(merged, whole)


def test_kmv_exact_below_k():
    """With fewer than k distinct keys the synopsis IS the hashed key
    set and kmv_ndv is exact."""
    ids = np.arange(40, dtype=np.int64).repeat(5)
    h = _kmv(ids)
    assert len(h) == 40
    assert sketch.kmv_ndv(h, K) == 40.0


def test_kmv_ndv_error_bound():
    """Relative NDV error within 4 / sqrt(k-2) across regimes above k."""
    rng = np.random.default_rng(23)
    for ndv in (500, 20_000):
        ids = rng.choice(np.arange(ndv, dtype=np.int64) * 104729 + 7,
                         size=ndv * 2)
        exact = len(np.unique(ids))
        est = sketch.kmv_ndv(_kmv(ids, 256), 256)
        assert abs(est - exact) <= 4 / math.sqrt(256 - 2) * exact, \
            (ndv, est, exact)


def test_kmv_overlap_estimates():
    """Jaccard/union/intersection from two independent synopses: exact
    when both sides < k; within 4*sqrt(j(1-j)/k) + NDV-error slack when
    truncated. Sets: A = [0, 3000), B = [1500, 4500) — true j = 1/3."""
    a_ids = np.arange(0, 3_000, dtype=np.int64)
    b_ids = np.arange(1_500, 4_500, dtype=np.int64)
    # exact regime
    out = sketch.kmv_overlap(_kmv(a_ids, 8192), _kmv(b_ids, 8192), 8192)
    assert out["jaccard"] == pytest.approx(1 / 3, abs=1e-12)
    assert out["union"] == 4_500.0 and out["intersection"] == 1_500.0
    # truncated regime
    k = 512
    out = sketch.kmv_overlap(_kmv(a_ids, k), _kmv(b_ids, k), k)
    j = 1 / 3
    tol = 4 * math.sqrt(j * (1 - j) / k)
    assert abs(out["jaccard"] - j) <= tol, out
    assert abs(out["union"] - 4_500) <= 4 / math.sqrt(k - 2) * 4_500
    assert abs(out["intersection"] - 1_500) <= (tol + 0.05) * 4_500


def test_kmv_grouped_and_distributed():
    """Grouped distributed synopsis == per-group single-pass synopsis,
    regardless of block layout."""
    rng = np.random.default_rng(29)
    n = 4_000
    ids = rng.integers(0, 1_000, size=n)
    groups = [("xyz"[i % 3]) for i in range(n)]
    ds = ray.data.from_arrow(_table(ids, groups)).repartition(7)
    got = sketch.kmv_synopsis(ds, "user_id", by=["g"], k=K).to_pandas()
    for g in ("x", "y", "z"):
        mask = np.array(groups) == g
        solo = _kmv(ids[mask])
        sub = got[got.g == g]["h"].to_numpy()
        assert np.array_equal(np.sort(sub), solo), g


def test_kmv_sql_parity():
    """Engine synopsis == DuckDB replay (the q119 oracle contract)."""
    rng = np.random.default_rng(31)
    ids = rng.integers(0, 2_000, size=1_000)
    got = _kmv(ids)
    con = duckdb.connect()
    con.register("ev", _table(ids))
    sm = sketch.splitmix64_sql("user_id")
    ref = con.execute(
        f"SELECT DISTINCT {sm} AS h FROM ev ORDER BY h LIMIT {K}"
    ).df()["h"].to_numpy()
    assert np.array_equal(got, ref.astype(np.uint64))


def test_kmv_merge_property_hypothesis():
    """Hypothesis: ANY id list, ANY cut — merged synopses == whole-input
    synopsis (the confluence that makes block layout / retries safe)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                    min_size=1, max_size=200),
           st.integers(min_value=0, max_value=200),
           st.integers(min_value=1, max_value=32))
    def prop(ids, cut, k):
        ids = np.asarray(ids, np.int64)
        cut = min(cut, len(ids))
        whole = _kmv(ids, k)
        parts = [_kmv(p, k) for p in (ids[:cut], ids[cut:]) if len(p)]
        merged = np.unique(np.concatenate(parts))[:k]
        assert np.array_equal(merged, whole)

    prop()


# ---------------------------------------------------------------------------
# Count-Min sketch


def test_cms_merge_equals_single_pass():
    """Sum-merging per-split partials == one partial over the whole
    input (counter additivity — block layout invariance)."""
    rng = np.random.default_rng(37)
    ids = rng.zipf(1.3, size=5_000).astype(np.int64)

    def dense(ids):
        t = sketch.cms_partial(_table(ids), "user_id", d=3, w=128)
        m = np.zeros((3, 128), np.int64)
        m[t["row"].to_numpy(), t["idx"].to_numpy()] = t["cnt"].to_numpy()
        return m

    whole = dense(ids)
    for cut in (1, 1_000, 4_999):
        assert np.array_equal(dense(ids[:cut]) + dense(ids[cut:]), whole)


def test_cms_overestimate_and_bound():
    """est >= true for EVERY key; est <= true + (e/w) * N for all but a
    delta = e^-d fraction (checked with generous slack on a zipf draw)."""
    rng = np.random.default_rng(41)
    ids = rng.zipf(1.2, size=20_000).astype(np.int64)
    d, w = 4, 256
    t = sketch.cms_partial(_table(ids), "user_id", d=d, w=w)
    keys, true = np.unique(ids, return_counts=True)
    est = sketch.cms_estimate(t, keys, d=d, w=w)
    assert (est >= true).all()
    eps_n = math.e / w * len(ids)
    frac_bad = float(np.mean(est > true + eps_n))
    assert frac_bad <= 2 * math.exp(-d), frac_bad


def test_cms_grouped_distributed_and_sql_parity():
    """Distributed grouped counters == per-group single pass == the
    DuckDB replay (the q121 oracle contract)."""
    rng = np.random.default_rng(43)
    n = 4_000
    ids = rng.integers(0, 500, size=n)
    groups = [("ab"[i % 2]) for i in range(n)]
    d, w = 3, 64
    ds = ray.data.from_arrow(_table(ids, groups)).repartition(6)
    got = sketch.cms_counters(ds, "user_id", by=["g"], d=d, w=w).to_pandas()
    con = duckdb.connect()
    con.register("ev", _table(ids, groups))
    arms = " UNION ALL ".join(
        f"SELECT g, {j} AS row, "
        f"{sketch.cms_hash_sql('user_id', j, w)} AS idx FROM ev"
        for j in range(d))
    ref = con.execute(
        f"WITH h AS ({arms}) SELECT g, row, idx, COUNT(*) AS cnt FROM h "
        f"GROUP BY g, row, idx ORDER BY g, row, idx").df()
    got = got.sort_values(["g", "row", "idx"]).reset_index(drop=True)
    assert got[["g", "row", "idx", "cnt"]].astype(
        {"row": "int64", "idx": "int64", "cnt": "int64"}).equals(
        ref.astype({"row": "int64", "idx": "int64", "cnt": "int64"}))
    # and per-group single-pass parity
    for g in ("a", "b"):
        mask = np.array(groups) == g
        solo = sketch.cms_partial(_table(ids[mask]), "user_id", d=d,
                                  w=w).to_pandas()
        sub = got[got.g == g][["row", "idx", "cnt"]].reset_index(drop=True)
        assert sub.astype("int64").equals(solo.astype("int64"))


def test_cms_validation():
    with pytest.raises(ValueError):
        sketch.cms_partial(_table(np.arange(4)), "user_id", d=0)
    with pytest.raises(ValueError):
        sketch.cms_partial(_table(np.arange(4)), "user_id", d=9)
    with pytest.raises(ValueError):
        sketch.cms_partial(_table(np.arange(4)), "user_id", w=1)
