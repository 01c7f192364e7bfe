"""Deterministic sampling / splitting / mixing for training-data pipelines
(engine brief: dataset assembly ops a 100-TB curriculum build needs).

All three ops are pure row-local functions of a hash of the row's ID —
embarrassingly parallel, zero shuffle, reproducible at ANY parallelism and
resumable (re-running a shard yields the same assignment). That is the
property that matters at scale: a random() sample changes under retry and
block-layout changes; a hash sample never does.

The hash is Knuth multiplicative hashing in u32 space —
``((id + seed) % 2^32 * 2654435761) % 2^32 / 2^32`` — chosen over siphash/
splitmix64 deliberately: it is exactly expressible in ANSI SQL (HUGEINT
arithmetic), so the DuckDB oracles reproduce the assignment bit-for-bit.
Intermediate products stay below 2^64, so numpy u64 and SQL exact integers
agree everywhere.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.core import FnStep

_KNUTH = np.uint64(2654435761)
_MOD = np.uint64(1) << np.uint64(32)


def _unit_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """[0,1) hash of integer ids: Knuth multiplicative in u32 space,
    salted by seed. Exactly ((id + seed) % 2^32 * 2654435761) % 2^32 /
    2^32 — the pre-multiply mod keeps the product < 2^64 so numpy u64 and
    the SQL oracle's exact HUGEINT arithmetic agree bit-for-bit."""
    with np.errstate(over="ignore"):
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD) * _KNUTH) % _MOD
    return h.astype(np.float64) / float(_MOD)


def hash_sample(id_col: str, fraction: float, seed: int = 0) -> FnStep:
    """Deterministic Bernoulli sample: keep rows whose unit hash < fraction.
    Unlike Dataset.random_sample, membership is a pure function of the row
    id — stable under retries, repartitioning and resume."""
    def _fn(t: pa.Table) -> pa.Table:
        u = _unit_hash(t[id_col].to_numpy(), seed)
        return t.filter(pa.array(u < fraction))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"hash_sample[{fraction}]", _apply)


def hash_split(id_col: str, weights: Sequence[float],
               labels: Sequence[str] | None = None, seed: int = 0,
               out: str = "split") -> FnStep:
    """Deterministic train/val/test split: the unit hash lands in one of
    ``len(weights)`` cumulative buckets. Every row gets exactly one label;
    the assignment never changes across runs or layouts."""
    w = np.asarray(weights, dtype=np.float64)
    if (w <= 0).any():
        raise ValueError("weights must be positive")
    cum = np.cumsum(w / w.sum())
    labs = list(labels) if labels else [f"split_{i}" for i in range(len(w))]
    if len(labs) != len(w):
        raise ValueError("need one label per weight")

    def _fn(t: pa.Table) -> pa.Table:
        u = _unit_hash(t[id_col].to_numpy(), seed)
        idx = np.searchsorted(cum, u, side="right")
        idx = np.minimum(idx, len(labs) - 1)
        vals = np.asarray(labs, dtype=object)[idx]
        return t.append_column(out, pa.array(vals, pa.string()))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"hash_split[{','.join(labs)}]", _apply)


def mixture(datasets: "Sequence[tuple]", id_cols: Sequence[str],
            fractions: Sequence[float], seed: int = 0):
    """Weighted mixture of N sources: hash-sample each source at its
    fraction, tag provenance, union. ``datasets``: (name, Dataset) pairs.
    The union streams — no materialization; per-source rates are exact in
    expectation and deterministic per row."""
    import ray.data  # noqa: F401
    parts = []
    for (name, ds), id_col, frac in zip(datasets, id_cols, fractions):
        sampled = hash_sample(id_col, frac, seed=seed).apply(ds)

        def _tag(t: pa.Table, _n=name) -> pa.Table:
            return t.append_column("_source",
                                   pa.array([_n] * t.num_rows, pa.string()))
        parts.append(sampled.map_batches(_tag, batch_format="pyarrow",
                                         zero_copy_batch=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def sql_unit_hash(id_expr: str, seed: int = 0) -> str:
    """The DuckDB expression equal to _unit_hash — shared by the oracles."""
    return (f"(((CAST({id_expr} AS HUGEINT) + {seed}) % 4294967296) "
            f"* 2654435761 % 4294967296) / 4294967296.0")


def stratified_sample(id_col: str, strata_col: str,
                      fractions: Mapping[str, float],
                      default: float = 0.0, seed: int = 0) -> FnStep:
    """Deterministic per-stratum Bernoulli sample (Spark
    ``sampleBy(col, fractions, seed)``): a row is kept iff its unit hash
    is below its stratum's fraction; strata absent from ``fractions``
    use ``default``. Pure row-local like hash_sample — zero shuffle,
    reproducible under retries/layout changes, SQL-expressible (same
    Knuth hash as the oracle). The rebalancing move for skewed training
    mixtures: down-sample the boilerplate stratum, keep the rare one."""
    fr = dict(fractions)

    def _fn(t: pa.Table) -> pa.Table:
        u = _unit_hash(t[id_col].to_numpy(), seed)
        svals = t[strata_col].to_pylist()
        limit = np.array([fr.get(s, default) for s in svals],
                         dtype=np.float64)
        return t.filter(pa.array(u < limit))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"stratified_sample[{strata_col}]", _apply)


def sample_per_group(by: Sequence[str], id_col: str, k: int,
                     seed: int = 0, num_partitions: int = 32) -> FnStep:
    """Deterministic uniform k-per-group sample (without replacement):
    keep each group's k rows with the smallest ``(unit_hash(id), id)`` —
    a distributed reservoir replacement that is layout/retry-invariant
    and SQL-reproducible (QUALIFY ROW_NUMBER() OVER (PARTITION BY by
    ORDER BY hash, id) <= k).

    Scale shape: per-batch PRE-PRUNE to k rows per group (the combiner —
    a batch can never contribute more than k survivors per group), then
    one hash-partition shuffle on the group key and the same vectorized
    prune per partition. Shuffle traffic is min(rows, k * groups_per_
    batch * blocks), not the full table."""
    import pandas as pd

    by = list(by)

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        df = df.assign(__h=_unit_hash(ids.astype(np.int64), seed))
        df = df.sort_values(by + ["__h", id_col], kind="mergesort")
        keep = df.groupby(by, sort=False, dropna=False).cumcount() < k
        return df[keep].drop(columns="__h")

    def _apply(ds):
        from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
            hash_partition_ids,
        )
        ds = ds.map_batches(_prune, batch_format="pandas")

        def _assign(t: pa.Table) -> pa.Table:
            pid = hash_partition_ids(t, by, num_partitions)
            return t.append_column("_spgid", pa.array(pid, pa.int32()))

        def _final(df: pd.DataFrame) -> pd.DataFrame:
            return _prune(df.drop(columns=["_spgid"]))

        ds = ds.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ds.groupby("_spgid").map_groups(_final, batch_format="pandas")

    return FnStep(f"sample_per_group[{k}]", _apply)


def _unit_hash_open(ids: np.ndarray, seed: int) -> np.ndarray:
    """(0,1)-open unit hash: (h + 0.5) / 2^32 = (2h+1)/2^33 — exactly
    representable (< 2^53), never 0 or 1, so logs are always finite.
    SQL twin: sql_unit_hash_open."""
    with np.errstate(over="ignore"):
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD) * _KNUTH) % _MOD
    return (h.astype(np.float64) + 0.5) / float(_MOD)


def sql_unit_hash_open(id_expr: str, seed: int = 0) -> str:
    """The DuckDB expression equal to _unit_hash_open bit-for-bit."""
    return (f"((((CAST({id_expr} AS HUGEINT) + {seed}) % 4294967296) "
            f"* 2654435761 % 4294967296) + 0.5) / 4294967296.0")


def weighted_sample(id_col: str, weight_col: str, rate: float,
                    seed: int = 0) -> FnStep:
    """Deterministic weighted Bernoulli sample: keep a row iff
    unit_hash(id) < rate * weight (clipped to [0,1]; null / non-positive
    weights never selected). P(keep) proportional to the weight column —
    the expected-count mixture primitive (up-weight rare high-quality
    docs, down-weight boilerplate) that stays PURE ROW-LOCAL: zero
    shuffle, reproducible under retries/layout, and BIT-EXACT in SQL
    (the unit hash is exact integer arithmetic and rate*weight is one
    correctly-rounded double multiply, identical in numpy and DuckDB)."""

    def _fn(t: pa.Table) -> pa.Table:
        u = _unit_hash(t[id_col].to_numpy(), seed)
        w = t[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
        w = np.nan_to_num(w.astype(np.float64), nan=0.0)
        p = np.minimum(1.0, rate * w)
        return t.filter(pa.array(u < p))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"weighted_sample[{weight_col}]", _apply)


def weighted_top_k(ds, id_col: str, weight_col: str, k: int,
                   seed: int = 0):
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    exponential race: each row's key is ln(u) / w (u = open unit hash of
    the id, order-equivalent to u^(1/w)) and the sample is the k rows
    with the LARGEST key — one pass, no resampling rounds. Non-positive
    / null weights never win.

    Scale shape: per-block top-k prune (a block contributes at most k
    survivors), then one k-row-per-block final merge — traffic is
    k x blocks rows, never the table. Deterministic under any layout.

    Oracle note (q124): the SQL twin orders by ln(u)/w computed by
    DuckDB's libm, which can differ from numpy's by 1 ulp; selection
    flips only if the k-th/k+1-th keys of DIFFERENT rows land within
    that ulp — a measure-zero tie for continuous hashed keys (verified
    green at every shipped sf). Exact ties break by id."""
    import pandas as pd

    def _prune(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        w = pd.to_numeric(df[weight_col], errors="coerce").to_numpy(
            dtype=np.float64)
        u = _unit_hash_open(ids.astype(np.int64), seed)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        key = np.where(np.isfinite(key) & (w > 0), key, -np.inf)
        df = df.assign(__esk=key)
        df = df.sort_values(["__esk", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
        return df[df.__esk > -np.inf].drop(columns="__esk")

    return (ds.map_batches(_prune, batch_format="pandas")
              .repartition(1)
              .map_batches(_prune, batch_format="pandas"))


def budget_select(ds, budget: int, weight_col: str, score_col: str,
                  id_col: str = "doc_id",
                  lo: float | None = 0.0, hi: float | None = 1.0,
                  nbuckets: int = 1024):
    """Data selection under a TOKEN BUDGET: keep the greedy quality-ranked
    prefix — rows ordered by (score DESC, id ASC) while the running sum of
    ``weight_col`` stays <= ``budget`` (inclusive of the row that reaches
    it). The standard way a training corpus is assembled when the compute
    budget fixes the token count: rank by quality, take from the top until
    the budget is spent (SQL: ``SUM(w) OVER (ORDER BY score DESC, id) <=
    B`` — the q169 oracle replays exactly that).

    Distributed shape — NO global sort: scores are range-bucketed
    (``floor((score-lo)/(hi-lo)*nbuckets)``), one tiny groupby reduces
    per-bucket weight sums (<= nbuckets rows to the driver), and the
    prefix over DESCENDING buckets classifies each bucket as fully-IN
    (kept with a vectorized filter, rows never sorted or moved),
    fully-OUT (dropped at the filter), or the ONE straddling bucket,
    which alone is ordered (one map_groups task: sort + cumsum + cut).
    Work is O(corpus) scan + O(straddle bucket log) — the only
    data-dependent bound is rows sharing the straddling score slice
    (width (hi-lo)/nbuckets); raise ``nbuckets`` if scores are coarsely
    quantized. Ties at the same score are broken by id, exact at any
    parallelism.

    Returns the selected rows (input columns, unsorted). Rows with null
    or NON-FINITE score (NaN, +/-inf) or null weight are never selected —
    the score contract is finite doubles (ADVICE r4: this was previously
    implicit in the isfinite mask).

    ``lo``/``hi`` bound the score range for bucketing only — selection is
    EXACT regardless (out-of-range scores clip into the edge buckets and
    the straddle cut orders by true score), but a mis-specified range
    collapses rows into one bucket and degrades the straddle cut toward a
    single-task sort. Pass ``lo=None`` / ``hi=None`` to derive the bound
    from a min/max pre-pass (one extra scan of the score column); an
    explicit range that misses observed scores raises a RuntimeWarning.
    """
    import warnings

    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )

    nb = int(nbuckets)
    if lo is None or hi is None:
        def _mm(t: pa.Table) -> pa.Table:
            s = t[score_col].cast(pa.float64()).to_numpy(
                zero_copy_only=False)
            s = s[np.isfinite(s)]
            if not len(s):
                return pa.table({"smin": pa.array([], pa.float64()),
                                 "smax": pa.array([], pa.float64())})
            return pa.table({"smin": [float(s.min())],
                             "smax": [float(s.max())]})

        mm = collect_arrow(ds.select_columns([score_col]).map_batches(
            _mm, batch_format="pyarrow", zero_copy_batch=True))
        if mm.num_rows:
            if lo is None:
                lo = pc.min(mm["smin"]).as_py()
            if hi is None:
                hi = pc.max(mm["smax"]).as_py()
        lo = 0.0 if lo is None else lo
        hi = 1.0 if hi is None else hi
        range_explicit = False
    else:
        range_explicit = True
    span = float(hi) - float(lo)
    if span <= 0:
        span = 1.0          # all-equal scores: one bucket, exact cut

    def _bucket_of(score: np.ndarray) -> np.ndarray:
        b = np.floor((score - float(lo)) / span * nb).astype(np.int64)
        return np.clip(b, 0, nb - 1)

    def _add_bucket(t: pa.Table) -> pa.Table:
        s = t[score_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        w = t[weight_col]
        ok = np.isfinite(s) & pc.is_valid(w).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ok))
        b = _bucket_of(s[ok])
        return t.append_column("_bsel", pa.array(b, pa.int64()))

    # deliberately NOT materialized: the three consumers (bucket sums,
    # full-bucket filter, straddle cut) each stream the tagged input, so
    # nothing corpus-sized ever pins the object store; pass a cached ds
    # if the upstream scoring is expensive to recompute
    tagged = ds.map_batches(_add_bucket, batch_format="pyarrow",
                            zero_copy_batch=True)
    def _sums(t: pa.Table) -> pa.Table:
        agg = t.group_by(["_bsel"]).aggregate(
            [(weight_col, "sum")]).rename_columns(["_bsel", "w"])
        s = t[score_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        smin = float(s.min()) if len(s) else float("nan")
        smax = float(s.max()) if len(s) else float("nan")
        return agg.append_column(
            "smin", pa.array([smin] * agg.num_rows, pa.float64())) \
            .append_column(
                "smax", pa.array([smax] * agg.num_rows, pa.float64()))

    sums = tagged.select_columns(["_bsel", weight_col, score_col]) \
        .map_batches(_sums, batch_format="pyarrow", zero_copy_batch=True)
    part = collect_arrow(sums)
    if part.num_rows == 0:
        return tagged.drop_columns(["_bsel"])
    if range_explicit:
        obs_lo = pc.min(part["smin"]).as_py()
        obs_hi = pc.max(part["smax"]).as_py()
        if obs_lo < float(lo) or obs_hi > float(hi):
            warnings.warn(
                f"budget_select: observed scores [{obs_lo}, {obs_hi}] fall "
                f"outside the declared range [{lo}, {hi}]; out-of-range "
                "rows clip into the edge buckets (selection stays exact, "
                "but a collapsed bucket degrades the straddle cut to one "
                "sort task). Pass lo=None/hi=None to derive the range.",
                RuntimeWarning, stacklevel=2)
    part = part.drop_columns(["smin", "smax"])
    agg = part.group_by(["_bsel"]).aggregate([("w", "sum")]) \
        .rename_columns(["_bsel", "w"]).to_pandas() \
        .sort_values("_bsel", ascending=False)
    ends = agg["w"].cumsum()
    starts = ends - agg["w"]
    full_in = set(agg["_bsel"][ends <= budget].tolist())
    straddle = agg["_bsel"][(starts <= budget) & (ends > budget)].tolist()
    straddle = int(straddle[0]) if straddle else None
    offset = int(starts[agg["_bsel"] == straddle].iloc[0]) \
        if straddle is not None else 0

    def _keep_full(t: pa.Table) -> pa.Table:
        b = t["_bsel"].to_numpy(zero_copy_only=False)
        mask = np.isin(b, np.fromiter(full_in, np.int64, len(full_in))) \
            if full_in else np.zeros(len(b), bool)
        return t.filter(pa.array(mask)).drop_columns(["_bsel"])

    kept = tagged.map_batches(_keep_full, batch_format="pyarrow",
                              zero_copy_batch=True)
    if straddle is None:
        return kept

    def _cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col], ascending=[False, True],
                          kind="mergesort")
        cum = g[weight_col].cumsum() + offset
        return g[cum <= budget].drop(columns=["_bsel"])

    def _only_straddle(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["_bsel"], straddle))

    edge = tagged.map_batches(_only_straddle, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("_bsel").map_groups(_cut, batch_format="pandas")
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        detach,
        ensure_schema,
    )
    schema = pa.schema([f for f in tagged.schema().base_schema
                        if f.name != "_bsel"])
    # pin pandas/empty map_groups blocks to Arrow before union (the Ray
    # 2.49 zero-column-empty-block wart, cf. stages/paradedup.py)
    edge = detach(edge.map_batches(ensure_schema(schema),
                                   batch_format="pyarrow"), schema)
    return kept.union(edge)


def budget_select_grouped(ds, budgets: dict, group_col: str,
                          weight_col: str, score_col: str,
                          id_col: str = "doc_id",
                          lo: float = 0.0, hi: float = 1.0,
                          nbuckets: int = 1024):
    """Per-GROUP token-budget selection — the FineWeb/Dolma-style
    per-domain budget mixture: within every group, keep the greedy
    quality-ranked prefix while the group's running ``weight_col`` sum
    stays <= ``budgets[group]`` (SQL: ``SUM(w) OVER (PARTITION BY g
    ORDER BY score DESC, id) <= B_g`` — the q176 oracle replays exactly
    that). Groups absent from ``budgets`` are DROPPED (budget 0).

    Distributed shape — the group-aware twin of :func:`budget_select`,
    still NO global (or even per-group) sort: one scan tags each row
    with its score bucket, one tiny reduce ships <= groups x nbuckets
    weight sums to the driver (per-domain budget maps are catalog-sized
    by construction), per-group descending-bucket prefix classification,
    ONE fused vectorized filter keeps every fully-in bucket, and a
    single map_groups pass sorts only each group's ONE straddling
    bucket. Finite-score contract as budget_select (null / NaN / +-inf
    scores and null weights never selected); ties break by id, exact at
    any parallelism. Returns the selected rows (input columns,
    unsorted)."""
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
        detach,
        ensure_schema,
    )

    nb = int(nbuckets)
    span = float(hi) - float(lo)
    if span <= 0:
        span = 1.0
    gkeys = pa.array(sorted(str(k) for k in budgets), pa.string())
    bmap = {str(k): float(v) for k, v in budgets.items()}
    SEP = "\x1f"

    def _gbk(group_arr, bucket_np):
        gs = pc.cast(group_arr, pa.string())
        bs = pa.array(bucket_np.astype("U"), pa.string())
        return pc.binary_join_element_wise(gs, bs, SEP)

    def _add_bucket(t: pa.Table) -> pa.Table:
        s = t[score_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        g = t[group_col].combine_chunks()
        ok = (np.isfinite(s)
              & pc.is_valid(t[weight_col]).to_numpy(zero_copy_only=False)
              & pc.is_in(pc.cast(g, pa.string()),
                         value_set=gkeys).to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(ok))
        b = np.clip(np.floor((s[ok] - float(lo)) / span * nb)
                    .astype(np.int64), 0, nb - 1)
        t = t.append_column("_bsel", pa.array(b, pa.int64()))
        return t.append_column(
            "_gbk", _gbk(t[group_col].combine_chunks(), b))

    tagged = ds.map_batches(_add_bucket, batch_format="pyarrow",
                            zero_copy_batch=True)
    sums = tagged.map_batches(
        lambda t: t.select([group_col, "_bsel", weight_col])
        .group_by([group_col, "_bsel"]).aggregate([(weight_col, "sum")])
        .rename_columns([group_col, "_bsel", "w"]),
        batch_format="pyarrow", zero_copy_batch=True)
    part = collect_arrow(sums)
    if part.num_rows == 0:
        return tagged.drop_columns(["_bsel", "_gbk"])
    agg = part.group_by([group_col, "_bsel"]).aggregate([("w", "sum")]) \
        .rename_columns([group_col, "_bsel", "w"]).to_pandas()
    full_in: list[str] = []
    straddle: list[str] = []
    offsets: dict[str, float] = {}
    for gval, gdf in agg.groupby(group_col, sort=True):
        budget = bmap[str(gval)]
        gdf = gdf.sort_values("_bsel", ascending=False)
        ends = gdf["w"].cumsum()
        starts = ends - gdf["w"]
        keys = [f"{gval}{SEP}{b}" for b in gdf["_bsel"]]
        for k, st, en in zip(keys, starts, ends):
            if en <= budget:
                full_in.append(k)
            elif st <= budget:
                straddle.append(k)
                offsets[str(gval)] = float(st)
    full_set = pa.array(sorted(full_in), pa.string())
    strad_set = pa.array(sorted(straddle), pa.string())

    def _keep_full(t: pa.Table) -> pa.Table:
        if len(full_set) == 0:
            t = t.slice(0, 0)
        else:
            t = t.filter(pc.is_in(t["_gbk"].combine_chunks(),
                                  value_set=full_set))
        return t.drop_columns(["_bsel", "_gbk"])

    kept = tagged.map_batches(_keep_full, batch_format="pyarrow",
                              zero_copy_batch=True)
    if len(strad_set) == 0:
        return kept

    def _cut(g: pd.DataFrame) -> pd.DataFrame:
        gval = str(g[group_col].iloc[0])
        g = g.sort_values([score_col, id_col], ascending=[False, True],
                          kind="mergesort")
        cum = g[weight_col].cumsum() + offsets.get(gval, 0.0)
        return g[cum <= bmap[gval]].drop(columns=["_bsel", "_gbk"])

    edge = tagged.map_batches(
        lambda t: t.filter(pc.is_in(t["_gbk"].combine_chunks(),
                                    value_set=strad_set)),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(group_col).map_groups(_cut, batch_format="pandas")
    schema = pa.schema([f for f in tagged.schema().base_schema
                        if f.name not in ("_bsel", "_gbk")])
    edge = detach(edge.map_batches(ensure_schema(schema),
                                   batch_format="pyarrow"), schema)
    return kept.union(edge)
