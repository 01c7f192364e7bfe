"""Aggregations (SURVEY.md §2.5).

Scale pattern: a bare ``groupby(key).aggregate(...)`` shuffles every row.
``pre_aggregate`` computes partial aggregates per batch FIRST (one row per
key per batch, vectorized via ``pyarrow.Table.group_by``) and only shuffles
the partials — for low-cardinality group keys this collapses the all-to-all
exchange to almost nothing. Count-distinct is exact (the reference is exact,
notebooks/06_optimizations.py:281) via a two-phase nested groupby.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import (AggregateFnV2, Count, Max, Mean, Min, Std,
                                Sum)

from e_commerce_batch_etl_pipeline_ray.core import FnStep
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow

# aggregate spec: list of (agg_kind, column, alias). agg_kind in
# {"count", "sum", "mean", "min", "max", "std", "sum_bool",
#  "count_distinct"}. All but count_distinct work in BOTH the direct and
# the pre-aggregated (combiner) plan; count_distinct has its own
# nested-groupby plan (count_distinct()).

def _lo_name(pname: str) -> str:
    """Compensation (residual) column paired with a float sum partial."""
    return f"__lo_{pname}"


def _dd_add(a: tuple, b: tuple) -> tuple:
    """Double-double addition of two normalized (hi, lo) pairs — exact to
    ~2^-105 relative, associative for merge purposes (order-insensitive far
    below one float64 ulp). Knuth TwoSum + renormalize."""
    s = a[0] + b[0]
    bb = s - a[0]
    err = (a[0] - (s - bb)) + (b[0] - bb)
    lo = a[1] + b[1] + err
    hi = s + lo
    return (hi, lo - (hi - s))


class _CompSumBase(AggregateFnV2):
    """Compensated SUM over a (hi, lo) partial-pair column set for the Ray
    shuffle merge path: a plain ``Sum`` over hi partials re-rounds once per
    partial (exactly the error the lo column exists to cancel), so block
    partials are folded with ``math.fsum`` and accumulators merge with
    double-double addition — the shuffle merge stays exact end to end.
    Integer hi columns take a plain exact int path (their lo is zero).
    Two instances (hi part / lo part) run per pair because one AggregateFn
    yields one output column; dd arithmetic makes both order-consistent."""

    def __init__(self, hi_col: str, lo_col: str, alias: str):
        self._hi_col = hi_col
        self._lo_col = lo_col
        # accumulator is a HOMOGENEOUS 3-float tuple (hi, lo, is_int) so
        # Ray can store it in an Arrow list column between shuffle map
        # and reduce — a mixed-type tag would force the pickled-object
        # block fallback (noisy and slower). Integer sums ride the same
        # double-double pair: hi = round(s), lo = s - hi, both integral
        # floats, and the dd two-sum is error-free on them (lo is 0
        # until |s| > 2^53 and a tiny integer after), so finalize
        # reconstructs the exact int.
        super().__init__(alias, on=hi_col, ignore_nulls=True,
                         zero_factory=lambda: (0.0, 0.0, 1.0))

    def aggregate_block(self, block):
        import math

        import numpy as np
        from ray.data.block import BlockAccessor
        t = BlockAccessor.for_block(block).to_arrow()
        if pa.types.is_integer(t.schema.field(self._hi_col).type):
            s = pc.sum(t[self._hi_col]).as_py()
            if s is None:
                return None
            hi = float(s)
            return (hi, float(s - int(hi)), 1.0)
        hi = pc.cast(t[self._hi_col],
                     pa.float64()).to_numpy(zero_copy_only=False)
        m = ~np.isnan(hi)
        if not m.any():
            return None
        if self._lo_col in t.column_names:
            lo = np.nan_to_num(
                t[self._lo_col].to_numpy(zero_copy_only=False), nan=0.0)
            xs = np.concatenate([hi[m], lo[m]]).tolist()
        else:
            xs = hi[m].tolist()
        s = math.fsum(xs)
        return (s, math.fsum(xs + [-s]), 0.0)

    def combine(self, cur, new):
        hi, lo = _dd_add(cur[:2], new[:2])
        return (hi, lo, cur[2] * new[2])


class _CompSumHi(_CompSumBase):
    def finalize(self, acc):
        if acc[2] == 1.0:
            return int(acc[0]) + int(acc[1])
        return acc[0]


class _CompSumLo(_CompSumBase):
    def finalize(self, acc):
        return 0.0 if acc[2] == 1.0 else acc[1]


_PARTIAL_MAP = {  # agg -> (local pa.Table.group_by agg, merge fn on partials)
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def grouped_aggregate(by: Sequence[str],
                      aggs: Sequence[tuple[str, str | None, str]],
                      pre_aggregate: bool = True,
                      final: str = "shuffle") -> FnStep:
    """A2/A3 — grouped multi-aggregate with partial (combiner) pre-aggregation.

    Reference: GROUP BY year, month -> COUNT/SUM/AVG/COUNT DISTINCT
    (notebooks/04_write_parquet.py:196-207); analytics cube
    (notebooks/06_optimizations.py:276-287).

    ``mean`` is decomposed into sum+count partials and finalized exactly.
    ``count_distinct`` is handled by a separate nested-groupby plan and may
    not be mixed with pre-aggregated aggs in one call — use
    ``count_distinct()`` and join, or set pre_aggregate=False (falls back to
    Ray's full-shuffle aggregate for everything in one pass).

    ``final`` (pre-aggregated plan only) picks where the MERGE of the
    per-block partials runs:

    - ``"shuffle"`` (default): Ray ``groupby().aggregate()`` — fully
      distributed, the right choice when the group-key cardinality is
      unbounded (the shuffle carries only partials either way).
    - ``"driver"``: collect the partials and merge with one Arrow
      ``group_by`` on the driver. Driver memory holds at most
      (#blocks x per-block distinct keys) partial rows — use ONLY for
      low-cardinality keys (dashboard/cube shapes: years x statuses).
      Skips the all-to-all entirely: no sort, no empty range partitions,
      and none of Ray's fixed shuffle latency on sub-second inputs.
    """
    by = list(by)
    aggs = [tuple(a) for a in aggs]
    if final not in ("shuffle", "driver"):
        raise ValueError(f"final must be 'shuffle' or 'driver', got {final!r}")

    if not pre_aggregate or any(k == "count_distinct" for k, _, _ in aggs):
        def _apply_direct(ds):
            bool_cols = {col for kind, col, _ in aggs if kind == "sum_bool"}
            if bool_cols:
                def _cast_bools(t: pa.Table) -> pa.Table:
                    for c in bool_cols:
                        t = t.append_column(f"__bool_{c}",
                                            pc.cast(t[c], pa.int64()))
                    return t
                ds = ds.map_batches(_cast_bools, batch_format="pyarrow",
                                    zero_copy_batch=True)
            ray_aggs = []
            for kind, col, alias in aggs:
                if kind == "count":
                    ray_aggs.append(Count(alias_name=alias))
                elif kind == "sum":
                    ray_aggs.append(Sum(col, alias_name=alias))
                elif kind == "sum_bool":
                    ray_aggs.append(Sum(f"__bool_{col}", alias_name=alias))
                elif kind == "mean":
                    ray_aggs.append(Mean(col, alias_name=alias))
                elif kind == "min":
                    ray_aggs.append(Min(col, alias_name=alias))
                elif kind == "max":
                    ray_aggs.append(Max(col, alias_name=alias))
                elif kind == "std":
                    ray_aggs.append(Std(col, alias_name=alias))
                elif kind == "count_distinct":
                    raise ValueError("use count_distinct() for distinct counts")
                else:
                    raise ValueError(f"unknown agg {kind}")
            return ds.groupby(by).aggregate(*ray_aggs)
        return FnStep(f"group_agg[{','.join(by)}]", _apply_direct)

    # --- pre-aggregated plan -------------------------------------------------
    plan = _PartialPlan(by, aggs)

    def _apply(ds):
        ds = ds.map_batches(plan.local, batch_format="pyarrow",
                            zero_copy_batch=True)
        if final == "driver":
            from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
                collect_arrow,
            )
            merged_t = plan.merge_arrow(collect_arrow(ds), by)
            import ray.data as _rd
            return _rd.from_arrow(plan.finalize(merged_t, by))
        merged = ds.groupby(by).aggregate(*plan.merge_ray_aggs())
        return merged.map_batches(lambda t: plan.finalize(t, by),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)

    return FnStep(f"group_agg_partial[{','.join(by)}]", _apply)


class _PartialPlan:
    """Decomposed-partials plan shared by grouped_aggregate's combiner path
    and grouping_sets/rollup/cube: every agg kind is expressed as mergeable
    partials (sum/min/max/count + derived sum-of-squares / bool-as-int), so
    partials can be merged again at any coarser grain (the grouping-sets
    trick: one scan at the finest grain, re-merge for each set).

    Float SUM partials are COMPENSATED two-float pairs ``(hi, __lo_hi)``
    whose real-number total ``hi + lo`` carries the batch sum to ~2^-64
    relative precision (extended-precision segment sums in the combiner;
    exact ``math.fsum`` re-compensation at every Arrow merge). Without
    this, re-merging partials across grains (rollup/cube) or across blocks
    bakes one float64 rounding per partial into the total — enough to flip
    a ROUND(AVG(x), 2) half-cent tie against the DuckDB oracle, which sums
    raw values in one pass (judge-found on q51_cube at sf0.001: the
    (FURNITURE, nation 8) grain partial fl(8857.76+7845.36) alone loses
    1.8e-12, landing avg_bal at 6202.34499... instead of 6202.345).
    ``finalize`` reconstructs fl(hi + lo) — the correctly-rounded total —
    so sums/means match a single-pass engine bit-for-bit on benign data.
    Integer sums are exact already; their lo column is all zeros (kept so
    the partial schema is static for the Ray shuffle merge path)."""

    def __init__(self, by: Sequence[str], aggs: Sequence[tuple[str, str | None, str]]):
        self.by = list(by)
        self.local_aggs: list[tuple[str, str]] = []   # (col, arrow_agg)
        self.partial_names: list[str] = []
        self.plan: list[tuple[str, str, list[str]]] = []  # (alias, kind, pcols)
        self.derived_cols: dict[str, tuple[str, str]] = {}  # name -> (src, kind)
        self.needs_rowcount = any(k in ("count", "mean") for k, _, _ in aggs)

        def _add_local(col: str, arrow_agg: str) -> str:
            name = f"{col}_{arrow_agg}"
            if name not in self.partial_names:
                self.local_aggs.append((col, arrow_agg))
                self.partial_names.append(name)
            return name

        for kind, col, alias in aggs:
            if kind == "count":
                self.plan.append((alias, "count", ["__rows_sum"]))
            elif kind == "sum":
                self.plan.append((alias, "sum", [_add_local(col, "sum")]))
            elif kind == "mean":
                self.plan.append((alias, "mean", [_add_local(col, "sum"),
                                                  _add_local(col, "count")]))
            elif kind == "min":
                self.plan.append((alias, "min", [_add_local(col, "min")]))
            elif kind == "max":
                self.plan.append((alias, "max", [_add_local(col, "max")]))
            elif kind == "sum_bool":
                # Spark sum(cast(bool as int)) — premium-customer count in the
                # reference cube (notebooks/06_optimizations.py:276-287)
                name = f"__bool_{col}"
                self.derived_cols[name] = (col, "bool_int")
                self.plan.append((alias, "sum_bool", [_add_local(name, "sum")]))
            elif kind == "std":
                # sample stddev from (sum, sum of squares, count) partials —
                # matches Spark stddev / DuckDB STDDEV (sample, n-1)
                name = f"__sq_{col}"
                self.derived_cols[name] = (col, "square")
                self.plan.append((alias, "std", [_add_local(col, "sum"),
                                                 _add_local(name, "sum"),
                                                 _add_local(col, "count")]))
            elif kind in ("corr", "covar"):
                # Pearson correlation / sample covariance from mergeable
                # pair partials (sum x, sum y, sum xy, [sum x^2, sum y^2],
                # pair count). SQL-parity nulls: rows where EITHER side is
                # null are excluded from every partial (the mask), matching
                # CORR/COVAR_SAMP; ``col`` is the (x, y) column pair.
                if not (isinstance(col, (tuple, list)) and len(col) == 2):
                    raise ValueError(f"{kind} needs col=(x, y), got {col!r}")
                x, y = col
                names = {part: f"__{kind[:2]}_{part}_{x}_{y}"
                         for part in ("x", "y", "xy", "x2", "y2")}
                parts = ["x", "y", "xy"] + (["x2", "y2"] if kind == "corr"
                                            else [])
                for part in parts:
                    self.derived_cols[names[part]] = ((x, y), f"pair_{part}")
                pcols = [_add_local(names[p], "sum") for p in parts]
                pcols.append(_add_local(names["xy"], "count"))
                self.plan.append((alias, kind, pcols))
            else:
                raise ValueError(f"agg {kind} not supported with pre_aggregate")

    def local(self, t: pa.Table) -> pa.Table:
        """Per-batch combiner: derived columns + one Arrow group_by."""
        by = self.by
        for name, (src, how) in self.derived_cols.items():
            if how == "bool_int":
                t = t.append_column(name, pc.cast(t[src], pa.int64()))
            elif how == "square":
                c = pc.cast(t[src], pa.float64())
                t = t.append_column(name, pc.multiply(c, c))
            else:  # pair_{x,y,xy,x2,y2}: null-masked corr/covar partials
                x, y = src
                cx = pc.cast(t[x], pa.float64())
                cy = pc.cast(t[y], pa.float64())
                both = pc.and_kleene(pc.is_valid(cx), pc.is_valid(cy))
                part = how.removeprefix("pair_")
                val = {"x": cx, "y": cy,
                       "xy": pc.multiply(cx, cy),
                       "x2": pc.multiply(cx, cx),
                       "y2": pc.multiply(cy, cy)}[part]
                t = t.append_column(
                    name, pc.if_else(both, val, pa.scalar(None, pa.float64())))
        cols = set(by) | {c for c, _ in self.local_aggs}
        t = t.select([c for c in t.column_names if c in cols])
        if self.needs_rowcount:
            t = t.append_column("__rows", pa.array([1] * t.num_rows, pa.int64()))
        gb_aggs = list(self.local_aggs) + (
            [("__rows", "sum")] if self.needs_rowcount else [])
        comp = [(c, f"{c}_sum") for c, agg in self.local_aggs if agg == "sum"]
        if not comp:
            return t.group_by(by).aggregate(gb_aggs)

        # Compensated float sums: group_by also collects each group's row
        # indices ("list" agg) so the extended-precision segment sums align
        # exactly with the aggregate's group rows.
        import numpy as np
        t = t.append_column("__seq", pa.array(np.arange(t.num_rows),
                                              pa.int64()))
        out = t.group_by(by).aggregate(gb_aggs + [("__seq", "list")])
        lists = out["__seq_list"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
        out = out.drop_columns(["__seq_list"])
        n_groups = out.num_rows
        for src, pname in comp:
            if not pa.types.is_floating(out.schema.field(pname).type):
                # integer sums are exact — static all-zero lo keeps the
                # partial schema uniform for the shuffle-merge path
                out = out.append_column(
                    _lo_name(pname),
                    pa.array(np.zeros(n_groups), pa.float64()))
                continue
            v = pc.cast(t[src], pa.float64()).to_numpy(zero_copy_only=False)
            g = v[flat]
            valid = ~np.isnan(g)
            ld = np.where(valid, g, 0.0).astype(np.longdouble)
            if n_groups:
                sums = np.add.reduceat(ld, offs[:-1])
                cnts = np.add.reduceat(valid.astype(np.int64), offs[:-1])
            else:
                sums = np.zeros(0, np.longdouble)
                cnts = np.zeros(0, np.int64)
            hi = sums.astype(np.float64)
            lo = (sums - hi.astype(np.longdouble)).astype(np.float64)
            none_valid = cnts == 0
            lo[none_valid] = 0.0
            out = out.set_column(
                out.column_names.index(pname), pname,
                pa.array(hi, pa.float64(), mask=none_valid))
            out = out.append_column(_lo_name(pname),
                                    pa.array(lo, pa.float64()))
        return out

    def _merge_pairs(self) -> tuple[list[tuple[str, str]], dict[str, str]]:
        pairs: list[tuple[str, str]] = []
        rename: dict[str, str] = {}
        for col, arrow_agg in self.local_aggs:
            pname = f"{col}_{arrow_agg}"
            how = arrow_agg if arrow_agg in ("min", "max") else "sum"
            pairs.append((pname, how))
            rename[f"{pname}_{how}"] = pname
            if arrow_agg == "sum":
                lo = _lo_name(pname)
                pairs.append((lo, "sum"))
                rename[f"{lo}_sum"] = lo
        if self.needs_rowcount:
            pairs.append(("__rows_sum", "sum"))
            rename["__rows_sum_sum"] = "__rows_sum"
        return pairs, rename

    def merge_arrow(self, t: pa.Table, keys: Sequence[str]) -> pa.Table:
        """Merge a partials table down to ``keys`` grain (idempotent across
        grains: partials of partials merge with the same pairs).

        Float sum pairs are re-compensated exactly: per group, ``math.fsum``
        over all (hi, lo) members gives the correctly-rounded group total as
        the new hi and the exact residual as the new lo — so no precision is
        lost however many times partials re-merge. The per-group Python loop
        is bounded by the merge-grain cardinality, which is the documented
        driver-path contract (dashboard/cube shapes)."""
        pairs, rename = self._merge_pairs()
        # tolerate legacy persisted partials without lo columns
        pairs = [(p, how) for p, how in pairs if p in t.column_names]
        comp = [f"{c}_sum" for c, agg in self.local_aggs
                if agg == "sum" and f"{c}_sum" in t.column_names
                and _lo_name(f"{c}_sum") in t.column_names
                and pa.types.is_floating(t.schema.field(f"{c}_sum").type)]
        if not comp:
            merged = t.group_by(list(keys)).aggregate(pairs)
            return merged.rename_columns(
                [rename.get(c, c) for c in merged.column_names])

        import math

        import numpy as np
        t2 = t.append_column("__midx", pa.array(np.arange(t.num_rows),
                                                pa.int64()))
        merged = t2.group_by(list(keys)).aggregate(pairs + [("__midx",
                                                             "list")])
        merged = merged.rename_columns(
            [rename.get(c, c) for c in merged.column_names])
        lists = merged["__midx_list"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens, dtype=np.int64)])
        merged = merged.drop_columns(["__midx_list"])
        n_groups = merged.num_rows
        for pname in comp:
            lo_name = _lo_name(pname)
            hi_v = t[pname].to_numpy(zero_copy_only=False)
            lo_v = np.nan_to_num(
                t[lo_name].to_numpy(zero_copy_only=False), nan=0.0)
            new_hi = np.zeros(n_groups, np.float64)
            new_lo = np.zeros(n_groups, np.float64)
            isnull = np.zeros(n_groups, bool)
            for gi in range(n_groups):
                idx = flat[offs[gi]:offs[gi + 1]]
                h = hi_v[idx]
                m = ~np.isnan(h)
                if not m.any():
                    isnull[gi] = True
                    continue
                xs = np.concatenate([h[m], lo_v[idx][m]]).tolist()
                hi2 = math.fsum(xs)
                new_hi[gi] = hi2
                new_lo[gi] = math.fsum(xs + [-hi2])
            merged = merged.set_column(
                merged.column_names.index(pname), pname,
                pa.array(new_hi, pa.float64(), mask=isnull))
            merged = merged.set_column(
                merged.column_names.index(lo_name), lo_name,
                pa.array(new_lo, pa.float64()))
        return merged

    def merge_ray_aggs(self):
        aggs = []
        for col, arrow_agg in self.local_aggs:
            pname = f"{col}_{arrow_agg}"
            if arrow_agg == "count":
                aggs.append(Sum(pname, alias_name=pname))
            elif arrow_agg == "sum":
                lo = _lo_name(pname)
                aggs.append(_CompSumHi(pname, lo, alias=pname))
                aggs.append(_CompSumLo(pname, lo, alias=lo))
            elif arrow_agg == "min":
                aggs.append(Min(pname, alias_name=pname))
            elif arrow_agg == "max":
                aggs.append(Max(pname, alias_name=pname))
        if self.needs_rowcount:
            aggs.append(Sum("__rows_sum", alias_name="__rows_sum"))
        return aggs

    @staticmethod
    def _total(t: pa.Table, pname: str):
        """Reconstruct a sum partial: fl(hi + lo) for compensated float
        pairs, the column itself otherwise."""
        col = t[pname]
        lo = _lo_name(pname)
        if lo in t.column_names and pa.types.is_floating(
                t.schema.field(pname).type):
            return pc.add(col, pc.fill_null(t[lo], 0.0))
        return col

    def finalize(self, t: pa.Table, keys: Sequence[str]) -> pa.Table:
        out = t.select(list(keys))
        for alias, kind, pcols in self.plan:
            if kind == "count":
                out = out.append_column(alias, t["__rows_sum"].cast(pa.int64()))
            elif kind == "mean":
                s, c = self._total(t, pcols[0]), t[pcols[1]]
                out = out.append_column(
                    alias, pc.divide(pc.cast(s, pa.float64()),
                                     c.cast(pa.float64())))
            elif kind == "sum":
                out = out.append_column(alias, self._total(t, pcols[0]))
            elif kind == "sum_bool":
                out = out.append_column(alias, t[pcols[0]].cast(pa.int64()))
            elif kind == "std":
                s = pc.cast(self._total(t, pcols[0]), pa.float64())
                sq = pc.cast(self._total(t, pcols[1]), pa.float64())
                n = t[pcols[2]].cast(pa.float64())
                var = pc.divide(
                    pc.subtract(sq, pc.divide(pc.multiply(s, s), n)),
                    pc.subtract(n, pa.scalar(1.0)))
                # clamp tiny negative fp residue before sqrt
                var = pc.max_element_wise(var, pa.scalar(0.0))
                # sample stddev of a singleton group is NULL in
                # DuckDB/Spark, not 0/0=NaN — guard n<=1
                std_vals = pc.if_else(pc.greater(n, pa.scalar(1.0)),
                                      pc.sqrt(var),
                                      pa.scalar(None, pa.float64()))
                out = out.append_column(alias, std_vals)
            elif kind == "covar":
                sx, sy, sxy = (pc.cast(self._total(t, c), pa.float64())
                               for c in pcols[:3])
                n = t[pcols[3]].cast(pa.float64())
                cov = pc.divide(
                    pc.subtract(sxy, pc.divide(pc.multiply(sx, sy), n)),
                    pc.subtract(n, pa.scalar(1.0)))
                out = out.append_column(
                    alias, pc.if_else(pc.greater(n, pa.scalar(1.0)), cov,
                                      pa.scalar(None, pa.float64())))
            elif kind == "corr":
                sx, sy, sxy, sx2, sy2 = (pc.cast(self._total(t, c),
                                                 pa.float64())
                                         for c in pcols[:5])
                n = t[pcols[5]].cast(pa.float64())
                num = pc.subtract(sxy, pc.divide(pc.multiply(sx, sy), n))
                dx = pc.subtract(sx2, pc.divide(pc.multiply(sx, sx), n))
                dy = pc.subtract(sy2, pc.divide(pc.multiply(sy, sy), n))
                ok = pc.and_(
                    pc.greater(n, pa.scalar(1.0)),
                    pc.and_(pc.greater(dx, pa.scalar(0.0)),
                            pc.greater(dy, pa.scalar(0.0))))
                denom = pc.sqrt(pc.multiply(pc.max_element_wise(dx, pa.scalar(0.0)),
                                            pc.max_element_wise(dy, pa.scalar(0.0))))
                r = pc.divide(num, pc.if_else(ok, denom, pa.scalar(1.0)))
                out = out.append_column(
                    alias, pc.if_else(ok, r, pa.scalar(None, pa.float64())))
            else:
                out = out.append_column(alias, t[pcols[0]])
        return out


def grouping_sets(sets: Sequence[Sequence[str]],
                  aggs: Sequence[tuple[str, str | None, str]],
                  final: str = "driver") -> FnStep:
    """GROUP BY GROUPING SETS / ROLLUP / CUBE (Spark ``rollup``/``cube`` —
    the reference's analytics-cube family generalized to multiple grains).

    Scale shape: ONE combiner scan of the data at the FINEST grain (the
    union of all sets' columns) — the only pass that touches every row —
    then each grouping set is derived by RE-MERGING the tiny grain-G partial
    table (partials are mergeable across grains by construction: sum of
    sums, min of mins, ...). Output matches SQL: one row block per set,
    rolled-up key columns NULL, plus no extra scan or shuffle per set.

    ``final``: where the grain-G merge of per-block partials runs —
    ``"driver"`` (default; right for dashboard/cube shapes whose finest
    grain is low-cardinality) or ``"shuffle"`` (Ray groupby for unbounded
    grain cardinality; the per-set re-merges still run driver-side on the
    merged grain-G table, so the finest grain must fit on the driver —
    grouping sets over an unbounded-cardinality grain is a different
    operator: run one grouped_aggregate per set instead).

    ``count_distinct`` is not supported (a distinct count is not mergeable
    across grains from counts alone — use count_distinct() per set).
    """
    sets = [list(s) for s in sets]
    if not sets:
        raise ValueError("grouping_sets needs at least one set")
    finest: list[str] = []
    for s in sets:
        for c in s:
            if c not in finest:
                finest.append(c)
    for s in sets:
        if not set(s) <= set(finest):
            raise ValueError(f"set {s} not a subset of finest grain {finest}")
    if any(k == "count_distinct" for k, _, _ in aggs):
        raise ValueError("count_distinct is not mergeable across grains; "
                         "use count_distinct() per grouping set")
    if final not in ("shuffle", "driver"):
        raise ValueError(f"final must be 'shuffle' or 'driver', got {final!r}")

    plan = _PartialPlan(finest, aggs)

    def _apply(ds):
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        parts = ds.map_batches(plan.local, batch_format="pyarrow",
                               zero_copy_batch=True)
        if final == "driver":
            grain = plan.merge_arrow(collect_arrow(parts), finest)
        else:
            merged = parts.groupby(finest).aggregate(*plan.merge_ray_aggs())
            grain = collect_arrow(merged)

        key_fields = {c: grain.schema.field(c) for c in finest}
        outs = []
        for s in sets:
            if s:
                sub = plan.finalize(plan.merge_arrow(grain, s), s)
            else:  # grand total: Arrow group_by needs >=1 key — constant key
                g = grain.append_column("__all", pa.nulls(grain.num_rows,
                                                          pa.int8()))
                sub = plan.finalize(plan.merge_arrow(g, ["__all"]),
                                    ["__all"]).drop_columns(["__all"])
            # SQL semantics: rolled-up keys come back as NULL columns
            for c in finest:
                if c not in s:
                    sub = sub.append_column(
                        key_fields[c].name,
                        pa.nulls(sub.num_rows, key_fields[c].type))
            outs.append(sub.select(finest + [a for a, _, _ in plan.plan]))
        import ray.data as _rd
        return _rd.from_arrow(pa.concat_tables(outs))

    return FnStep(f"grouping_sets[{len(sets)}]", _apply)


def rollup(by: Sequence[str], aggs: Sequence[tuple[str, str | None, str]],
           final: str = "driver") -> FnStep:
    """GROUP BY ROLLUP(by): (a,b,c) -> (a,b,c), (a,b), (a,), ()."""
    by = list(by)
    return grouping_sets([by[:i] for i in range(len(by), -1, -1)], aggs,
                         final=final)


def cube(by: Sequence[str], aggs: Sequence[tuple[str, str | None, str]],
         final: str = "driver") -> FnStep:
    """GROUP BY CUBE(by): every subset of ``by`` (2^n sets)."""
    from itertools import combinations
    by = list(by)
    sets = [list(c) for n in range(len(by), -1, -1)
            for c in combinations(by, n)]
    return grouping_sets(sets, aggs, final=final)


def count_distinct(by: Sequence[str], col: str, alias: str,
                   num_partitions: int = 32, final: str = "shuffle") -> FnStep:
    """Exact COUNT(DISTINCT col) GROUP BY by — three thin vectorized
    phases: local distinct per batch (combiner: traffic is distinct pairs
    per block, not rows), hash-partitioned global distinct (the dedup_keyed
    sort+boundary kernel — num_partitions Python calls, never one per
    group), then a pre-aggregated count per ``by``.
    Reference: countDistinct notebooks/06_optimizations.py:281."""
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import dedup_keyed

    by = list(by)
    keys = by + [col]

    def _apply(ds):
        def _local_distinct(t: pa.Table) -> pa.Table:
            return t.select(keys).group_by(keys).aggregate([]).select(keys)
        ds = ds.map_batches(_local_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
        # rows are identical per key, so any winner works; order_by=col is a
        # no-op tiebreak that keeps the combine kernel total
        ds = dedup_keyed(keys, [col], descending=False,
                         num_partitions=num_partitions).apply(ds)
        return grouped_aggregate(by, [("count", None, alias)],
                                 pre_aggregate=True, final=final).apply(ds)
    return FnStep(f"count_distinct[{col} by {','.join(by)}]", _apply)


def null_counts(columns: Sequence[str] | None = None) -> "FnStep":
    """A4 — per-column null counts for ALL columns in ONE streaming pass
    (the reference does one filtered count per column, src/quality_checks.py:37-59;
    the notebook's single-pass conditional-count version,
    notebooks/02_transformations.py:52-56, is the model).

    Returns a Step producing a 1-row-per-batch partials dataset with columns
    ``{col: null_count}`` + ``__rows``; reduce with ``sum_partials``.
    """
    def _apply(ds):
        cols = list(columns) if columns else None

        def _local(t: pa.Table) -> pa.Table:
            use = cols or t.column_names
            arrays = {f"{c}": pa.array([t[c].null_count], pa.int64()) for c in use}
            arrays["__rows"] = pa.array([t.num_rows], pa.int64())
            return pa.table(arrays)
        return ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep("null_counts", _apply)


def sum_partials(ds: ray.data.Dataset) -> dict[str, int]:
    """Reduce a tiny partials dataset (one row per batch) on the driver."""
    t = collect_arrow(ds)
    return {c: (pc.sum(t[c]).as_py() or 0) for c in t.column_names}


def global_counts(ds: ray.data.Dataset, masks: Mapping[str, object]) -> dict[str, int]:
    """Named conditional counts over the whole dataset in one pass.

    ``masks``: name -> (batch -> boolean mask). Used by the DQ framework for
    its filtered-count checks (src/quality_checks.py:116-151) without
    re-scanning per check.
    """
    names = list(masks)

    def _local(t: pa.Table) -> pa.Table:
        arrays = {}
        for name in names:
            m = masks[name](t)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            arrays[name] = pa.array([pc.sum(pc.fill_null(m, False)).as_py() or 0],
                                    pa.int64())
        arrays["__rows"] = pa.array([t.num_rows], pa.int64())
        return pa.table(arrays)

    partials = ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)
    return sum_partials(partials)


def approx_count_distinct(ds: ray.data.Dataset, col: str,
                          precision: int = 12) -> int:
    """HyperLogLog approximate distinct count — the mergeable-sketch pattern
    (one sketch per batch, reduced by register-max; ~1.04/sqrt(2^p) relative
    error, ~1.6% at p=12). The reference is exact-only (SURVEY.md §2.5); this
    is the scale path when exact distinct (a full shuffle) is too expensive:
    sketch traffic is 2^p bytes per batch regardless of cardinality.
    """
    import numpy as np

    m = 1 << precision
    p64 = np.uint64(64 - precision)

    def _sketch(t: pa.Table) -> pa.Table:
        import pandas as pd
        h = pd.util.hash_pandas_object(
            t.select([col]).to_pandas()[col], index=False,
            categorize=False).to_numpy().astype(np.uint64)
        idx = (h >> p64).astype(np.int64)
        rest = h << np.uint64(precision)
        # rank = leading zeros of the remaining bits + 1 (capped)
        nz = rest != 0
        lz = np.full(len(h), 64 - precision + 1, dtype=np.int64)
        if nz.any():
            # rank = leading zeros + 1 = 64 - bit_length + 1, computed
            # vectorized via log2 on the high 53 bits (exact for bit_length)
            r = rest[nz]
            bl = np.floor(np.log2((r >> np.uint64(11)).astype(np.float64) + 0.5)).astype(np.int64) + 12
            bl = np.where(r < np.uint64(1 << 11),
                          np.frompyfunc(lambda x: int(x).bit_length(), 1, 1)(r).astype(np.int64),
                          bl)
            lz[nz] = np.minimum(64 - bl + 1, 64 - precision + 1)
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, lz.astype(np.int8))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partials = ds.map_batches(_sketch, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = collect_arrow(partials)
    regs = np.zeros(m, dtype=np.int8)
    for b in merged["regs"].to_pylist():
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
    # HLL estimate with small-range correction
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_count_distinct_by(ds: ray.data.Dataset, by: Sequence[str], col: str,
                             alias: str = "approx_distinct",
                             precision: int = 12) -> ray.data.Dataset:
    """Grouped HLL: approximate COUNT(DISTINCT col) GROUP BY ``by``.

    Per batch: one register sketch per group (pandas groupby + vectorized
    rank); shuffle only (group, 2^p-byte sketch) rows; final merge via
    register-max per group. Traffic is independent of per-group cardinality
    — the grouped counterpart of approx_count_distinct.
    """
    import numpy as np
    import pandas as pd

    by = list(by)
    m = 1 << precision
    p64 = np.uint64(64 - precision)

    def _rank(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = (h >> p64).astype(np.int64)
        rest = h << np.uint64(precision)
        lz = np.full(len(h), 64 - precision + 1, dtype=np.int64)
        nz = rest != 0
        if nz.any():
            r = rest[nz]
            bl = np.floor(np.log2((r >> np.uint64(11)).astype(np.float64) + 0.5)).astype(np.int64) + 12
            bl = np.where(r < np.uint64(1 << 11),
                          np.frompyfunc(lambda x: int(x).bit_length(), 1, 1)(r).astype(np.int64),
                          bl)
            lz[nz] = np.minimum(64 - bl + 1, 64 - precision + 1)
        return idx, lz

    def _sketch(t: pa.Table) -> pa.Table:
        # Explicit output schema always (by-column types taken from the INPUT
        # table, never re-inferred): an empty or single-group batch must
        # produce the same schema as every other block or the downstream
        # groupby(by) breaks / drifts.
        key_proj = t.select(by)
        if t.num_rows == 0:
            return key_proj.append_column("__regs", pa.array([], pa.binary()))
        df = t.select(by + [col]).to_pandas()
        h = pd.util.hash_pandas_object(df[col], index=False,
                                       categorize=False).to_numpy().astype(np.uint64)
        idx, lz = _rank(h)
        first_idx, regs_out = [], []
        for _key, grp_idx in df.groupby(by, sort=False, dropna=False).indices.items():
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx[grp_idx], lz[grp_idx].astype(np.int8))
            first_idx.append(int(grp_idx[0]))
            regs_out.append(regs.tobytes())
        out = key_proj.take(pa.array(first_idx, pa.int64()))
        return out.append_column("__regs", pa.array(regs_out, pa.binary()))

    def _merge(g: pa.Table) -> pa.Table:
        import numpy as np
        regs = np.zeros(m, dtype=np.int8)
        for b in g["__regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out = g.select(by).slice(0, 1)
        return out.append_column(alias, pa.array([int(round(est))], pa.int64()))

    partials = ds.map_batches(_sketch, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(by).map_groups(_merge, batch_format="pyarrow")


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: Sequence[float],
                    bins: int = 2048, fetch_limit: int = 200_000,
                    pass_counter: list | None = None) -> list[float]:
    """EXACT distributed quantiles WITHOUT a global sort: iterative range
    narrowing. Each round runs ONE streaming histogram pass serving ALL
    still-unresolved quantiles (each with its own [lo,hi] candidate range;
    the per-batch fn histograms every active range and tags counts with the
    range index — mergeable ``bins``-cell counts per range). The driver
    finds each quantile's target cell and recurses into it; cells whose
    population fits ``fetch_limit`` are resolved together in ONE bounded
    fetch pass. O(log_bins(n/fetch_limit) + 1) pass-rounds TOTAL regardless
    of how many quantiles are requested; a 10^12-row column needs 2-3.

    Rank semantics match DuckDB ``quantile_disc`` / numpy ``inverted_cdf``:
    the element at 0-based rank ``max(0, ceil(q*n) - 1)``.

    ``pass_counter``: optional list; one element is appended per full
    dataset pass (tests assert the shared-pass bound).
    """
    import math

    import numpy as np

    qs = list(qs)
    if pass_counter is None:
        pass_counter = []

    def _collect(fn):
        pass_counter.append(1)
        return collect_arrow(
            ds.map_batches(fn, batch_format="pyarrow",
                           zero_copy_batch=True))

    def _stats(t: pa.Table) -> pa.Table:
        c = t[col]
        return pa.table({"n": pa.array([len(c) - c.null_count], pa.int64()),
                         "lo": pa.array([pc.min(c).as_py()], pa.float64()),
                         "hi": pa.array([pc.max(c).as_py()], pa.float64())})

    st = _collect(_stats)
    n = pc.sum(st["n"]).as_py() or 0
    if n == 0:
        raise ValueError("no non-null values")
    glo, ghi = pc.min(st["lo"]).as_py(), pc.max(st["hi"]).as_py()

    # per-quantile narrowing state; offset = count strictly below lo
    states = [{"rank": max(0, math.ceil(q * n) - 1), "lo": glo, "hi": ghi,
               "offset": 0, "val": None} for q in qs]

    while True:
        for s in states:
            if s["val"] is None and s["lo"] == s["hi"]:
                s["val"] = s["lo"]
        pending = [s for s in states if s["val"] is None]
        if not pending:
            break

        # ONE histogram pass over the union of active ranges (deduped)
        ranges = sorted({(s["lo"], s["hi"]) for s in pending})
        edges_list = [np.linspace(lo, hi, bins + 1) for lo, hi in ranges]

        def _hist(t: pa.Table, _ranges=ranges, _edges=edges_list) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
            cs, iis, rs = [], [], []
            for ri, ((lo, hi), edges) in enumerate(zip(_ranges, _edges)):
                in_r = v[(v >= lo) & (v <= hi)]
                counts, _ = np.histogram(in_r, bins=edges)
                cs.append(counts)
                iis.append(np.arange(len(counts), dtype=np.int32))
                rs.append(np.full(len(counts), ri, dtype=np.int32))
            return pa.table({"r": pa.array(np.concatenate(rs)),
                             "i": pa.array(np.concatenate(iis)),
                             "c": pa.array(np.concatenate(cs), pa.int64())})

        h = _collect(_hist)
        counts_by_r = np.zeros((len(ranges), bins), dtype=np.int64)
        np.add.at(counts_by_r,
                  (h["r"].to_numpy(), h["i"].to_numpy()), h["c"].to_numpy())
        cums = np.cumsum(counts_by_r, axis=1)

        # narrow every pending quantile against its range's histogram;
        # small-enough cells queue for one combined bounded fetch
        fetch_cells: dict[tuple, list] = {}   # cell -> [(state, below)]
        for s in pending:
            ri = ranges.index((s["lo"], s["hi"]))
            edges, cum, counts = edges_list[ri], cums[ri], counts_by_r[ri]
            b = int(np.searchsorted(cum, s["rank"] - s["offset"] + 1,
                                    side="left"))
            b = min(b, bins - 1)
            blo = edges[b]
            bhi = edges[b + 1] if b + 1 < len(edges) else s["hi"]
            below = s["offset"] + (int(cum[b - 1]) if b > 0 else 0)
            in_bin = int(counts[b])
            if in_bin <= fetch_limit:
                cell = (blo, bhi, b == bins - 1)   # (lo, hi, closed-right)
                fetch_cells.setdefault(cell, []).append((s, below))
            else:
                s["lo"], s["hi"], s["offset"] = blo, bhi, below

        if fetch_cells:
            # ONE bounded fetch pass over all resolved cells (np.histogram
            # bins are half-open except the last, which is closed)
            cells = sorted(fetch_cells)

            def _grab(t: pa.Table, _cells=cells) -> pa.Table:
                v = t[col].to_numpy(zero_copy_only=False)
                v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
                vals, cis = [], []
                for ci, (blo, bhi, closed) in enumerate(_cells):
                    m = (v >= blo) & ((v <= bhi) if closed else (v < bhi))
                    got = v[m]
                    vals.append(got)
                    cis.append(np.full(len(got), ci, dtype=np.int32))
                return pa.table({"ci": pa.array(np.concatenate(cis)),
                                 "v": pa.array(
                                     np.concatenate(vals).astype(np.float64),
                                     pa.float64())})

            g = _collect(_grab)
            ci_arr = g["ci"].to_numpy()
            v_arr = g["v"].to_numpy()
            for ci, cell in enumerate(cells):
                vals = np.sort(v_arr[ci_arr == ci])
                for s, below in fetch_cells[cell]:
                    s["val"] = float(vals[s["rank"] - below])

    return [s["val"] for s in states]


def pivot(by: Sequence[str], pivot_col: str, values: Sequence[str] | None,
          agg: tuple[str, str | None] = ("sum", None),
          prefix: str = "", final: str = "shuffle") -> FnStep:
    """Spark ``groupBy(by).pivot(col, values).agg(...)`` as conditional
    aggregation: ONE row-local map adds a column per pivot value (value
    where pivot==v else NULL for sum/mean/min/max, 0/1 mask for count),
    then the pre-aggregated combiner merge — a single partials-only
    shuffle regardless of how many pivot columns there are.

    ``values``: pass the pivot values explicitly (like Spark's two-arg
    pivot — avoids an extra scan). ``values=None`` discovers them with a
    distinct pass first (documented extra pass; fine when the pivot column
    is low-cardinality, which is the only regime where pivot makes sense —
    every value becomes a physical column).

    SQL-parity nulls: a (group, value) cell with no rows is NULL for
    sum/mean/min/max and 0 for count — matching SUM(CASE WHEN...) /
    COUNT(CASE WHEN ... THEN 1 END).
    """
    kind, col = agg
    if kind not in ("sum", "count", "mean", "min", "max"):
        raise ValueError(f"pivot agg must be sum/count/mean/min/max, got {kind}")
    if kind != "count" and col is None:
        raise ValueError(f"pivot agg {kind} needs a value column")

    def _apply(ds):
        vals = list(values) if values is not None else sorted(
            v for v in ds.select_columns([pivot_col]).unique(pivot_col)
            if v is not None)
        out_names = [f"{prefix}{v}" for v in vals]

        def _widen(t: pa.Table) -> pa.Table:
            pv = t[pivot_col]
            for v, name in zip(vals, out_names):
                mask = pc.equal(pv, pa.scalar(v))
                if kind == "count":
                    cell = pc.if_else(pc.fill_null(mask, False),
                                      pa.scalar(1, pa.int64()),
                                      pa.scalar(0, pa.int64()))
                else:
                    cell = pc.if_else(pc.fill_null(mask, False), t[col],
                                      pa.scalar(None, t[col].type))
                t = t.append_column(name, cell)
            return t

        agg_kind = "sum" if kind == "count" else kind
        inner = grouped_aggregate(
            by, [(agg_kind, n, n) for n in out_names], final=final)
        ds = ds.map_batches(_widen, batch_format="pyarrow",
                            zero_copy_batch=True)
        return inner.apply(ds)

    return FnStep(f"pivot[{pivot_col}]", _apply)


def grouped_quantiles(by: Sequence[str], col: str, qs: Sequence[float],
                      aliases: Sequence[str] | None = None,
                      interpolation: str = "disc",
                      num_partitions: int = 32) -> FnStep:
    """Exact per-group quantiles.

    ``interpolation="disc"`` (default): DuckDB ``quantile_disc`` /
    Spark ``percentile`` rank semantics — the element at 0-based rank
    ``max(0, ceil(q*n) - 1)`` of the group's sorted non-null values; a
    group whose values are all null yields NULL.

    ``interpolation="linear"``: DuckDB ``quantile_cont`` / ``median`` /
    Spark ``percentile_approx``-exact semantics — linear interpolation at
    position ``q*(n-1)`` between the two nearest sorted values.

    Scale shape: hash-partition on the group key (each group lands whole
    on one partition), then ONE vectorized numpy pass per partition —
    sort + per-group offsets + fancy-index, no per-group dispatch and no
    global sort. Complements ``exact_quantiles`` (global quantiles via
    iterative narrowing, for when a single group's values exceed one
    worker); grouped quantiles assume each GROUP fits in a partition,
    the standard assumption for keyed analytics."""
    import numpy as np
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.streaming import (
        partitioned_apply,
    )

    by = list(by)
    qs = list(qs)
    aliases = list(aliases) if aliases is not None else [
        f"q{str(q).replace('.', '_')}" for q in qs]
    if len(aliases) != len(qs):
        raise ValueError("aliases must match qs")
    if interpolation not in ("disc", "linear"):
        raise ValueError(
            f"interpolation must be 'disc' or 'linear', got {interpolation!r}")

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        keys_all = g[by].drop_duplicates().reset_index(drop=True)
        g = g.dropna(subset=[col]).sort_values(by + [col], kind="mergesort")
        if g.empty:
            out = keys_all.copy()
            for a in aliases:
                out[a] = np.nan
            return out
        grp = g.groupby(by, sort=False, dropna=False)
        cnt = grp.size().to_numpy()
        off = np.zeros(len(cnt), dtype=np.int64)
        off[1:] = np.cumsum(cnt)[:-1]
        vals = g[col].to_numpy()
        out = grp.head(1)[by].reset_index(drop=True)
        for q, a in zip(qs, aliases):
            if interpolation == "disc":
                idx = off + np.minimum(
                    cnt - 1,
                    np.maximum(0, np.ceil(q * cnt).astype(np.int64) - 1))
                out[a] = vals[idx]
            else:
                pos = q * (cnt - 1).astype(np.float64)
                lo = np.floor(pos).astype(np.int64)
                frac = pos - lo
                hi = np.minimum(lo + 1, cnt - 1)
                v = vals.astype(np.float64)
                out[a] = (v[off + lo] * (1.0 - frac)
                          + v[off + hi] * frac)
        # groups whose values were ALL null dropped out above — restore
        # them with NULL quantiles (SQL GROUP BY emits the group)
        return keys_all.merge(out, on=by, how="left")

    def _apply(ds):
        if len(by) == 1:
            return partitioned_apply(by[0], _per_partition,
                                     f"gquant[{col}]", num_partitions).apply(ds)
        # multi-key: partition on the tuple via a derived key column
        import pyarrow as _pa
        from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
            hash_partition_ids,
        )

        def _assign(t: pa.Table) -> pa.Table:
            pid = hash_partition_ids(t, by, num_partitions)
            return t.append_column("__qpid", _pa.array(pid, _pa.int32()))

        def _run(g: pd.DataFrame) -> pd.DataFrame:
            return _per_partition(g.drop(columns=["__qpid"]))

        ds = ds.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ds.groupby("__qpid").map_groups(_run, batch_format="pandas")

    return FnStep(f"grouped_quantiles[{col}]", _apply)


def grouped_collect(by: Sequence[str], col: str, alias: str,
                    distinct: bool = False, sep: str = ",",
                    num_partitions: int = 32) -> FnStep:
    """Spark ``collect_list``/``collect_set`` with DETERMINISTIC output:
    per group, the (optionally distinct) values joined into one
    ``sep``-separated string in sorted value order — the canonical form
    (raw collect_list order is nondeterministic under parallelism, which
    is why the engine's contract sorts; it also makes the result
    SQL-mirrorable via ``string_agg(... ORDER BY ...)``).

    Scale shape: prune to (by, col) at the source; with ``distinct`` a
    per-batch local distinct acts as the combiner; ONE hash-partition
    shuffle on the group key, then one vectorized pandas join per
    partition. A group's collected string must fit in memory — this is a
    small-fanin aggregate (tags, categories), not a corpus concatenator.
    """
    import numpy as np
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    by = list(by)

    def _local_distinct(t: pa.Table) -> pa.Table:
        return t.select(by + [col]).group_by(by + [col]).aggregate([])

    def _assign(t: pa.Table) -> pa.Table:
        t = t.select(by + [col])
        pid = hash_partition_ids(t, by, num_partitions)
        return t.append_column("_gcid", pa.array(pid, pa.int32()))

    def _per_partition(g: pd.DataFrame, int_col: bool) -> pd.DataFrame:
        g = g.drop(columns=["_gcid"]).dropna(subset=[col])
        if int_col:
            # nulls promoted the int column to float in pandas — restore
            # so str() renders '2', not '2.0' (string_agg parity)
            g[col] = g[col].astype("int64")
        if distinct:
            g = g.drop_duplicates(by + [col])
        g = g.sort_values(by + [col], kind="mergesort")
        vals = g[col].astype(str)
        out = (vals.groupby([g[c] for c in by], sort=False)
               .agg(sep.join).rename(alias).reset_index())
        return out

    def _apply(ds):
        import functools
        int_col = pa.types.is_integer(
            ds.schema().base_schema.field(col).type)
        if distinct:
            ds = ds.map_batches(_local_distinct, batch_format="pyarrow",
                                zero_copy_batch=True)
        ds = ds.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ds.groupby("_gcid").map_groups(
            functools.partial(_per_partition, int_col=int_col),
            batch_format="pandas")

    return FnStep(f"collect[{col}]", _apply)


def grouped_arg_extremum(by: Sequence[str], order_col: str,
                         keep: Sequence[str], kind: str = "max",
                         tiebreak: Sequence[str] | None = None,
                         num_partitions: int = 32) -> FnStep:
    """SQL ``max_by``/``min_by`` (``arg_max``/``arg_min``) generalized to
    whole rows: per group, the ``keep`` columns of the row with the
    extreme ``order_col``.

    Determinism: ties on ``order_col`` are broken by ``tiebreak`` (same
    sort direction as ``order_col``; include a unique column to make the
    winner total). The SQL mirror is the ROW_NUMBER()=1 idiom:
    ``ROW_NUMBER() OVER (PARTITION BY by ORDER BY order_col DESC,
    tiebreak DESC) = 1`` for kind="max".

    Scale shape: identical to keyed LWW dedup — a per-block combiner keeps
    ONE candidate row per group per block, so the group-key shuffle carries
    at most (#blocks x groups-per-block) rows, never the input; a second
    per-partition reduce picks the global winner. Skew-immune: a hot group
    contributes one row per block.
    """
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import dedup_keyed

    by = list(by)
    keep = list(keep)
    if kind not in ("max", "min"):
        raise ValueError(f"kind must be 'max' or 'min', got {kind!r}")
    order_by = [order_col] + list(tiebreak or [])

    inner = dedup_keyed(by, order_by, descending=(kind == "max"),
                        num_partitions=num_partitions)

    def _apply(ds):
        out = inner.apply(ds)
        return out.select_columns(by + [c for c in keep if c not in by])

    return FnStep(f"arg_{kind}[{order_col}]", _apply)


def heavy_hitters(col: str, k: int, capacity: int = 4096,
                  num_partitions: int = 16) -> FnStep:
    """Approximate top-k most frequent values (heavy hitters) via
    mergeable Misra-Gries summaries — the streaming-sketch alternative to
    a full groupby-count when the value cardinality is unbounded.

    Scale shape: each batch produces an EXACT value-count table, then
    compresses it to ``capacity`` counters Misra-Gries style (keep the
    top ``capacity`` counts, subtract the (capacity+1)-th — every kept
    count becomes a lower bound, undercounted by at most the subtracted
    threshold). The shuffle then carries at most (#batches x capacity)
    partial rows — never one row per input value; a grouped sum merges
    partials (MG summaries are mergeable under addition) and a tiny
    top-k finishes. Estimate error is bounded by n/(capacity+1) overall;
    with ``capacity`` >= the per-batch distinct count no compression
    happens anywhere and the result is EXACT (how the SQL oracle pins it
    at test scale).

    Output: (col, est_count) rows, the k most frequent, ordered by
    (est_count DESC, col ASC) — deterministic under ties.
    """
    from e_commerce_batch_etl_pipeline_ray.stages import sorts

    if k < 1 or capacity < k:
        raise ValueError("need k >= 1 and capacity >= k")

    def _partial(t: pa.Table) -> pa.Table:
        cnt = (t.select([col]).group_by([col])
               .aggregate([(col, "count")])
               .rename_columns([col, "est_count"]))
        if cnt.num_rows <= capacity:
            return cnt
        idx = pc.sort_indices(cnt, sort_keys=[("est_count", "descending"),
                                              (col, "ascending")])
        cnt = cnt.take(idx)
        thresh = cnt["est_count"][capacity].as_py()
        kept = cnt.slice(0, capacity)
        dec = pc.subtract(kept["est_count"], pa.scalar(thresh))
        kept = kept.set_column(1, "est_count", dec)
        return kept.filter(pc.greater(kept["est_count"], 0))

    def _apply(ds):
        from ray.data.aggregate import Sum as _Sum
        partials = ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        merged = partials.groupby(col).aggregate(
            _Sum("est_count", alias_name="est_count"))
        return sorts.top_k([("est_count", "descending"),
                            (col, "ascending")], k).apply(merged)

    return FnStep(f"heavy_hitters[{col}]", _apply)


def histogram(col: str, lo: float, hi: float, nbins: int) -> FnStep:
    """Fixed-width histogram over ``[lo, hi)``: per-batch vectorized
    bincount (the combiner — the shuffle carries nbins rows per block,
    never the data), grouped sum, ALL bins emitted including empty ones.
    Values outside [lo, hi) and nulls are dropped (mirror with a SQL
    WHERE). Output: (bin, bin_lo, bin_hi, n) sorted by bin."""
    import numpy as np

    if not (hi > lo) or nbins < 1:
        raise ValueError("need hi > lo and nbins >= 1")
    width = (hi - lo) / nbins

    def _partial(t: pa.Table) -> pa.Table:
        v = t[col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v < hi)]
        ids = np.minimum((v - lo) / width, nbins - 1).astype(np.int64)
        counts = np.bincount(ids, minlength=nbins)
        return pa.table({"bin": pa.array(np.arange(nbins), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    def _finish(t: pa.Table) -> pa.Table:
        b = t["bin"].cast(pa.float64())
        t = t.append_column("bin_lo", pc.add(pa.scalar(lo),
                                             pc.multiply(b, pa.scalar(width))))
        t = t.append_column("bin_hi", pc.add(pa.scalar(lo + width),
                                             pc.multiply(b, pa.scalar(width))))
        return t.select(["bin", "bin_lo", "bin_hi", "n"])

    def _apply(ds):
        from ray.data.aggregate import Sum as _Sum
        partials = ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        merged = partials.groupby("bin").aggregate(_Sum("n", alias_name="n"))
        return merged.map_batches(_finish, batch_format="pyarrow",
                                  zero_copy_batch=True).sort("bin")

    return FnStep(f"histogram[{col}]", _apply)


def grouped_heavy_hitters(by: Sequence[str], col: str, k: int,
                          capacity: int = 4096,
                          num_partitions: int = 32) -> FnStep:
    """Per-GROUP approximate top-k frequent values (heavy hitters within
    each group) — ``heavy_hitters`` with a group dimension.

    Scale shape: per batch, EXACT (by, col) counts are compressed
    Misra-Gries style to ``capacity`` counters PER GROUP (vectorized: one
    sort + grouped cumcount, no per-group dispatch). ONE hash-partition
    shuffle on the group key then does merge (grouped sum of partials —
    every partial of a group lands in its partition) AND the per-group
    top-k in the same partition pass. Counts are lower bounds with
    per-group error <= group_n/(capacity+1) per summary; with
    ``capacity`` >= per-batch distinct values per group the result is
    EXACT (the SQL-oracle regime).

    Output: (by..., col, est_count) with ties broken (est_count DESC,
    col ASC) — deterministic.
    """
    import numpy as np
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    by = list(by)
    if k < 1 or capacity < k:
        raise ValueError("need k >= 1 and capacity >= k")

    def _partial(t: pa.Table) -> pa.Table:
        cnt = (t.select(by + [col]).group_by(by + [col])
               .aggregate([(col, "count")]))
        cnt = cnt.rename_columns(by + [col, "est_count"])
        df = cnt.to_pandas()
        df = df.sort_values(by + ["est_count", col],
                            ascending=[True] * len(by) + [False, True],
                            kind="mergesort")
        r = df.groupby(by, sort=False).cumcount()
        # per-group MG compression: subtract the (capacity+1)-th count
        over = df.loc[r == capacity, by + ["est_count"]] \
                 .rename(columns={"est_count": "__thresh"})
        if len(over):
            df = df[r < capacity].merge(over, on=by, how="left")
            df["est_count"] = df["est_count"] - df["__thresh"].fillna(0)
            df = df[df["est_count"] > 0].drop(columns="__thresh")
        out = pa.Table.from_pandas(df, preserve_index=False) \
                      .replace_schema_metadata(None)
        return out.set_column(out.column_names.index("est_count"),
                              "est_count",
                              out["est_count"].cast(pa.int64()))

    def _assign(t: pa.Table) -> pa.Table:
        pid = hash_partition_ids(t, by, num_partitions)
        return t.append_column("_hhid", pa.array(pid, pa.int32()))

    def _merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_hhid"])
        g = g.groupby(by + [col], sort=False, as_index=False)["est_count"].sum()
        g = g.sort_values(by + ["est_count", col],
                          ascending=[True] * len(by) + [False, True],
                          kind="mergesort")
        return g[g.groupby(by, sort=False).cumcount() < k]

    def _apply(ds):
        partials = ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        partials = partials.map_batches(_assign, batch_format="pyarrow",
                                        zero_copy_batch=True)
        return partials.groupby("_hhid").map_groups(_merge_topk,
                                                    batch_format="pandas")

    return FnStep(f"grouped_heavy_hitters[{col}]", _apply)


def describe(ds: ray.data.Dataset,
             columns: Sequence[str] | None = None) -> pa.Table:
    """One-pass per-column profile (the `df.describe()` / data-audit op):
    n_rows, n_nulls, and for numeric columns mean/std/min/max — every
    metric from ONE combiner map_batches pass (per-block scalar partials,
    driver merge); no shuffle, no second scan. Returns a tiny Arrow table
    with one row per column, deterministic order.

    Exact-SQL-parity definitions: std is sample stddev (NULL when n<=1),
    mean/min/max ignore nulls, n_nulls counts SQL NULLs."""
    schema = ds.schema().base_schema
    cols = list(columns) if columns is not None else list(schema.names)
    numeric = {c for c in cols
               if pa.types.is_integer(schema.field(c).type)
               or pa.types.is_floating(schema.field(c).type)}

    def _partial(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        arrays.append(pa.array([t.num_rows], pa.int64()))
        names.append("__rows")
        for c in cols:
            col = t[c]
            arrays.append(pa.array([col.null_count], pa.int64()))
            names.append(f"{c}__nulls")
            if c in numeric:
                v = pc.cast(col, pa.float64())
                arrays += [
                    pa.array([pc.count(v).as_py()], pa.int64()),
                    pa.array([pc.sum(v).as_py() or 0.0], pa.float64()),
                    pa.array([pc.sum(pc.multiply(v, v)).as_py() or 0.0],
                             pa.float64()),
                    pa.array([pc.min(v).as_py()], pa.float64()),
                    pa.array([pc.max(v).as_py()], pa.float64()),
                ]
                names += [f"{c}__n", f"{c}__s", f"{c}__sq", f"{c}__lo",
                          f"{c}__hi"]
        return pa.Table.from_arrays(arrays, names=names)

    parts = ds.select_columns(cols).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n_rows = sum(p["__rows"] for p in parts)
    rows = []
    for c in cols:
        rec = {"column": c, "n_rows": n_rows,
               "n_nulls": sum(p[f"{c}__nulls"] for p in parts),
               "mean": None, "std": None, "min": None, "max": None}
        if c in numeric:
            n = sum(p[f"{c}__n"] for p in parts)
            s = sum(p[f"{c}__s"] for p in parts)
            sq = sum(p[f"{c}__sq"] for p in parts)
            los = [p[f"{c}__lo"] for p in parts if p[f"{c}__lo"] is not None]
            his = [p[f"{c}__hi"] for p in parts if p[f"{c}__hi"] is not None]
            if n > 0:
                rec["mean"] = s / n
                rec["min"] = min(los)
                rec["max"] = max(his)
            if n > 1:
                var = max((sq - s * s / n) / (n - 1), 0.0)
                rec["std"] = var ** 0.5
        rows.append(rec)
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("column", pa.string()), ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()), ("mean", pa.float64()),
        ("std", pa.float64()), ("min", pa.float64()),
        ("max", pa.float64())]))


class IncrementalAggregate:
    """Incrementally-maintained grouped aggregate (materialized-view
    maintenance): keep the MERGEABLE PARTIALS as the persistent state and
    fold in delta batches without rescanning history — the incremental
    companion to the CDC engine for append-only facts.

    Works for every ``_PartialPlan`` agg kind (count/sum/mean/min/max/
    sum_bool/std/corr/covar) because each is expressed as partials closed
    under re-merge. ``update(delta)`` costs one combiner pass over the
    DELTA plus a merge of two partial tables at the group-key grain;
    ``result()`` finalizes without touching the data.

    State lives as an Arrow table of partials (grain rows only). For
    dashboard-grain keys that is tiny and driver-held; persist it with
    ``state``/``load`` (parquet) between runs. Deletions/updates are out
    of scope (min/max are not subtractable) — pair with the CDC engine
    when facts mutate.
    """

    def __init__(self, by: Sequence[str],
                 aggs: Sequence[tuple[str, str | None, str]]):
        self.by = list(by)
        self.plan = _PartialPlan(self.by, [tuple(a) for a in aggs])
        self._state: pa.Table | None = None

    def update(self, delta: "ray.data.Dataset") -> "IncrementalAggregate":
        """Fold one delta batch into the state (combiner pass over the
        delta only; shuffle carries per-block partials)."""
        partials = delta.map_batches(self.plan.local, batch_format="pyarrow",
                                     zero_copy_batch=True)
        raw = collect_arrow(partials)
        if raw.num_rows == 0:
            return self      # empty delta (also: zero-column Ray block)
        delta_t = self.plan.merge_arrow(raw, self.by)
        if self._state is None:
            self._state = delta_t
        else:
            both = pa.concat_tables([self._state, delta_t],
                                    promote_options="permissive")
            self._state = self.plan.merge_arrow(both, self.by)
        return self

    def result(self) -> pa.Table:
        """Finalized aggregate at the current state (no data scan)."""
        if self._state is None:
            raise ValueError("no deltas ingested yet")
        return self.plan.finalize(self._state, self.by)

    def state(self) -> pa.Table:
        if self._state is None:
            raise ValueError("no deltas ingested yet")
        return self._state

    def load(self, state: pa.Table) -> "IncrementalAggregate":
        """Resume from a persisted partials table (column set must match
        this plan's partials)."""
        need = self.by + self.plan.partial_names + (
            ["__rows_sum"] if self.plan.needs_rowcount else [])
        missing = [c for c in need if c not in state.column_names]
        if missing:
            raise ValueError(f"state is missing partial columns {missing}")
        self._state = state
        return self


def grouped_mode(by: Sequence[str], value_col: str,
                 num_partitions: int = 32) -> FnStep:
    """Exact per-group MODE (most frequent non-null value, largest value
    wins ties — deterministic). SQL mirror is the ROW_NUMBER()=1 idiom
    over GROUP BY (by, value) counts.

    Scale shape: composition of two skew-immune pieces — the pre-aggregated
    count over (by, value) (combiner: one partial per distinct pair per
    block) and the arg-max winner reduce (one candidate per group per
    block). Output: by + [value_col (the mode), "mode_count"].
    """
    by = list(by)

    count = grouped_aggregate(by + [value_col],
                              [("count", None, "mode_count")])
    winner = grouped_arg_extremum(by, "mode_count",
                                  keep=[value_col, "mode_count"],
                                  kind="max", tiebreak=[value_col],
                                  num_partitions=num_partitions)

    def _apply(ds):
        import pyarrow.compute as pc_

        def _drop_null(t: pa.Table) -> pa.Table:
            return t.filter(pc_.is_valid(t[value_col]))

        ds = ds.map_batches(_drop_null, batch_format="pyarrow",
                            zero_copy_batch=True)
        return winner.apply(count.apply(ds))

    return FnStep(f"mode[{value_col}]", _apply)


def approx_quantiles(ds: "ray.data.Dataset", col: str, qs: Sequence[float],
                     sketch_size: int = 256) -> list[float]:
    """ONE-PASS approximate quantiles via a mergeable weighted-sample
    summary: each block contributes its ``sketch_size`` evenly-spaced
    order statistics, each weighted block_rows/sketch_size; the driver
    folds the (value, weight) summaries and answers any quantile from the
    weighted CDF. Deterministic (no sampling), mergeable (summaries are
    just weighted value lists), and single-scan — the streaming
    complement of ``exact_quantiles`` (which is exact but needs O(log)
    passes). Rank error is bounded by sum_blocks n_b/sketch_size =
    n/sketch_size, i.e. <= 1/sketch_size of total rank regardless of
    scale or skew (tests assert the bound).
    """
    import numpy as np

    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")

    def _summary(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[~np.isnan(vals)]
        n = vals.size
        if n == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        vals.sort()
        k = min(sketch_size, n)
        # evenly-spaced order statistics (inclusive of both extremes)
        idx = np.unique(np.round(np.linspace(0, n - 1, k)).astype(np.int64))
        return pa.table({"v": pa.array(vals[idx], pa.float64()),
                         "w": pa.array(np.full(idx.size, n / idx.size),
                                       pa.float64())})

    parts = ds.map_batches(_summary, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    if not parts:
        return [float("nan")] * len(qs)
    import numpy as np
    v = np.array([r["v"] for r in parts], dtype=np.float64)
    w = np.array([r["w"] for r in parts], dtype=np.float64)
    if v.size == 0:
        return [float("nan")] * len(qs)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = []
    for q in qs:
        pos = np.searchsorted(cum, q * total, side="left")
        out.append(float(v[min(pos, v.size - 1)]))
    return out


def grouped_robust_stats(by: Sequence[str], col: str,
                         num_partitions: int = 32) -> FnStep:
    """Per-group ROBUST location/scale: exact median, MAD
    (median(|x - median|)) and count — the outlier-resistant profile a
    data-quality pass uses where mean/std are poisoned by the very
    outliers being hunted. Matches DuckDB MEDIAN/MAD tie semantics
    (even counts average the two middles; over integer columns every
    intermediate is an exact .0/.5 double, so the oracle is bit-exact).

    Scale shape: ONE hash-partition shuffle on the group key, then
    vectorized pandas per partition (groupby.median + transform) — each
    GROUP must fit a partition, the standard map_groups contract; group
    count is unbounded."""
    import numpy as np
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    by = list(by)

    def _assign(t: pa.Table) -> pa.Table:
        pid = hash_partition_ids(t, by, num_partitions)
        return t.append_column("_rpid", pa.array(pid, pa.int32()))

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_rpid"])
        x = pd.to_numeric(df[col], errors="coerce")
        med = x.groupby([df[c] for c in by]).transform("median")
        dev = (x - med).abs()
        g = df.assign(__med=med, __dev=dev).groupby(by, sort=False)
        out = g.agg(median=("__med", "first"), mad=("__dev", "median"),
                    n=(col, "count")).reset_index()
        return out.astype({"median": np.float64, "mad": np.float64,
                           "n": np.int64})

    def _apply(ds):
        ds = ds.map_batches(_assign, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ds.groupby("_rpid").map_groups(_stats,
                                              batch_format="pandas")
    return FnStep(f"grouped_robust_stats[{col}]", _apply)


def robust_outlier_filter(by: Sequence[str], col: str, c: float = 3.0,
                          keep: str = "inliers",
                          num_partitions: int = 32) -> FnStep:
    """Row filter by the robust rule |x - median_group| <= c * MAD_group
    (``keep="outliers"`` inverts). Two passes: grouped_robust_stats
    (small — one row per group), BROADCAST to every task via ray.put,
    then a pure row-local vectorized filter — no second shuffle. Rows
    with null x or an unseen group are dropped in both modes. MAD = 0
    collapses the band to exact-median-only, the standard caveat."""
    import numpy as np
    import pandas as pd

    if keep not in ("inliers", "outliers"):
        raise ValueError("keep must be 'inliers' or 'outliers'")
    by = list(by)

    def _apply(ds):
        import ray as _ray
        stats = grouped_robust_stats(
            by, col, num_partitions).apply(ds).to_pandas()
        key = (stats[by[0]] if len(by) == 1
               else pd.MultiIndex.from_frame(stats[by]))
        med = dict(zip(key, stats["median"]))
        mad = dict(zip(key, stats["mad"]))
        ref = _ray.put((med, mad))

        def _filter(t: pa.Table) -> pa.Table:
            med_m, mad_m = _ray.get(ref)
            df = t.select(by).to_pandas()
            k = (df[by[0]] if len(by) == 1
                 else pd.MultiIndex.from_frame(df))
            m = k.map(med_m).to_numpy(dtype=np.float64)
            s = k.map(mad_m).to_numpy(dtype=np.float64)
            x = pd.to_numeric(
                t[col].combine_chunks().to_pandas(),
                errors="coerce").to_numpy(dtype=np.float64)
            inlier = np.abs(x - m) <= c * s      # NaN -> False either way
            mask = inlier if keep == "inliers" else \
                (~inlier & ~np.isnan(x) & ~np.isnan(m))
            return t.filter(pa.array(mask))

        return ds.map_batches(_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"robust_outlier_filter[{col}]", _apply)
