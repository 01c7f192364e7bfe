"""Feature-encoding / ML-prep operators (training-data pipeline surface).

Scale shapes:

- ``label_encode``: vocabulary = distinct (hash-partitioned dedup) ->
  distributed sort -> CONTIGUOUS global ids assigned from per-block
  offsets (two metadata-sized passes over the vocab, the driver only ever
  holds one tiny (first_value, n) row per vocab block) -> join back
  (broadcast below a threshold, hash-shuffle join above). Equivalent to
  SQL ``DENSE_RANK() OVER (ORDER BY value) - 1`` — the distributed
  implementation of a global dense rank without a per-key partition.
- ``standard_scale`` / ``minmax_scale``: ONE combiner pass reduces each
  column to scalar partials (sum/sumsq/count or min/max) merged on the
  driver; the transform is then row-local with broadcast constants —
  no shuffle at all.
- ``one_hot``: pure row-local (explicit category list — discovering
  categories is ``label_encode``'s job).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import FnStep

_BROADCAST_MAX = 1_000_000  # vocab rows; above this the join-back shuffles


def label_encode(col: str, out: str = "label_id",
                 num_partitions: int = 64,
                 broadcast_max: int = _BROADCAST_MAX) -> FnStep:
    """Encode a string/categorical column as dense contiguous int64 ids
    ``0..V-1`` in value-sorted order (== ``DENSE_RANK() OVER (ORDER BY
    col) - 1``; null stays null).

    Id assignment is driver-light: after the distinct+sort, each vocab
    BLOCK contributes one (first_value, num_rows) row; block offsets are
    prefix sums of those counts (distinct values can't span blocks, so a
    block is identified by its first value). The data itself never moves
    to the driver.
    """
    from e_commerce_batch_etl_pipeline_ray.stages import dedup, joins

    def _apply(ds):
        vocab = dedup.distinct([col], num_partitions=num_partitions) \
                     .apply(ds.select_columns([col]))

        def _drop_null(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_valid(t[col]))
        vocab = vocab.map_batches(_drop_null, batch_format="pyarrow",
                                  zero_copy_batch=True)
        vocab = vocab.sort(col).materialize()

        # pass 1 (block -> one row): (first_value, n)
        def _block_stats(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"first": pa.nulls(0, t[col].type),
                                 "n": pa.array([], pa.int64())})
            return pa.table({"first": t[col].slice(0, 1),
                             "n": pa.array([t.num_rows], pa.int64())})
        # batch_size=None -> one batch per BLOCK in both passes, so the
        # (first_value -> offset) map built here aligns exactly with the
        # batches _assign sees (same materialized blocks, no re-slicing)
        stats = vocab.map_batches(_block_stats, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=None).take_all()
        stats.sort(key=lambda r: r["first"])
        offsets = {}
        acc = 0
        for r in stats:
            offsets[r["first"]] = acc
            acc += r["n"]
        vocab_size = acc

        # pass 2 (block-local): contiguous ids from the block's offset
        def _assign(t: pa.Table) -> pa.Table:
            import numpy as np
            if t.num_rows == 0:
                return pa.table({col: pa.nulls(0, t[col].type),
                                 out: pa.array([], pa.int64())})
            off = offsets[t[col][0].as_py()]
            ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.int64))
            return pa.table({col: t[col], out: ids})
        mapping = vocab.map_batches(_assign, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None)

        if vocab_size <= broadcast_max:
            mtab = pa.concat_tables(
                [pa.table(b) for b in
                 mapping.iter_batches(batch_format="pyarrow")]) \
                if vocab_size else pa.table(
                    {col: pa.nulls(0), out: pa.array([], pa.int64())})
            return joins.broadcast_lookup(mtab, on=col).apply(ds)
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import detach
        mapping = detach(mapping, pa.schema([
            (col, ds.schema().base_schema.field(col).type),
            (out, pa.int64())]))
        return joins.hash_join(mapping, on=col, join_type="left_outer",
                               num_partitions=num_partitions).apply(ds)

    return FnStep(f"label_encode[{col}]", _apply)


def _column_moments(ds, cols: Sequence[str]) -> dict[str, dict[str, float]]:
    """ONE combiner pass -> per-column (n, sum, sumsq, min, max) partials,
    merged on the driver (one tiny row per block)."""
    cols = list(cols)

    def _partial(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for c in cols:
            v = pc.cast(t[c], pa.float64())
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
    outd: dict[str, dict[str, float]] = {}
    for c in cols:
        n = sum(p[f"{c}__n"] for p in parts)
        s = sum(p[f"{c}__s"] for p in parts)
        sq = sum(p[f"{c}__sq"] for p in parts)
        los = [p[f"{c}__lo"] for p in parts if p[f"{c}__lo"] is not None]
        his = [p[f"{c}__hi"] for p in parts if p[f"{c}__hi"] is not None]
        outd[c] = {"n": n, "sum": s, "sumsq": sq,
                   "min": min(los) if los else float("nan"),
                   "max": max(his) if his else float("nan")}
    return outd


def standard_scale(cols: Sequence[str], suffix: str = "_z",
                   ddof: int = 1) -> FnStep:
    """Z-score columns: ``(v - mean) / std`` (sample std by default, SQL
    STDDEV_SAMP parity). Two-phase but shuffle-free: scalar moments from
    one combiner pass, then a row-local transform with broadcast
    constants. Columns with zero variance (or n <= ddof) scale to NULL."""
    cols = list(cols)

    def _apply(ds):
        m = _column_moments(ds, cols)
        consts = {}
        for c in cols:
            n, s, sq = m[c]["n"], m[c]["sum"], m[c]["sumsq"]
            if n > ddof:
                var = (sq - s * s / n) / (n - ddof)
                std = max(var, 0.0) ** 0.5
            else:
                std = 0.0
            consts[c] = (s / n if n else float("nan"), std)

        def _fn(t: pa.Table) -> pa.Table:
            for c in cols:
                mean, std = consts[c]
                v = pc.cast(t[c], pa.float64())
                if std > 0:
                    z = pc.divide(pc.subtract(v, pa.scalar(mean)),
                                  pa.scalar(std))
                else:
                    z = pa.nulls(t.num_rows, pa.float64())
                t = t.append_column(f"{c}{suffix}", z)
            return t
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)

    return FnStep(f"standard_scale[{','.join(cols)}]", _apply)


def minmax_scale(cols: Sequence[str], suffix: str = "_mm") -> FnStep:
    """Scale columns to [0, 1] via global min/max (same shuffle-free
    two-phase shape as standard_scale). Constant columns scale to NULL."""
    cols = list(cols)

    def _apply(ds):
        m = _column_moments(ds, cols)

        def _fn(t: pa.Table) -> pa.Table:
            for c in cols:
                lo, hi = m[c]["min"], m[c]["max"]
                v = pc.cast(t[c], pa.float64())
                if hi > lo:
                    z = pc.divide(pc.subtract(v, pa.scalar(lo)),
                                  pa.scalar(hi - lo))
                else:
                    z = pa.nulls(t.num_rows, pa.float64())
                t = t.append_column(f"{c}{suffix}", z)
            return t
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)

    return FnStep(f"minmax_scale[{','.join(cols)}]", _apply)


def one_hot(col: str, categories: Sequence[str],
            prefix: str | None = None) -> FnStep:
    """Row-local one-hot: one int64 0/1 column per EXPLICIT category
    (``{prefix}_{cat}``); values outside ``categories`` produce all
    zeros; null input produces nulls. Category discovery at scale is
    ``label_encode``'s job — passing an explicit list keeps the schema
    static across blocks (a streaming requirement)."""
    categories = list(categories)
    pre = prefix if prefix is not None else col

    def _fn(t: pa.Table) -> pa.Table:
        valid = pc.is_valid(t[col])
        for cat in categories:
            flag = pc.cast(pc.equal(t[col], pa.scalar(cat)), pa.int64())
            flag = pc.if_else(valid, pc.fill_null(flag, 0),
                              pa.scalar(None, pa.int64()))
            t = t.append_column(f"{pre}_{cat}", flag)
        return t

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"one_hot[{col}]", _apply)
