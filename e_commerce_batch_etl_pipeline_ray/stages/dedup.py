"""Keyed exact dedup — the reference's D2 and the core of the CDC engine's
last-writer-wins upsert (SURVEY.md §2.7).

Reference semantics: ``dropDuplicates(["invoice_id","stock_code"])``
(src/transform.py:73-87, key from src/config.py:55) keeps a nondeterministic
first row; the notebook notes "in production keep latest updated_at"
(notebooks/02_transformations.py:90-94). Here the winner is ALWAYS chosen by
an explicit deterministic rule (max/min of an order column with a total
tiebreak), never "first seen" — required for parallel determinism
(SURVEY.md §7.4 #4).

Scale design (this is a shuffle):
  1. per-batch vectorized combine (``map_batches``) — caps any key's traffic
     at one row per input block (the combiner; also the skew/hot-key guard:
     a key updated a million times in one epoch ships at most num_blocks rows),
  2. hash-partition rows by ``hash(keys) % num_partitions`` (deterministic
     pandas siphash — stable across processes, required for CDC resume),
  3. one vectorized combine per partition via ``groupby(part).map_groups`` —
     exactly ``num_partitions`` Python calls, each an Arrow sort + boundary
     mask, NOT a call per key.

The same machinery implements keep-first, keep-last and LWW-by-LSN.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.core import FnStep

_PART_COL = "__part_id"


def hash_partition_ids(table: pa.Table, keys: Sequence[str], num_partitions: int,
                       salt: pa.Array | None = None) -> np.ndarray:
    """Deterministic vectorized partition id per row: siphash of the key
    columns mod num_partitions. Stable across processes and runs (fixed hash
    key inside pandas) — the CDC engine relies on this for resume.

    ``salt`` (optional int array) is added before the modulo to split a hot
    key across sub-partitions (SURVEY.md §7.4 #6); only valid for mergeable
    reductions (LWW is associative+commutative, so per-salt winners merge).
    """
    df = table.select(list(keys)).to_pandas()
    # categorize=False: pandas' factorize shortcut mis-hashes strings with
    # embedded NUL bytes ('' and '\x00' collide non-deterministically by
    # array composition) — found by the hypothesis order-independence
    # property test. Without categorization the hash is pure per value.
    h = pd.util.hash_pandas_object(df, index=False, categorize=False).to_numpy()
    if salt is not None:
        h = h + np.asarray(salt, dtype=np.uint64)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def combine_keep_extreme(table: pa.Table, keys: Sequence[str], order_by: Sequence[str],
                         descending: bool = True) -> pa.Table:
    """Vectorized within-table reduce: one surviving row per key, the row with
    the max (descending=True) or min of ``order_by`` (lexicographic; include a
    unique tiebreak column for full determinism).

    Implementation: one Arrow multi-key sort, then an adjacent-difference
    boundary mask — O(n log n), no per-key Python.
    """
    if table.num_rows == 0:
        return table
    sort_keys = [(k, "ascending") for k in keys] + [
        (o, "descending" if descending else "ascending") for o in order_by]
    idx = pc.sort_indices(table, sort_keys=sort_keys)
    t = table.take(idx)
    mask = None
    for k in keys:
        col = t[k].combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, len(col) - 1))
        # treat null != null as a boundary only when validity differs
        neq = pc.fill_null(neq, False)
        vd = pc.is_valid(col)
        vneq = pc.xor(vd.slice(1), vd.slice(0, len(col) - 1))
        neq = pc.or_(neq, vneq)
        mask = neq if mask is None else pc.or_(mask, neq)
    if table.num_rows == 1:
        return t
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    keep = pa.concat_arrays([pa.array([True]), mask])
    return t.filter(keep)


def dedup_keyed(keys: Sequence[str], order_by: Sequence[str], descending: bool = True,
                num_partitions: int = 64) -> FnStep:
    """D2 — exact keyed dedup with a deterministic winner.

    ``descending=True`` + order_by=(lsn,) == last-writer-wins (CDC upsert core);
    ``descending=False`` + order_by=(arrival_id,) == reference keep-first.
    """
    keys = list(keys)
    order_by = list(order_by)

    def _apply(ds):
        def _combine_batch(t: pa.Table) -> pa.Table:
            t = combine_keep_extreme(t, keys, order_by, descending)
            pid = hash_partition_ids(t, keys, num_partitions)
            return t.append_column(_PART_COL, pa.array(pid, pa.int32()))

        def _combine_part(t: pa.Table) -> pa.Table:
            return combine_keep_extreme(t, keys, order_by, descending)

        ds = ds.map_batches(_combine_batch, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.groupby(_PART_COL).map_groups(_combine_part, batch_format="pyarrow")
        return ds.drop_columns([_PART_COL])

    return FnStep(f"dedup[{','.join(keys)}]", _apply)


def distinct(columns: Sequence[str], num_partitions: int = 64) -> FnStep:
    """Distinct rows over ``columns`` (projection + dedup on all of them).
    Used by the duplicate-rate DQ check (src/quality_checks.py:62-80)."""
    cols = list(columns)

    def _apply(ds):
        ds = ds.select_columns(cols)

        def _local(t: pa.Table) -> pa.Table:
            t = t.group_by(cols).aggregate([]).select(cols)
            pid = hash_partition_ids(t, cols, num_partitions)
            return t.append_column(_PART_COL, pa.array(pid, pa.int32()))

        def _part(t: pa.Table) -> pa.Table:
            return t.group_by(cols).aggregate([]).select(cols)

        ds = ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.groupby(_PART_COL).map_groups(_part, batch_format="pyarrow")
        return ds
    return FnStep(f"distinct[{','.join(cols)}]", _apply)


def set_op(left, right, how: str = "intersect",
           num_partitions: int = 32):
    """SQL set operations with DISTINCT semantics — ``INTERSECT`` /
    ``EXCEPT`` (Spark ``intersect`` / ``subtract``) over whole rows.

    ONE shuffle total: tag each side (int8), union, hash-partition on ALL
    columns, then a single vectorized pandas pass per partition (sort +
    per-group side min/max — equal rows land in the same partition, so
    membership on both sides is partition-local). Compare with the naive
    plan (distinct each side + join on every column = three shuffles).

    Schemas must match by column name; nulls compare equal (SQL set-op
    semantics: NULL IS NOT DISTINCT FROM NULL).
    """
    import ray.data as _rd

    if how not in ("intersect", "except"):
        raise ValueError(f"how must be 'intersect' or 'except', got {how!r}")
    cols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    if set(cols) != set(rcols):
        raise ValueError(f"set_op schema mismatch: {cols} vs {rcols}")

    def _tag(side: int):
        def _fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)  # align column order across sides
            return t.append_column("_side", pa.array(
                np.full(t.num_rows, side, dtype=np.int8), pa.int8()))
        return _fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow",
                              zero_copy_batch=True) \
        .union(right.map_batches(_tag(1), batch_format="pyarrow",
                                 zero_copy_batch=True))

    def _assign(t: pa.Table) -> pa.Table:
        pid = hash_partition_ids(t, cols, num_partitions)
        return t.append_column(_PART_COL, pa.array(pid, pa.int32()))

    def _per_partition(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.drop(columns=[_PART_COL])
        grp = g.groupby(cols, sort=False, dropna=False)["_side"]
        agg = grp.agg(["min", "max"]).reset_index()
        if how == "intersect":
            keep = agg[(agg["min"] == 0) & (agg["max"] == 1)]
        else:
            keep = agg[agg["max"] == 0]     # only-left groups
        return keep[cols]

    tagged = tagged.map_batches(_assign, batch_format="pyarrow",
                                zero_copy_batch=True)
    return tagged.groupby(_PART_COL).map_groups(_per_partition,
                                                batch_format="pandas")
