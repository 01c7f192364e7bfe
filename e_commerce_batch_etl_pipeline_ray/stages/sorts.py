"""Sorts / limits / top-k / sampling (SURVEY.md §2.6).

A global sort is a range-partitioned all-to-all shuffle — use it only on
final outputs (the reference's only sorts are on small aggregate results,
notebooks/06_optimizations.py:287). ``top_k`` avoids the global sort
entirely: per-batch local top-k (vectorized select_k) then a driver-side
merge of the tiny partials.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.core import FnStep


def _norm_keys(keys: Sequence[tuple[str, str]] | Sequence[str] | str):
    if isinstance(keys, str):
        return [(keys, "ascending")]
    out = []
    for k in keys:
        if isinstance(k, str):
            out.append((k, "ascending"))
        else:
            out.append((k[0], k[1]))
    return out


def sort(keys, name: str = "sort") -> FnStep:
    """O2 — multi-key global sort (range-partitioned shuffle).
    Reference: orderBy(year, month, gross_revenue desc)
    notebooks/06_optimizations.py:287."""
    sk = _norm_keys(keys)

    def _apply(ds):
        return ds.sort([k for k, _ in sk],
                       descending=[d == "descending" for _, d in sk])
    return FnStep(name, _apply)


def limit(n: int) -> FnStep:
    """O1 — ``limit(n)`` (src/extract.py:80-89). Streaming executor stops
    producing blocks once n rows are taken."""
    def _apply(ds):
        return ds.limit(n)
    return FnStep(f"limit[{n}]", _apply)


def top_k(keys, k: int) -> FnStep:
    """O3 — top-k by sort keys WITHOUT a global sort: vectorized per-batch
    select_k partials, then one final select_k over the concatenated partials
    (k * num_blocks rows — tiny). Reference: ORDER BY ... DESC LIMIT 10
    (sql/create_tables.sql:113-129)."""
    sk = _norm_keys(keys)

    def _apply(ds):
        def _local(t: pa.Table) -> pa.Table:
            if t.num_rows <= k:
                idx = pc.sort_indices(t, sort_keys=sk)
            else:
                idx = pc.select_k_unstable(t, k=k, sort_keys=sk)
            return t.take(idx)
        ds = ds.map_batches(_local, batch_format="pyarrow", zero_copy_batch=True)
        # final reduce: repartition partials to one block, select_k again
        ds = ds.repartition(1)
        return ds.map_batches(_local, batch_format="pyarrow", batch_size=None,
                              zero_copy_batch=True)
    return FnStep(f"top_k[{k}]", _apply)


def sample(fraction: float, seed: int = 42) -> FnStep:
    def _apply(ds):
        return ds.random_sample(fraction, seed=seed)
    return FnStep(f"sample[{fraction}]", _apply)
