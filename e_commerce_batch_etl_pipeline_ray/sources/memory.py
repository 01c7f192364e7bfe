"""S10 — in-memory table sources + S2 dataset expansion.

Reference: spark.createDataFrame(list, schema) for lookups/reports
(src/pipeline.py:89, notebooks/06_optimizations.py:172-194); self-union
expansion to a target row count (src/extract.py:72-91).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def from_arrow(table: pa.Table) -> ray.data.Dataset:
    return ray.data.from_arrow(table)


def from_rows(rows: list[dict], schema: pa.Schema | None = None) -> ray.data.Dataset:
    t = pa.Table.from_pylist(rows, schema=schema)
    return ray.data.from_arrow(t)


def expand_to_target(ds: ray.data.Dataset, target_rows: int,
                     current_rows: int | None = None) -> ray.data.Dataset:
    """S2 — union copies of the dataset until >= target, then limit.

    Reference: while count < target: df = df.union(base) then limit
    (src/extract.py:72-91). The union is lazy; limit stops the stream.
    """
    n = current_rows if current_rows is not None else ds.count()
    if n <= 0:
        return ds
    if n >= target_rows:
        return ds.limit(target_rows)
    copies = -(-target_rows // n)  # ceil
    out = ds.union(*[ds for _ in range(copies - 1)])
    return out.limit(target_rows)
