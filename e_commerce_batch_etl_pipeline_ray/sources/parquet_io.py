"""S5/S7/S8 — Parquet / JSON sinks and read-back verification.

Reference: partitioned Parquet writer (repartition(8, col) then
write.partitionBy(col).mode("overwrite"), src/load.py:8-43,
notebooks/04_write_parquet.py:55-110); coalesce(1) JSON report writer
(src/load.py:95-130); Parquet read-back verifier
(notebooks/04_write_parquet.py:121-139).

Scale notes: write one directory of part files per partition value
(resumable — a rerun can skip finished partitions); target file size via
min/max rows per file instead of a fixed repartition(8).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def read_parquet(path: str | list[str], columns: list[str] | None = None,
                 **kwargs) -> ray.data.Dataset:
    """Column-pruned parquet read (always pass ``columns`` in pipelines —
    a read that loads all columns for a 2-column transform is wrong).
    Metadata-stripped at the read so pandas-written files can't break
    Ray's block-schema dedup (see blockutil.read_parquet_clean)."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    return read_parquet_clean(path, columns=columns, **kwargs)


def write_parquet_partitioned(ds: ray.data.Dataset, path: str,
                              partition_cols: list[str] | None = None,
                              mode: str = "overwrite",
                              min_rows_per_file: int | None = None,
                              max_rows_per_file: int | None = None) -> None:
    """S5 — partitioned parquet write, overwrite semantics like the
    reference's mode("overwrite") (src/load.py:36-41)."""
    kwargs: dict = {}
    if partition_cols:
        kwargs["partition_cols"] = partition_cols
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    if max_rows_per_file:
        kwargs["max_rows_per_file"] = max_rows_per_file
    ds.write_parquet(path, mode=mode, **kwargs)


def write_json_report(table: pa.Table, path: str) -> None:
    """S7 — single-file JSON report (coalesce(1) equivalent: the report is
    tiny and written from the driver, src/load.py:95-110)."""
    import json
    import os
    import tempfile
    rows = table.to_pylist()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    with os.fdopen(fd, "w") as f:
        for r in rows:
            f.write(json.dumps(r, default=str) + "\n")
    os.replace(tmp, path)   # atomic, like the CDC manifest commit


def verify_parquet_roundtrip(path: str, expected_rows: int) -> bool:
    """S8 — read-back verifier (notebooks/04_write_parquet.py:121-139).
    Row count only — cheap metadata scan."""
    return ray.data.read_parquet(path).count() == expected_rows
