"""JSONL (newline-delimited JSON) reader with explicit schema and the same
Spark-style parse-mode contract as the CSV source — the ingestion format
most large text-corpus pipelines actually ship (one document object per
line), beyond the reference's CSV-only surface.

Mode mapping:
  FAILFAST      -> pyarrow JSON parse errors and uncastable values raise.
  DROPMALFORMED -> structurally invalid lines are dropped (per-batch
                   line-level fallback parse), type-bad values raise.
  PERMISSIVE    -> fields are read leniently and cast per column with
                   errors -> null (field nulled, row kept), missing fields
                   null-backfilled — Spark's semantics.

Implementation notes: `ray.data.read_json` (pyarrow.json block reader)
handles well-formed files; DROPMALFORMED/PERMISSIVE read the file as TEXT
lines first (`ray.data.read_text` — still distributed/streaming) and parse
each batch's lines with the stdlib json inside `map_batches`, which is the
only way to skip a single bad LINE (pyarrow.json aborts the whole block).
Line-level parse is the documented cost of malformed-tolerant ingestion;
use FAILFAST for trusted corpora.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import TableSpec
from e_commerce_batch_etl_pipeline_ray.sources.csv_source import _lenient_cast


def read_jsonl(path: str | list[str], spec: TableSpec,
               mode: str = "PERMISSIVE", **read_kwargs) -> ray.data.Dataset:
    mode = mode.upper()
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown mode {mode}")
    schema = spec.schema

    if mode == "FAILFAST":
        ds = ray.data.read_json(path, **read_kwargs)

        def _conform(t: pa.Table) -> pa.Table:
            cols = []
            for fld in schema:
                if fld.name in t.column_names:
                    cols.append(t[fld.name].cast(fld.type))   # raises on bad
                else:
                    raise ValueError(f"missing required field {fld.name}")
            return pa.Table.from_arrays(cols, schema=schema)
        return ds.map_batches(_conform, batch_format="pyarrow",
                              zero_copy_batch=True)

    # PERMISSIVE / DROPMALFORMED: distributed text lines -> per-batch parse
    lines = ray.data.read_text(path, **read_kwargs)
    drop_bad = mode == "DROPMALFORMED"

    def _parse(t: pa.Table) -> pa.Table:
        names = [f.name for f in schema]
        out: dict[str, list] = {n: [] for n in names}
        for line in t["text"].to_pylist():
            if not line or line.isspace():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
            except Exception:  # noqa: BLE001
                if drop_bad:
                    continue
                obj = {}                       # PERMISSIVE: all-null row
            for n in names:
                v = obj.get(n)
                out[n].append(None if isinstance(v, (dict, list)) else v)
        # values come in as strings/numbers/bools; lenient per-column cast
        cols = []
        for fld in schema:
            raw = pa.array([None if v is None else str(v) for v in out[fld.name]],
                           pa.string())
            if fld.type == pa.string():
                cols.append(raw)
            else:
                cols.append(_lenient_cast(pa.chunked_array([raw]), fld.type))
        return pa.Table.from_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in cols], schema=schema)

    return lines.map_batches(_parse, batch_format="pyarrow",
                             zero_copy_batch=True)
