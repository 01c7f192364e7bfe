"""S1 — CSV reader with explicit schema and Spark-style parse modes.

Reference: src/extract.py:40-69 (options 55-64: header, PERMISSIVE mode,
timestampFormat "M/d/yyyy H:mm", quote-escape, multiLine) and the FAILFAST
variant notebooks/01_data_ingestion.py:228-239.

Mode mapping onto pyarrow CSV:
  FAILFAST      -> let pyarrow raise on any malformed row / uncastable value.
  DROPMALFORMED -> invalid_row_handler="skip" drops structurally bad rows;
                   type-bad values raise (stricter than Spark, documented).
  PERMISSIVE    -> read everything as string, then cast per column with
                   errors -> null inside map_batches (Spark nulls the whole
                   field, keeps the row).

Timestamp columns are declared as string in the read schema and parsed by the
M2 step (stages.maps.parse_timestamp) — same division of labor as the
reference (extract reads strings, transform parses, src/transform.py:30-47).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import TableSpec


def read_csv(path: str | list[str], spec: TableSpec, mode: str = "PERMISSIVE",
             **read_kwargs) -> ray.data.Dataset:
    mode = mode.upper()
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown mode {mode}")

    parse_options = pacsv.ParseOptions(newlines_in_values=True)
    if mode == "DROPMALFORMED":
        parse_options = pacsv.ParseOptions(
            newlines_in_values=True, invalid_row_handler=lambda row: "skip")

    if mode == "PERMISSIVE":
        convert = pacsv.ConvertOptions(
            column_types={f.name: pa.string() for f in spec.schema},
            strings_can_be_null=True)
    else:
        convert = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in spec.schema},
            strings_can_be_null=True)

    ds = ray.data.read_csv(path, parse_options=parse_options,
                           convert_options=convert, **read_kwargs)

    if mode == "PERMISSIVE":
        schema = spec.schema

        def _cast_permissive(t: pa.Table) -> pa.Table:
            cols = []
            for fld in schema:
                if fld.name in t.column_names:
                    col = t[fld.name]
                    if fld.type == pa.string():
                        cols.append(col.cast(pa.string()))
                    else:
                        # per-value lenient cast: uncastable -> null, row kept
                        cols.append(_lenient_cast(col, fld.type))
                else:
                    cols.append(pa.nulls(t.num_rows, type=fld.type))
            return pa.Table.from_arrays(cols, schema=schema)
        ds = ds.map_batches(_cast_permissive, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


def _lenient_cast(col: pa.ChunkedArray, ty: pa.DataType) -> pa.ChunkedArray:
    """Cast string -> ty, nulling values that fail (Spark PERMISSIVE field
    semantics) without a Python loop: try the vectorized cast; on failure,
    identify bad values by parsing doubles/ints via a regex prefilter."""
    import pyarrow.compute as pc
    try:
        return col.cast(ty)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    # trim FIRST: the prefilter regexes accept whitespace-padded values
    # (' 5 ') that pyarrow's string cast rejects — without the trim one
    # padded value plus any bad value fails the whole cast, violating the
    # Spark-PERMISSIVE "null the field, keep the row" contract.
    col = pc.utf8_trim_whitespace(col)
    if pa.types.is_integer(ty):
        ok = pc.match_substring_regex(col, r"^[+-]?\d+$")
    elif pa.types.is_floating(ty):
        ok = pc.match_substring_regex(
            col, r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
    elif pa.types.is_boolean(ty):
        ok = pc.match_substring_regex(col, r"^(?i:true|false|0|1)$")
    else:
        ok = pc.is_valid(col)
    cleaned = pc.if_else(pc.fill_null(ok, False), col, pa.scalar(None, pa.string()))
    return cleaned.cast(ty)
