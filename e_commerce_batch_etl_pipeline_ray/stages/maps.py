"""Row-local operators (SURVEY.md §2.2, M1-M12): every one is a single
zero-copy Arrow ``map_batches`` pass, so consecutive steps fuse into one task
per block under the streaming executor. No shuffles here.

Each factory returns a ``Step``; compose with ``core.Pipeline``.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.core import FnStep, batch_step
from e_commerce_batch_etl_pipeline_ray.functions import scalar as F


def _set_or_append(t: pa.Table, name: str, col) -> pa.Table:
    if isinstance(col, pa.ChunkedArray):
        pass
    elif isinstance(col, pa.Array):
        col = pa.chunked_array([col])
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, col)
    return t.append_column(name, col)


def rename_columns(mapping: Mapping[str, str]) -> FnStep:
    """M1 — rename columns (snake_case conformance).

    Reference: 8x withColumnRenamed src/transform.py:10-27 (incl. the
    space-containing ``Customer ID``). Zero-copy: Arrow renames are metadata.
    """
    def _fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])
    return batch_step(f"rename[{len(mapping)}]", _fn)


def parse_timestamp(col: str, fmt: str = "%m/%d/%Y %H:%M", out: str | None = None,
                    drop_source: bool = False, drop_unparsed: bool = False) -> FnStep:
    """M2 — lenient timestamp parse (bad values -> null), optionally dropping
    the raw column and/or rows that failed to parse.

    Reference: src/transform.py:30-47 (keep-null variant);
    notebooks/02_transformations.py:127-149 (drop-null-rows variant).
    """
    out_name = out or col

    def _fn(t: pa.Table) -> pa.Table:
        parsed = F.to_timestamp(t[col], fmt=fmt)
        if drop_source and out_name != col:
            t = t.drop_columns([col])
        t = _set_or_append(t, out_name, parsed)
        if drop_unparsed:
            t = t.filter(pc.is_valid(t[out_name]))
        return t
    return batch_step(f"parse_ts[{col}]", _fn)


def cast_columns(types: Mapping[str, pa.DataType]) -> FnStep:
    """M3 — defensive numeric/type casts (src/transform.py:43-44)."""
    def _fn(t: pa.Table) -> pa.Table:
        for name, ty in types.items():
            if name in t.column_names and t[name].type != ty:
                t = _set_or_append(t, name, t[name].cast(ty))
        return t
    return batch_step(f"cast[{','.join(types)}]", _fn)


def bool_from_string(col: str, out: str | None = None) -> FnStep:
    """M4 — ``lower(s)=='true' -> True else False``
    (notebooks/02_transformations.py:136-141)."""
    out_name = out or col

    def _fn(t: pa.Table) -> pa.Table:
        return _set_or_append(t, out_name, F.bool_from_string(t[col]))
    return batch_step(f"bool_cast[{col}]", _fn)


def drop_null_rows(columns: Sequence[str]) -> FnStep:
    """M5 — drop rows with a null in any critical column.

    Reference: dropna(subset=...) src/transform.py:50-60 (key columns from
    src/config.py:54); notebooks/02_transformations.py:71-75. Row-local ->
    embarrassingly parallel.
    """
    cols = list(columns)

    def _fn(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(t[c]))
        return t.filter(mask)
    return batch_step(f"drop_null[{','.join(cols)}]", _fn)


def fill_nulls(defaults: Mapping[str, object]) -> FnStep:
    """M6 — per-column null fill.

    Reference: customer_id null -> 'GUEST' when/otherwise src/transform.py:62-65;
    7-default fillna dict notebooks/02_transformations.py:59-68.
    """
    def _fn(t: pa.Table) -> pa.Table:
        for name, default in defaults.items():
            if name in t.column_names:
                t = _set_or_append(t, name, pc.fill_null(t[name], default))
        return t
    return batch_step(f"fillna[{','.join(defaults)}]", _fn)


def filter_expr(predicate: Callable[[pa.Table], "pa.ChunkedArray | pa.Array"],
                name: str = "filter") -> FnStep:
    """M7 — business-rule predicate filter as one compound vectorized mask.

    ``predicate`` maps a batch to a boolean mask (nulls treated as False).
    Reference: qty>0 AND price>0 AND date/country checks
    src/transform.py:90-112; audited 4-filter chain
    notebooks/02_transformations.py:240-274.
    """
    def _fn(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return t.filter(pc.fill_null(mask, False))
    return batch_step(name, _fn)


def with_columns(exprs: Mapping[str, Callable[[pa.Table], object]],
                 name: str = "derive") -> FnStep:
    """M8/M9/M10 — derived columns from vectorized expressions.

    Each value is ``batch -> Array``; applied in insertion order so later
    expressions can read earlier outputs.

    Reference: date parts src/transform.py:128-130 +
    notebooks/02_transformations.py:170-175; arithmetic deriveds
    src/transform.py:131, notebooks/02_transformations.py:177-193; is_return
    flag src/transform.py:132.
    """
    def _fn(t: pa.Table) -> pa.Table:
        for out, expr in exprs.items():
            t = _set_or_append(t, out, expr(t))
        return t
    return batch_step(f"{name}[{','.join(exprs)}]", _fn)


def bucketize(col: str, thresholds: Sequence[float], labels: Sequence[str],
              out: str) -> FnStep:
    """M11 — ordered threshold bucketing (price_bucket src/transform.py:133-140,
    revenue_band notebooks/02_transformations.py:181-186)."""
    thr, lab = list(thresholds), list(labels)

    def _fn(t: pa.Table) -> pa.Table:
        return _set_or_append(t, out, F.bucketize(t[col], thr, lab))
    return batch_step(f"bucket[{out}]", _fn)


def select(columns: Sequence[str]) -> FnStep:
    """M12 — final projection to the fixed output contract in fixed order
    (src/transform.py:145-165)."""
    cols = list(columns)

    def _fn(ds):
        return ds.select_columns(cols)
    return FnStep(f"select[{len(cols)}]", _fn)


def map_batches_step(name: str, fn, **kwargs) -> FnStep:
    """Escape hatch: arbitrary map_batches as a Step (defaults to pyarrow
    zero-copy)."""
    return batch_step(name, fn, **kwargs)


def checkpoint(name: str = "checkpoint") -> FnStep:
    """ST1 — pin the dataset in the object store before multi-pass
    consumers (the reference's cache()+count() before the DQ checks,
    src/pipeline.py:116-129). Ray spills to disk automatically; there is no
    unpersist — blocks are freed when the MaterializedDataset is dropped."""
    def _apply(ds):
        return ds.materialize()
    return FnStep(name, _apply)


def unpivot(id_cols: Sequence[str], value_cols: Sequence[str],
            var_name: str = "variable", value_name: str = "value") -> FnStep:
    """Long-format melt (Spark ``unpivot``/``stack``, SQL UNPIVOT): one
    output row per (input row, value column). Row-local — a pure per-batch
    flat transform, no shuffle; value columns are cast to a common Arrow
    type (unify via pa.unify_schemas fails loudly on incompatible types)."""
    ids, vals = list(id_cols), list(value_cols)
    if not vals:
        raise ValueError("unpivot needs at least one value column")

    def _fn(t: pa.Table) -> pa.Table:
        # common type for the value column (int32+int64 -> int64, int+float
        # -> float64, ...), computed per batch off the actual schema
        common = t.schema.field(vals[0]).type
        for c in vals[1:]:
            ft = t.schema.field(c).type
            if ft != common:
                common = pa.unify_schemas(
                    [pa.schema([("v", common)]), pa.schema([("v", ft)])],
                    promote_options="permissive").field("v").type
        parts = []
        for c in vals:
            part = t.select(ids)
            part = part.append_column(
                var_name, pa.array([c] * t.num_rows, pa.string()))
            part = part.append_column(value_name, t[c].cast(common))
            parts.append(part)
        return pa.concat_tables(parts)

    return batch_step(f"unpivot[{len(vals)}]", _fn)


def explode(list_col: str, out: str | None = None,
            pos_col: str | None = None) -> FnStep:
    """Spark ``explode`` / ``posexplode`` (SQL UNNEST): one output row per
    list element, other columns replicated; rows with NULL lists emit
    nothing (SQL semantics). ``pos_col`` adds the 1-based ordinality.

    Row-local and fully vectorized: Arrow ``list_flatten`` +
    ``list_parent_indices`` + one take — no Python loop over rows, no
    shuffle. The inverse of a groupby-collect; the standard shape for
    fanning a token/shingle/URL list column out to per-element rows."""
    import numpy as np

    name = out or list_col

    def _fn(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col)
        base = t.drop_columns([list_col]).take(parents)
        if pos_col is not None:
            par = parents.to_numpy()
            n = len(par)
            if n:
                starts = np.ones(n, dtype=bool)
                starts[1:] = par[1:] != par[:-1]
                run_id = np.cumsum(starts) - 1
                run_start = np.flatnonzero(starts)
                pos = np.arange(n, dtype=np.int64) - run_start[run_id] + 1
            else:
                pos = np.array([], dtype=np.int64)
            base = base.append_column(pos_col, pa.array(pos, pa.int64()))
        return base.append_column(name, flat)

    return batch_step(f"explode[{list_col}]", _fn)


def json_extract(col: str, key: str, out: str, value_type: str = "int") -> FnStep:
    """Vectorized scalar extraction from a FLAT JSON string column (the
    events.props shape): one RE2 ``extract_regex`` kernel per batch — no
    per-row json.loads. ``value_type``: 'int' | 'float' | 'string'
    (string matches a quoted value). Returns NULL where the key is
    absent or the value does not match the type — same as SQL
    ``json_extract`` + CAST on flat objects. For nested/escaped JSON use
    an actor-pool stage with a real parser instead."""
    if value_type == "int":
        pat = rf'"{key}"\s*:\s*(?P<v>-?\d+)'
    elif value_type == "float":
        pat = rf'"{key}"\s*:\s*(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    elif value_type == "string":
        pat = rf'"{key}"\s*:\s*"(?P<v>[^"\\]*)"'
    else:
        raise ValueError(f"unknown value_type {value_type!r}")
    cast_to = {"int": pa.int64(), "float": pa.float64(),
               "string": pa.string()}[value_type]

    def _fn(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t[col], pattern=pat)
        vals = pc.struct_field(st, "v")
        if value_type != "string":
            vals = vals.cast(cast_to)
        return _set_or_append(t, out, vals)

    return batch_step(f"json_extract[{key}]", _fn)


def union_by_name(*datasets, strict: bool = False):
    """Spark ``unionByName(allowMissingColumns=True)`` / DuckDB ``UNION ALL
    BY NAME``: union datasets whose schemas differ in column ORDER and (with
    strict=False) in column PRESENCE — missing columns null-filled, the
    output schema is the name-ordered union of all input schemas.

    Row-local (one projection per block, no shuffle): each dataset is
    mapped onto the unified schema, then block lists are concatenated by
    ``Dataset.union`` (zero data movement). Column types must agree where
    names collide; a mismatch raises rather than silently casting.
    """
    import ray.data

    if len(datasets) < 2:
        raise ValueError("union_by_name needs at least two datasets")
    schemas = [ds.schema() for ds in datasets]
    fields: dict[str, pa.DataType] = {}
    for s in schemas:
        for name, typ in zip(s.names, s.types):
            if name in fields:
                if fields[name] != typ:
                    raise TypeError(
                        f"union_by_name: column {name!r} has conflicting "
                        f"types {fields[name]} vs {typ}")
            else:
                fields[name] = typ
    if strict:
        for s in schemas:
            missing = set(fields) - set(s.names)
            if missing:
                raise ValueError(
                    f"union_by_name(strict): missing columns {sorted(missing)}")
    unified = pa.schema(sorted(fields.items()))

    def _project(t: pa.Table) -> pa.Table:
        cols = []
        for f in unified:
            if f.name in t.column_names:
                cols.append(t[f.name])
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.Table.from_arrays(cols, schema=unified)

    projected = [ds.map_batches(_project, batch_format="pyarrow",
                                zero_copy_batch=True) for ds in datasets]
    out = projected[0]
    for p in projected[1:]:
        out = out.union(p)
    return out
