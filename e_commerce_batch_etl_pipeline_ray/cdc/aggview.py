"""Aggregate view maintained from the CHANGE DATA FEED — the composition
that makes the CDF pay for itself: a grouped COUNT/SUM/AVG over the live
table kept current by processing ONLY row-level changes, never rescanning
state.

Retraction algebra: every feed row becomes a signed contribution —
insert / update_postimage weigh +1, delete / update_preimage weigh -1 —
so an update retracts the old image and asserts the new one, and the
per-group partials (n = sum(w), sum_x = sum(w * x)) stay exact under any
interleaving. Only retractable aggregates are offered (count / sum / avg
= sum/n); min/max need full recomputation by design and belong to a
snapshot query instead.

Exactly-once: the view's durable state is ONE atomic file (parquet of
group partials + the consumed feed offset in its metadata, tmp +
os.replace). A crash between processing and commit re-polls the same
epochs (the feed is deterministic per epoch) and re-applies onto the OLD
state — never double-counting, because state and offset move together.

Scale shape: one combiner map_batches pass over the feed (per-block
grouped partials — shuffle carries one row per (group, block)), then a
tiny grouped merge. State size is the group cardinality, the same bound
every grouped aggregate has; the work per refresh is O(changes), never
O(state) — the property that matters when the table holds 10^10 rows and
an epoch touches 10^5.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from e_commerce_batch_etl_pipeline_ray.cdc import feed as cdc_feed

_W = "_w"
_N = "n_rows"


class AggregateView:
    """Feed-driven grouped aggregate: ``by`` key columns, ``sums`` a list
    of (value_expr_column, output_name) summed over live rows, plus a row
    count (``n_rows``). ``value_fn`` (optional) derives/transforms value
    columns per batch before aggregation (e.g. string length)."""

    def __init__(self, lake_dir: str, state_path: str, by: list[str],
                 sums: list[tuple[str, str]], value_fn=None,
                 by_types: dict[str, pa.DataType] | None = None):
        self.lake_dir = lake_dir
        self.state_path = state_path
        self.by = list(by)
        self.sums = list(sums)
        self.value_fn = value_fn
        # a refresh that ends BEFORE a schema-evolution epoch sees feeds
        # without the later columns; a group column missing from the feed
        # is NULL by additive-evolution semantics (type from by_types,
        # default string)
        self.by_types = dict(by_types or {})
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)

    # -- state ----------------------------------------------------------------

    def _load(self) -> tuple[pa.Table | None, int | None]:
        if not os.path.exists(self.state_path):
            return None, None
        t = pq.read_table(self.state_path)
        off = t.schema.metadata.get(b"feed_offset") if t.schema.metadata else None
        return t, (int(off) if off is not None else None)

    def offset(self) -> int | None:
        return self._load()[1]

    # -- refresh ----------------------------------------------------------------

    def _signed_partials(self, fd) -> pa.Table:
        by, sums, value_fn = self.by, self.sums, self.value_fn
        by_types = self.by_types

        def _partial(t: pa.Table) -> pa.Table:
            for c in by:
                if c not in t.column_names:
                    t = t.append_column(
                        c, pa.nulls(t.num_rows, by_types.get(c, pa.string())))
            if value_fn is not None:
                t = value_fn(t)
            w = pc.if_else(
                pc.is_in(t[cdc_feed.CHANGE_COL],
                         value_set=pa.array(["insert", "update_postimage"])),
                pa.scalar(1, pa.int64()), pa.scalar(-1, pa.int64()))
            cols = {c: t[c] for c in by}
            cols[_N] = w
            for src, out in sums:
                cols[out] = pc.multiply(
                    pc.cast(t[src], pa.float64()),
                    pc.cast(w, pa.float64()))
            flat = pa.table(cols)
            return flat.group_by(by).aggregate(
                [(_N, "sum")] + [(out, "sum") for _, out in sums]
            ).rename_columns(by + [_N] + [out for _, out in sums])

        parts = fd.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        if not parts:
            return None
        # pin the partials schema: an all-null group column infers as
        # null-type in from_pylist and would break the merge with state
        schema = pa.schema(
            [pa.field(c, by_types.get(c, pa.string())) for c in by]
            + [pa.field(_N, pa.int64())]
            + [pa.field(out, pa.float64()) for _, out in sums])
        return pa.Table.from_pylist(parts).select(schema.names).cast(schema)

    def refresh(self) -> dict:
        """Process all feed epochs past the stored offset; atomically
        advance state+offset together. Returns {epochs_applied, groups}."""
        from e_commerce_batch_etl_pipeline_ray.cdc import lake

        state, off = self._load()
        last = lake.last_committed_epoch(self.lake_dir)
        if last is None or (off is not None and off >= last):
            return {"epochs_applied": 0,
                    "groups": state.num_rows if state is not None else 0}
        start = 0 if off is None else off + 1
        fd = cdc_feed.change_feed(self.lake_dir, start, last)
        delta = self._signed_partials(fd)

        if delta is not None:
            merged_src = delta if state is None else pa.concat_tables(
                [state.select(delta.column_names), delta])
            merged = merged_src.group_by(self.by).aggregate(
                [(_N, "sum")] + [(out, "sum") for _, out in self.sums]
            ).rename_columns(
                self.by + [_N] + [out for _, out in self.sums])
            # groups whose rows all vanished drop out of the view
            merged = merged.filter(pc.greater(merged[_N], 0))
        else:
            merged = state
        if merged is None:
            # empty feed AND no prior state: nothing to persist yet; the
            # un-advanced offset just re-polls the (still empty) epochs
            return {"epochs_applied": 0, "groups": 0}

        meta = dict(merged.schema.metadata or {})
        meta[b"feed_offset"] = str(last).encode()
        merged = merged.replace_schema_metadata(meta)
        tmp = f"{self.state_path}.tmp.{os.getpid()}"
        pq.write_table(merged, tmp)
        os.replace(tmp, self.state_path)
        return {"epochs_applied": last - start + 1, "groups": merged.num_rows}

    # -- read -------------------------------------------------------------------

    def read(self, with_avg: list[tuple[str, str]] | None = None) -> pa.Table:
        """Current view (sorted by group key). ``with_avg``: derive
        (sum_col, avg_name) = sum_col / n_rows columns on the way out."""
        state, _ = self._load()
        if state is None:
            raise FileNotFoundError("view never refreshed")
        t = state.replace_schema_metadata(None)
        for src, name in (with_avg or []):
            t = t.append_column(name, pc.divide(
                t[src], pc.cast(t[_N], pa.float64())))
        return t.sort_by([(k, "ascending") for k in self.by])
