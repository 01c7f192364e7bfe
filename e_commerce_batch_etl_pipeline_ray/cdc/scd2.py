"""SCD Type 2 — full version history with validity intervals.

Where the CDC engine's LWW upsert keeps only each key's LATEST row, SCD2
keeps EVERY version: one row per (key, change event) carrying
``valid_from_lsn`` / ``valid_to_lsn`` / ``is_current``. An I/U event opens
a version; the key's next event (any op, including D) closes it. Delete
events emit no version of their own — they only close.

Out-of-order + duplicate delivery: versions are keyed by (key, lsn), so a
late event INSERTS INTO THE MIDDLE of a key's chain and the adjacent
versions' validity re-links around it; duplicate delivery is idempotent
(same (key, lsn) = byte-identical payload, deduped exactly).

Two surfaces sharing one vectorized chain kernel (``derive_history``):

* ``scd2_history(events)`` — one-shot operator over an event Dataset:
  batch-level (key,lsn) dedupe combiner -> one hash shuffle -> per-partition
  sort + chain derivation. The only all-to-all is the key shuffle.
* ``SCD2Engine`` — incrementally maintained across epochs in a manifest
  lake (same exactly-once commit protocol as the CDC engine: tmp dir +
  atomic manifest). Per-partition state is the deduped, key-sorted EVENT
  log — the minimal state from which any chain repair (late arrival,
  re-delivery) is a local recompute; ``history()`` derives validity at
  read time, one shuffle-free task per partition. An epoch touching 3 of
  10k partitions rewrites 3.

Reference lineage: generalizes the reference's "keep latest updated_at"
production note (notebooks/02_transformations.py:90-94) to full dimension
history — the classic warehouse SCD2 the reference's star schema implies
(sql/create_tables.sql).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    combine_keep_extreme,
    hash_partition_ids,
)

KEY = ["repo", "path"]
_PID = "_pid"


def _dedupe_events(t: pa.Table) -> pa.Table:
    """Exactly-once on (key, lsn): duplicate delivery is byte-identical, so
    any winner is THE row."""
    return combine_keep_extreme(t, KEY + ["lsn"], ["lsn"], descending=True)


def _sort_events(t: pa.Table) -> pa.Table:
    return t.sort_by([(k, "ascending") for k in KEY] + [("lsn", "ascending")])


def derive_history(t: pa.Table) -> pa.Table:
    """Chain kernel: ``t`` is one partition's deduped event log sorted by
    (key, lsn). Emits version rows with validity interval columns —
    vectorized (one fused-key compare + shifts), no per-key Python."""
    n = t.num_rows
    base = t.drop_columns(["op"]).rename_columns(
        ["valid_from_lsn" if c == "lsn" else c
         for c in t.drop_columns(["op"]).column_names])
    if n == 0:
        return base.append_column(
            "valid_to_lsn", pa.array([], pa.int64())).append_column(
            "is_current", pa.array([], pa.bool_()))
    fused = pc.binary_join_element_wise(
        t[KEY[0]].combine_chunks(), t[KEY[1]].combine_chunks(), "\x00")
    f = fused.to_numpy(zero_copy_only=False)
    lsn = t["lsn"].to_numpy()
    same_next = np.empty(n, dtype=bool)
    same_next[:-1] = f[1:] == f[:-1]
    same_next[-1] = False
    next_lsn = np.empty(n, dtype=np.int64)
    next_lsn[:-1] = lsn[1:]
    next_lsn[-1] = 0
    valid_to = pa.array(next_lsn, pa.int64(), mask=~same_next)
    live = pc.not_equal(t["op"], "D")
    is_current = pc.and_(pa.array(~same_next), live)
    out = base.append_column("valid_to_lsn", valid_to)
    out = out.append_column("is_current", is_current)
    return out.filter(live)


def scd2_history(events: ray.data.Dataset,
                 num_partitions: int = 32) -> ray.data.Dataset:
    """One-shot SCD2 over an event Dataset (columns: lsn, op, key cols,
    attributes). One hash shuffle; everything else batch-local."""
    def _combine(t: pa.Table) -> pa.Table:
        t = _dedupe_events(t)
        pid = hash_partition_ids(t, KEY, num_partitions)
        return t.append_column(_PID, pa.array(pid, pa.int32()))

    def _partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_PID])
        return derive_history(_sort_events(_dedupe_events(g)))

    ds = events.map_batches(_combine, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds.groupby(_PID).map_groups(_partition, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incrementally-maintained SCD2 lake


@dataclass
class SCD2Config:
    lake_dir: str
    num_partitions: int = 32
    merge_concurrency: int = 4
    # LSM write-amplification control, same contract as CDCConfig: with
    # compact_interval=K, K-1 of every K epochs append only a per-partition
    # DELTA event-log file (no prior read, O(epoch) I/O); every K-th epoch
    # compacts base+deltas into a fresh deduped key-sorted log. history()
    # merges base+deltas per partition at read time, so snapshots stay
    # correct at any epoch. K=1 (default) compacts every epoch.
    compact_interval: int = 1


def _event_schema(new: pa.Schema, prev: pa.Schema | None) -> pa.Schema:
    """Evolved event-log schema (op KEPT — deletes are chain-closing
    events), metadata-stripped, additively unified."""
    s = pa.schema([pa.field(f.name, f.type) for f in new])
    if prev is not None:
        s = pa.unify_schemas([prev, s], promote_options="permissive")
    return s


class _Scd2Apply:
    """Per-partition event-log merge: prior log + epoch delta -> deduped,
    key-sorted log file under the epoch tmp dir (same atomic pattern as
    cdc.engine.MergeApply)."""

    def __init__(self, lake_dir: str, epoch: int, schema_b64: str,
                 prev_partitions: dict[str, dict], mode: str = "compact"):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema = lake.schema_from_b64(schema_b64)
        self.prev_partitions = prev_partitions
        self.mode = mode                       # "compact" | "delta"
        self.tmp_dir = lake.epoch_dir(lake_dir, epoch, tmp=True)
        os.makedirs(self.tmp_dir, exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group[_PID][0].as_py()
        delta = lake._unify_to(group.drop_columns([_PID]), self.schema)
        if self.mode == "delta":
            # no prior read, no state rewrite: the deduped, key-sorted
            # epoch delta IS the output (history() re-merges at read time)
            merged = _sort_events(_dedupe_events(delta))
        else:
            rec = self.prev_partitions.get(str(pid))
            files = ([rec["file"]] if rec and rec.get("file") else []) + \
                (list(rec.get("deltas", [])) if rec else [])
            if files:
                prior = pa.concat_tables(
                    [lake._unify_to(pq.read_table(f), self.schema)
                     for f in files])
                delta = pa.concat_tables([prior, delta])
            merged = _sort_events(_dedupe_events(delta))

        suffix = "delta.parquet" if self.mode == "delta" else "parquet"
        fname = f"part-{pid:05d}.{suffix}"
        tmp_path = os.path.join(self.tmp_dir, fname)
        in_progress = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(merged, in_progress)
        os.replace(in_progress, tmp_path)
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([os.path.join(
                lake.epoch_dir(self.lake_dir, self.epoch), fname)], pa.string()),
            "lsn_watermark": pa.array([pc.max(merged["lsn"]).as_py()], pa.int64()),
            "rows_applied": pa.array([group.num_rows], pa.int64()),
            "rows_total": pa.array([merged.num_rows], pa.int64()),
            "bytes_written": pa.array([os.path.getsize(tmp_path)], pa.int64()),
        })


class SCD2Engine:
    """Epoch loop + commit protocol for the incrementally-maintained
    history. Exactly-once and resume semantics are inherited wholesale from
    the lake manifest machinery (cdc/lake.py)."""

    def __init__(self, config: SCD2Config):
        self.cfg = config
        os.makedirs(config.lake_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.lake_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.lake_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def ingest_epoch(self, events: ray.data.Dataset, epoch: int) -> dict:
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.lake_dir, last)
                         if last is not None else None)
        prev_schema = (lake.schema_from_b64(prev_manifest["schema"])
                       if prev_manifest else None)
        schema = _event_schema(events.schema().base_schema, prev_schema)
        schema_b64 = lake.schema_to_b64(schema)
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        def _combine(t: pa.Table) -> pa.Table:
            t = lake._unify_to(t, schema)
            t = _dedupe_events(t)
            pid = hash_partition_ids(t, KEY, cfg.num_partitions)
            return t.append_column(_PID, pa.array(pid, pa.int32()))

        normalized = events.map_batches(_combine, batch_format="pyarrow",
                                        zero_copy_batch=True)
        from e_commerce_batch_etl_pipeline_ray.cdc.engine import (
            merge_pool_size,
        )
        conc = merge_pool_size(cfg.merge_concurrency)
        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        lineage_ds = normalized.groupby(_PID).map_groups(
            _Scd2Apply, batch_format="pyarrow",
            fn_constructor_args=(cfg.lake_dir, epoch, schema_b64, prev_parts,
                                 mode),
            concurrency=conc, num_cpus=1)
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        lineage = collect_arrow(lineage_ds)

        lake.promote_epoch_dir(cfg.lake_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            pid = rec["partition"]
            if mode == "delta":
                prev = prev_parts.get(str(pid), {})
                partitions[pid] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])) + [rec["file"]],
                    "lsn_watermark": max(prev.get("lsn_watermark", -1),
                                         rec["lsn_watermark"]),
                    "rows_applied": rec["rows_applied"],
                    "rows_total": -1,          # unknown without a base read
                    "bytes_written": rec["bytes_written"],
                }
            else:
                partitions[pid] = {
                    "file": rec["file"], "deltas": [],
                    "lsn_watermark": rec["lsn_watermark"],
                    "rows_applied": rec["rows_applied"],
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        manifest = lake.commit_manifest(cfg.lake_dir, epoch, partitions,
                                        schema, prev_manifest,
                                        num_partitions=cfg.num_partitions)
        return manifest

    def history(self, epoch: int | None = None) -> ray.data.Dataset:
        """The full SCD2 table at ``epoch`` (default latest): one
        shuffle-free derive task per partition."""
        cfg = self.cfg
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no committed epochs in {cfg.lake_dir}")
        manifest = lake.read_manifest(cfg.lake_dir, epoch)
        schema_b64 = manifest["schema"]
        import json

        items = []
        for pid, rec in manifest["partitions"].items():
            files = ([rec["file"]] if rec.get("file") else []) + \
                list(rec.get("deltas", []))
            if files:
                items.append({"partition": int(pid),
                              "files": json.dumps(files)})
        if not items:
            empty = derive_history(
                lake.schema_from_b64(schema_b64).empty_table())
            return ray.data.from_arrow(empty)

        def _read_derive(batch: pa.Table) -> pa.Table:
            sch = lake.schema_from_b64(schema_b64)
            out = []
            for r in batch.to_pylist():
                files = json.loads(r["files"])
                tables = [lake._unify_to(pq.read_table(f), sch)
                          for f in files]
                t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
                # base is already deduped+sorted; uncompacted deltas need
                # the (idempotent) re-dedupe + sort before chain derivation
                if len(tables) > 1:
                    t = _sort_events(_dedupe_events(t))
                out.append(derive_history(t))
            return pa.concat_tables(out) if len(out) > 1 else out[0]

        return ray.data.from_items(items).map_batches(
            _read_derive, batch_format="pyarrow", batch_size=1)

    def current(self, epoch: int | None = None) -> ray.data.Dataset:
        """Only the open versions — equals the CDC engine's live LWW table."""
        def _cur(t: pa.Table) -> pa.Table:
            return t.filter(t["is_current"])
        return self.history(epoch).map_batches(_cur, batch_format="pyarrow",
                                               zero_copy_batch=True)


def as_of_lsn(history: ray.data.Dataset, lsn: int) -> ray.data.Dataset:
    """Temporal snapshot BY LSN (finer grain than epoch time travel): the
    rows whose validity interval covers ``lsn`` — i.e. the live table
    exactly as of transaction ``lsn``, reconstructed from SCD2 history
    with a row-local filter (no shuffle, no state read beyond the history
    itself). Equivalent SQL: ``valid_from_lsn <= L AND (valid_to_lsn IS
    NULL OR valid_to_lsn > L)``."""
    def _filter(t: pa.Table) -> pa.Table:
        lo = pc.less_equal(t["valid_from_lsn"], lsn)
        hi = pc.or_kleene(pc.is_null(t["valid_to_lsn"]),
                          pc.greater(t["valid_to_lsn"], lsn))
        return t.filter(pc.and_(lo, hi))
    return history.map_batches(_filter, batch_format="pyarrow",
                               zero_copy_batch=True)


def temporal_join(facts: ray.data.Dataset, history: ray.data.Dataset,
                  at_col: str = "lsn", payload: list[str] | None = None,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """POINT-IN-TIME (temporal) join: attach to each fact row the
    dimension version that was valid AT the fact's LSN — the leakage-safe
    dimension lookup for training-data assembly (a fact must never see
    attributes from its future).

    ``facts``: any Dataset with the key columns + ``at_col``.
    ``history``: SCD2 version rows (scd2_history / SCD2Engine.history).
    Match rule per key: ``valid_from_lsn <= at < valid_to_lsn`` (open
    ``valid_to_lsn`` = current). Facts in a deletion gap (or before the
    first version) keep their row with null payload — left-outer.

    Shape: ONE co-hash-shuffle of both sides on the key, then one
    ``pd.merge_asof(by=key)`` per partition — no per-key Python, no
    driver materialization. Payload columns colliding with fact columns
    get a ``_dim`` suffix.
    """
    import pandas as pd

    fact_schema = facts.schema().base_schema
    hist_schema = history.schema().base_schema
    if payload is None:
        payload = [f.name for f in hist_schema
                   if f.name not in KEY + ["valid_from_lsn", "valid_to_lsn",
                                           "is_current"]]
    out_names = {}
    for p in payload:
        out_names[p] = p + "_dim" if p in fact_schema.names else p

    out_schema = pa.schema(
        [pa.field(f.name, f.type) for f in fact_schema]
        + [pa.field(out_names[p], hist_schema.field(p).type)
           for p in payload]
        + [pa.field("valid_from_lsn", pa.int64())])

    fact_cols = [f.name for f in fact_schema]

    def _tag(side: str):
        def _fn(t: pa.Table) -> pa.Table:
            pid = hash_partition_ids(t, KEY, num_partitions)
            return t.append_column(_PID, pa.array(pid, pa.int32())) \
                    .append_column("_side", pa.array([side] * t.num_rows))
        return _fn

    f_tagged = facts.map_batches(_tag("f"), batch_format="pyarrow",
                                 zero_copy_batch=True)
    h_tagged = history.map_batches(_tag("h"), batch_format="pyarrow",
                                   zero_copy_batch=True)

    def _unify(t: pa.Table, names: list[str], types: dict) -> pa.Table:
        cols = []
        for nm in names:
            if nm in t.column_names:
                c = t[nm]
                cols.append(c.cast(types[nm]) if c.type != types[nm] else c)
            else:
                cols.append(pa.nulls(t.num_rows, type=types[nm]))
        return pa.Table.from_arrays(cols, names=names)

    union_names = [_PID, "_side"] + sorted(
        {f.name for f in fact_schema}
        | {f.name for f in hist_schema})
    union_types = {_PID: pa.int32(), "_side": pa.string()}
    for sch in (fact_schema, hist_schema):
        for f in sch:
            union_types.setdefault(f.name, f.type)

    both = f_tagged.map_batches(
        lambda t: _unify(t, union_names, union_types),
        batch_format="pyarrow", zero_copy_batch=True).union(
        h_tagged.map_batches(
            lambda t: _unify(t, union_names, union_types),
            batch_format="pyarrow", zero_copy_batch=True))

    def _join_partition(g: pa.Table) -> pa.Table:
        fused = pc.binary_join_element_wise(
            g[KEY[0]].combine_chunks(), g[KEY[1]].combine_chunks(), "\x00")
        g = g.append_column("_k", fused)
        fmask = pc.equal(g["_side"], "f")
        f_t = g.filter(fmask)
        h_t = g.filter(pc.invert(fmask))
        fdf = f_t.select(["_k"] + fact_cols).to_pandas()
        hdf = h_t.select(["_k", "valid_from_lsn", "valid_to_lsn"]
                         + payload).to_pandas()
        hdf = hdf.rename(columns={p: out_names[p] + "__h" for p in payload})
        fdf = fdf.sort_values(at_col, kind="stable")
        hdf = hdf.sort_values("valid_from_lsn", kind="stable")
        m = pd.merge_asof(fdf, hdf, left_on=at_col,
                          right_on="valid_from_lsn", by="_k",
                          direction="backward")
        # expired version (fact falls in a deletion gap) -> null payload
        expired = m["valid_to_lsn"].notna() & (m["valid_to_lsn"] <= m[at_col])
        arrays = []
        for f in fact_schema:
            arrays.append(pa.Array.from_pandas(m[f.name], type=f.type))
        for p in payload:
            s = m[out_names[p] + "__h"].mask(expired)
            arrays.append(pa.Array.from_pandas(
                s, type=hist_schema.field(p).type))
        vf = m["valid_from_lsn"].mask(expired).astype("Int64")
        arrays.append(pa.Array.from_pandas(vf, type=pa.int64()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby(_PID).map_groups(_join_partition,
                                         batch_format="pyarrow")
