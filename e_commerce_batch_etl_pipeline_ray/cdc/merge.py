"""MERGE INTO — conditional merge of a source Dataset into a CDC lake.

Generalizes the engine's fixed last-writer-wins rule to user conditions,
with Spark/Delta MERGE semantics:

    merge_into(lake_dir, source,
               when_matched_delete_if=...,   # evaluated FIRST
               when_matched_update_if=...,   # then this
               when_not_matched_insert=True)

Conditions are VECTORIZED callables ``(src: pa.Table, tgt: pa.Table) ->
BooleanArray`` over key-aligned batches (row i of src matches row i of
tgt); ``None`` means "always" for update and "never" for delete. A matched
row hit by neither clause keeps its target version. Unmatched source rows
insert when ``when_not_matched_insert`` (bool or a ``(src) -> mask``
callable) allows.

The merge is executed per partition with the lake's own routing (source
rows hash to their partition; prior state is that partition's file set)
and COMMITS THROUGH THE STANDARD EPOCH PROTOCOL — a merge is just an
epoch whose delta was computed conditionally, so time travel, the change
feed, point reads, vacuum and resume all compose with it unchanged.
Deletes write tombstones carrying the source row's LSN (same stale-event
armor as the engine).

Scale: one hash shuffle of the SOURCE only (the target never moves);
per-partition work is index_in + boolean masks + take. Partitions with no
source rows carry forward untouched.

Reference lineage: the reference's closest shape is the truncate-then-
append idempotent DB load (src/load.py:36-41); MERGE is the incremental
form its README aspires to ("in production keep latest updated_at",
notebooks/02_transformations.py:90-94).
"""

from __future__ import annotations

import os
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    combine_keep_extreme,
    hash_partition_ids,
)

KEY = ["repo", "path"]
_PID = "_pid"

Cond2 = Callable[[pa.Table, pa.Table], pa.Array]
Cond1 = Callable[[pa.Table], pa.Array]


def _fused(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        t[KEY[0]].combine_chunks(), t[KEY[1]].combine_chunks(), "\x00")


def _as_bool_np(mask, n: int):
    import numpy as np
    if mask is None:
        return np.zeros(n, dtype=bool)
    if isinstance(mask, (pa.Array, pa.ChunkedArray)):
        return pc.fill_null(mask, False).to_numpy(zero_copy_only=False).astype(bool)
    return np.asarray(mask, dtype=bool)


def apply_merge(prior: pa.Table, src: pa.Table, schema: pa.Schema,
                update_if: Cond2 | None, delete_if: Cond2 | None,
                insert: bool | Cond1) -> tuple[pa.Table, int]:
    """The pure MERGE kernel (one partition's state x source slice ->
    new state, rows_applied) — extracted so it is property-testable
    without files or Ray. ``prior`` must be LWW-compacted (one row per
    key); ``src`` may carry duplicates (highest-lsn wins)."""
    import numpy as np

    src = combine_keep_extreme(src, KEY, ["lsn"], descending=True)

    idx = pc.index_in(_fused(src), value_set=_fused(prior)) \
        if prior.num_rows else pa.nulls(src.num_rows, pa.int32())
    idx_np = idx.to_numpy(zero_copy_only=False)
    has_tgt = ~np.isnan(idx_np) if len(idx_np) else np.array([], bool)
    tgt_pos = np.where(has_tgt, idx_np, 0).astype(np.int64)
    tgt_live = np.zeros(src.num_rows, dtype=bool)
    if prior.num_rows:
        live_np = pc.invert(prior["_deleted"].combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(bool)
        tgt_live = np.where(has_tgt, live_np[tgt_pos], False)
    matched = tgt_live                      # tombstoned target == unmatched

    # evaluate clauses on the ALIGNED matched rows only
    m_idx = np.flatnonzero(matched)
    src_m = src.take(m_idx)
    tgt_m = prior.take(tgt_pos[m_idx]) if len(m_idx) else \
        schema.empty_table()
    del_m = _as_bool_np(
        delete_if(src_m, tgt_m) if delete_if else None, len(m_idx))
    upd_m = _as_bool_np(
        update_if(src_m, tgt_m) if update_if is not None
        else np.ones(len(m_idx), dtype=bool), len(m_idx))
    upd_m &= ~del_m                         # delete clause wins

    unmatched = np.flatnonzero(~matched)
    src_u = src.take(unmatched)
    if callable(insert):
        ins_u = _as_bool_np(insert(src_u), len(unmatched))
    else:
        ins_u = np.full(len(unmatched), bool(insert))

    # assemble: prior minus touched keys, + updates, + tombstones, + inserts
    touched_pos = tgt_pos[m_idx[del_m | upd_m]]
    keep = np.ones(prior.num_rows, dtype=bool)
    keep[touched_pos] = False
    # an explicit not-matched INSERT over a key that only has a (possibly
    # higher-lsn) tombstone must clear that tombstone — MERGE semantics
    # outrank the stale-event armor for rows the user explicitly revived
    revived = unmatched[ins_u & has_tgt[unmatched]]
    if len(revived):
        keep[tgt_pos[revived]] = False
    pieces = [prior.filter(pa.array(keep))] if prior.num_rows else []

    updates = src_m.filter(pa.array(upd_m))
    if updates.num_rows:
        pieces.append(updates)
    deletes = src_m.filter(pa.array(del_m))
    if deletes.num_rows:
        # tombstone: key + source lsn, payload nulled
        cols = []
        for fld in schema:
            if fld.name in (*KEY, "lsn"):
                cols.append(deletes[fld.name])
            elif fld.name == "_deleted":
                cols.append(pa.array([True] * deletes.num_rows))
            else:
                cols.append(pa.nulls(deletes.num_rows, fld.type))
        pieces.append(pa.Table.from_arrays(cols, schema=schema))
    inserts = src_u.filter(pa.array(ins_u))
    if inserts.num_rows:
        pieces.append(inserts)

    merged = pa.concat_tables(pieces) if pieces else schema.empty_table()
    merged = combine_keep_extreme(merged, KEY, ["lsn"], descending=True)
    rows_applied = int(upd_m.sum() + del_m.sum() + ins_u.sum())
    return merged, rows_applied


class _MergeIntoApply:
    """Per-partition conditional merge (actor, same contract as
    engine.MergeApply): prior state + source slice -> new state file."""

    def __init__(self, lake_dir: str, epoch: int, schema_b64: str,
                 prev_partitions: dict[str, dict],
                 update_if: Cond2 | None, delete_if: Cond2 | None,
                 insert: bool | Cond1):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema = lake.schema_from_b64(schema_b64)
        self.prev_partitions = prev_partitions
        self.update_if = update_if
        self.delete_if = delete_if
        self.insert = insert
        self.tmp_dir = lake.epoch_dir(lake_dir, epoch, tmp=True)
        os.makedirs(self.tmp_dir, exist_ok=True)

    def _load_prior(self, pid: int) -> pa.Table:
        rec = self.prev_partitions.get(str(pid))
        files = ([rec["file"]] if rec and rec.get("file") else []) + \
            (list(rec.get("deltas", [])) if rec else [])
        if not files:
            return self.schema.empty_table()
        # deletion-vector mask (lake.delete_where_dv): the merge's compact
        # rewrite materializes the delete, so the fresh rec carries no dv
        tables = [lake._unify_to(lake.apply_dv(pq.read_table(f), f, rec),
                                 self.schema)
                  for f in files]
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        return combine_keep_extreme(t, KEY, ["lsn"], descending=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group[_PID][0].as_py()
        src = lake._unify_to(group.drop_columns([_PID]), self.schema)
        prior = self._load_prior(pid)
        merged, rows_applied = apply_merge(prior, src, self.schema,
                                           self.update_if, self.delete_if,
                                           self.insert)
        fname = f"part-{pid:05d}.parquet"
        tmp_path = os.path.join(self.tmp_dir, fname)
        wip = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(merged, wip)
        os.replace(wip, tmp_path)
        # keep key-bloom point-read pruning alive across a MERGE on a
        # bloom-enabled lake (any prior file carried a sidecar)
        from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
        rec = self.prev_partitions.get(str(pid)) or {}
        prior_files = ([rec["file"]] if rec.get("file") else []) + \
            list(rec.get("deltas", []))
        if any(os.path.exists(keybloom.sidecar_path(f))
               for f in prior_files) or not prior_files:
            keybloom.write_sidecar(
                tmp_path, merged,
                value_cols=keybloom.sidecar_value_cols(prior_files))
        import json as _json
        stats_cols = sorted((rec.get("stats") or {"lsn": None}).keys())
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([os.path.join(
                lake.epoch_dir(self.lake_dir, self.epoch), fname)], pa.string()),
            "lsn_watermark": pa.array(
                [pc.max(merged["lsn"]).as_py() if merged.num_rows else -1],
                pa.int64()),
            "rows_applied": pa.array([rows_applied], pa.int64()),
            "rows_total": pa.array([merged.num_rows], pa.int64()),
            "bytes_written": pa.array([os.path.getsize(tmp_path)], pa.int64()),
            "stats": pa.array([_json.dumps(
                {**lake.col_stats(merged, stats_cols),
                 **lake.live_meta(merged, stats_cols)})], pa.string()),
        })


def merge_into(lake_dir: str, source: ray.data.Dataset, *,
               when_matched_update_if: Cond2 | None = None,
               when_matched_delete_if: Cond2 | None = None,
               when_not_matched_insert: bool | Cond1 = True,
               merge_concurrency: int = 4) -> dict:
    """Run the conditional merge as the lake's next epoch. ``source`` must
    carry the key columns and ``lsn`` (the version the merged rows get);
    missing lake columns null-backfill, new columns evolve the schema
    additively. Returns the committed manifest."""
    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(
            f"no committed epochs in {lake_dir} — merge_into needs an "
            f"existing lake (use CDCEngine for initial load)")
    epoch = last + 1
    prev_manifest = lake.read_manifest(lake_dir, last)
    num_partitions = prev_manifest.get("num_partitions")
    if num_partitions is None:
        raise ValueError("manifest lacks num_partitions")
    prev_schema = lake.schema_from_b64(prev_manifest["schema"])

    src_fields = [pa.field(f.name, f.type)
                  for f in source.schema().base_schema
                  if f.name != "_deleted"]
    src_names = {f.name for f in src_fields}
    for k in (*KEY, "lsn"):
        if k not in src_names:
            raise ValueError(f"source lacks required column {k}")
    schema = pa.unify_schemas(
        [pa.schema([f for f in prev_schema if f.name != "_deleted"]),
         pa.schema(src_fields)],
        promote_options="permissive").append(pa.field("_deleted", pa.bool_()))
    schema_b64 = lake.schema_to_b64(schema)
    prev_parts = prev_manifest["partitions"]

    def _route(t: pa.Table) -> pa.Table:
        t = lake._unify_to(t, schema)
        # source rows are live by definition (the null-backfilled _deleted
        # would otherwise poison the reader's tombstone filter)
        i = t.column_names.index("_deleted")
        t = t.set_column(i, "_deleted",
                         pc.fill_null(t["_deleted"], False))
        t = combine_keep_extreme(t, KEY, ["lsn"], descending=True)
        pid = hash_partition_ids(t, KEY, num_partitions)
        return t.append_column(_PID, pa.array(pid, pa.int32()))

    routed = source.map_batches(_route, batch_format="pyarrow",
                                zero_copy_batch=True)
    from e_commerce_batch_etl_pipeline_ray.cdc.engine import merge_pool_size
    conc = merge_pool_size(merge_concurrency)
    lineage = collect_arrow(routed.groupby(_PID).map_groups(
        _MergeIntoApply, batch_format="pyarrow",
        fn_constructor_args=(lake_dir, epoch, schema_b64, prev_parts,
                             when_matched_update_if, when_matched_delete_if,
                             when_not_matched_insert),
        concurrency=conc, num_cpus=1))

    lake.promote_epoch_dir(lake_dir, epoch)
    import json as _json
    partitions = {}
    for rec in lineage.to_pylist():
        st = _json.loads(rec["stats"])
        live_rows = st.pop("_live_rows", None)
        live_stats = st.pop("_live", None)
        partitions[rec["partition"]] = {
            "file": rec["file"], "deltas": [],
            "lsn_watermark": rec["lsn_watermark"],
            "rows_applied": rec["rows_applied"],
            "rows_total": rec["rows_total"],
            "bytes_written": rec["bytes_written"],
            "stats": st,
        }
        if live_rows is not None:
            partitions[rec["partition"]]["live_rows"] = live_rows
            partitions[rec["partition"]]["live_stats"] = live_stats or {}
    metrics = {
        "op": "merge_into",
        "rows_applied": sum(r["rows_applied"] for r in partitions.values()),
        "partitions_touched": len(partitions),
    }
    return lake.commit_manifest(lake_dir, epoch, partitions, schema,
                                prev_manifest, metrics=metrics,
                                num_partitions=num_partitions)
