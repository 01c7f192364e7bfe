"""Change Data Feed — per-epoch row-level change stream from the lake.

``change_feed(lake_dir, from_epoch, to_epoch)`` returns a Dataset of every
row-level change each epoch committed, in the Delta-Lake CDF shape: data
columns + ``_change_type`` in {insert, update_preimage, update_postimage,
delete} + ``_commit_epoch``. Downstream incremental consumers (sync to a
search index, maintain a materialized view, audit) read ONLY the changes —
never a full snapshot diff.

Scale design — this is shuffle-free end to end:
  * The lake's partitioning is stable across epochs (same key hash, same
    partition count), so epoch N's ``part-P`` file and epoch N-1's
    ``part-P`` file hold the SAME key range: the diff is per-partition
    file-vs-file, one task per (epoch, partition), no all-to-all exchange.
  * Untouched partitions carry their file references forward in the
    manifest unchanged — identical file lists mean zero changes, and the
    partition is skipped WITHOUT reading data (manifest-only pruning). An
    epoch that touched 3 of 10k partitions schedules 3 tasks.
  * Inside a task the diff is Arrow-vectorized: one ``index_in`` hash
    lookup per side on a fused key column, boolean masks, ``take`` — no
    per-row Python.

Change semantics at epoch grain (like Delta's per-commit CDF):
  * insert           — key live in N, absent-or-tombstoned in N-1
  * update_pre/post  — key live in both with a different winning LSN
                       (two rows: the old image and the new image)
  * delete           — key live in N-1, tombstoned in N (the emitted row
                       is the PREIMAGE — the row as it was before delete)
  * a key whose winner LSN is unchanged (duplicate / stale delivery only)
    emits nothing; tombstone -> tombstone (re-delete) emits nothing.

Applying a feed onto the epoch N-1 snapshot reproduces the epoch N
snapshot exactly (tested: test_cdc_feed.py::test_feed_applies_to_snapshot).

Reference lineage: the reference pipeline is full-rewrite batch (overwrite
sink, src/load.py:36-41) with no change tracking; this generalizes its
run-log delta counts (notebooks/07_pipeline_orchestrator.py:139-150) to
row-level lineage, per the north-star's replayable change-event pipeline.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import combine_keep_extreme

KEY = ["repo", "path"]
CHANGE_COL = "_change_type"
EPOCH_COL = "_commit_epoch"
# key fuse separator: paths/repos never contain NUL (binlog + POSIX contract)
_SEP = "\x00"


def _feed_schema(data_schema: pa.Schema) -> pa.Schema:
    """Output schema: data columns (tombstone marker dropped) + change
    metadata columns. Fields are kept WHOLE (not rebuilt name+type): the
    rename-alias field metadata (lake.rename_column) must survive into the
    state schema so _load_state unifies pre-rename files correctly — a
    feed window crossing a rename boundary would otherwise null-backfill
    the renamed column on the old side and report every row as changed."""
    fields = [f for f in data_schema if f.name != "_deleted"]
    return pa.schema(fields + [pa.field(CHANGE_COL, pa.string()),
                               pa.field(EPOCH_COL, pa.int64())])


def _part_files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return ([rec["file"]] if rec.get("file") else []) + list(rec.get("deltas", []))


def _load_state(files: list[str], schema: pa.Schema,
                rec: dict | None = None) -> pa.Table:
    """One partition's compacted LWW state (tombstones kept), unified to
    ``schema``. Base files are already compacted+sorted; delta files can
    carry multiple rows per key, so re-combine (idempotent on bases).
    ``rec`` carries the record's deletion vectors (lake.delete_where_dv):
    a DV'd key is GONE from the loaded state, so the diff emits a delete
    row with the preimage lsn — the GC-vanished contract below."""
    if not files:
        return schema.empty_table()
    tables = [lake._unify_to(lake.apply_dv(pq.read_table(f), f, rec), schema)
              for f in files]
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    return combine_keep_extreme(t, KEY, ["lsn"], descending=True)


def _fused_key(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        t[KEY[0]].combine_chunks(), t[KEY[1]].combine_chunks(), _SEP)


def _emit(t: pa.Table, idx, change_type: str, epoch: int,
          out_schema: pa.Schema) -> pa.Table:
    rows = t.take(idx)
    if "_deleted" in rows.column_names:
        rows = rows.drop_columns(["_deleted"])
    n = rows.num_rows
    rows = rows.append_column(
        CHANGE_COL, pa.array([change_type] * n, pa.string()))
    rows = rows.append_column(EPOCH_COL, pa.array([epoch] * n, pa.int64()))
    return rows.select(out_schema.names).cast(out_schema)


def _diff_states(prev: pa.Table, cur: pa.Table, epoch: int,
                 out_schema: pa.Schema) -> pa.Table:
    """Vectorized per-partition diff of two compacted states (one row per
    key each, tombstones as ``_deleted`` rows)."""
    import numpy as np

    p_live = pc.invert(prev["_deleted"].combine_chunks()) if prev.num_rows \
        else pa.array([], pa.bool_())
    n_live = pc.invert(cur["_deleted"].combine_chunks()) if cur.num_rows \
        else pa.array([], pa.bool_())

    pk, nk = _fused_key(prev), _fused_key(cur)
    # position of each current key in prev (null = brand-new key), and the
    # reverse for delete detection
    n_in_p = pc.index_in(nk, value_set=pk)
    p_in_n = pc.index_in(pk, value_set=nk)

    n_in_p_np = n_in_p.to_numpy(zero_copy_only=False)   # float w/ nan
    p_in_n_np = p_in_n.to_numpy(zero_copy_only=False)
    n_live_np = n_live.to_numpy(zero_copy_only=False).astype(bool)
    p_live_np = p_live.to_numpy(zero_copy_only=False).astype(bool)
    n_lsn = cur["lsn"].to_numpy(zero_copy_only=False) if cur.num_rows else \
        np.array([], dtype=np.int64)
    p_lsn = prev["lsn"].to_numpy(zero_copy_only=False) if prev.num_rows else \
        np.array([], dtype=np.int64)

    has_prev = ~np.isnan(n_in_p_np) if len(n_in_p_np) else \
        np.array([], dtype=bool)
    pidx = np.where(has_prev, n_in_p_np, 0).astype(np.int64)
    prev_live_at = np.where(has_prev, p_live_np[pidx] if len(p_live_np)
                            else False, False)
    prev_lsn_at = np.where(has_prev, p_lsn[pidx] if len(p_lsn) else 0, -1)

    insert_mask = n_live_np & ~prev_live_at
    update_mask = n_live_np & prev_live_at & (n_lsn != prev_lsn_at)

    has_cur = ~np.isnan(p_in_n_np) if len(p_in_n_np) else \
        np.array([], dtype=bool)
    nidx = np.where(has_cur, p_in_n_np, 0).astype(np.int64)
    cur_dead_at = np.where(
        has_cur, ~n_live_np[nidx] if len(n_live_np) else True, True)
    # prior-live key now tombstoned (or GC-vanished) -> delete, preimage row
    delete_mask = p_live_np & cur_dead_at

    # delete rows carry the PREIMAGE payload but the DELETE's lsn (the
    # tombstone's lsn in cur) — the Debezium contract, and what makes a
    # feed-driven replica's tombstones win LWW against the rows they
    # delete. A GC-vanished key (no cur row) keeps the preimage lsn.
    del_idx = np.flatnonzero(delete_mask)
    del_piece = _emit(prev, del_idx, "delete", epoch, out_schema)
    if del_piece.num_rows:
        has_c = has_cur[del_idx]
        lsn_np = del_piece["lsn"].to_numpy(zero_copy_only=False).copy()
        lsn_np[has_c] = n_lsn[nidx[del_idx][has_c]]
        del_piece = del_piece.set_column(
            del_piece.column_names.index("lsn"), "lsn",
            pa.array(lsn_np, pa.int64()))
    pieces = [
        _emit(cur, np.flatnonzero(insert_mask), "insert", epoch, out_schema),
        _emit(prev, pidx[update_mask], "update_preimage", epoch, out_schema),
        _emit(cur, np.flatnonzero(update_mask), "update_postimage", epoch,
              out_schema),
        del_piece,
    ]
    return pa.concat_tables([p for p in pieces if p.num_rows] or
                            [out_schema.empty_table()])


def _plan(lake_dir: str, from_epoch: int,
          to_epoch: int | None) -> tuple[list[dict], pa.Schema, int]:
    """Manifest-only diff plan: one item per (epoch, partition) whose file
    list changed vs the prior epoch. Untouched (carried-forward) partitions
    never appear — the pruning is pure metadata, no data read."""
    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    if to_epoch is None:
        to_epoch = last
    if not (0 <= from_epoch <= to_epoch <= last):
        raise ValueError(
            f"epoch range [{from_epoch}, {to_epoch}] outside committed [0, {last}]")

    # newest schema in the range governs the whole feed's output layout
    # (older epochs' columns null-backfill forward, additive evolution)
    out_schema = _feed_schema(lake.schema_from_b64(
        lake.read_manifest(lake_dir, to_epoch)["schema"]))

    items = []
    prev_manifest = (lake.read_manifest(lake_dir, from_epoch - 1)
                     if from_epoch > 0 else None)
    for e in range(from_epoch, to_epoch + 1):
        cur_manifest = lake.read_manifest(lake_dir, e)
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        for pid, rec in cur_manifest["partitions"].items():
            cur_files = _part_files(rec)
            prev_files = _part_files(prev_parts.get(pid))
            cur_dv = lake.dv_json(rec)
            prev_dv = lake.dv_json(prev_parts.get(pid))
            # a deletion-vector commit changes visible state WITHOUT
            # changing the file list — the dv entries are part of the
            # carried-forward identity
            if cur_files == prev_files and cur_dv == prev_dv:
                continue                     # carried forward: no changes
            items.append({
                "partition": int(pid), "epoch": e,
                "cur_files": json.dumps(cur_files),
                "prev_files": json.dumps(prev_files),
                "cur_dv": cur_dv, "prev_dv": prev_dv,
            })
        prev_manifest = cur_manifest
    return items, out_schema, to_epoch


def change_feed(lake_dir: str, from_epoch: int = 0,
                to_epoch: int | None = None) -> ray.data.Dataset:
    """Row-level change stream for epochs ``from_epoch..to_epoch``
    (inclusive; default: latest committed). One shuffle-free Ray task per
    (epoch, touched partition); untouched partitions pruned from the
    manifest without any data read."""
    items, out_schema, _ = _plan(lake_dir, from_epoch, to_epoch)

    if not items:
        return ray.data.from_arrow(out_schema.empty_table())

    schema_b64 = lake.schema_to_b64(
        pa.schema([f for f in out_schema if f.name
                   not in (CHANGE_COL, EPOCH_COL)]).append(
            pa.field("_deleted", pa.bool_())))

    def _diff_partition(batch: pa.Table) -> pa.Table:
        state_schema = lake.schema_from_b64(schema_b64)
        feed_schema = _feed_schema(state_schema)
        out = []
        for row in batch.to_pylist():
            prev = _load_state(json.loads(row["prev_files"]), state_schema,
                               lake.rec_from_dv_json(row["prev_dv"]))
            cur = _load_state(json.loads(row["cur_files"]), state_schema,
                              lake.rec_from_dv_json(row["cur_dv"]))
            out.append(_diff_states(prev, cur, row["epoch"], feed_schema))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(items).map_batches(
        _diff_partition, batch_format="pyarrow", batch_size=1)


def _key_plan(lake_dir: str, keys: list[tuple[str, str]],
              from_epoch: int, to_epoch: int | None
              ) -> tuple[list[dict], pa.Schema]:
    """key_history's pruned diff plan (split out so tests can pin the
    pruning levels without running the diff)."""
    from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    items, out_schema, to_epoch = _plan(lake_dir, from_epoch, to_epoch)
    repos = [k[0] for k in keys]
    paths = [k[1] for k in keys]

    num_partitions = lake.read_manifest(
        lake_dir, to_epoch).get("num_partitions")
    pids = None
    if num_partitions is not None and keys:
        key_t = pa.table({KEY[0]: pa.array(repos, pa.string()),
                          KEY[1]: pa.array(paths, pa.string())})
        pids = set(hash_partition_ids(key_t, KEY, num_partitions).tolist())

    pruned = []
    for it in items:
        if pids is not None and it["partition"] not in pids:
            continue
        cur = keybloom.prune_files(json.loads(it["cur_files"]), repos, paths)
        prev = keybloom.prune_files(json.loads(it["prev_files"]), repos,
                                    paths)
        # identical pruned chains AND identical deletion vectors: the
        # keys' state provably didn't change (a DV commit alters state
        # without touching the file list)
        if cur == prev and it["cur_dv"] == it["prev_dv"]:
            continue
        pruned.append({**it, "cur_files": json.dumps(cur),
                       "prev_files": json.dumps(prev)})
    return pruned, out_schema


def key_history(lake_dir: str, keys: list[tuple[str, str]],
                from_epoch: int = 0,
                to_epoch: int | None = None) -> ray.data.Dataset:
    """Per-key VERSION HISTORY — the change feed restricted to ``keys``,
    with three pruning levels stacked so the cost scales with the keys'
    own change history, never the lake:

      1. partition routing: the keys hash to a fixed set of partitions
         (constant manifest modulus), every other partition's (epoch,
         partition) diff item is dropped — pure metadata;
      2. manifest carry-forward (inherited from the feed's planner):
         epochs that didn't touch a key's partition never appear;
      3. key-bloom sidecars: within a touched partition's file chains,
         files that provably hold none of the keys are dropped from BOTH
         sides of the diff — and if the pruned chains come out identical,
         the keys' state provably didn't change and the whole diff task
         is skipped.

    Inside a task, files read with a parquet ``isin`` row-group filter
    and the loaded states mask to the EXACT fused keys before the
    standard vectorized diff — so the diff itself is O(keys' rows), and
    pruning can never change the answer (a dropped file holds no needle
    rows; extra (repo, path) cross-pairs from the isin superset are
    masked out).

    Output: the feed schema (_change_type/_commit_epoch) filtered to the
    keys — for one key, its full insert/update/delete timeline across the
    manifest chain; ordering is up to the caller (sort by _commit_epoch).
    Epochs older than the vacuum horizon are gone by definition.
    """
    pruned, out_schema = _key_plan(lake_dir, keys, from_epoch, to_epoch)
    repos = [k[0] for k in keys]
    paths = [k[1] for k in keys]

    if not pruned or not keys:
        return ray.data.from_arrow(out_schema.empty_table())

    schema_b64 = lake.schema_to_b64(
        pa.schema([f for f in out_schema if f.name
                   not in (CHANGE_COL, EPOCH_COL)]).append(
            pa.field("_deleted", pa.bool_())))
    fused_keys = [f"{r}{_SEP}{p}" for r, p in keys]

    def _diff_keys(batch: pa.Table) -> pa.Table:
        state_schema = lake.schema_from_b64(schema_b64)
        feed_schema = _feed_schema(state_schema)
        needle = pa.array(fused_keys, pa.string())
        flt = (pc.field(KEY[0]).isin(pa.array(sorted(set(repos))))
               & pc.field(KEY[1]).isin(pa.array(sorted(set(paths)))))

        def _load(files, rec):
            if not files:
                return state_schema.empty_table()
            # dv mask composes with the isin pushdown: masking is by key
            tabs = [lake._unify_to(
                lake.apply_dv(pq.read_table(f, filters=flt), f, rec),
                state_schema)
                for f in files]
            t = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
            t = t.filter(pc.is_in(_fused_key(t), value_set=needle))
            return combine_keep_extreme(t, KEY, ["lsn"], descending=True)

        out = []
        for row in batch.to_pylist():
            prev = _load(json.loads(row["prev_files"]),
                         lake.rec_from_dv_json(row["prev_dv"]))
            cur = _load(json.loads(row["cur_files"]),
                        lake.rec_from_dv_json(row["cur_dv"]))
            out.append(_diff_states(prev, cur, row["epoch"], feed_schema))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(pruned).map_batches(
        _diff_keys, batch_format="pyarrow", batch_size=1)


def apply_feed(snapshot: pa.Table, feed: pa.Table) -> pa.Table:
    """Re-apply a change feed onto the snapshot it diffed FROM, producing
    the snapshot it diffed TO (driver-side helper for tests / consumers):
    drop deleted + pre-update keys, add inserts + postimages. Feed may span
    multiple epochs; later epochs win per key."""
    # a key has at most ONE non-preimage change per epoch, so the final
    # change per key is the max-epoch row among {insert, update_postimage,
    # delete}; only non-delete finals are (re)added
    finals = combine_keep_extreme(
        feed.filter(pc.not_equal(feed[CHANGE_COL], "update_preimage")),
        KEY, [EPOCH_COL], descending=True)
    adds = finals.filter(pc.not_equal(finals[CHANGE_COL], "delete"))
    removed_keys = _fused_key(feed)          # ANY change removes the old row
    if snapshot.num_rows:
        mask = pc.invert(pc.is_in(_fused_key(snapshot),
                                  value_set=pc.unique(removed_keys)))
        snapshot = snapshot.filter(mask)
    add_data = adds.drop_columns([CHANGE_COL, EPOCH_COL])
    cols = snapshot.column_names
    if set(cols) != set(add_data.column_names):
        # additive schema evolution across the feed range: null-backfill
        unified = pa.unify_schemas(
            [snapshot.schema, add_data.schema], promote_options="permissive")
        snapshot = lake._unify_to(snapshot, unified)
        add_data = lake._unify_to(add_data, unified)
        cols = snapshot.column_names
    merged = pa.concat_tables([snapshot, add_data.select(cols)])
    return merged.sort_by([(k, "ascending") for k in KEY])


class FeedCursor:
    """Committed-offset consumer over the change feed — the piece that
    makes the CDF drivable by a downstream incremental job (index sync,
    view maintenance, audit shipping) with EXACTLY-ONCE progress:

        cur = FeedCursor(lake_dir, state_path)
        while True:
            batch = cur.poll()          # Dataset of unseen changes (or None)
            if batch is not None:
                consume(batch)          # ... user work ...
                cur.commit()            # advance the durable offset

    ``poll`` returns every change in epochs (offset, latest]; ``commit``
    persists the new offset atomically (tmp + os.replace) ONLY after the
    consumer finished — a crash between poll and commit re-delivers the
    same epochs (at-least-once delivery + idempotent downstream = exactly
    once, the same contract the engine's own manifests use). Offsets are
    epoch-aligned: the feed is deterministic per epoch, so redelivery is
    byte-identical.
    """

    def __init__(self, lake_dir: str, state_path: str, feed_fn=None):
        """``feed_fn(lake_dir, from_epoch, to_epoch) -> Dataset`` selects
        WHICH feed the cursor drains (default: the row-grain change_feed;
        pass cdc.patch_feed.cell_change_feed to consume a patch lake at
        cell grain — both lakes share the epoch/manifest protocol, so the
        offset contract is identical)."""
        import os
        self.lake_dir = lake_dir
        self.state_path = state_path
        self.feed_fn = feed_fn or change_feed
        self._pending: int | None = None
        os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)

    def offset(self) -> int | None:
        """Last consumed epoch (None = nothing consumed yet)."""
        import json
        import os
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)["epoch"]

    def poll(self) -> ray.data.Dataset | None:
        """Changes committed since the cursor's offset, or None if caught
        up. Leaves the offset untouched until ``commit``."""
        last = lake.last_committed_epoch(self.lake_dir)
        off = self.offset()
        if last is None or (off is not None and off >= last):
            self._pending = None
            return None
        start = 0 if off is None else off + 1
        self._pending = last
        return self.feed_fn(self.lake_dir, start, last)

    def commit(self) -> int:
        """Durably advance the offset to the last polled epoch."""
        import json
        import os
        if self._pending is None:
            raise RuntimeError("nothing polled — call poll() first")
        tmp = f"{self.state_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"epoch": self._pending}, f)
        os.replace(tmp, self.state_path)
        epoch, self._pending = self._pending, None
        return epoch


def sync_feed_to_db(lake_dir: str, db_path: str, table: str,
                    state_path: str, key_cols: list[str] = KEY,
                    value_cols: list[str] | None = None,
                    batch_rows: int = 5000) -> dict:
    """End-to-end exactly-once CDC sink: drain the change feed into a
    relational table (SQLite stand-in, same contract as sources/db_sink —
    swap the connection factory for a real driver).

    Idempotent apply + committed offset = exactly-once: inserts and
    postimages become ``INSERT OR REPLACE`` on the key's primary key,
    deletes become ``DELETE WHERE key``; re-applying the same epochs after
    a crash-before-commit converges to the same table. Preimages are
    skipped (the postimage carries the new row). Changes stream through
    ``iter_batches`` — the driver never holds the feed.

    Returns {epochs_applied, upserts, deletes}.
    """
    import sqlite3

    cur = FeedCursor(lake_dir, state_path)
    prev_off = cur.offset()
    batch_ds = cur.poll()
    if batch_ds is None:
        return {"epochs_applied": 0, "upserts": 0, "deletes": 0}

    first = lake.schema_from_b64(
        lake.read_manifest(lake_dir,
                           lake.last_committed_epoch(lake_dir))["schema"])
    if value_cols is None:
        value_cols = [f.name for f in first
                      if f.name not in (*key_cols, "_deleted")]
    cols = list(key_cols) + [c for c in value_cols if c not in key_cols]

    con = sqlite3.connect(db_path)
    con.execute("PRAGMA journal_mode=WAL")
    col_defs = ", ".join(f'"{c}"' for c in cols)
    pk = ", ".join(f'"{c}"' for c in key_cols)
    con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" '
                f"({col_defs}, PRIMARY KEY ({pk}))")
    placeholders = ", ".join("?" for _ in cols)
    upsert_sql = (f'INSERT OR REPLACE INTO "{table}" ({col_defs}) '
                  f"VALUES ({placeholders})")
    where = " AND ".join(f'"{c}" = ?' for c in key_cols)
    delete_sql = f'DELETE FROM "{table}" WHERE {where}'

    upserts = deletes = 0
    for batch in batch_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=batch_rows):
        # a batch may span epochs: resolve each key to its FINAL change in
        # the batch (max epoch among non-preimage rows) before applying, so
        # delete@e0 + reinsert@e1 nets to the insert, never the delete
        batch = batch.filter(pc.not_equal(batch[CHANGE_COL],
                                          "update_preimage"))
        batch = combine_keep_extreme(batch, key_cols, [EPOCH_COL],
                                     descending=True)
        ct = batch[CHANGE_COL]
        ups = batch.filter(pc.is_in(
            ct, value_set=pa.array(["insert", "update_postimage"])))
        dels = batch.filter(pc.equal(ct, "delete"))
        if ups.num_rows:
            rows = list(zip(*(ups[c].to_pylist() for c in cols)))
            con.executemany(upsert_sql, rows)
            upserts += ups.num_rows
        if dels.num_rows:
            keys = list(zip(*(dels[c].to_pylist() for c in key_cols)))
            con.executemany(delete_sql, keys)
            deletes += dels.num_rows
    con.commit()
    con.close()
    epoch = cur.commit()            # offset advances ONLY after the DB commit
    start = 0 if prev_off is None else prev_off + 1
    return {"epochs_applied": epoch - start + 1,
            "upserts": upserts, "deletes": deletes}


def replicate(src_lake: str, dst_lake: str, state_path: str,
              num_partitions: int | None = None,
              merge_concurrency: int = 2,
              dq=None, dq_gate: bool = True) -> dict:
    """GEO-REPLICA from the change feed: drain unseen source epochs
    through a FeedCursor, convert the row-level changes back into upsert/
    delete EVENTS (insert/update_postimage -> 'U', delete -> 'D', each
    keeping its original lsn; preimages skipped — the postimage carries
    the row), and ingest them into the destination lake through the
    normal epoch protocol. LWW on the preserved lsn makes redelivery
    idempotent, so crash-between-poll-and-commit is exactly-once — the
    same contract as sync_feed_to_db, with a LAKE as the sink.

    ``dq``/``dq_gate`` plumb the destination engine's data-quality gate
    (quality.checks.DQConfig): the reconstructed events run the one-pass
    check framework BEFORE any merge work, with the report persisted under
    the destination's manifests; on FAIL with dq_gate=True the replica is
    untouched and the feed cursor does NOT advance (the batch re-drains
    after the source is fixed).

    The replica is a full CDC lake: point reads, time travel (its own
    epoch grain), feeds and views all work on it. One call replicates one
    batch of epochs; run it per source commit (or in a poll loop)."""
    from e_commerce_batch_etl_pipeline_ray.cdc import engine as _engine

    last_src = lake.last_committed_epoch(src_lake)
    if last_src is None:
        return {"epochs_applied": 0, "events": 0}
    src_manifest = lake.read_manifest(src_lake, last_src)
    if num_partitions is None:
        num_partitions = src_manifest.get("num_partitions", 32)
    cur = FeedCursor(src_lake, state_path)
    batch = cur.poll()
    if batch is None:
        return {"epochs_applied": 0, "events": 0}

    def _to_events(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t[CHANGE_COL], "update_preimage"))
        op = pc.if_else(pc.equal(t[CHANGE_COL], "delete"),
                        pa.scalar("D"), pa.scalar("U"))
        cols = {"lsn": t["lsn"], "op": op}
        for f in t.schema:
            if f.name not in ("lsn", CHANGE_COL, EPOCH_COL):
                cols[f.name] = t[f.name]
        return pa.table(cols)

    events = batch.map_batches(_to_events, batch_format="pyarrow",
                               zero_copy_batch=True)
    eng = _engine.CDCEngine(_engine.CDCConfig(
        lake_dir=dst_lake, num_partitions=num_partitions,
        merge_concurrency=merge_concurrency, dq=dq, dq_gate=dq_gate))
    epoch = eng.resume_point()
    n = events.count()
    eng.ingest_epoch(events, epoch, events_in=n)
    applied_through = cur.commit()     # offset advances AFTER the commit
    return {"epochs_applied": 1, "events": n,
            "src_epoch_through": applied_through, "dst_epoch": epoch}
