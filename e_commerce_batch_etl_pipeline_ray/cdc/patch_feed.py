"""Cell-grain Change Data Feed for the patch lake (cdc/patch.py).

``cell_change_feed(lake_dir, from_epoch, to_epoch)`` returns a Dataset of
every OBSERVABLE state change each epoch committed to a PatchCDCEngine
lake, at column grain: data columns + ``changed_cols`` (comma-joined sorted
names of the cells whose VALUE changed) + ``_change_type`` in {insert,
update_preimage, update_postimage, delete} + ``_commit_epoch``. This is
what a downstream consumer of a partial-column stream actually wants: "key
K's ``lang`` and ``content`` changed this epoch, here are both images" —
not a row-grain diff that can't say WHICH cells moved, and not a raw event
replay that re-ships unset junk columns.

Change semantics (value-grain, per epoch boundary):
  * insert           — key live in N, absent-or-tombstoned in N-1
                       (includes revives; changed_cols NULL: the whole row
                       is new, Debezium's create has no column mask)
  * update_pre/post  — key live in both and AT LEAST ONE cell value
                       differs (``IS DISTINCT FROM``); changed_cols names
                       exactly those cells, alphabetically. A key whose
                       lsn advanced but whose every cell re-set to the
                       SAME value emits nothing — duplicate delivery and
                       idempotent rewrites are invisible, by design.
  * delete           — key live in N-1, tombstoned in N; the emitted row
                       is the PREIMAGE with the DELETE's lsn (the
                       tombstone lsn from N's state — Debezium semantics,
                       same contract as cdc/feed.py row deletes).

Scale design — shuffle-free end to end, same shape as cdc/feed.py:
  * the patch lake's partitioning is constant (manifest num_partitions),
    so epoch N's part-P and epoch N-1's part-P hold the same key range:
    one Ray task per (epoch, TOUCHED partition), no all-to-all;
  * untouched partitions carry their file refs forward in the manifest —
    identical refs are skipped on the driver with zero data read;
  * inside a task the diff is Arrow/numpy-vectorized: fused-key
    ``index_in`` both ways, per-cell IS-DISTINCT masks, ``take``.

The q137 oracle replays every boundary in SQL: the q130 cell-LWW state
aggregation over each epoch PREFIX of the raw binlog (filename= pushdown),
full-outer-joined old-vs-new, changed_cols rebuilt with list_filter over
per-cell CASE expressions. Exact at both smoke scales.

Reference lineage: the reference is full-rewrite batch with no change
tracking (src/load.py:36-41); this extends its run-log delta counts
(notebooks/07_pipeline_orchestrator.py:139-150) past row grain to the cell
grain its notebooks' column-level audits reason about.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.patch import (
    KEY,
    cell_columns,
)

CHANGE_COL = "_change_type"
EPOCH_COL = "_commit_epoch"
CHANGED_COLS = "changed_cols"
_SEP = "\x00"


def _feed_schema(state_schema: pa.Schema) -> pa.Schema:
    cells = cell_columns(state_schema)
    fields = [pa.field(k, pa.string()) for k in KEY]
    fields.append(pa.field("lsn", pa.int64()))
    fields += [pa.field(c, state_schema.field(c).type) for c in cells]
    fields += [pa.field(CHANGED_COLS, pa.string()),
               pa.field(CHANGE_COL, pa.string()),
               pa.field(EPOCH_COL, pa.int64())]
    return pa.schema(fields)


def _load_state(files: list[str], schema: pa.Schema) -> pa.Table:
    """One partition's cell-LWW state (compacted base + any LSM deltas,
    CRDT-merged), unified to the newest schema, ``_deleted`` attached."""
    from e_commerce_batch_etl_pipeline_ray.cdc.patch import merge_state_files
    return merge_state_files(files, schema, cell_columns(schema))


def _fused_key(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        t[KEY[0]].combine_chunks(), t[KEY[1]].combine_chunks(), _SEP)


def _changed_cols_strings(prev: pa.Table, cur: pa.Table,
                          pidx: np.ndarray, cidx: np.ndarray,
                          cells: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """For the update-candidate pairs (prev row pidx[i] vs cur row cidx[i]):
    the comma-joined sorted names of the cells whose value differs
    (IS DISTINCT FROM), and the any-changed mask. Vectorized: one Arrow
    distinct-compare per cell, then a row-major nonzero walk."""
    n = len(pidx)
    names = sorted(cells)
    mat = np.zeros((n, len(names)), dtype=bool)
    for j, c in enumerate(names):
        a = prev[c].combine_chunks().take(pa.array(pidx, pa.int64()))
        b = cur[c].combine_chunks().take(pa.array(cidx, pa.int64()))
        neq = pc.fill_null(pc.not_equal(a, b), False)
        null_flip = pc.xor(pc.is_null(a), pc.is_null(b))
        mat[:, j] = pc.or_(neq, null_flip).to_numpy(zero_copy_only=False)
    any_changed = mat.any(axis=1)
    rows, cols = np.nonzero(mat)            # row-major: per-row cols sorted
    name_arr = np.asarray(names, dtype=object)
    joined = np.empty(n, dtype=object)
    counts = np.bincount(rows, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    picked = name_arr[cols]
    for i in np.flatnonzero(any_changed):
        joined[i] = ",".join(picked[offsets[i]:offsets[i + 1]])
    return joined, any_changed


def _emit(t: pa.Table, idx: np.ndarray, change_type: str, epoch: int,
          changed: np.ndarray | None, out_schema: pa.Schema) -> pa.Table:
    rows = t.take(pa.array(idx, pa.int64()))
    n = rows.num_rows
    arrays = {name: rows[name] for name in out_schema.names
              if name in rows.column_names}
    arrays[CHANGED_COLS] = (pa.array(changed, pa.string())
                            if changed is not None
                            else pa.nulls(n, pa.string()))
    arrays[CHANGE_COL] = pa.array([change_type] * n, pa.string())
    arrays[EPOCH_COL] = pa.array([epoch] * n, pa.int64())
    return pa.table({name: arrays[name] for name in out_schema.names}) \
        .cast(out_schema)


def _diff_states(prev: pa.Table, cur: pa.Table, epoch: int,
                 cells: list[str], out_schema: pa.Schema) -> pa.Table:
    """Vectorized cell-grain diff of two compacted patch states (one row
    per key each, tombstones as ``_deleted`` rows)."""
    p_live = (pc.invert(prev["_deleted"].combine_chunks())
              .to_numpy(zero_copy_only=False).astype(bool)
              if prev.num_rows else np.array([], dtype=bool))
    c_live = (pc.invert(cur["_deleted"].combine_chunks())
              .to_numpy(zero_copy_only=False).astype(bool)
              if cur.num_rows else np.array([], dtype=bool))
    pk, ck = _fused_key(prev), _fused_key(cur)
    c_in_p = pc.index_in(ck, value_set=pk).to_numpy(zero_copy_only=False)
    p_in_c = pc.index_in(pk, value_set=ck).to_numpy(zero_copy_only=False)

    has_prev = (~np.isnan(c_in_p) if len(c_in_p)
                else np.array([], dtype=bool))
    pidx_at = np.where(has_prev, c_in_p, 0).astype(np.int64)
    prev_live_at = np.where(
        has_prev, p_live[pidx_at] if len(p_live) else False, False)

    insert_idx = np.flatnonzero(c_live & ~prev_live_at)

    upd_cand = np.flatnonzero(c_live & prev_live_at)
    changed_str = np.empty(0, dtype=object)
    upd_keep = upd_cand[:0]
    if len(upd_cand):
        joined, any_changed = _changed_cols_strings(
            prev, cur, pidx_at[upd_cand], upd_cand, cells)
        upd_keep = upd_cand[any_changed]
        changed_str = joined[any_changed]

    has_cur = ~np.isnan(p_in_c) if len(p_in_c) else np.array([], dtype=bool)
    cidx_at = np.where(has_cur, p_in_c, 0).astype(np.int64)
    cur_dead_at = np.where(
        has_cur, ~c_live[cidx_at] if len(c_live) else True, True)
    delete_idx = np.flatnonzero(p_live & cur_dead_at)

    del_piece = _emit(prev, delete_idx, "delete", epoch, None, out_schema)
    if del_piece.num_rows:
        # the DELETE's lsn = the tombstone's _del_lsn in the new state
        has_c = has_cur[delete_idx]
        lsn_np = del_piece["lsn"].to_numpy(zero_copy_only=False).copy()
        cur_del = (cur["_del_lsn"].to_numpy(zero_copy_only=False)
                   if cur.num_rows else np.array([], dtype=np.int64))
        lsn_np[has_c] = cur_del[cidx_at[delete_idx][has_c]]
        del_piece = del_piece.set_column(
            del_piece.column_names.index("lsn"), "lsn",
            pa.array(lsn_np, pa.int64()))
    pieces = [
        _emit(cur, insert_idx, "insert", epoch, None, out_schema),
        _emit(prev, pidx_at[upd_keep], "update_preimage", epoch,
              changed_str, out_schema),
        _emit(cur, upd_keep, "update_postimage", epoch, changed_str,
              out_schema),
        del_piece,
    ]
    return pa.concat_tables([p for p in pieces if p.num_rows]
                            or [out_schema.empty_table()])


def _plan(lake_dir: str, from_epoch: int,
          to_epoch: int | None) -> tuple[list[dict], pa.Schema]:
    """Manifest-only plan: one item per (epoch, partition) whose file ref
    changed vs the prior epoch — carried-forward partitions never appear
    (pure metadata pruning, no data read)."""
    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    if to_epoch is None:
        to_epoch = last
    if not (0 <= from_epoch <= to_epoch <= last):
        raise ValueError(f"epoch range [{from_epoch}, {to_epoch}] "
                         f"outside committed [0, {last}]")
    state_schema = lake.schema_from_b64(
        lake.read_manifest(lake_dir, to_epoch)["schema"])
    items = []
    prev_manifest = (lake.read_manifest(lake_dir, from_epoch - 1)
                     if from_epoch > 0 else None)
    for e in range(from_epoch, to_epoch + 1):
        cur_manifest = lake.read_manifest(lake_dir, e)
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        for pid, rec in cur_manifest["partitions"].items():
            from e_commerce_batch_etl_pipeline_ray.cdc.patch import (
                _part_files,
            )
            cur_files = _part_files(rec)
            prev_files = _part_files(prev_parts.get(pid))
            if cur_files == prev_files:
                continue                     # carried forward: no changes
            items.append({"partition": int(pid), "epoch": e,
                          "cur_files": json.dumps(cur_files),
                          "prev_files": json.dumps(prev_files)})
        prev_manifest = cur_manifest
    return items, state_schema


def cell_change_feed(lake_dir: str, from_epoch: int = 0,
                     to_epoch: int | None = None) -> ray.data.Dataset:
    """Cell-grain change stream for epochs ``from_epoch..to_epoch``
    (inclusive; default: latest committed)."""
    items, state_schema = _plan(lake_dir, from_epoch, to_epoch)
    cells = cell_columns(state_schema)
    out_schema = _feed_schema(state_schema)
    if not items:
        return ray.data.from_arrow(out_schema.empty_table())
    schema_b64 = lake.schema_to_b64(state_schema)

    def _diff_partition(batch: pa.Table) -> pa.Table:
        schema = lake.schema_from_b64(schema_b64)
        feed_schema = _feed_schema(schema)
        out = []
        for row in batch.to_pylist():
            prev = _load_state(json.loads(row["prev_files"]), schema)
            cur = _load_state(json.loads(row["cur_files"]), schema)
            out.append(_diff_states(prev, cur, row["epoch"], cells,
                                    feed_schema))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(items).map_batches(
        _diff_partition, batch_format="pyarrow", batch_size=1)


def cell_feed_oracle_sql(files: list[str], cells: list[str],
                         from_epoch: int = 0) -> str:
    """DuckDB replay of the cell-grain feed over the raw binlog files —
    one q130-style cell-LWW state per epoch PREFIX (filename pushdown on a
    single union_by_name read), then per boundary a full old-vs-new diff
    with changed_cols rebuilt from per-cell IS DISTINCT FROM cases."""
    flist = ", ".join(f"'{f}'" for f in files)
    sets = ("e.op = 'I' OR e.cols IS NULL OR "
            "contains(',' || e.cols || ',', ',{c},')")
    cell_agg = ",\n    ".join(
        ("(arg_max({'v': e." + c + "}, e.lsn) FILTER (WHERE "
         + sets.format(c=c) + ")).v AS " + c) for c in cells)
    names = sorted(cells)
    cases = ", ".join(
        f"CASE WHEN o.{c} IS DISTINCT FROM n.{c} THEN '{c}' END"
        for c in names)
    changed_expr = ("array_to_string(list_filter([" + cases
                    + "], x -> x IS NOT NULL), ',')")
    any_changed = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}" for c in names)
    o_cells = ", ".join(f"o.{c}" for c in cells)
    n_cells = ", ".join(f"n.{c}" for c in cells)

    def state(prefix_len: int, alias: str) -> str:
        fset = ", ".join(f"'{f}'" for f in files[:prefix_len])
        return f"""{alias} AS (
  SELECT e.repo, e.path, max(e.lsn) AS lsn,
    {cell_agg}
  FROM ev e JOIN (
    SELECT repo, path,
           coalesce(max(lsn) FILTER (WHERE op = 'D'), -1) AS del_lsn
    FROM ev WHERE filename IN ({fset}) GROUP BY repo, path) d
    USING (repo, path)
  WHERE e.op <> 'D' AND e.lsn > d.del_lsn AND e.filename IN ({fset})
  GROUP BY e.repo, e.path
)"""

    boundaries = []
    ctes = [f"""ev AS (
  SELECT * FROM read_parquet([{flist}], union_by_name=true, filename=true)
)"""]
    for e in range(from_epoch, len(files)):
        old_a, new_a = f"s{e}_old", f"s{e}_new"
        if e == 0:
            ctes.append(f"{old_a} AS (SELECT * FROM s0_new WHERE false)")
        else:
            ctes.append(state(e, old_a))
        ctes.append(state(e + 1, new_a))
        boundaries.append(f"""
SELECT n.repo, n.path, n.lsn, {n_cells},
       CAST(NULL AS VARCHAR) AS changed_cols,
       'insert' AS _change_type, {e} AS _commit_epoch
FROM {new_a} n LEFT JOIN {old_a} o USING (repo, path)
WHERE o.repo IS NULL
UNION ALL
SELECT o.repo, o.path, o.lsn, {o_cells}, {changed_expr},
       'update_preimage', {e}
FROM {new_a} n JOIN {old_a} o USING (repo, path) WHERE {any_changed}
UNION ALL
SELECT n.repo, n.path, n.lsn, {n_cells}, {changed_expr},
       'update_postimage', {e}
FROM {new_a} n JOIN {old_a} o USING (repo, path) WHERE {any_changed}
UNION ALL
SELECT o.repo, o.path, d.del_lsn AS lsn, {o_cells},
       CAST(NULL AS VARCHAR), 'delete', {e}
FROM {old_a} o LEFT JOIN {new_a} n USING (repo, path)
JOIN (SELECT repo, path,
             coalesce(max(lsn) FILTER (WHERE op = 'D'), -1) AS del_lsn
      FROM ev WHERE filename IN ({", ".join(f"'{f}'" for f in files[:e + 1])})
      GROUP BY repo, path) d USING (repo, path)
WHERE n.repo IS NULL""")
    # s0_new must be defined before the synthetic empty s0_old references it
    if from_epoch == 0:
        order = [ctes[0]] + [c for c in ctes[1:] if "WHERE false" not in c]
        empty = [c for c in ctes[1:] if "WHERE false" in c]
        ctes = order[:2] + empty + order[2:]
    body = "\nUNION ALL\n".join(boundaries)
    return ("WITH " + ",\n".join(ctes) + "\n" + body
            + "\nORDER BY _commit_epoch, repo, path, _change_type")
