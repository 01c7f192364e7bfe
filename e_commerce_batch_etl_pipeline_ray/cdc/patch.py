"""Partial-column (patch) CDC merge — CELL-grain last-writer-wins.

Real change streams are not always full-row images: MongoDB/DynamoDB CDC and
Debezium's MongoDB connector emit *patch* events naming only the columns the
write touched, and Cassandra resolves writes per-cell by timestamp. This
module upgrades the engine's row-LWW upsert (cdc/engine.py) to cell-LWW so
such streams replay correctly — a column set by an early full image must
survive a later patch that touched a different column.

Event contract (event schema = key + lsn + op + cols + data columns):
  op='I'            full row image: EVERY data column is set
                    (column absent from the epoch's schema => set to NULL)
  op='U', cols NULL full row image (Debezium default update)
  op='U', cols='a,b' patch: ONLY the named columns are set; any values the
                    event carries in OTHER columns are ignored
  op='D'            tombstone: kills every cell with lsn <= the delete's lsn

Final state per key (what read() returns):
  del_lsn = max lsn over D events        (-1 if none)
  alive   iff some I/U event has lsn > del_lsn
  lsn     = max lsn over I/U events (== max over the post-delete survivors
            whenever the row is alive)
  cell c  = value of the max-lsn I/U event with lsn > del_lsn that SETS c
            (NULL when no such event — including "set to NULL explicitly")

The state row is a per-key CRDT: (del_lsn, row lsn, and per data column c a
(value, _lsn_c) pair). Merging two states is pointwise max / cell-LWW —
associative, commutative, idempotent — so ONE kernel (combine_patch) serves
as the within-block combiner, the cross-block reduce inside merge-apply, and
the prior-state merge; any epoch slicing of the same events yields the
bit-identical lake, and duplicate delivery / epoch re-runs are no-ops.
As in the row-LWW engine, an lsn collision between two DIFFERENT payloads is
undefined (the binlog contract: equal lsn => byte-identical duplicate).

Pipeline shape (identical to cdc/engine.py — the Ray Data idiom):
  events -> normalize to state rows + within-block cell-LWW combine
            [map_batches, Arrow]
         -> hash shuffle on hash(repo,path) % P [groupby]
         -> PatchMergeApply actor pool: cell-LWW against the prior epoch's
            partition file, tombstone application, sorted compacted write
         -> atomic epoch-dir promote + manifest commit (reuses cdc/lake.py,
            so exactly-once, resume, carry-forward and vacuum all behave
            exactly like the main engine's lake).

Schema evolution: a new data column appearing in a later epoch adds a
(value, _lsn_c) pair; prior state is unified with value=NULL / _lsn_c=-1
(never set) — the additive-column contract of the main engine extended to
cell grain.

Reference lineage: generalizes the same keyed-dedup business rule as
cdc/engine.py (dropDuplicates on the business key, src/transform.py:73-87)
to column-level freshness; the reference itself always ships full rows, so
this operator is part of the beyond-reference CDC surface the brief asks
for.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import hash_partition_ids

KEY = ["repo", "path"]
_PID = "_pid"
_NON_CELL = {"op", "cols", "lsn", *KEY}
_INTERNAL = {"lsn", "_del_lsn", "_deleted", _PID}


def cell_columns(state_schema: pa.Schema) -> list[str]:
    """Data (cell) column names of a state schema, in schema order."""
    return [f.name for f in state_schema
            if f.name not in _INTERNAL and f.name not in KEY
            and not f.name.startswith("_lsn_")]


def patch_state_schema(event_schema: pa.Schema,
                       prev_state: pa.Schema | None) -> pa.Schema:
    """State layout: key, lsn, _del_lsn, then (c, _lsn_c) per data column —
    additively unified with the previous epoch's state (new columns appear,
    none vanish), metadata-stripped like engine._data_schema."""
    data = pa.schema([pa.field(f.name, f.type) for f in event_schema
                      if f.name not in _NON_CELL])
    if prev_state is not None:
        prev_data = pa.schema([pa.field(c, prev_state.field(c).type)
                               for c in cell_columns(prev_state)])
        data = pa.unify_schemas([prev_data, data],
                                promote_options="permissive")
    fields = [pa.field(k, pa.string()) for k in KEY]
    fields += [pa.field("lsn", pa.int64()), pa.field("_del_lsn", pa.int64())]
    for f in data:
        fields.append(pa.field(f.name, f.type))
        fields.append(pa.field(f"_lsn_{f.name}", pa.int64()))
    return pa.schema(fields)


def combine_patch(t: pa.Table, cells: list[str]) -> pa.Table:
    """Vectorized cell-LWW reduce to one state row per key.

    One Arrow key sort + numpy segment reductions: row lsn / del_lsn are
    ``maximum.reduceat`` over group starts; each cell's winner is the last
    row of a ``lexsort((cell_lsn, gid))`` segment — O(cells · n log n),
    no per-key Python. Input and output share the state layout, so the
    kernel composes with itself (associative reduce)."""
    if t.num_rows == 0:
        return t
    order = pc.sort_indices(t, sort_keys=[(k, "ascending") for k in KEY])
    t = t.take(order)
    n = t.num_rows
    bound = np.zeros(n, dtype=bool)
    bound[0] = True
    for k in KEY:
        col = t[k].combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(col.slice(1), col.slice(0, n - 1)), False)
        vd = pc.is_valid(col)
        neq = pc.or_(neq, pc.xor(vd.slice(1), vd.slice(0, n - 1)))
        bound[1:] |= neq.to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(bound)
    ends = np.concatenate([starts[1:], [n]]) - 1
    gid = np.cumsum(bound) - 1

    arrays: dict[str, pa.Array] = {}
    for k in KEY:
        arrays[k] = t[k].take(starts)
    lsn = t["lsn"].to_numpy()
    dlsn = t["_del_lsn"].to_numpy()
    arrays["lsn"] = pa.array(np.maximum.reduceat(lsn, starts), pa.int64())
    arrays["_del_lsn"] = pa.array(np.maximum.reduceat(dlsn, starts),
                                  pa.int64())
    for c in cells:
        lc = t[f"_lsn_{c}"].to_numpy()
        win = np.lexsort((lc, gid))[ends]
        arrays[c] = t[c].take(win)
        arrays[f"_lsn_{c}"] = pa.array(lc[win], pa.int64())
    return pa.table(arrays)


def apply_tombstones(t: pa.Table, cells: list[str]) -> pa.Table:
    """Physically null every cell at-or-below the key's delete lsn and
    append ``_deleted`` (no surviving cell <=> row lsn <= del_lsn). Safe to
    apply eagerly at every compaction: del_lsn stays in the state, so a
    later-arriving older cell is re-killed by the next merge."""
    dl = t["_del_lsn"]
    for c in cells:
        lc = t[f"_lsn_{c}"]
        dead = pc.less_equal(lc, dl)
        i = t.schema.get_field_index(c)
        typ = t.schema.field(c).type
        t = t.set_column(i, t.schema.field(c),
                         pc.if_else(dead, pa.scalar(None, type=typ), t[c]))
        j = t.schema.get_field_index(f"_lsn_{c}")
        t = t.set_column(j, t.schema.field(f"_lsn_{c}"),
                         pc.if_else(dead, pa.scalar(-1, type=pa.int64()), lc))
    deleted = pc.less_equal(t["lsn"], dl)
    if "_deleted" in t.column_names:
        t = t.drop_columns(["_deleted"])
    return t.append_column("_deleted", deleted)


def _normalize_patch_factory(schema: pa.Schema, num_partitions: int):
    """Batch fn: event rows -> state rows (set-mask per cell from op/cols),
    within-block cell-LWW combine, partition-id assignment."""
    cells = cell_columns(schema)

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table().append_column(
                _PID, pa.array([], pa.int32()))
        op = t["op"]
        is_d = pc.equal(op, "D")
        is_u = pc.equal(op, "U")
        cols_c = (t["cols"] if "cols" in t.column_names
                  else pa.nulls(t.num_rows, pa.string()))
        # last arg of binary_join_element_wise is the SEPARATOR -> ",cols,"
        padded = pc.binary_join_element_wise(
            pa.scalar(","), cols_c, pa.scalar(","), pa.scalar(""))  # NULL stays NULL
        set_all = pc.or_(pc.equal(op, "I"),
                         pc.and_(is_u, pc.is_null(cols_c)))
        ev_lsn = t["lsn"].cast(pa.int64())
        neg1 = pa.scalar(-1, type=pa.int64())
        arrays: dict[str, object] = {k: t[k] for k in KEY}
        arrays["lsn"] = pc.if_else(is_d, neg1, ev_lsn)
        arrays["_del_lsn"] = pc.if_else(is_d, ev_lsn, neg1)
        for c in cells:
            typ = schema.field(c).type
            sets = pc.or_(set_all, pc.and_(
                is_u, pc.fill_null(pc.match_substring(padded, f",{c},"),
                                   False)))
            if c in t.column_names:
                src = t[c]
                if src.type != typ:
                    src = src.cast(typ)
            else:
                src = pa.nulls(t.num_rows, typ)
            arrays[c] = pc.if_else(sets, src, pa.scalar(None, type=typ))
            arrays[f"_lsn_{c}"] = pc.if_else(sets, ev_lsn, neg1)
        out = pa.table(arrays).cast(schema)
        out = combine_patch(out, cells)
        pid = hash_partition_ids(out, KEY, num_partitions)
        return out.append_column(_PID, pa.array(pid, pa.int32()))
    return _fn


def _unify_state(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Pin a prior state file to the evolved state schema: new value
    columns backfill NULL, their _lsn_* pair backfills -1 (never set)."""
    cols = []
    for fld in schema:
        if fld.name in t.column_names:
            c = t[fld.name]
            cols.append(c.cast(fld.type) if c.type != fld.type else c)
        elif fld.name.startswith("_lsn_") or fld.name == "_del_lsn":
            cols.append(pa.array(np.full(t.num_rows, -1, np.int64)))
        else:
            cols.append(pa.nulls(t.num_rows, fld.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _part_files(rec: dict | None) -> list[str]:
    """A partition's full state file list: compacted base + LSM deltas."""
    if not rec:
        return []
    return ([rec["file"]] if rec.get("file") else []) \
        + list(rec.get("deltas", []))


def merge_state_files(files: list[str], schema: pa.Schema,
                      cells: list[str]) -> pa.Table:
    """One partition's cell-LWW state from base + delta files: unify each
    to the newest schema, CRDT-merge (combine_patch is associative +
    commutative + idempotent, so delta order is irrelevant), re-apply
    tombstones. Idempotent on an already-compacted single file."""
    if not files:
        return apply_tombstones(schema.empty_table(), cells)
    tables = [_unify_state(pq.read_table(f), schema) for f in files]
    t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
    return apply_tombstones(combine_patch(t, cells), cells)


class PatchMergeApply:
    """Merge-apply actor (map_groups over the hash shuffle). Two modes,
    selected per epoch like engine.MergeApply (same lineage contract so
    the manifest commit is shared):

      compact — cell-LWW the epoch's combined delta against the prior
                base + accumulated deltas, write one sorted state file
                (O(state) write for the touched partition);
      delta   — write ONLY the epoch's combined delta (O(epoch) write,
                the LSM path): because the state row is a CRDT, readers
                merge base+deltas in ANY order and get the identical
                table, so no removal log or ordering metadata is needed.
    """

    def __init__(self, lake_dir: str, epoch: int, schema_b64: str,
                 prev_partitions: dict[str, dict], mode: str = "compact",
                 key_bloom_fpp: float | None = None):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema = lake.schema_from_b64(schema_b64)
        self.cells = cell_columns(self.schema)
        self.prev_partitions = prev_partitions
        self.mode = mode
        self.key_bloom_fpp = key_bloom_fpp
        self.tmp_dir = lake.epoch_dir(lake_dir, epoch, tmp=True)
        os.makedirs(self.tmp_dir, exist_ok=True)

    _LINEAGE_SCHEMA = pa.schema([
        ("partition", pa.int32()), ("file", pa.string()),
        ("lsn_watermark", pa.int64()), ("rows_applied", pa.int64()),
        ("rows_total", pa.int64()), ("bytes_written", pa.int64())])

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self._LINEAGE_SCHEMA.empty_table()
        pid = group[_PID][0].as_py()
        delta = _unify_state(group.drop_columns([_PID]), self.schema)
        rows_applied = delta.num_rows
        if self.mode == "compact":
            rec = self.prev_partitions.get(str(pid))
            prior_files = _part_files(rec)
            if prior_files:
                priors = [_unify_state(pq.read_table(f), self.schema)
                          for f in prior_files]
                delta = pa.concat_tables([*priors, delta])
        merged = combine_patch(delta, self.cells)
        # eager tombstoning is safe even on deltas: _del_lsn stays in the
        # state, so base cells at-or-below it are re-killed at read merge
        merged = apply_tombstones(merged, self.cells)
        fname = (f"part-{pid:05d}.parquet" if self.mode == "compact"
                 else f"part-{pid:05d}.delta-{self.epoch:04d}.parquet")
        tmp_path = os.path.join(self.tmp_dir, fname)
        in_progress = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(merged, in_progress)
        os.replace(in_progress, tmp_path)
        if self.key_bloom_fpp:
            from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
            keybloom.write_sidecar(tmp_path, merged, self.key_bloom_fpp)
        watermark = max(pc.max(merged["lsn"]).as_py() or -1,
                        pc.max(merged["_del_lsn"]).as_py() or -1)
        final_path = os.path.join(
            lake.epoch_dir(self.lake_dir, self.epoch), fname)
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([final_path], pa.string()),
            "lsn_watermark": pa.array([watermark], pa.int64()),
            "rows_applied": pa.array([rows_applied], pa.int64()),
            "rows_total": pa.array([merged.num_rows], pa.int64()),
            "bytes_written": pa.array([os.path.getsize(tmp_path)],
                                      pa.int64()),
        })


@dataclass
class PatchCDCConfig:
    lake_dir: str
    num_partitions: int = 16
    merge_concurrency: int = 4
    # LSM write-amplification control, same contract as CDCConfig: with
    # compact_interval=K, K-1 of every K epochs write O(epoch) delta files
    # and every K-th epoch folds base+deltas into a fresh sorted base.
    # The cell-state CRDT makes this trivially correct: readers merge
    # base+deltas in any order (combine_patch) and re-apply tombstones.
    compact_interval: int = 1
    # per-file key Bloom sidecars (cdc/keybloom.py, same contract as
    # CDCConfig.key_bloom_fpp): point_read skips files whose bloom proves
    # no needle key present. None disables.
    key_bloom_fpp: float | None = 0.01


class PatchCDCEngine:
    """The cell-LWW sibling of cdc/engine.CDCEngine, sharing its lake
    protocol (atomic epoch promote + manifest chain => exactly-once,
    resume, carry-forward) and its LSM delta mode (compact_interval) —
    without delta mode a touched partition's FULL state is rewritten
    every epoch, O(state) write amplification that does not hold at
    100 TB."""

    def __init__(self, config: PatchCDCConfig):
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
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError("constant partition modulus required")
        prev_schema = (lake.schema_from_b64(prev_manifest["schema"])
                       if prev_manifest else None)
        schema = patch_state_schema(events.schema().base_schema, prev_schema)
        schema_b64 = lake.schema_to_b64(schema)
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        normalized = events.map_batches(
            _normalize_patch_factory(schema, cfg.num_partitions),
            batch_format="pyarrow")
        from e_commerce_batch_etl_pipeline_ray.cdc.engine import (
            merge_pool_size,
        )
        conc = merge_pool_size(cfg.merge_concurrency)
        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        lineage_ds = normalized.groupby(_PID).map_groups(
            PatchMergeApply, batch_format="pyarrow",
            fn_constructor_args=(cfg.lake_dir, epoch, schema_b64, prev_parts,
                                 mode, cfg.key_bloom_fpp),
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
        manifest = lake.commit_manifest(
            cfg.lake_dir, epoch, partitions, schema, prev_manifest,
            metrics={"rows_applied": sum(r["rows_applied"]
                                         for r in partitions.values()),
                     "partitions_touched": len(partitions)},
            num_partitions=cfg.num_partitions)
        return manifest

    def read(self, epoch: int | None = None) -> ray.data.Dataset:
        """Live rows (key, lsn, data columns) as of ``epoch`` (default:
        latest). Compacted partitions are tombstone-filtered at write time
        — a pure pruned read + boolean filter, no merge work; partitions
        carrying LSM deltas CRDT-merge base+deltas, one Ray task per
        partition (co-partitioned by construction, no shuffle)."""
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError("no committed epoch")
        manifest = lake.read_manifest(self.cfg.lake_dir, epoch)
        schema = lake.schema_from_b64(manifest["schema"])
        cells = cell_columns(schema)
        out_cols = [*KEY, "lsn", *cells]
        compacted, delta_items = [], []
        for pid, rec in manifest["partitions"].items():
            if rec.get("deltas"):
                delta_items.append({"pid": int(pid),
                                    "files": json.dumps(_part_files(rec))})
            elif rec.get("file"):
                compacted.append(rec["file"])
        pieces = []
        if compacted:
            read_schema = pa.schema(
                [schema.field(c) for c in out_cols]
                + [pa.field("_deleted", pa.bool_())])
            ds = ray.data.read_parquet(compacted, schema=read_schema,
                                       columns=out_cols + ["_deleted"])

            def _live(t: pa.Table) -> pa.Table:
                t = t.filter(pc.invert(pc.fill_null(t["_deleted"], False)))
                return t.drop_columns(["_deleted"])
            pieces.append(ds.map_batches(_live, batch_format="pyarrow",
                                         zero_copy_batch=True))
        if delta_items:
            schema_b64 = lake.schema_to_b64(schema)

            def _merge_live(batch: pa.Table) -> pa.Table:
                sch = lake.schema_from_b64(schema_b64)
                cls = cell_columns(sch)
                out = []
                for row in batch.to_pylist():
                    t = merge_state_files(json.loads(row["files"]), sch, cls)
                    t = t.filter(pc.invert(t["_deleted"]))
                    out.append(t.select([*KEY, "lsn", *cls]))
                return pa.concat_tables(out) if len(out) > 1 else out[0]
            pieces.append(ray.data.from_items(delta_items).map_batches(
                _merge_live, batch_format="pyarrow", batch_size=1))
        if not pieces:
            return ray.data.from_arrow(pa.schema(
                [schema.field(c) for c in out_cols]).empty_table())
        return pieces[0] if len(pieces) == 1 else pieces[0].union(pieces[1])

    def point_read(self, keys: list[tuple[str, str]],
                   epoch: int | None = None) -> pa.Table:
        """Pruned exact-key lookup on the patch lake: hash-route each key
        to its partition (constant modulus from the manifest) and read
        ONLY those partitions' files — the state is one row per key, so
        this is a filter, not a merge. Driver-side result (point lookups
        are small by contract)."""
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError("no committed epoch")
        manifest = lake.read_manifest(self.cfg.lake_dir, epoch)
        num_partitions = manifest.get("num_partitions",
                                      self.cfg.num_partitions)
        schema = lake.schema_from_b64(manifest["schema"])
        cells = cell_columns(schema)
        key_t = pa.table({"repo": pa.array([k[0] for k in keys]),
                          "path": pa.array([k[1] for k in keys])})
        pids = set(hash_partition_ids(key_t, KEY, num_partitions).tolist())
        groups = [_part_files(manifest["partitions"].get(str(p)))
                  for p in pids]
        groups = [g for g in groups if g]
        out_cols = [*KEY, "lsn", *cells]
        if not groups:
            return pa.schema([schema.field(c)
                              for c in out_cols]).empty_table()
        needles = pa.array([f"{r}\x00{p}" for r, p in keys], pa.string())
        parts = []
        from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
        for files in groups:
            # bloom sidecars first: a pruned file provably holds NO needle
            # row — including tombstones (they carry the key too), so the
            # CRDT merge below never loses a kill by skipping it
            files = keybloom.prune_files(
                files, [k[0] for k in keys], [k[1] for k in keys])
            if not files:
                continue
            # filter to the needles on each file's OWN columns first
            # (pre-evolution files lack newer cells), keep tombstone rows
            # — a delta's tombstone must kill base rows at the merge —
            # then CRDT-merge the partition's base+deltas and drop dead
            tabs = []
            for f in files:
                t = pq.read_table(f)
                joined = pc.binary_join_element_wise(t["repo"], t["path"],
                                                     pa.scalar("\x00"))
                t = t.filter(pc.is_in(joined, value_set=needles))
                tabs.append(_unify_state(t, schema))
            merged = apply_tombstones(
                combine_patch(pa.concat_tables(tabs), cells), cells)
            merged = merged.filter(pc.invert(merged["_deleted"]))
            parts.append(merged.select(out_cols))
        if not parts:
            return pa.schema([schema.field(c)
                              for c in out_cols]).empty_table()
        return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# deterministic patch binlog (fixture generator)

PATCH_CHOICES = [None, "commit", "lang", "content,content_sha256"]


def gen_patch_epoch_table(spec, epoch: int) -> pa.Table:
    """The standard binlog epoch (cdc/binlog.py — hot-key skew, duplicate
    delivery, out-of-order, schema evolution) with a ``cols`` column:
    every U event is one of {full image, patch commit, patch lang, patch
    content+sha} chosen by splitmix64 of its lsn — duplicates replay the
    SAME choice, so redelivery stays byte-identical. Patch rows keep the
    generator's values in their UNSET columns on purpose: both the engine
    and the SQL oracle must ignore them."""
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    from e_commerce_batch_etl_pipeline_ray.sources.generators import (
        rng_streams,
    )
    t = binlog.gen_epoch_table(spec, epoch)
    lsn = t["lsn"].to_numpy().astype(np.uint64)
    variant = (rng_streams(lsn, spec.seed, 230) % np.uint64(4)).astype(int)
    op = np.asarray(t["op"].to_pylist(), dtype=object)
    cols = np.asarray(PATCH_CHOICES, dtype=object)[variant]
    cols = np.where(op == "U", cols, None)
    return t.append_column("cols", pa.array(cols.tolist(), pa.string()))


def patch_oracle_sql(files: list[str], cells: list[str]) -> str:
    """DuckDB replay of the cell-LWW semantics over the raw binlog files —
    the q130 oracle. NULL-safe winner via arg_max over a one-field struct
    (arg_max skips NULL args; a struct wrapping NULL is non-NULL)."""
    flist = ", ".join(f"'{f}'" for f in files)
    sets = ("e.op = 'I' OR e.cols IS NULL OR "
            "contains(',' || e.cols || ',', ',{c},')")
    cell_sql = ",\n  ".join(
        ("(arg_max({'v': e." + c + "}, e.lsn) FILTER (WHERE "
         + sets.format(c=c) + ")).v AS " + c) for c in cells)
    return f"""
WITH ev AS (
  SELECT * FROM read_parquet([{flist}], union_by_name=true)
),
d AS (
  SELECT repo, path,
         coalesce(max(lsn) FILTER (WHERE op = 'D'), -1) AS del_lsn
  FROM ev GROUP BY repo, path
)
SELECT e.repo, e.path, max(e.lsn) AS lsn,
  {cell_sql}
FROM ev e JOIN d USING (repo, path)
WHERE e.op <> 'D' AND e.lsn > d.del_lsn
GROUP BY e.repo, e.path
ORDER BY repo, path
"""
