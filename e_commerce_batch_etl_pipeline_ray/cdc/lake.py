"""Parquet lake sink with per-epoch manifests — the exactly-once commit
protocol (SURVEY.md §4 'Exactly-once sink'; Delta-Lake-style manifest commit,
cf. PAPERS.md).

Layout under ``lake_dir``:

    epoch=000N/part-PPPPP.parquet   committed partition files for epoch N
    .tmp-epoch=000N/...             in-flight writes (crash debris; cleaned)
    manifests/epoch-000N.json       atomic commit record (os.replace)

A partition untouched in epoch N carries FORWARD its file reference from the
last epoch that wrote it — the manifest maps partition -> file, so readers
never scan directories. Readers only see manifested epochs; a crash between
data write and manifest write leaves only ignorable tmp/orphan files, and
re-running the epoch is idempotent (same deterministic inputs -> same file
contents, manifest replaced atomically).

The committed table keeps TOMBSTONES (op='D' rows with null content and the
delete's LSN) so a stale pre-delete event arriving in a later epoch cannot
resurrect a deleted key (LWW needs the delete's LSN). ``read_lake`` filters
them out.

Manifest record (FIXTURES.md F7): per partition
``{file, lsn_watermark, rows_applied, rows_total, bytes_written}`` plus
epoch-level ``lsn_watermark`` and the evolved Arrow schema (serialized) for
schema-evolution-safe reads.
"""

from __future__ import annotations

import base64
import json
import os
import shutil

import pyarrow as pa

import ray.data

MANIFEST_DIR = "manifests"
# dropped from the user-facing read; lsn is kept (it is the row's version /
# lineage metadata, like a _commit_version column)
INTERNAL_COLS = ("_deleted",)


class CommitConflictError(RuntimeError):
    """Another writer committed this epoch first. The manifest chain is the
    lake's commit log; epoch numbers are claimed with an atomic
    CREATE-EXCLUSIVE (hardlink CAS), so two writers racing the same epoch
    can never silently overwrite each other — the loser gets this error,
    re-reads the new head, and retries at the next epoch (metadata ops
    retry automatically; ingest re-plans via ``CDCConfig.commit_retries``).
    This is the mutual-exclusion contract a Delta log store provides
    (put-if-absent), expressed on a filesystem."""


def _commit_json(path: str, manifest: dict, overwrite: bool = False) -> None:
    """Atomic manifest write. ``overwrite=False`` (final epoch commits) is
    a put-if-absent CAS: hardlink from a writer-unique tmp fails with
    FileExistsError if the epoch was already claimed — EXCEPT when the
    existing bytes are identical (an idempotent crash-replay of the same
    commit), which is a no-op success. ``overwrite=True`` keeps the old
    os.replace semantics (staged prepares: re-running a crashed
    transaction prepare legitimately rewrites its own invisible .staged
    file with fresh timings)."""
    import uuid

    payload = json.dumps(manifest)
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(payload)
    if overwrite:
        os.replace(tmp, path)
        return
    try:
        os.link(tmp, path)
    except FileExistsError:
        with open(path) as f:
            if f.read() == payload:
                return
        raise CommitConflictError(
            f"epoch manifest {path} was committed by another writer "
            f"(put-if-absent lost)") from None
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


def _retry_conflicts(fn, *args, attempts: int = 8):
    """Run a metadata-only committer, retrying on a lost CAS. Each retry
    re-reads the head and re-validates from scratch (the ops are O(KB)
    metadata commits), so a surviving retry is semantically the op applied
    AFTER the competing commit — and a retry that now fails validation
    (e.g. the column was dropped by the winner) surfaces the REAL conflict
    as that op's own error."""
    for _ in range(attempts - 1):
        try:
            return fn(*args)
        except CommitConflictError:
            continue
    return fn(*args)


def _manifest_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, MANIFEST_DIR, f"epoch-{epoch:04d}.json")


def epoch_dir(lake_dir: str, epoch: int, tmp: bool = False) -> str:
    name = f"epoch={epoch:04d}"
    return os.path.join(lake_dir, f".tmp-{name}" if tmp else name)


def last_committed_epoch(lake_dir: str) -> int | None:
    d = os.path.join(lake_dir, MANIFEST_DIR)
    if not os.path.isdir(d):
        return None
    epochs = []
    for f in os.listdir(d):
        if f.startswith("epoch-") and f.endswith(".json"):
            epochs.append(int(f[len("epoch-"):-len(".json")]))
    return max(epochs) if epochs else None


def _read_manifest_raw(lake_dir: str, epoch: int) -> dict:
    with open(_manifest_path(lake_dir, epoch)) as f:
        return json.load(f)


def read_manifest(lake_dir: str, epoch: int) -> dict:
    """The LOGICAL manifest at ``epoch`` — always the full partition map.

    Manifest delta-log (``CDCConfig.manifest_log``; the Delta _delta_log +
    checkpoint shape): when enabled, most commits serialize ONLY the
    partitions they touched (``"delta_log": true``), so commit bytes are
    O(touched) instead of O(all partitions) — at 100k partitions that is
    KBs per epoch instead of tens of MB. This reader folds the chain back
    to the nearest FULL manifest (a checkpoint every ``manifest_log``
    epochs, or any metadata op / restore / clone, which always write
    full), newest record per partition winning; the returned dict is
    indistinguishable from a v1 manifest (``delta_log`` stripped), so
    every consumer — readers, ops, vacuum, resume — is unaffected."""
    m = _read_manifest_raw(lake_dir, epoch)
    if not m.get("delta_log"):
        return m
    chain = [m]
    e = epoch - 1
    while True:
        if e < 0 or not os.path.exists(_manifest_path(lake_dir, e)):
            raise FileNotFoundError(
                f"manifest chain for epoch {epoch} broken at epoch {e} — "
                f"a delta-log manifest needs its checkpoint (vacuum "
                f"materializes the oldest kept manifest; don't delete "
                f"manifests by hand)")
        prev = _read_manifest_raw(lake_dir, e)
        chain.append(prev)
        if not prev.get("delta_log"):
            break
        e -= 1
    parts: dict[str, dict] = {}
    for mm in reversed(chain):
        parts.update(mm["partitions"])
    out = dict(m)
    out["partitions"] = parts
    out.pop("delta_log")
    return out


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def commit_manifest(lake_dir: str, epoch: int, partitions: dict[int, dict],
                    schema: pa.Schema, prev: dict | None,
                    metrics: dict | None = None,
                    staged: bool = False,
                    num_partitions: int | None = None,
                    snapshot_lsn: int | None = None,
                    extra: dict | None = None) -> dict:
    """Build epoch manifest (carrying forward untouched partitions from
    ``prev``) and commit it atomically: tmp file + os.replace.
    ``metrics``: optional epoch-level observability record (events_in,
    rows_applied, elapsed_s, ...) persisted alongside the lineage.

    ``staged=True`` writes to ``<manifest>.staged`` instead — INVISIBLE to
    readers/resume (they only see ``.json``) until
    ``promote_staged_manifest`` renames it. This is the prepare phase of
    the cross-table transactional commit (cdc/multi.py)."""
    part_map: dict[str, dict] = dict(prev["partitions"]) if prev else {}
    for pid, rec in partitions.items():
        part_map[str(pid)] = rec
    watermark = max(
        [r.get("lsn_watermark", -1) for r in part_map.values()] + [-1])
    manifest = {
        "epoch": epoch,
        "lsn_watermark": watermark,
        "schema": schema_to_b64(schema),
        "partitions": part_map,
        "committed": True,
    }
    # the key->partition hash modulus: readers need it to route point
    # lookups straight to one partition (point_read). Must be constant for
    # a lake's lifetime (resume + carry-forward both assume it).
    if num_partitions is not None:
        manifest["num_partitions"] = num_partitions
    elif prev and "num_partitions" in prev:
        manifest["num_partitions"] = prev["num_partitions"]
    # snapshot-bootstrap boundary (engine.bootstrap): events at or below
    # this LSN are already folded into the snapshot AND the snapshot holds
    # no tombstones for keys deleted before it — every later epoch must
    # drop them, so the marker rides the whole manifest chain
    if snapshot_lsn is not None:
        manifest["snapshot_lsn"] = snapshot_lsn
    elif prev and "snapshot_lsn" in prev:
        manifest["snapshot_lsn"] = prev["snapshot_lsn"]
    # dead-letter-queue lineage (cdc/dlq.py) rides the WHOLE manifest
    # chain like snapshot_lsn — every commit path (ingest, optimize,
    # zorder, merge, delete_where) must carry it or vacuum reclaims the
    # quarantined rows; an ingest that adds rows passes the accumulated
    # lists via ``extra`` (explicit extra wins over carry-forward).
    # dropped_columns (lake.drop_column) rides the chain the same way —
    # every commit path must carry it or a later ingest would resurrect
    # the retired column from the incoming events
    # identity (engine CDCConfig.identity spec) and manifest_log (the
    # delta-log checkpoint interval) ride the chain the same way —
    # identity uniqueness and log reconstruction depend on them
    for carry in ("dlq_files", "dlq_rows", "dropped_columns", "identity",
                  "manifest_log"):
        if (extra is None or carry not in extra) and prev and carry in prev:
            manifest[carry] = prev[carry]
    if metrics:
        manifest["metrics"] = metrics
    # extra top-level keys (e.g. the index view's removal_log) land in
    # the SAME atomic write — a second rewrite would open a crash window
    if extra:
        manifest.update(extra)
    os.makedirs(os.path.join(lake_dir, MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(lake_dir, epoch)
    if staged:
        path += ".staged"
    # manifest delta-log: when the chain carries manifest_log=K, serialize
    # only the TOUCHED partitions (O(touched) commit bytes) except every
    # K-th epoch, which writes the full fold as a checkpoint bounding
    # read_manifest's reconstruction walk. The returned dict is always the
    # full logical manifest.
    k = manifest.get("manifest_log")
    serial = manifest
    if k and epoch % int(k) != 0:
        serial = dict(manifest)
        serial["partitions"] = {str(p): r for p, r in partitions.items()}
        serial["delta_log"] = True
    # final commits are put-if-absent (CommitConflictError on a lost race);
    # staged prepares overwrite their own invisible file (crash re-prepare)
    _commit_json(path, serial, overwrite=staged)
    return manifest


def promote_staged_manifest(lake_dir: str, epoch: int) -> None:
    """Roll a staged manifest forward to final (idempotent: a second call
    after the rename — e.g. crash-recovery replay — is a no-op when the
    final manifest already exists)."""
    path = _manifest_path(lake_dir, epoch)
    staged = path + ".staged"
    if os.path.exists(staged):
        os.replace(staged, path)
    elif not os.path.exists(path):
        raise FileNotFoundError(
            f"no staged or final manifest for epoch {epoch} in {lake_dir}")


def clean_staged(lake_dir: str) -> int:
    """Remove staged manifests (aborted transaction prepares). Call ONLY
    after every committed transaction has been rolled forward
    (MultiTableCDC.recover does this ordering)."""
    d = os.path.join(lake_dir, MANIFEST_DIR)
    n = 0
    if os.path.isdir(d):
        for f in os.listdir(d):
            if f.endswith(".json.staged"):
                os.remove(os.path.join(d, f))
                n += 1
    return n


def promote_epoch_dir(lake_dir: str, epoch: int) -> None:
    """Atomically promote .tmp-epoch=N -> epoch=N (removing any debris from
    a previous crashed attempt)."""
    src, dst = epoch_dir(lake_dir, epoch, tmp=True), epoch_dir(lake_dir, epoch)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    if os.path.isdir(src):
        os.replace(src, dst)


def clean_uncommitted(lake_dir: str) -> None:
    """Remove crash debris: tmp dirs and epoch dirs newer than the last
    committed manifest."""
    last = last_committed_epoch(lake_dir)
    if not os.path.isdir(lake_dir):
        return
    for name in os.listdir(lake_dir):
        full = os.path.join(lake_dir, name)
        if name.startswith(".tmp-epoch="):
            shutil.rmtree(full)
        elif name.startswith("epoch="):
            ep = int(name.split("=")[1])
            if last is None or ep > last:
                shutil.rmtree(full)


def manifest_files(manifest: dict) -> list[str]:
    return sorted({rec["file"] for rec in manifest["partitions"].values()
                   if rec.get("file")})


def col_stats(t: pa.Table, cols) -> dict:
    """Exact per-file min/max of ``cols`` (nulls ignored; an all-null or
    absent column records no bound -> never prunable on it). JSON-scalar
    values only. Written into manifest partition records by compacting
    writers (ingest compact mode, zorder) and consumed by
    zorder.plan_range_scan for driver-side file pruning."""
    import pyarrow.compute as pc
    stats = {}
    for c in cols:
        if c not in t.column_names:
            continue
        mm = pc.min_max(t[c])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is not None:
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            stats[c] = [lo, hi]
    return stats


def live_meta(t: pa.Table, cols) -> dict:
    """LIVE-row metadata for a compacted partition file (tombstones
    excluded): exact count + per-column min/max, embedded in the same
    ``stats`` JSON channel the writers already ship (underscore keys so
    zorder's per-column pruning lookups never see them). This is what
    makes ``table_stats`` a metadata-only answer — Delta's numRecords /
    Iceberg's snapshot-summary shape."""
    import pyarrow.compute as pc
    live = t.filter(pc.equal(t["_deleted"], False)) \
        if "_deleted" in t.column_names else t
    return {"_live_rows": live.num_rows, "_live": col_stats(live, cols)}


def table_stats(lake_dir: str, epoch: int | None = None,
                cols: tuple = ("lsn",)) -> dict:
    """COUNT(*) + MIN/MAX of the live table answered from MANIFEST
    metadata — no data file is opened for any compacted partition whose
    record carries ``live_rows``/``live_stats`` (every compact write
    records them). Partitions that can't be answered from metadata
    (uncompacted LSM delta chains, files rewritten by purge, legacy
    manifests) fall back to a pruned read of ONLY those partitions'
    chains, LWW-merged per partition — at a 10k-partition lake with a
    delta interval of K, that is at most the partitions touched since the
    last compaction, never the whole lake.

    ``cols`` must be within the lake's ``CDCConfig.stats_cols`` (default
    ``("lsn",)``): a column the writers never tracked would be
    indistinguishable from an all-null column in the metadata. Returns
    ``{"rows", "min": {col: v}, "max": {col: v}, "partitions_total",
    "partitions_from_metadata", "partitions_read"}``.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
    )

    if epoch is None:
        epoch = last_committed_epoch(lake_dir)
    if epoch is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = read_manifest(lake_dir, epoch)
    schema_b64 = manifest["schema"]
    # a renamed column's stats were recorded under its name AT WRITE TIME —
    # look a requested column up under its historical aliases too
    # (newest-first), same resolution rule as the data projection
    probe = probe_names(schema_from_b64(schema_b64), cols)

    rows = 0
    lo: dict[str, object] = {}
    hi: dict[str, object] = {}

    def _fold(c, a, b):
        lo[c] = a if c not in lo or a < lo[c] else lo[c]
        hi[c] = b if c not in hi or b > hi[c] else hi[c]

    fallback = []
    n_meta = 0
    for pid, rec in manifest["partitions"].items():
        files = (([rec["file"]] if rec.get("file") else [])
                 + list(rec.get("deltas", [])))
        if not files:
            continue
        if not rec.get("deltas") and not rec.get("dv") \
                and rec.get("live_rows") is not None:
            n_meta += 1
            rows += rec["live_rows"]
            for c in cols:
                st = rec.get("live_stats") or {}
                b = next((st[n] for n in probe[c] if n in st), None)
                if b is not None:
                    _fold(c, b[0], b[1])
        else:
            fallback.append({"partition": int(pid),
                             "files": json.dumps(files),
                             "dv": dv_json(rec)})

    if fallback:
        cols_list = list(cols)

        def _summarize(batch: pa.Table) -> pa.Table:
            sch = schema_from_b64(schema_b64)
            out = {"live_rows": [], "stats": []}
            for row in batch.to_pylist():
                files_json = row["files"]
                drec = rec_from_dv_json(row["dv"])
                tables = [_unify_to(apply_dv(pq.read_table(f), f, drec), sch)
                          for f in json.loads(files_json)]
                t = (tables[0] if len(tables) == 1
                     else pa.concat_tables(tables))
                t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                         descending=True)
                live = t.filter(pc.equal(t["_deleted"], False))
                out["live_rows"].append(live.num_rows)
                out["stats"].append(json.dumps(col_stats(live, cols_list)))
            return pa.table({"live_rows": pa.array(out["live_rows"],
                                                   pa.int64()),
                             "stats": pa.array(out["stats"], pa.string())})

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        summary = collect_arrow(
            ray.data.from_items(fallback).map_batches(
                _summarize, batch_format="pyarrow", batch_size=1))
        for r in summary.to_pylist():
            rows += r["live_rows"]
            for c, (a, b) in json.loads(r["stats"]).items():
                _fold(c, a, b)

    return {"rows": rows, "min": lo, "max": hi,
            "partitions_total": len(manifest["partitions"]),
            "partitions_from_metadata": n_meta,
            "partitions_read": len(fallback)}


def field_aliases(fld: pa.Field) -> tuple[str, ...]:
    """Historical names of a renamed column (``rename_column``), carried as
    field metadata INSIDE the manifest schema so every reader / writer that
    projects through the schema sees them with zero extra plumbing — the
    Delta column-mapping idea (logical name decoupled from the physical
    parquet name), with the manifest schema's field metadata as the map."""
    if fld.metadata and b"aliases" in fld.metadata:
        return tuple(a for a in fld.metadata[b"aliases"].decode().split(",")
                     if a)
    return ()


def resolve_source(fld: pa.Field, column_names) -> str | None:
    """Physical column of ``fld`` inside a file/batch with ``column_names``:
    the current name if present, else the NEWEST alias present (aliases are
    ordered oldest-first, and a file written between two renames carries
    the newer of the two old names)."""
    if fld.name in column_names:
        return fld.name
    for a in reversed(field_aliases(fld)):
        if a in column_names:
            return a
    return None


def probe_names(schema: pa.Schema, cols) -> dict[str, tuple[str, ...]]:
    """For each requested column: the physical names it may carry in files
    / stats records written before a ``rename_column`` — current name
    first, then aliases newest-first (the ``resolve_source`` order)."""
    return {c: ((c, *reversed(field_aliases(schema.field(c))))
                if c in schema.names else (c,)) for c in cols}


def field_default(fld: pa.Field):
    """(has_default, value) from ``add_column`` field metadata."""
    meta = fld.metadata or {}
    d = meta.get(b"default")
    if d is None:
        return False, None
    return True, json.loads(d.decode())


def _unify_to(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for fld in schema:
        src = resolve_source(fld, t.column_names)
        if src is not None:
            c = t[src]
            cols.append(c.cast(fld.type) if c.type != fld.type else c)
        else:
            # a column physically ABSENT from the batch backfills with its
            # declared DEFAULT (lake.add_column) — the Delta default-value
            # contract: pre-add files and events not carrying the column
            # read/write the default; an EXPLICIT null in a carried column
            # stays null (present column -> src path above)
            has_d, v = field_default(fld)
            if has_d:
                cols.append(pa.array([v] * t.num_rows, type=fld.type))
            else:
                cols.append(pa.nulls(t.num_rows, type=fld.type))
    return pa.Table.from_arrays(cols, schema=schema)


def read_lake(lake_dir: str, epoch: int | None = None,
              include_tombstones: bool = False,
              columns: list[str] | None = None) -> ray.data.Dataset:
    """Snapshot read of the committed table at ``epoch`` (default: latest).

    Files from different epochs may have different (additive) schemas; old
    files are unified to the manifest schema with null backfill. Partitions
    with uncompacted delta files (compact_interval > 1) are LWW-merged
    base+deltas per partition — one task per partition, shuffle-free (the
    partition is already the co-location unit).
    """
    import json

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if epoch is None:
        epoch = last_committed_epoch(lake_dir)
    if epoch is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = read_manifest(lake_dir, epoch)
    schema = schema_from_b64(manifest["schema"])
    schema_b64 = manifest["schema"]

    def _finish(t: pa.Table) -> pa.Table:
        if not include_tombstones:
            t = t.filter(pc.equal(t["_deleted"], False))
            t = t.drop_columns([c for c in INTERNAL_COLS if c in t.column_names])
        if columns:
            t = t.select(columns)
        return t

    has_deltas = any(rec.get("deltas") or rec.get("dv")
                     for rec in manifest["partitions"].values())
    if not has_deltas:
        files = manifest_files(manifest)
        if not files:
            return ray.data.from_arrow(_finish(schema.empty_table()))
        ds = ray.data.read_parquet(files)

        def _unify(t: pa.Table) -> pa.Table:
            return _finish(_unify_to(t, schema))
        return ds.map_batches(_unify, batch_format="pyarrow",
                              zero_copy_batch=True)

    # delta / deletion-vector path: one merge task per partition
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import combine_keep_extreme
    parts = []
    for pid, rec in manifest["partitions"].items():
        files = ([rec["file"]] if rec.get("file") else []) + list(rec.get("deltas", []))
        if files:
            parts.append({"partition": int(pid), "files": json.dumps(files),
                          "dv": dv_json(rec)})
    if not parts:
        return ray.data.from_arrow(_finish(schema.empty_table()))

    def _merge_partition(batch: pa.Table) -> pa.Table:
        sch = schema_from_b64(schema_b64)
        out = []
        for row in batch.to_pylist():
            files = json.loads(row["files"])
            rec = rec_from_dv_json(row["dv"])
            tables = [_unify_to(apply_dv(pq.read_table(f), f, rec), sch)
                      for f in files]
            t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
            t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                     descending=True)
            out.append(_finish(t))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(parts).map_batches(
        _merge_partition, batch_format="pyarrow", batch_size=1)


def point_read(lake_dir: str, keys: list[tuple[str, str]],
               epoch: int | None = None,
               include_tombstones: bool = False) -> ray.data.Dataset:
    """Pruned exact-key lookup: hash-route each ``(repo, path)`` key to its
    partition and read ONLY those partitions' files — at 10k partitions a
    single-key lookup touches 1/10k of the lake, metadata-decided on the
    driver with zero data scan.

    Two pruning levels:
      1. partition: the lake's stable key hash (manifest ``num_partitions``)
         maps each key to exactly one partition file set;
      2. row group: partition files are key-sorted, so a parquet
         ``repo IN (...) AND path IN (...)`` filter skips row groups by
         min/max stats before decoding any content bytes.
    The coarse (repo-set x path-set) superset is then cut to the exact key
    pairs with one vectorized ``index_in``.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    if epoch is None:
        epoch = last_committed_epoch(lake_dir)
    if epoch is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = read_manifest(lake_dir, epoch)
    schema = schema_from_b64(manifest["schema"])
    schema_b64 = manifest["schema"]
    num_partitions = manifest.get("num_partitions")
    if num_partitions is None:
        raise ValueError(
            "manifest lacks num_partitions (lake written by a pre-point_read "
            "engine version) — re-ingest or use read_lake + filter")

    key_t = pa.table({"repo": pa.array([k[0] for k in keys], pa.string()),
                      "path": pa.array([k[1] for k in keys], pa.string())})
    pids = hash_partition_ids(key_t, ["repo", "path"], num_partitions)

    per_pid: dict[int, list[int]] = {}
    for i, pid in enumerate(pids):
        per_pid.setdefault(int(pid), []).append(i)

    items = []
    for pid, idxs in sorted(per_pid.items()):
        rec = manifest["partitions"].get(str(pid))
        files = ([rec["file"]] if rec and rec.get("file") else []) + \
            (list(rec.get("deltas", [])) if rec else [])
        if not files:
            continue                       # no key ever landed here
        items.append({
            "partition": pid,
            "files": json.dumps(files),
            "dv": dv_json(rec),
            "repos": json.dumps(sorted({keys[i][0] for i in idxs})),
            "paths": json.dumps(sorted({keys[i][1] for i in idxs})),
            "keys": json.dumps(sorted([list(keys[i]) for i in idxs])),
        })

    def _strip_internal(t: pa.Table) -> pa.Table:
        if not include_tombstones:
            t = t.filter(pc.equal(t["_deleted"], False))
            t = t.drop_columns([c for c in INTERNAL_COLS
                                if c in t.column_names])
        return t

    if not items:
        empty = schema.empty_table()
        return ray.data.from_arrow(_strip_internal(empty))

    def _lookup(batch: pa.Table) -> pa.Table:
        from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
        from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
            combine_keep_extreme,
        )
        sch = schema_from_b64(schema_b64)
        out = []
        for row in batch.to_pylist():
            repos = json.loads(row["repos"])
            paths = json.loads(row["paths"])
            pairs = json.loads(row["keys"])
            filt = [[("repo", "in", repos), ("path", "in", paths)]]
            # third pruning level: per-file key Bloom sidecars — a file
            # whose bloom proves no needle is present is skipped without
            # opening its footer (LSM delta chains shrink to ~fpp x files)
            files = keybloom.prune_files(
                json.loads(row["files"]),
                [p[0] for p in pairs], [p[1] for p in pairs])
            rec = rec_from_dv_json(row["dv"])
            tables = [sch.empty_table()] if not files else []
            for f in files:
                # deletion-vector mask composes with the pushed-down filter:
                # masking is BY KEY, so it is exact on any row subset
                t = apply_dv(pq.read_table(f, filters=filt), f, rec)
                tables.append(_unify_to(t, sch))
            t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
            # coarse repo-set x path-set superset -> exact key pairs
            want = pa.array([f"{r}\x00{p}" for r, p in pairs])
            fused = pc.binary_join_element_wise(
                t["repo"].combine_chunks(), t["path"].combine_chunks(), "\x00")
            t = t.filter(pc.is_in(fused, value_set=want))
            t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                     descending=True)
            out.append(_strip_internal(t))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(items).map_batches(
        _lookup, batch_format="pyarrow", batch_size=1)


def optimize(lake_dir: str, mode: str = "lww") -> dict:
    """Force-compact every delta-carrying partition (LSM mode,
    ``compact_interval > 1``) into a fresh sorted base file, committed as
    the lake's next epoch — the on-demand form of the engine's periodic
    compaction, for when a read-heavy phase follows a write-heavy one.

    ``mode``: "lww" (CDC table — one winner per key, the default) or
    "log" (SCD2 event-log lake — keep EVERY (key, lsn) version, dedupe
    duplicate deliveries only).

    One Ray task per delta-carrying partition; clean partitions carry
    forward untouched (an all-clean lake commits a pure carry-forward
    epoch with zero tasks). Same single-writer rule as ingest/vacuum.
    """
    if mode not in ("lww", "log"):
        raise ValueError(f"mode must be 'lww' or 'log', got {mode!r}")
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
    )

    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = read_manifest(lake_dir, last)
    schema_b64 = manifest["schema"]
    epoch = last + 1
    tmp_dir = epoch_dir(lake_dir, epoch, tmp=True)

    items = []
    for pid, rec in manifest["partitions"].items():
        # a deletion-vector entry also warrants a rewrite: compaction
        # MATERIALIZES the masked deletes and clears the DV (Delta's
        # OPTIMIZE/REORG contract)
        if rec.get("deltas") or rec.get("dv"):
            files = ([rec["file"]] if rec.get("file") else []) + \
                list(rec.get("deltas", []))
            items.append({"partition": int(pid), "files": json.dumps(files),
                          "dv": dv_json(rec)})

    if not items:
        # nothing to compact: no epoch burned, manifest untouched
        return {"epoch": last, "partitions_compacted": 0}

    # the stats columns this lake tracks (union over existing records;
    # "lsn" when the lake predates stats) — the fresh bases must keep
    # recording them or optimize would DOWNGRADE table_stats/range_scan
    stats_cols = sorted({c for rec in manifest["partitions"].values()
                         for c in (rec.get("stats") or {})}) or ["lsn"]

    partitions: dict[int, dict] = {}
    if items:
        os.makedirs(tmp_dir, exist_ok=True)

        def _compact(batch: pa.Table) -> pa.Table:
            sch = schema_from_b64(schema_b64)
            recs = []
            for row in batch.to_pylist():
                drec = rec_from_dv_json(row["dv"])
                tables = [_unify_to(apply_dv(pq.read_table(f), f, drec), sch)
                          for f in json.loads(row["files"])]
                t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
                if mode == "lww":
                    t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                             descending=True)
                else:            # event log: every version survives
                    t = combine_keep_extreme(t, ["repo", "path", "lsn"],
                                             ["lsn"], descending=True)
                    t = t.sort_by([("repo", "ascending"),
                                   ("path", "ascending"),
                                   ("lsn", "ascending")])
                pid = row["partition"]
                fname = f"part-{pid:05d}.parquet"
                tmp_path = os.path.join(tmp_dir, fname)
                wip = f"{tmp_path}.wip.{os.getpid()}"
                pq.write_table(t, wip)
                os.replace(wip, tmp_path)
                # the fresh base inherits a key-bloom sidecar when any
                # source file carried one (bloom-enabled lake)
                from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
                srcs = json.loads(row["files"])
                if any(os.path.exists(keybloom.sidecar_path(f))
                       for f in srcs):
                    keybloom.write_sidecar(
                        tmp_path, t,
                        value_cols=keybloom.sidecar_value_cols(srcs))
                recs.append({
                    "partition": pid,
                    "file": os.path.join(epoch_dir(lake_dir, epoch), fname),
                    "lsn_watermark": pc.max(t["lsn"]).as_py()
                    if t.num_rows else -1,
                    "rows_total": t.num_rows,
                    "bytes_written": os.path.getsize(tmp_path),
                    "stats": json.dumps(col_stats(t, stats_cols)),
                    "live": json.dumps(live_meta(t, stats_cols)
                                       if mode == "lww" else {}),
                })
            return pa.Table.from_pylist(recs)

        lineage = collect_arrow(
            ray.data.from_items(items).map_batches(
                _compact, batch_format="pyarrow", batch_size=1))
        for rec in lineage.to_pylist():
            partitions[rec["partition"]] = {
                "file": rec["file"], "deltas": [],
                "lsn_watermark": rec["lsn_watermark"],
                "rows_applied": 0,
                "rows_total": rec["rows_total"],
                "bytes_written": rec["bytes_written"],
                "stats": json.loads(rec["stats"]),
            }
            live = json.loads(rec["live"])
            if "_live_rows" in live:   # log-mode lakes keep no live meta
                partitions[rec["partition"]]["live_rows"] = \
                    live["_live_rows"]
                partitions[rec["partition"]]["live_stats"] = live["_live"]
    promote_epoch_dir(lake_dir, epoch)
    commit_manifest(lake_dir, epoch, partitions,
                    schema_from_b64(schema_b64), manifest,
                    metrics={"op": "optimize",
                             "partitions_compacted": len(items)},
                    num_partitions=manifest.get("num_partitions"))
    return {"epoch": epoch, "partitions_compacted": len(items)}


def vacuum(lake_dir: str, keep_last: int = 1,
           dry_run: bool = False) -> dict:
    """Reclaim storage: delete data files and manifests not referenced by
    the newest ``keep_last`` committed manifests. ``dry_run=True`` (the
    Delta VACUUM DRY RUN contract) only REPORTS what would be reclaimed —
    nothing is deleted and no manifest is materialized — returning the
    same counters plus the candidate ``files`` list.

    Carry-forward safety: an untouched partition's file lives in an OLD
    epoch dir but is still referenced by the newest manifest — vacuum
    walks the kept manifests' file references (bases AND deltas) and only
    removes unreferenced files, then prunes empty epoch dirs and old
    manifests. Time travel to vacuumed epochs is gone by definition;
    resume is unaffected (it only needs the newest manifest).

    Concurrency: epoch dirs NEWER than the last committed manifest are
    skipped entirely — an ingest that has promoted ``.tmp-epoch=N`` to
    ``epoch=N`` but not yet committed its manifest must not have its
    in-flight files reclaimed. ``.tmp-epoch=*`` dirs are never touched
    either (that is ``clean_uncommitted``'s job, at ingest startup only).
    Beyond that window vacuum MUST NOT run concurrently with an ingest
    into the same lake — it reads the manifest set once and deletes
    against that snapshot.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    last = last_committed_epoch(lake_dir)
    if last is None:
        return {"files_removed": 0, "bytes_reclaimed": 0,
                "manifests_removed": 0}
    keep_epochs = [e for e in range(last - keep_last + 1, last + 1)
                   if os.path.exists(_manifest_path(lake_dir, e))]
    # manifest delta-log: the oldest KEPT manifest must be self-contained
    # after its ancestors are deleted — materialize the reconstructed full
    # fold in place first (atomic os.replace; any reader racing this sees
    # either version and resolves identically while the ancestors still
    # exist). Single-writer rule, like the rest of vacuum.
    if keep_epochs and not dry_run:
        e0 = keep_epochs[0]
        if _read_manifest_raw(lake_dir, e0).get("delta_log"):
            _commit_json(_manifest_path(lake_dir, e0),
                         read_manifest(lake_dir, e0), overwrite=True)
    referenced: set[str] = set()
    for e in keep_epochs:
        m = read_manifest(lake_dir, e)
        # index-view manifests track their uncompacted removal log at the
        # top level — those files are part of the committed state too
        for f in m.get("removal_log", []):
            referenced.add(os.path.realpath(f))
        # dead-letter-queue files are committed state too (cdc/dlq.py)
        for f in m.get("dlq_files", []):
            referenced.add(os.path.realpath(f))
        for rec in m["partitions"].values():
            if rec.get("file"):
                referenced.add(os.path.realpath(rec["file"]))
            # incremental-dedup states (cdc/dedup_state, cdc/neardup_state)
            # commit their per-epoch novel outputs through the same
            # manifests — a kept manifest keeps its novel files too
            if rec.get("novel_file"):
                referenced.add(os.path.realpath(rec["novel_file"]))
            for d in rec.get("deltas", []):
                referenced.add(os.path.realpath(d))
            # deletion-vector sidecars are committed state (masked reads
            # need them until a rewrite materializes the delete)
            for e in rec.get("dv", []):
                referenced.add(os.path.realpath(e["file"]))
    # an open branch's manifests may reference this lake's files (the
    # fork-point carry-forward, cdc/branch.py) — vacuuming the parent must
    # never break a branch that hasn't published yet
    from e_commerce_batch_etl_pipeline_ray.cdc.branch import (
        branch_referenced_files,
    )
    referenced |= branch_referenced_files(lake_dir)
    # a referenced data file keeps its key-bloom sidecar alive too
    # (sidecars are never referenced by manifests directly)
    from e_commerce_batch_etl_pipeline_ray.cdc.keybloom import BLOOM_SUFFIX
    referenced |= {f + BLOOM_SUFFIX for f in referenced}

    files_removed = 0
    bytes_reclaimed = 0
    candidates: list[str] = []
    for name in sorted(os.listdir(lake_dir)):
        if not name.startswith("epoch="):
            continue
        if int(name.split("=")[1]) > last:
            # promoted-but-not-yet-manifested epoch of a concurrent ingest
            continue
        full = os.path.join(lake_dir, name)
        for fname in sorted(os.listdir(full)):
            fpath = os.path.join(full, fname)
            if os.path.realpath(fpath) not in referenced:
                bytes_reclaimed += os.path.getsize(fpath)
                files_removed += 1
                if dry_run:
                    candidates.append(fpath)
                else:
                    os.remove(fpath)
        if not dry_run and not os.listdir(full):
            os.rmdir(full)

    manifests_removed = 0
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    for f in sorted(os.listdir(mdir)):
        if f.startswith("epoch-") and f.endswith(".json"):
            e = int(f[len("epoch-"):-len(".json")])
            if e not in keep_epochs:
                manifests_removed += 1
                if not dry_run:
                    os.remove(os.path.join(mdir, f))
    out = {"files_removed": files_removed,
           "bytes_reclaimed": bytes_reclaimed,
           "manifests_removed": manifests_removed}
    if dry_run:
        out["dry_run"] = True
        out["files"] = candidates
    return out


def restore(lake_dir: str, to_epoch: int) -> dict:
    """See ``_restore_once``; auto-retries a lost commit CAS."""
    return _retry_conflicts(_restore_once, lake_dir, to_epoch)


def _restore_once(lake_dir: str, to_epoch: int) -> dict:
    """RESTORE the lake's live state to an earlier committed epoch — the
    Delta ``RESTORE TABLE t TO VERSION AS OF k`` shape (reference has no
    rollback at all; its pipeline overwrites the curated table per run,
    src/load.py). Pure METADATA: commits a NEW epoch whose per-partition
    records are a copy of epoch ``to_epoch``'s — the manifest re-references
    the old files by path, zero data is copied or rewritten, so a 100 TB
    rollback is one O(KB) JSON write. The schema reverts with the data
    (a restore across the additive-evolution boundary narrows the read
    schema again, exactly like Delta's metadata revert).

    What does NOT rewind — the stream-position contracts:

    * ``lsn_watermark`` stays at the pre-restore head. The watermark is the
      high-water mark of the INGESTED binlog (delete_where/MERGE mint
      ``wm+1`` as a fresh LSN; rewinding it could collide with real lsns
      from the undone epochs if they are later re-delivered).
    * ``snapshot_lsn`` (bootstrap boundary) and the DLQ lineage
      (``dlq_files``/``dlq_rows``) carry from the head — quarantined rows
      are an audit channel, not table state.

    Everything downstream composes because this is a normal epoch commit:
    time travel to pre-restore epochs still works (manifests are
    immutable), the change feed emits the INVERSE diff at the restore
    boundary (its planner diffs file lists per epoch, and the lists just
    changed back), ``apply_feed`` roundtrips across it, vacuum keeps the
    re-referenced old files (it walks manifest references, not epoch
    dirs), and the next ``ingest_epoch`` resumes at ``restored_epoch + 1``
    with LWW semantics unchanged (new binlog lsns exceed the preserved
    watermark). A partition whose FIRST file landed after ``to_epoch`` is
    restored to an explicit empty record (``file: None``) — omitting the
    pid would hide its deletion from the feed planner.

    Plain CDC lakes only: derived stores with their own top-level manifest
    state (index views' removal_log, incremental dedup states) version
    through their own engines. Not concurrency-safe with an ingest into
    the same lake (single-writer rule, same as optimize/vacuum).
    """
    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"restore on an empty lake: {lake_dir}")
    if not (0 <= to_epoch <= last):
        raise ValueError(f"restore target {to_epoch} outside committed "
                         f"[0, {last}]")
    if not os.path.exists(_manifest_path(lake_dir, to_epoch)):
        raise FileNotFoundError(
            f"epoch {to_epoch} manifest was vacuumed — restore needs the "
            f"target manifest (vacuum keep_last bounds the restore window)")
    target = read_manifest(lake_dir, to_epoch)
    head = read_manifest(lake_dir, last)

    parts: dict[str, dict] = {pid: dict(rec)
                              for pid, rec in target["partitions"].items()}
    for pid in head["partitions"]:
        if pid not in parts:
            parts[pid] = {"file": None, "deltas": [], "lsn_watermark": -1,
                          "rows_applied": 0, "rows_total": 0,
                          "bytes_written": 0, "late_events": 0, "stats": ""}

    manifest = {
        "epoch": last + 1,
        "lsn_watermark": head["lsn_watermark"],
        "schema": target["schema"],
        "partitions": parts,
        "committed": True,
        "restored_from": to_epoch,
        "metrics": {"restored_from": to_epoch, "head_before_restore": last},
    }
    # dropped_columns is a STATE property — it reverts with the schema
    # (a drop after the target epoch is undone by the restore)
    if "dropped_columns" in target:
        manifest["dropped_columns"] = target["dropped_columns"]
    for carry in ("num_partitions", "snapshot_lsn", "dlq_files", "dlq_rows"):
        if carry in head:
            manifest[carry] = head[carry]

    _commit_json(_manifest_path(lake_dir, last + 1), manifest)
    return {"restored_from": to_epoch, "epoch": last + 1,
            "partitions_reverted": sum(
                1 for pid, rec in parts.items()
                if _rec_files(rec) != _rec_files(
                    head["partitions"].get(pid)))}


def _rec_files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return ([rec["file"]] if rec.get("file") else []) \
        + list(rec.get("deltas", []))


# ---------------------------------------------------------------------------
# Deletion vectors — merge-on-read predicate deletes (Delta deletion-vector /
# Iceberg delete-file shape). A DV delete never rewrites a data file and
# never flows through the event shuffle: the predicate scan writes one tiny
# sidecar of DELETED KEYS per touched partition and the manifest commit makes
# it visible. Readers mask the keys out at read time; the next compacting
# rewrite (ingest compact mode / optimize / zorder) materializes the delete
# and clears the entry. At 100 TB a predicate delete costs O(matched keys)
# written bytes instead of an O(state) rewrite or an O(matched keys) event
# shuffle through the merge pool.
#
# Per-partition record entry (rides the manifest chain via carry-forward):
#     rec["dv"] = [{"file": <key parquet>, "covers": [data files], "rows": n}]
#
# ``covers`` pins the DV to the chain files that existed AT DELETE TIME —
# the rule that keeps LWW correct under LSM delta chains: a later delta that
# re-inserts a deleted key is NOT covered, so the re-born row wins the merge
# untouched, while every covered (older) version of the key stays masked.
# Keys — not row positions — are stored because every read path (filtered
# point reads, row-group-pruned range scans) can mask by key after any
# pushdown, whereas positions survive only whole-file reads.
#
# The change feed sees DV deletes naturally (state diff: key live at N-1,
# gone at N -> delete row with the preimage lsn). SCD2 histories are built
# from the EVENT stream and do not observe DV deletes — use the tombstone
# path (engine.delete_where) for SCD2-tracked lakes.
_DV_KEYSEP = "\x00"
_dv_needle_cache: dict[str, "pa.Array"] = {}


def _dv_needles(dv_file: str) -> "pa.Array":
    """Fused ``repo\\x00path`` needle array of one DV sidecar (immutable
    file — cached per process; a DV is small by construction)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    hit = _dv_needle_cache.get(dv_file)
    if hit is None:
        t = pq.read_table(dv_file)
        hit = pc.binary_join_element_wise(
            t["repo"].combine_chunks(), t["path"].combine_chunks(),
            _DV_KEYSEP)
        if len(_dv_needle_cache) > 256:      # bounded per-process cache
            _dv_needle_cache.clear()
        _dv_needle_cache[dv_file] = hit
    return hit


def apply_dv(t: pa.Table, fpath: str, rec: dict | None) -> pa.Table:
    """Mask a data file's rows through the partition record's deletion
    vectors. Only DV entries whose ``covers`` include this file apply —
    files written after the delete (later deltas, re-inserts) pass through
    untouched."""
    import pyarrow.compute as pc
    ents = (rec or {}).get("dv") or []
    if not ents or t.num_rows == 0:
        return t
    fp = os.path.normpath(fpath)
    hits = [e["file"] for e in ents
            if fp in {os.path.normpath(c) for c in e["covers"]}]
    if not hits:
        return t
    needles = _dv_needles(hits[0]) if len(hits) == 1 else pa.concat_arrays(
        [_dv_needles(h) for h in hits])
    fused = pc.binary_join_element_wise(
        t["repo"].combine_chunks(), t["path"].combine_chunks(), _DV_KEYSEP)
    mask = pc.is_in(fused, value_set=needles)
    if not pc.any(mask).as_py():
        return t
    return t.filter(pc.invert(mask))


def dv_json(rec: dict | None) -> str:
    """Serialize a record's DV entries for shipping inside task descriptors
    (the per-partition ``from_items`` plans)."""
    return json.dumps((rec or {}).get("dv") or [])


def rec_from_dv_json(s: str | None) -> dict:
    """Inverse of ``dv_json`` — a minimal rec usable by ``apply_dv``."""
    dv = json.loads(s) if s else []
    return {"dv": dv} if dv else {}


def delete_where_dv(lake_dir: str, predicate,
                    columns: list[str] | None = None) -> dict:
    """See ``_delete_where_dv_once``; auto-retries a lost commit CAS
    (re-scans against the new head — the matched key set may have moved)."""
    return _retry_conflicts(_delete_where_dv_once, lake_dir, predicate,
                            columns)


def _delete_where_dv_once(lake_dir: str, predicate,
                          columns: list[str] | None = None) -> dict:
    """DELETE FROM t WHERE ... as a DELETION-VECTOR commit: evaluate
    ``predicate`` (a batch fn ``pa.Table -> boolean mask``; nulls False,
    SQL WHERE semantics) over the LIVE merged state per partition, write
    the matched keys as one DV sidecar per touched partition, and commit a
    new epoch whose records reference them — zero data files rewritten,
    zero events shuffled. ``columns``: the predicate's column set, pruning
    each file read to keys + protocol + those columns.

    Crash-safe like an ingest (tmp dir -> promote -> manifest CAS): a crash
    before the CAS leaves only vacuum-able orphans and the lake at the old
    head. Composes with: reads/point reads/range scans (masked), the change
    feed (emits delete rows with preimage lsns), compaction and zorder
    (materialize + clear), clone/branch/vacuum (sidecars ride the record),
    later re-inserts (new deltas are not covered). Stale per-file stats /
    key blooms remain safe supersets for pruning."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
    )

    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError("delete_where_dv on an empty lake")
    manifest = read_manifest(lake_dir, last)
    schema_b64 = manifest["schema"]
    epoch = last + 1
    tmp_dir = epoch_dir(lake_dir, epoch, tmp=True)
    final_dir = epoch_dir(lake_dir, epoch)

    items = []
    for pid, rec in manifest["partitions"].items():
        files = _rec_files(rec)
        if files:
            items.append({"partition": int(pid),
                          "files": json.dumps(files),
                          "dv": dv_json(rec)})
    if not items:
        return {"epoch": last, "keys_deleted": 0, "partitions_touched": 0}
    os.makedirs(tmp_dir, exist_ok=True)
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(
            ["repo", "path", "lsn", "_deleted", *columns]))

    def _scan(batch: pa.Table) -> pa.Table:
        sch = schema_from_b64(schema_b64)
        probe = probe_names(sch, read_cols) if read_cols else None
        tgt = sch if read_cols is None else \
            pa.schema([sch.field(c) for c in read_cols])
        recs = []
        for row in batch.to_pylist():
            rec = rec_from_dv_json(row["dv"])
            tables = []
            for f in json.loads(row["files"]):
                if probe is not None:
                    # prune the read to each file's PHYSICAL names for the
                    # requested columns (pre-rename files carry an alias)
                    fnames = set(pq.read_schema(f).names)
                    cols = [n for c in read_cols
                            for n in [next((n for n in probe[c]
                                            if n in fnames), None)]
                            if n is not None]
                    t = pq.read_table(f, columns=cols)
                else:
                    t = pq.read_table(f)
                tables.append(_unify_to(apply_dv(t, f, rec), tgt))
            t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
            t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                     descending=True)
            live = t.filter(pc.equal(t["_deleted"], False))
            mask = pc.fill_null(predicate(live), False)
            matched = live.filter(mask)
            pid = row["partition"]
            dv_path = ""
            if matched.num_rows:
                fname = f"dv-p{pid:05d}.parquet"
                tmp_path = os.path.join(tmp_dir, fname)
                wip = f"{tmp_path}.wip.{os.getpid()}"
                pq.write_table(matched.select(["repo", "path"]), wip)
                os.replace(wip, tmp_path)
                dv_path = os.path.join(final_dir, fname)
            recs.append({"partition": pid, "dv_file": dv_path,
                         "rows": matched.num_rows})
        return pa.Table.from_pylist(recs)

    lineage = collect_arrow(
        ray.data.from_items(items).map_batches(
            _scan, batch_format="pyarrow", batch_size=1))
    touched: dict[int, dict] = {}
    total = 0
    for r in lineage.to_pylist():
        if not r["dv_file"]:
            continue
        total += r["rows"]
        prev = dict(manifest["partitions"][str(r["partition"])])
        prev["dv"] = list(prev.get("dv", [])) + [
            {"file": r["dv_file"], "covers": _rec_files(prev),
             "rows": r["rows"]}]
        # live-row metadata is stale now — drop it so table_stats falls
        # back to a pruned read for this partition (min/max stats stay:
        # safe supersets for pruning)
        prev.pop("live_rows", None)
        prev.pop("live_stats", None)
        touched[r["partition"]] = prev
    if not touched:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return {"epoch": last, "keys_deleted": 0, "partitions_touched": 0}
    promote_epoch_dir(lake_dir, epoch)
    commit_manifest(lake_dir, epoch, touched, schema_from_b64(schema_b64),
                    manifest,
                    metrics={"op": "delete_where_dv", "keys_deleted": total,
                             "partitions_touched": len(touched)},
                    num_partitions=manifest.get("num_partitions"))
    return {"epoch": epoch, "keys_deleted": total,
            "partitions_touched": len(touched)}


# key + protocol columns a CDC lake cannot function without
_UNDROPPABLE = ("repo", "path", "lsn", "_deleted", "op")


def drop_column(lake_dir: str, col: str) -> dict:
    """See ``_drop_column_once``; auto-retries a lost commit CAS."""
    return _retry_conflicts(_drop_column_once, lake_dir, col)


def _drop_column_once(lake_dir: str, col: str) -> dict:
    """Metadata-only ``ALTER TABLE t DROP COLUMN col`` — the Delta
    column-mapping drop shape, adapted to a CDC lake whose producer keeps
    sending the column. Commits a new epoch with the SAME partition
    records (zero data rewritten — at 100 TB the drop is one O(KB) JSON
    write) and the schema minus ``col``; effects:

    * READS hide the column instantly: every reader projects files to the
      manifest schema (``_unify_to``), so old files' bytes are simply
      never selected.
    * INGEST strips the column: ``dropped_columns`` rides the manifest
      chain and the engine excludes retired names from the evolved schema,
      so the normalize projection drops them from incoming events and
      every compact rewrite progressively removes the old bytes.
    * The NAME is retired: re-introducing it via events is ignored (strip)
      rather than resurrecting old values from un-rewritten files. To
      reuse the name, ``undrop_column`` verifies no referenced file still
      carries physical bytes (footer scan) and lifts the marker; the next
      ingest then re-adds it as a fresh additive column.
    * RESTORE to a pre-drop epoch reverts the drop with the schema
      (state property, like Delta's metadata revert).
    * The row-grain change feed emits nothing at the drop boundary (file
      lists unchanged; a column-level change is not a row change).

    Physical erasure on demand (GDPR-grade) is a full-rewrite pass —
    ``zorder.optimize_zorder`` rewrites every partition and therefore
    drops the bytes as a side effect of the schema projection.

    Single-writer rule: not concurrency-safe with an ingest into the same
    lake (same as optimize/vacuum/restore).
    """
    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"drop_column on an empty lake: {lake_dir}")
    if col in _UNDROPPABLE:
        raise ValueError(f"cannot drop key/protocol column {col!r}")
    head = read_manifest(lake_dir, last)
    schema = schema_from_b64(head["schema"])
    if col not in schema.names:
        raise ValueError(f"column {col!r} not in lake schema "
                         f"{[n for n in schema.names if n != '_deleted']}")
    new_schema = pa.schema([f for f in schema if f.name != col])
    # dropping a RENAMED column retires its historical names too — a
    # re-delivery under any old name must strip, not resurrect the bytes
    # still sitting in pre-rename files as a fresh additive column
    retired = [col, *field_aliases(schema.field(col))]
    dropped = list(head.get("dropped_columns", [])) + retired

    manifest = dict(head)
    manifest.pop("restored_from", None)
    manifest["epoch"] = last + 1
    manifest["schema"] = schema_to_b64(new_schema)
    manifest["dropped_columns"] = dropped
    manifest["metrics"] = {"dropped_column": col}
    _commit_json(_manifest_path(lake_dir, last + 1), manifest)
    return {"dropped": col, "epoch": last + 1,
            "dropped_columns": dropped}


def undrop_column(lake_dir: str, col: str) -> dict:
    """See ``_undrop_column_once``; auto-retries a lost commit CAS."""
    return _retry_conflicts(_undrop_column_once, lake_dir, col)


def _undrop_column_once(lake_dir: str, col: str) -> dict:
    """Lift a ``drop_column`` marker so the name can be reused. SAFE only
    when no file referenced by the head manifest still physically carries
    the column — otherwise the schema projection would resurrect stale
    values for partitions not rewritten since the drop. The check is
    metadata-grade: one parquet FOOTER read per referenced file, no data
    decoded. Refuses (listing offending files) until a full rewrite
    (``zorder.optimize_zorder``) or enough compact ingests have removed
    the bytes. The column is NOT re-added to the schema — the next ingest
    carrying it evolves the schema additively, as a fresh all-new column."""
    import pyarrow.parquet as pq

    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"undrop_column on an empty lake: {lake_dir}")
    head = read_manifest(lake_dir, last)
    dropped = list(head.get("dropped_columns", []))
    if col not in dropped:
        raise ValueError(f"column {col!r} is not dropped "
                         f"(dropped_columns={dropped})")
    stale = []
    for rec in head["partitions"].values():
        for f in _rec_files(rec):
            if col in pq.read_schema(f).names:
                stale.append(f)
    if stale:
        raise ValueError(
            f"column {col!r} still has physical bytes in {len(stale)} "
            f"file(s) (e.g. {stale[0]}) — rewrite them first "
            f"(zorder.optimize_zorder rewrites every partition)")
    dropped.remove(col)
    manifest = dict(head)
    manifest.pop("restored_from", None)
    manifest["epoch"] = last + 1
    if dropped:
        manifest["dropped_columns"] = dropped
    else:
        manifest.pop("dropped_columns", None)
    manifest["metrics"] = {"undropped_column": col}
    _commit_json(_manifest_path(lake_dir, last + 1), manifest)
    return {"undropped": col, "epoch": last + 1,
            "dropped_columns": dropped}


def clone_lake(src_lake: str, dst_lake: str, epoch: int | None = None) -> dict:
    """CLONE TABLE — an instant, fully INDEPENDENT copy of the lake's
    committed state at ``epoch`` (default head), the Delta clone shape.
    Every referenced data file (bases, deltas, novel files, DLQ files,
    plus their ``.kbloom`` sidecars) is HARDLINKED into the same relative
    layout under ``dst_lake`` (copy fallback across filesystems), and the
    source manifest is re-committed there with rewritten paths — on one
    filesystem a 100 TB clone costs one inode link per file and one O(KB)
    JSON write, zero bytes copied.

    Unlike a branch (cdc/branch.py) the clone has NO parent contract: it
    starts its own lineage at the source's epoch number (history is not
    cloned — a clone is a single-version table, like Delta's), both sides
    ingest/optimize/vacuum independently, and because hardlinks pin the
    inodes, vacuuming either side can never tear files out of the other.
    ``resume_point`` on the clone continues at ``epoch + 1`` with the
    source's lsn_watermark / snapshot_lsn / dropped_columns / schema
    (rename aliases ride the schema b64) carried over.

    Crash-safe without a transaction: links are idempotent (deterministic
    destination names, existing dst = completed earlier attempt) and the
    clone only becomes visible with the final manifest CAS — re-run a
    crashed clone and it finishes."""
    from e_commerce_batch_etl_pipeline_ray.cdc.branch import _link

    if epoch is None:
        epoch = last_committed_epoch(src_lake)
    if epoch is None:
        raise FileNotFoundError(f"clone of an empty lake: {src_lake}")
    if not os.path.exists(_manifest_path(src_lake, epoch)):
        raise FileNotFoundError(
            f"no manifest for epoch {epoch} in {src_lake} (vacuumed?)")
    if last_committed_epoch(dst_lake) is not None:
        raise FileExistsError(f"{dst_lake} already holds a committed lake")
    manifest = read_manifest(src_lake, epoch)

    src_prefix = os.path.normpath(src_lake) + os.sep
    linked = 0

    def _map(p: str) -> str:
        nonlocal linked
        q = os.path.normpath(p)
        if not q.startswith(src_prefix):
            raise ValueError(
                f"referenced file {p!r} lies outside the source lake — "
                f"clone would dangle (publish/retarget it first)")
        dst = os.path.join(dst_lake, q[len(src_prefix):])
        linked += _link(q, dst)
        if os.path.exists(q + ".kbloom"):
            linked += _link(q + ".kbloom", dst + ".kbloom")
        return dst

    out = dict(manifest)
    out.pop("restored_from", None)
    out["partitions"] = {}
    for pid, rec in manifest["partitions"].items():
        rec = dict(rec)
        for key in ("file", "novel_file"):
            if rec.get(key):
                rec[key] = _map(rec[key])
        if rec.get("deltas"):
            rec["deltas"] = [_map(d) for d in rec["deltas"]]
        if rec.get("dv"):
            # link the DV sidecar AND rewrite its covers to the cloned
            # data-file paths (apply_dv matches covers against the paths
            # the cloned manifest references)
            rec["dv"] = [{**e, "file": _map(e["file"]),
                          "covers": [_map(c) for c in e["covers"]]}
                         for e in rec["dv"]]
        out["partitions"][pid] = rec
    for key in ("removal_log", "dlq_files"):
        if manifest.get(key):
            out[key] = [_map(p) for p in manifest[key]]
    out["metrics"] = {"cloned_from": os.path.normpath(src_lake),
                      "source_epoch": epoch, "files_linked": linked}
    os.makedirs(os.path.join(dst_lake, MANIFEST_DIR), exist_ok=True)
    _commit_json(_manifest_path(dst_lake, epoch), out)
    return {"cloned_from": src_lake, "epoch": epoch,
            "files_linked": linked}


def rename_column(lake_dir: str, old: str, new: str) -> dict:
    """See ``_rename_column_once``; auto-retries a lost commit CAS."""
    return _retry_conflicts(_rename_column_once, lake_dir, old, new)


def _rename_column_once(lake_dir: str, old: str, new: str) -> dict:
    """Metadata-only ``ALTER TABLE t RENAME COLUMN old TO new`` — the Delta
    column-mapping rename shape. One O(KB) manifest commit re-referencing
    the same files (zero data rewritten at any lake size); the old name is
    recorded as a field-metadata ALIAS inside the manifest schema, so:

    * READS translate instantly: every reader projects files through
      ``_unify_to``/``resolve_source``, which falls back to the newest
      alias present in a file — pre-rename files' bytes surface under the
      new name with no rewrite.
    * INGEST translates: the engine's normalize projection resolves
      aliases the same way, so a producer still sending the OLD name lands
      in the new column (and ``_data_schema`` canonicalizes event fields
      so the old name can never re-appear as a fresh additive column).
      An event batch carrying BOTH names keeps the current name (the
      alias is ignored, same rule as a retired name).
    * Every compact rewrite progressively renames the physical bytes
      (files are written with the manifest schema), exactly like
      ``drop_column``'s progressive removal.
    * Renames CHAIN (a->b->c keeps [a, b] as aliases, newest-alias-wins
      for files written between the two renames) and compose with
      ``drop_column`` (dropping a renamed column retires its aliases) and
      ``restore`` (the schema reverts, so the rename reverts).

    Guards: protocol columns are fixed (hash routing + LWW key on
    repo/path, versioning on lsn); ``new`` must not collide with a live
    column, a live column's alias, or a RETIRED (dropped) name — old files
    may still physically carry retired bytes, and the alias fallback would
    resurrect them under the new column. Single-writer rule, like
    drop/optimize/restore."""
    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"rename_column on an empty lake: {lake_dir}")
    if old in _UNDROPPABLE or new in _UNDROPPABLE:
        raise ValueError(f"cannot rename key/protocol column "
                         f"({old!r} -> {new!r})")
    if old == new:
        raise ValueError(f"rename {old!r} -> {new!r} is a no-op")
    head = read_manifest(lake_dir, last)
    schema = schema_from_b64(head["schema"])
    if old not in schema.names:
        raise ValueError(f"column {old!r} not in lake schema "
                         f"{[n for n in schema.names if n != '_deleted']}")
    if new in schema.names:
        raise ValueError(f"column {new!r} already exists")
    for f in schema:
        if new in field_aliases(f):
            raise ValueError(f"name {new!r} is a historical alias of "
                             f"{f.name!r} — old files may still carry its "
                             f"bytes; pick another name or rewrite first "
                             f"(zorder.optimize_zorder)")
    if new in head.get("dropped_columns", ()):
        raise ValueError(f"name {new!r} is retired by drop_column — old "
                         f"files may still carry its bytes; undrop_column "
                         f"it first (requires a full rewrite)")

    fields = []
    for f in schema:
        if f.name == old:
            aliases = [*field_aliases(f), old]
            # preserve OTHER field metadata (e.g. add_column's default)
            meta = {k.decode(): v.decode()
                    for k, v in (f.metadata or {}).items()}
            meta["aliases"] = ",".join(aliases)
            fields.append(pa.field(new, f.type, metadata=meta))
        else:
            fields.append(f)
    manifest = dict(head)
    manifest.pop("restored_from", None)
    manifest["epoch"] = last + 1
    manifest["schema"] = schema_to_b64(pa.schema(fields))
    manifest["metrics"] = {"renamed_column": [old, new]}
    _commit_json(_manifest_path(lake_dir, last + 1), manifest)
    return {"renamed": [old, new], "epoch": last + 1}


def add_column(lake_dir: str, name: str, typ: pa.DataType,
               default=None) -> dict:
    """See ``_add_column_once``; auto-retries a lost commit CAS."""
    return _retry_conflicts(_add_column_once, lake_dir, name, typ, default)


def _add_column_once(lake_dir: str, name: str, typ: pa.DataType,
                     default=None) -> dict:
    """Metadata-only ``ALTER TABLE t ADD COLUMN name typ [DEFAULT v]`` —
    the Delta default-column-values shape. One O(KB) manifest commit, zero
    files rewritten at any lake size. With a default:

    * READS backfill: files written before the add lack the column
      physically, so ``_unify_to`` fills the DEFAULT (not null) — existing
      rows surface with the default instantly.
    * INGEST backfills: events not carrying the column write the default
      physically (the normalize projection runs the same ``_unify_to``);
      an event batch CARRYING the column keeps its values — including
      EXPLICIT nulls, which stay null (present-vs-absent is the contract
      line, exactly Delta's).
    * Every compact rewrite materializes the default into the bytes.
    * Stats/bloom pruning stays safe: files without the column record no
      stats for it (never pruned on it), and ``zorder.range_scan`` treats
      a missing-but-defaulted column as matchable (no dead-file shortcut).

    Without a default this is the engine's ordinary additive evolution,
    just initiated by an operator instead of a producer. The default is a
    JSON scalar (validated against ``typ``); it rides the manifest schema
    as field metadata, like rename aliases. Guards: the name must not
    collide with a live column, an alias, or a retired (dropped) name —
    old files may still carry retired bytes and would resurrect."""
    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"add_column on an empty lake: {lake_dir}")
    head = read_manifest(lake_dir, last)
    schema = schema_from_b64(head["schema"])
    if name in schema.names:
        raise ValueError(f"column {name!r} already exists")
    for f in schema:
        if name in field_aliases(f):
            raise ValueError(f"name {name!r} is a historical alias of "
                             f"{f.name!r} — old files may still carry its "
                             f"bytes; pick another name")
    if name in head.get("dropped_columns", ()):
        raise ValueError(f"name {name!r} is retired by drop_column — "
                         f"undrop_column it instead (its old bytes would "
                         f"resurrect under the new column)")
    meta = None
    if default is not None:
        try:
            pa.array([default], type=typ)
        except Exception as e:
            raise ValueError(f"default {default!r} is not a valid "
                             f"{typ} value: {e}") from e
        meta = {"default": json.dumps(default)}
    fields = [f for f in schema if f.name != "_deleted"]
    fields.append(pa.field(name, typ, metadata=meta))
    fields.append(schema.field("_deleted"))
    manifest = dict(head)
    manifest.pop("restored_from", None)
    manifest["epoch"] = last + 1
    manifest["schema"] = schema_to_b64(pa.schema(fields))
    manifest["metrics"] = {"added_column": [name, str(typ), default]}
    _commit_json(_manifest_path(lake_dir, last + 1), manifest)
    return {"added": name, "default": default, "epoch": last + 1}


def rebucket(src_lake: str, dst_lake: str, num_partitions: int,
             epoch: int | None = None) -> dict:
    """Offline partition-count migration: rewrite the lake's state (at
    ``epoch``, default latest — tombstones included) into a NEW lake with a
    different key->partition modulus, committed as the destination's epoch
    0. The answer to "the modulus is fixed for a lake's lifetime": when the
    cluster outgrows P, rebucket to 4P offline and point ingest at the new
    lake (its resume point continues from epoch 1).

    One all-to-all shuffle — unavoidable, every row changes partition — as
    a single Ray Data pipeline: read state files -> assign new pid
    [map_batches] -> hash shuffle [groupby] -> per-partition sorted write.
    LWW invariants, schema, and watermark carry over; lineage records note
    the migration.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
        hash_partition_ids,
    )

    if epoch is None:
        epoch = last_committed_epoch(src_lake)
    if epoch is None:
        raise FileNotFoundError(f"no committed epochs in {src_lake}")
    if last_committed_epoch(dst_lake) is not None:
        raise ValueError(f"destination lake {dst_lake} is not empty")
    manifest = read_manifest(src_lake, epoch)
    schema_b64 = manifest["schema"]
    schema = schema_from_b64(schema_b64)
    os.makedirs(dst_lake, exist_ok=True)
    tmp_dir = epoch_dir(dst_lake, 0, tmp=True)
    os.makedirs(tmp_dir, exist_ok=True)

    state = read_lake(src_lake, epoch=epoch, include_tombstones=True)

    def _assign(t: pa.Table) -> pa.Table:
        t = _unify_to(t, schema_from_b64(schema_b64))
        pid = hash_partition_ids(t, ["repo", "path"], num_partitions)
        return t.append_column("_pid", pa.array(pid, pa.int32()))

    def _write(group: pa.Table) -> pa.Table:
        pid = group["_pid"][0].as_py()
        t = group.drop_columns(["_pid"])
        # re-sort into the lake's canonical compacted layout
        t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                 descending=True)
        fname = f"part-{pid:05d}.parquet"
        tmp_path = os.path.join(tmp_dir, fname)
        wip = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(t, wip)
        os.replace(wip, tmp_path)
        from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
        keybloom.write_sidecar(tmp_path, t)
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([os.path.join(epoch_dir(dst_lake, 0), fname)],
                             pa.string()),
            "lsn_watermark": pa.array(
                [pc.max(t["lsn"]).as_py() if t.num_rows else -1], pa.int64()),
            "rows_total": pa.array([t.num_rows], pa.int64()),
            "bytes_written": pa.array([os.path.getsize(tmp_path)], pa.int64()),
        })

    lineage = collect_arrow(
        state.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("_pid").map_groups(_write, batch_format="pyarrow"))

    promote_epoch_dir(dst_lake, 0)
    partitions = {
        rec["partition"]: {
            "file": rec["file"], "deltas": [],
            "lsn_watermark": rec["lsn_watermark"],
            "rows_applied": rec["rows_total"],
            "rows_total": rec["rows_total"],
            "bytes_written": rec["bytes_written"],
        } for rec in lineage.to_pylist()}
    commit_manifest(dst_lake, 0, partitions, schema, None,
                    metrics={"op": "rebucket", "src": src_lake,
                             "src_epoch": epoch,
                             "src_num_partitions":
                                 manifest.get("num_partitions")},
                    num_partitions=num_partitions,
                    # a bootstrapped lake's boundary marker must survive
                    # the migration or pre-snapshot redeliveries resurrect
                    # deleted keys in the new lake
                    snapshot_lsn=manifest.get("snapshot_lsn"))
    return {"rows": sum(r["rows_total"] for r in partitions.values()),
            "partitions": len(partitions)}


def purge_keys(lake_dir: str, keys: list[tuple[str, str]]) -> dict:
    """GDPR right-to-be-forgotten: PHYSICALLY erase every trace of the
    given (repo, path) keys from the lake — every committed epoch's files,
    so time travel to ANY epoch no longer returns them (a D tombstone only
    hides a key going forward; the bytes stay readable via as-of reads).

    Hash routing bounds the work: the keys map to a handful of partitions
    (constant modulus from the manifest chain), and only those partitions'
    file chains (bases + deltas, across all manifests) are rewritten —
    never the whole lake. Each file rewrite is atomic (wip + os.replace
    under the SAME path, so every manifest that references the file via
    carry-forward sees the purged content at once); manifests referencing
    rewritten base files get their rows_total/bytes_written lineage
    refreshed in place. lsn watermarks are NOT recomputed: they are
    high-water marks of the ingested stream (resume/GC contracts), not
    row properties.

    An audit record lands in manifests/purge-<n>.json carrying sha256
    digests of the purged keys (never the keys themselves — they may be
    the personal data being erased), the files rewritten and rows removed.

    Like vacuum, NOT concurrency-safe with an ingest into the same lake.
    The binlog source files and any derived stores (indexes, dedup states,
    replicas) are outside the lake — purge them separately.
    """
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    last = last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifests = {}
    for name in sorted(os.listdir(os.path.join(lake_dir, MANIFEST_DIR))):
        if name.startswith("epoch-") and name.endswith(".json"):
            e = int(name[len("epoch-"):-len(".json")])
            manifests[e] = read_manifest(lake_dir, e)
    newest = manifests[last]
    num_partitions = newest.get("num_partitions")

    key_t = pa.table({"repo": pa.array([k[0] for k in keys], pa.string()),
                      "path": pa.array([k[1] for k in keys], pa.string())})
    target_files: set[str] = set()
    if num_partitions is not None:
        routed = set(hash_partition_ids(key_t, ["repo", "path"],
                                        num_partitions).tolist())
    else:  # legacy manifest without a recorded modulus: scan all
        routed = None
    for m in manifests.values():
        pids = routed if routed is not None else \
            {int(p) for p in m["partitions"]}
        for pid in pids:
            rec = m["partitions"].get(str(pid))
            if not rec:
                continue
            for f in ([rec["file"]] if rec.get("file") else []) \
                    + list(rec.get("deltas", [])):
                target_files.add(f)

    # distributed rewrite: one task per candidate file (Ray Data over the
    # file list — at scale the chains are per-partition-per-epoch files)
    files = sorted(target_files)
    key_set = set(keys)

    def _rewrite(batch: pa.Table) -> pa.Table:
        out = {"file": [], "rows_removed": [], "rows_total": [],
               "bytes_written": []}
        needles = pa.array([f"{r}\x00{p}" for r, p in sorted(key_set)],
                           pa.string())
        for f in batch["file"].to_pylist():
            t = pq.read_table(f)
            joined = pc.binary_join_element_wise(t["repo"], t["path"],
                                                 pa.scalar("\x00"))
            mask = pc.is_in(joined, value_set=needles)
            removed = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
            if removed:
                t = t.filter(pc.invert(mask))
                wip = f"{f}.purge.{os.getpid()}"
                pq.write_table(t, wip)
                os.replace(wip, f)
                # refresh the key-bloom sidecar (the stale one is a
                # superset — safe — but rebuilding drops the purged keys'
                # bits and lets point_read skip the file outright)
                from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
                if os.path.exists(keybloom.sidecar_path(f)):
                    keybloom.write_sidecar(
                        f, t, value_cols=keybloom.sidecar_value_cols([f]))
            out["file"].append(f)
            out["rows_removed"].append(removed)
            out["rows_total"].append(t.num_rows)
            out["bytes_written"].append(os.path.getsize(f))
        return pa.table({"file": pa.array(out["file"], pa.string()),
                         "rows_removed": pa.array(out["rows_removed"],
                                                  pa.int64()),
                         "rows_total": pa.array(out["rows_total"],
                                                pa.int64()),
                         "bytes_written": pa.array(out["bytes_written"],
                                                   pa.int64())})

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    stats_t = collect_arrow(
        ray.data.from_items([{"file": f} for f in files])
        .map_batches(_rewrite, batch_format="pyarrow", batch_size=1))
    by_file = {r["file"]: r for r in stats_t.to_pylist()}
    touched = {f: r for f, r in by_file.items() if r["rows_removed"]}

    # refresh lineage of every manifest referencing a rewritten base file
    for e, m in manifests.items():
        changed = False
        for rec in m["partitions"].values():
            f = rec.get("file")
            if f in touched and rec.get("rows_total", -1) != -1:
                rec["rows_total"] = touched[f]["rows_total"]
                rec["bytes_written"] = touched[f]["bytes_written"]
                # live-row metadata is now stale — drop it so table_stats
                # falls back to reading the purged partition (per-file
                # min/max "stats" stay: still a SUPERSET of the remaining
                # rows, so range-scan pruning remains safe, just looser)
                rec.pop("live_rows", None)
                rec.pop("live_stats", None)
                changed = True
        if changed:
            path = _manifest_path(lake_dir, e)
            wip = f"{path}.wip.{os.getpid()}"
            with open(wip, "w") as fh:
                json.dump(m, fh)
            os.replace(wip, path)

    audit = {
        "key_sha256": sorted(
            hashlib.sha256(f"{r}\x00{p}".encode()).hexdigest()
            for r, p in keys),
        "files_rewritten": sorted(touched),
        "rows_removed": sum(r["rows_removed"] for r in touched.values()),
        "files_scanned": len(files),
    }
    n = 0
    while os.path.exists(os.path.join(lake_dir, MANIFEST_DIR,
                                      f"purge-{n:04d}.json")):
        n += 1
    apath = os.path.join(lake_dir, MANIFEST_DIR, f"purge-{n:04d}.json")
    wip = f"{apath}.wip.{os.getpid()}"
    with open(wip, "w") as fh:
        json.dump(audit, fh)
    os.replace(wip, apath)
    return audit
