"""Z-ORDER clustering + stats-based data skipping for the CDC lake.

``optimize_zorder(lake_dir, by=[cols])`` rewrites every partition's state
file with rows sorted by the interleaved-bit (Morton) order of the ``by``
columns and SMALL parquet row groups, and records per-file min/max stats
for those columns in the epoch manifest. ``range_scan(lake_dir, preds)``
then prunes at two levels before any content bytes are decoded:

  1. partition file: manifest stats disjoint from the predicate -> the
     file is never opened (driver-side, metadata only);
  2. row group: parquet min/max stats + the pushed-down filter skip row
     groups inside surviving files — this is where z-ordering pays off,
     because Morton order makes EVERY ``by`` column's values locally
     clustered, so each row group covers a narrow range of each column
     (a plain single-column sort only narrows that one column).

The hash-partition layout (key -> partition modulus) is untouched: each
key still lives wholly in one partition, so ingest resume, carry-forward
and ``point_read`` routing all keep working. Inside the rewritten file the
rows are z-ordered rather than key-sorted, so point reads into a z-ordered
partition lose row-group pruning (correctness unaffected) — like Delta
Lake's OPTIMIZE ZORDER BY, run it when a range-scan-heavy phase follows
ingest. A later ingest epoch that rewrites a partition restores key-sorted
layout for that partition and drops its stats record (the scan planner
then simply reads that file unpruned).

Correctness under LWW: z-order compaction first resolves one winner per
key (tombstones kept, exactly like ``lake.optimize``); skipping a whole
file by stats can only skip rows that cannot match the predicate, and
since every key's winner lives in exactly one partition, partition-level
pruning never changes the merged result.

Reference lineage: generalizes the reference's partitioned-write read
optimization (src/load.py:34-41, notebooks/04_write_parquet.py:26-46 —
partition pruning on invoice_year) from directory-level to file- and
row-group-level skipping.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake

_ZBITS = 16          # bits per column in the Morton key (<= 4 cols / uint64)


def _ordinal_codes(t: pa.Table, col: str) -> np.ndarray:
    """Partition-local rank of each value scaled to 0..2^16-1 (null ->
    sentinel 2^16-1 so all-null rows sort last). Works for any orderable
    Arrow type — the Morton key only needs a monotone encoding; pruning
    relies on the exact min/max stats, not on the encoding."""
    arr = t[col].combine_chunks()
    valid = pc.is_valid(arr)
    uniq = pc.unique(arr.filter(valid)).sort()
    n = len(uniq)
    codes = np.full(t.num_rows, (1 << _ZBITS) - 1, dtype=np.uint64)
    if n:
        idx = pc.index_in(arr, value_set=uniq)
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = valid.to_numpy(zero_copy_only=False)
        scaled = (idx_np * ((1 << _ZBITS) - 1) / max(n - 1, 1))
        codes[mask] = scaled[mask].astype(np.uint64)
    return codes


def _morton_key(t: pa.Table, by: list[str]) -> np.ndarray:
    """Interleave the _ZBITS-bit ordinal codes of the ``by`` columns."""
    if not 1 <= len(by) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    cols = [_ordinal_codes(t, c) for c in by]
    k = len(cols)
    z = np.zeros(t.num_rows, dtype=np.uint64)
    for b in range(_ZBITS):
        for j, c in enumerate(cols):
            z |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + j)
    return z


def _col_stats(t: pa.Table, by: list[str]) -> dict:
    """Per-file min/max of the zorder columns plus lsn (lake.col_stats)."""
    return lake.col_stats(t, list(dict.fromkeys(list(by) + ["lsn"])))


def optimize_zorder(lake_dir: str, by: list[str],
                    row_group_rows: int = 2048) -> dict:
    """Rewrite every partition as one z-ordered file (LWW-compacted,
    tombstones kept, deltas folded in), committed as the lake's next epoch
    with per-file column stats in the manifest. One Ray task per
    partition; same single-writer rule as ingest/optimize/vacuum."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
    )

    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = lake.read_manifest(lake_dir, last)
    schema = lake.schema_from_b64(manifest["schema"])
    for c in by:
        if c not in schema.names:
            raise ValueError(f"zorder column {c!r} not in lake schema "
                             f"{schema.names}")
    schema_b64 = manifest["schema"]
    epoch = last + 1
    tmp_dir = lake.epoch_dir(lake_dir, epoch, tmp=True)

    items = []
    for pid, rec in manifest["partitions"].items():
        files = ([rec["file"]] if rec.get("file") else []) + \
            list(rec.get("deltas", []))
        if files:
            items.append({"partition": int(pid), "files": json.dumps(files),
                          "dv": lake.dv_json(rec)})
    if not items:
        return {"epoch": last, "partitions_rewritten": 0}
    os.makedirs(tmp_dir, exist_ok=True)

    def _rewrite(batch: pa.Table) -> pa.Table:
        sch = lake.schema_from_b64(schema_b64)
        recs = []
        for row in batch.to_pylist():
            # dv mask: the zorder rewrite MATERIALIZES deletion vectors
            # (the fresh rec below carries no dv entry)
            drec = lake.rec_from_dv_json(row["dv"])
            tables = [lake._unify_to(lake.apply_dv(pq.read_table(f), f,
                                                   drec), sch)
                      for f in json.loads(row["files"])]
            t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
            t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                     descending=True)
            order = np.argsort(_morton_key(t, by), kind="stable")
            t = t.take(pa.array(order))
            pid = row["partition"]
            fname = f"part-{pid:05d}.parquet"
            tmp_path = os.path.join(tmp_dir, fname)
            wip = f"{tmp_path}.wip.{os.getpid()}"
            pq.write_table(t, wip, row_group_size=row_group_rows)
            os.replace(wip, tmp_path)
            # inherit key-bloom sidecars across the rewrite (same keys,
            # new file) so zorder never degrades point-read pruning
            from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
            srcs = json.loads(row["files"])
            if any(os.path.exists(keybloom.sidecar_path(f))
                   for f in srcs):
                keybloom.write_sidecar(
                    tmp_path, t,
                    value_cols=keybloom.sidecar_value_cols(srcs))
            recs.append({
                "partition": pid,
                "file": os.path.join(lake.epoch_dir(lake_dir, epoch), fname),
                "lsn_watermark": pc.max(t["lsn"]).as_py()
                if t.num_rows else -1,
                "rows_total": t.num_rows,
                "bytes_written": os.path.getsize(tmp_path),
                "stats": json.dumps({**_col_stats(t, by),
                                     **lake.live_meta(
                                         t, list(dict.fromkeys(
                                             list(by) + ["lsn"])))}),
            })
        return pa.Table.from_pylist(recs)

    lineage = collect_arrow(
        ray.data.from_items(items).map_batches(
            _rewrite, batch_format="pyarrow", batch_size=1))
    partitions = {}
    for rec in lineage.to_pylist():
        st = json.loads(rec["stats"])
        live_rows = st.pop("_live_rows", None)
        live_stats = st.pop("_live", None)
        partitions[rec["partition"]] = {
            "file": rec["file"], "deltas": [],
            "lsn_watermark": rec["lsn_watermark"],
            "rows_applied": 0,
            "rows_total": rec["rows_total"],
            "bytes_written": rec["bytes_written"],
            "stats": st,
            "zorder": list(by),
        }
        if live_rows is not None:
            partitions[rec["partition"]]["live_rows"] = live_rows
            partitions[rec["partition"]]["live_stats"] = live_stats or {}
    lake.promote_epoch_dir(lake_dir, epoch)
    lake.commit_manifest(lake_dir, epoch, partitions, schema, manifest,
                         metrics={"op": "zorder", "by": list(by),
                                  "partitions_rewritten": len(items)},
                         num_partitions=manifest.get("num_partitions"))
    return {"epoch": epoch, "partitions_rewritten": len(items)}


def _overlaps(bounds: list, lo, hi) -> bool:
    """File [min,max] intersects the [lo,hi] predicate (None = open side)."""
    fmin, fmax = bounds
    if lo is not None and fmax < lo:
        return False
    if hi is not None and fmin > hi:
        return False
    return True


def plan_range_scan(lake_dir: str, predicates: dict,
                    epoch: int | None = None) -> dict:
    """Driver-side scan plan: which partition file sets survive pruning.
    ``predicates``: {col: (lo, hi)} inclusive, either side None.

    Two pruning levels, both metadata-grade:
      * manifest min/max stats — partitions with delta files (or no stats
        record) are never stats-pruned (stats exist only for compacted
        bases);
      * for EQUALITY predicates (lo == hi), per-file VALUE Blooms
        (CDCConfig.bloom_cols, keybloom v2 sidecars): a partition is
        pruned when EVERY file's bloom proves the value absent — safe
        under LWW for delta chains too (if no version of any key ever
        carried the value, the merged state cannot), and probed only for
        partitions that survived stats pruning (one small sidecar read
        per file)."""
    from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
    if epoch is None:
        epoch = lake.last_committed_epoch(lake_dir)
    if epoch is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = lake.read_manifest(lake_dir, epoch)
    # stats written before a lake.rename_column are keyed by the OLD name —
    # probe a predicate column under its aliases too (newest-first), same
    # resolution rule as the data projection, so pruning stays effective
    # across a rename (a miss only disables pruning, never wrongly prunes)
    schema = lake.schema_from_b64(manifest["schema"])
    probe = lake.probe_names(schema, predicates)
    eq_needles = {}
    for col, (lo, hi) in predicates.items():
        if lo is not None and lo == hi:
            typ = schema.field(col).type if col in schema.names else None
            eq_needles[col] = pa.array([lo], type=typ)
    items, files_total, files_pruned = [], 0, 0
    for pid, rec in manifest["partitions"].items():
        files = ([rec["file"]] if rec.get("file") else []) + \
            list(rec.get("deltas", []))
        if not files:
            continue
        files_total += len(files)
        stats = rec.get("stats")
        prunable = False
        if stats is not None and not rec.get("deltas"):
            for col, (lo, hi) in predicates.items():
                b = next((stats[n] for n in probe[col] if n in stats), None)
                if b is not None and not _overlaps(b, lo, hi):
                    prunable = True
                    break
        if not prunable and eq_needles:
            for col, needle in eq_needles.items():
                verdicts = []
                for f in files:
                    sp = keybloom.sidecar_path(f)
                    if not os.path.exists(sp):
                        verdicts = None
                        break
                    with open(sp, "rb") as fh:
                        v = keybloom.value_verdict(fh.read(), probe[col],
                                                   needle)
                    if v is None:
                        verdicts = None
                        break
                    verdicts.append(v)
                if verdicts is not None and not any(verdicts):
                    prunable = True
                    break
        if prunable:
            files_pruned += len(files)
            continue
        # deletion vectors ride into the scan tasks; stats and blooms
        # written before the DV are stale SUPERSETS — safe for pruning
        # (prune only on proven absence), exact-masked at the read
        items.append({"partition": int(pid), "files": json.dumps(files),
                      "dv": lake.dv_json(rec)})
    return {"epoch": epoch, "manifest": manifest, "items": items,
            "files_total": files_total, "files_pruned": files_pruned,
            "files_selected": files_total - files_pruned}


def range_scan(lake_dir: str, predicates: dict, epoch: int | None = None,
               columns: list[str] | None = None) -> ray.data.Dataset:
    """Pruned snapshot scan: read only the partition files whose manifest
    stats may contain predicate matches, push the range filter into the
    parquet read (row-group pruning inside each file), LWW-merge any
    delta-carrying partitions, drop tombstones, apply the exact mask.
    Result == read_lake(...).filter(predicates), at a fraction of the I/O
    on a z-ordered lake."""
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        combine_keep_extreme,
    )

    plan = plan_range_scan(lake_dir, predicates, epoch)
    manifest = plan["manifest"]
    schema_b64 = manifest["schema"]
    schema = lake.schema_from_b64(schema_b64)
    preds = {c: (lo, hi) for c, (lo, hi) in predicates.items()}

    def _finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["_deleted"], False))
        t = t.drop_columns([c for c in lake.INTERNAL_COLS
                            if c in t.column_names])
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        for col, (lo, hi) in preds.items():
            if lo is not None:
                mask = pc.and_kleene(mask, pc.greater_equal(t[col], lo))
            if hi is not None:
                mask = pc.and_kleene(mask, pc.less_equal(t[col], hi))
        t = t.filter(pc.fill_null(mask, False))
        if columns:
            t = t.select(columns)
        return t

    if not plan["items"]:
        return ray.data.from_arrow(_finish(schema.empty_table()))

    # parquet filter: prune row groups, but keep tombstones (null zcols)
    # so delta-partition LWW merges still see their delete markers
    conj = []
    for col, (lo, hi) in preds.items():
        if lo is not None:
            conj.append((col, ">=", lo))
        if hi is not None:
            conj.append((col, "<=", hi))
    def _scan(batch: pa.Table) -> pa.Table:
        sch = lake.schema_from_b64(schema_b64)
        probe = lake.probe_names(sch, preds)
        out = []
        for row in batch.to_pylist():
            files = json.loads(row["files"])
            drec = lake.rec_from_dv_json(row["dv"])
            if len(files) == 1:
                # compacted partition: one winner per key already — the
                # pushed-down filter is safe (no cross-row LWW to break).
                # Translate filter columns to the file's PHYSICAL names
                # (pre-rename files carry an alias); a file lacking the
                # column entirely unifies to all-null, which a range
                # predicate can never match — skip the read
                fnames = pq.read_schema(files[0]).names
                fconj, dead = [], False
                for col, op, v in (conj or []):
                    src = next((n for n in probe[col] if n in fnames), None)
                    if src is None:
                        if col in sch.names and \
                                lake.field_default(sch.field(col))[0]:
                            # missing column with a DEFAULT (lake.add_column)
                            # unifies to the default, which CAN match —
                            # read without this pushdown; _finish re-masks
                            continue
                        dead = True
                        break
                    fconj.append((src, op, v))
                if dead:
                    t = sch.empty_table()
                else:
                    # dv mask composes with the pushdown (mask is by key)
                    t = lake._unify_to(
                        lake.apply_dv(
                            pq.read_table(files[0],
                                          filters=[fconj] if fconj else None),
                            files[0], drec),
                        sch)
            else:
                # delta partition: LWW first (a filter could drop the
                # winning tombstone/update of a matching older row), so
                # read unfiltered, merge, then mask
                tabs = [lake._unify_to(lake.apply_dv(pq.read_table(f), f,
                                                     drec), sch)
                        for f in files]
                t = pa.concat_tables(tabs)
                t = combine_keep_extreme(t, ["repo", "path"], ["lsn"],
                                         descending=True)
            out.append(_finish(t))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items(plan["items"]).map_batches(
        _scan, batch_format="pyarrow", batch_size=1)
