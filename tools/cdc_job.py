"""CDC ingest job entrypoint — the `ray job submit` surface.

On a real cluster:
    ray job submit --working-dir . -- python tools/cdc_job.py \\
        --binlog-dir s3://bucket/binlog --lake-dir s3://bucket/lake \\
        --epochs 96 --partitions 2048 --merge-concurrency 256 --resume

In this sandbox it runs against a local binlog dir (generate one with
--generate) on a local ray session. The script owns its Ray session only
when none exists (ray job submit provides one).

Resume semantics: with --resume the job continues from the last committed
epoch manifest; without it, a non-empty lake is an error (no accidental
double-ingest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--binlog-dir", default="/tmp/cdc_job_binlog")
    ap.add_argument("--lake-dir", default="/tmp/cdc_job_lake")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--events-per-epoch", type=int, default=100_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--merge-concurrency", type=int, default=8)
    ap.add_argument("--compact-interval", type=int, default=1)
    ap.add_argument("--verify-sha", action="store_true")
    ap.add_argument("--dlq", action="store_true",
                    help="quarantine malformed rows (null key / bad lsn / "
                         "unknown op / sha mismatch when --verify-sha) to "
                         "dead-letter files instead of applying or failing")
    ap.add_argument("--read-dlq", action="store_true",
                    help="print the accumulated dead-letter-queue counts by "
                         "reason and exit")
    ap.add_argument("--backend", default="map_groups",
                    choices=["map_groups", "actor_pool"])
    ap.add_argument("--gc-lateness-epochs", type=int, default=None,
                    help="drop tombstones older than the watermark this many "
                         "epochs back (bounded-lateness contract)")
    ap.add_argument("--history", action="store_true",
                    help="print per-epoch manifest metrics for the lake and exit")
    ap.add_argument("--vacuum-keep", type=int, default=None,
                    help="after ingest, vacuum the lake keeping the last N manifests")
    ap.add_argument("--optimize", action="store_true",
                    help="after ingest, force-compact delta partitions "
                         "(LSM mode) into fresh sorted bases")
    ap.add_argument("--pipeline", action="store_true",
                    help="overlap epoch N+1 normalize with epoch N merge")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--generate", action="store_true",
                    help="generate the synthetic binlog epochs first")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--read-epoch", type=int, default=None,
                    help="time travel: print row count + lsn watermark of "
                         "the committed snapshot AS OF this epoch and exit")
    ap.add_argument("--get", nargs=2, metavar=("REPO", "PATH"), default=None,
                    help="pruned point lookup of one key (reads ONE "
                         "partition's files) and exit")
    ap.add_argument("--rebucket", nargs=2, metavar=("DST", "P"), default=None,
                    help="migrate the lake's partition count: rewrite state "
                         "into DST with P partitions and exit")
    ap.add_argument("--zorder", default=None, metavar="COL[,COL...]",
                    help="OPTIMIZE ZORDER BY: rewrite every partition "
                         "Morton-sorted on these columns with per-file "
                         "min/max stats, commit as the next epoch, exit")
    ap.add_argument("--scan", nargs=3, metavar=("COL", "LO", "HI"),
                    default=None,
                    help="stats-pruned range scan (lsn bounds are ints); "
                         "prints the prune plan + matching row count, exit")
    ap.add_argument("--bootstrap", nargs=2, metavar=("SNAPSHOT", "LSN0"),
                    default=None,
                    help="Debezium-style initial load: bulk-load the "
                         "snapshot parquet as epoch 0 at LSN0, exit "
                         "(then tail the binlog with --resume)")
    ap.add_argument("--replicate", nargs=2, metavar=("DST", "CURSOR"),
                    default=None,
                    help="drain this lake's change feed into the replica "
                         "lake DST (exactly-once via the CURSOR offset "
                         "file), exit")
    ap.add_argument("--purge", nargs=2, metavar=("REPO", "PATH"),
                    default=None,
                    help="GDPR physical purge of one key from EVERY epoch's "
                         "files (time travel included); prints the digest "
                         "audit record, exit")
    ap.add_argument("--delete-where", nargs=2, metavar=("COL", "VALUE"),
                    default=None,
                    help="DELETE WHERE col = value through the standard "
                         "epoch protocol (exactly-once, feed-visible), "
                         "committed as the next epoch, exit")
    ap.add_argument("--delete-where-dv", nargs=2, metavar=("COL", "VALUE"),
                    default=None,
                    help="DELETE WHERE col = value as a DELETION-VECTOR "
                         "commit (merge-on-read: zero files rewritten, "
                         "readers mask until the next rewrite), exit")
    ap.add_argument("--add-column", nargs="+", default=None,
                    metavar="NAME TYPE [DEFAULT]",
                    help="metadata-only ALTER TABLE ADD COLUMN name "
                         "{int64,float64,string,bool} [DEFAULT json], exit")
    ap.add_argument("--vacuum-dry-run", type=int, default=None,
                    metavar="KEEP",
                    help="report what vacuum --vacuum-keep KEEP would "
                         "reclaim without deleting anything, exit")
    ap.add_argument("--create-branch", default=None, metavar="NAME",
                    help="fork a WAP staging branch off the latest "
                         "committed epoch (metadata-only), exit")
    ap.add_argument("--audit-branch", default=None, metavar="NAME",
                    help="run the DQ framework over the branch's live "
                         "state, persist audit-NNNN.json, exit")
    ap.add_argument("--publish-branch", default=None, metavar="NAME",
                    help="fast-forward main onto the branch head "
                         "(requires a PASS/WARN audit of the head), exit")
    ap.add_argument("--drop-branch", default=None, metavar="NAME",
                    help="remove a branch (safe published or not), exit")
    ap.add_argument("--list-branches", action="store_true",
                    help="list branches with fork/head epochs, exit")
    ap.add_argument("--restore", type=int, default=None, metavar="EPOCH",
                    help="RESTORE the live table to this committed epoch "
                         "(metadata-only rollback commit; stream position "
                         "is preserved), exit")
    ap.add_argument("--drop-column", default=None, metavar="COL",
                    help="metadata-only ALTER TABLE DROP COLUMN: reads hide "
                         "it instantly, later ingests strip it, exit")
    ap.add_argument("--undrop-column", default=None, metavar="COL",
                    help="lift a drop_column marker (refuses while any "
                         "referenced file still carries the bytes), exit")
    ap.add_argument("--rename-column", default=None, nargs=2,
                    metavar=("OLD", "NEW"),
                    help="metadata-only ALTER TABLE RENAME COLUMN: reads "
                         "translate instantly via schema aliases, ingests "
                         "map the old name, exit")
    ap.add_argument("--clone", default=None, metavar="DST_DIR",
                    help="CLONE TABLE: hardlink every referenced file into "
                         "DST_DIR + one manifest commit — an instant, fully "
                         "independent copy of the head state, exit")
    ap.add_argument("--stats", action="store_true",
                    help="metadata-only COUNT/MIN/MAX from the manifest "
                         "(reads data only for uncompacted partitions), "
                         "exit")
    args = ap.parse_args()

    if args.restore is not None:
        # metadata-only: no Ray session needed
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        print(json.dumps({"restore": _lake.restore(args.lake_dir,
                                                   args.restore)}))
        return 0

    if args.clone is not None:
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        print(json.dumps({"clone": _lake.clone_lake(args.lake_dir,
                                                    args.clone)}))
        return 0

    if (args.drop_column is not None or args.undrop_column is not None
            or args.rename_column is not None):
        # metadata-only (undrop reads parquet footers, still no Ray session)
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        if args.drop_column is not None:
            print(json.dumps({"drop_column": _lake.drop_column(
                args.lake_dir, args.drop_column)}))
        elif args.undrop_column is not None:
            print(json.dumps({"undrop_column": _lake.undrop_column(
                args.lake_dir, args.undrop_column)}))
        else:
            print(json.dumps({"rename_column": _lake.rename_column(
                args.lake_dir, *args.rename_column)}))
        return 0

    if args.add_column is not None:
        # metadata-only: one manifest commit, no Ray session
        import pyarrow as _pa
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        if not 2 <= len(args.add_column) <= 3:
            raise SystemExit("--add-column NAME TYPE [DEFAULT]")
        name, typ = args.add_column[0], args.add_column[1]
        typemap = {"int64": _pa.int64(), "float64": _pa.float64(),
                   "string": _pa.string(), "bool": _pa.bool_()}
        if typ not in typemap:
            raise SystemExit(f"--add-column type must be one of "
                             f"{sorted(typemap)}")
        default = (json.loads(args.add_column[2])
                   if len(args.add_column) == 3 else None)
        print(json.dumps({"add_column": _lake.add_column(
            args.lake_dir, name, typemap[typ], default=default)}))
        return 0

    if args.vacuum_dry_run is not None:
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        out = _lake.vacuum(args.lake_dir, keep_last=args.vacuum_dry_run,
                           dry_run=True)
        out["files"] = out["files"][:20] + (
            [f"... {len(out['files']) - 20} more"]
            if len(out["files"]) > 20 else [])
        print(json.dumps({"vacuum_dry_run": out}))
        return 0

    if args.stats:
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        print(json.dumps({"table_stats": _lake.table_stats(args.lake_dir)}))
        ray.shutdown()
        return 0

    if (args.create_branch or args.publish_branch or args.drop_branch
            or args.list_branches):
        # metadata-only branch ops: no Ray session needed
        from e_commerce_batch_etl_pipeline_ray.cdc import branch as _br
        if args.create_branch:
            print(json.dumps({"create_branch": _br.create_branch(
                args.lake_dir, args.create_branch)}))
        elif args.publish_branch:
            print(json.dumps({"publish_branch": _br.publish_branch(
                args.lake_dir, args.publish_branch, require_audit=True)}))
        elif args.drop_branch:
            _br.drop_branch(args.lake_dir, args.drop_branch)
            print(json.dumps({"drop_branch": args.drop_branch}))
        else:
            print(json.dumps({"branches": _br.list_branches(args.lake_dir)}))
        return 0

    if args.audit_branch:
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        from e_commerce_batch_etl_pipeline_ray.cdc import branch as _br
        from e_commerce_batch_etl_pipeline_ray.quality.checks import DQConfig
        report, status = _br.audit_branch(
            args.lake_dir, args.audit_branch,
            DQConfig(min_rows=1, max_null_pct={"repo": 0.0, "path": 0.0}))
        print(json.dumps({"audit_branch": args.audit_branch,
                          "status": status, "checks": len(report)}))
        ray.shutdown()
        return 0

    if (args.get is not None or args.rebucket is not None
            or args.zorder is not None or args.scan is not None
            or args.bootstrap is not None or args.replicate is not None
            or args.purge is not None or args.delete_where is not None
            or args.delete_where_dv is not None or args.read_dlq):
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        if args.read_dlq:
            from e_commerce_batch_etl_pipeline_ray.cdc import dlq as _dlq
            df = _dlq.read_dlq(args.lake_dir).to_pandas()
            by = (df.groupby("_dlq_reason").size().to_dict()
                  if len(df) else {})
            print(json.dumps({"dlq_rows": len(df),
                              "by_reason": {k: int(v)
                                            for k, v in sorted(by.items())}}))
        elif args.get is not None:
            rows = _lake.point_read(args.lake_dir,
                                    [tuple(args.get)]).take_all()
            print(json.dumps({"key": args.get, "found": bool(rows),
                              **({k: v for k, v in rows[0].items()
                                  if k != "content"} if rows else {})}))
        elif args.rebucket is not None:
            dst, p = args.rebucket
            print(json.dumps({"rebucket": _lake.rebucket(
                args.lake_dir, dst, num_partitions=int(p))}))
        elif args.zorder is not None:
            from e_commerce_batch_etl_pipeline_ray.cdc import zorder as _z
            print(json.dumps({"zorder": _z.optimize_zorder(
                args.lake_dir, by=args.zorder.split(","))}))
        elif args.scan is not None:
            from e_commerce_batch_etl_pipeline_ray.cdc import zorder as _z
            col, lo, hi = args.scan
            if col == "lsn":
                lo, hi = int(lo), int(hi)
            plan = _z.plan_range_scan(args.lake_dir, {col: (lo, hi)})
            n = _z.range_scan(args.lake_dir, {col: (lo, hi)}).count()
            print(json.dumps({"col": col, "lo": lo, "hi": hi, "rows": n,
                              "files_total": plan["files_total"],
                              "files_pruned": plan["files_pruned"]}))
        elif args.purge is not None:
            print(json.dumps({"purge": _lake.purge_keys(
                args.lake_dir, [tuple(args.purge)])}))
        elif args.delete_where is not None:
            import pyarrow.compute as _pc

            from e_commerce_batch_etl_pipeline_ray.cdc import engine as _eng
            col, value = args.delete_where
            eng = _eng.CDCEngine(_eng.CDCConfig(
                lake_dir=args.lake_dir, num_partitions=args.partitions,
                merge_concurrency=args.merge_concurrency))
            last = eng.last_committed_epoch()
            st = eng.delete_where(lambda t: _pc.equal(t[col], value),
                                  (last or 0) + 1, columns=[col])
            print(json.dumps({"delete_where": {"col": col, "value": value,
                                               "epoch": st.epoch,
                                               "deleted": st.events_in}}))
        elif args.delete_where_dv is not None:
            import pyarrow.compute as _pc
            col, value = args.delete_where_dv
            out = _lake.delete_where_dv(
                args.lake_dir, lambda t: _pc.equal(t[col], value),
                columns=[col])
            print(json.dumps({"delete_where_dv": {"col": col,
                                                  "value": value, **out}}))
        elif args.replicate is not None:
            from e_commerce_batch_etl_pipeline_ray.cdc import feed as _feed
            dst, cursor = args.replicate
            print(json.dumps({"replicate": _feed.replicate(
                args.lake_dir, dst, cursor,
                merge_concurrency=args.merge_concurrency)}))
        else:
            snap_path, lsn0 = args.bootstrap
            from e_commerce_batch_etl_pipeline_ray.cdc import engine as _eng
            from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
                read_parquet_clean,
            )
            eng = _eng.CDCEngine(_eng.CDCConfig(
                lake_dir=args.lake_dir, num_partitions=args.partitions,
                merge_concurrency=args.merge_concurrency))
            st = eng.bootstrap(read_parquet_clean(snap_path),
                               lsn0=int(lsn0))
            print(json.dumps({"bootstrap": {"rows": st.rows_applied,
                                            "lsn0": st.lsn_watermark,
                                            "partitions":
                                                st.partitions_touched}}))
        ray.shutdown()
        return 0

    if args.read_epoch is not None:
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        import ray.data
        ray.data.DataContext.get_current().enable_progress_bars = False
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        m = _lake.read_manifest(args.lake_dir, args.read_epoch)
        n = _lake.read_lake(args.lake_dir, epoch=args.read_epoch).count()
        print(json.dumps({"epoch": args.read_epoch, "rows": n,
                          "lsn_watermark": m.get("lsn_watermark")}))
        ray.shutdown()
        return 0

    if args.history:
        import os as _os

        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        last = _lake.last_committed_epoch(args.lake_dir)
        if last is None:
            print(json.dumps({"error": "no committed epochs"}))
            return 1
        for ep in range(last + 1):
            try:
                m = _lake.read_manifest(args.lake_dir, ep)
            except FileNotFoundError:
                continue        # vacuumed
            print(json.dumps({"epoch": ep,
                              "lsn_watermark": m.get("lsn_watermark"),
                              **m.get("metrics", {})}))
        return 0

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        silence_empty_bundle_warnings,
    )
    silence_empty_bundle_warnings()
    ctx.read_op_min_num_blocks = 32

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine

    spec = binlog.BinlogSpec(events_per_epoch=args.events_per_epoch,
                             n_repos=max(20, args.events_per_epoch // 2000),
                             paths_per_repo=500, evolution_epoch=1)
    if args.generate:
        for ep in range(args.epochs):
            d = os.path.join(args.binlog_dir, f"ep{ep:04d}")
            # a crashed earlier generate can leave an EMPTY dir — treat
            # it as absent (reading it would fail much later with a
            # cryptic schema-None error at ingest)
            if os.path.isdir(d) and not os.listdir(d):
                os.rmdir(d)
            if not os.path.isdir(d):
                binlog.gen_epoch(spec, ep, override_num_blocks=32).write_parquet(d)

    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=args.lake_dir,
        num_partitions=args.partitions,
        merge_concurrency=args.merge_concurrency,
        compact_interval=args.compact_interval,
        verify_sha=args.verify_sha,
        dlq=args.dlq,
        cache_partitions=False,
        backend=args.backend,
        gc_lateness_epochs=args.gc_lateness_epochs,
    ))

    if args.resume:
        start = eng.resume_point()
    else:
        if eng.last_committed_epoch() is not None:
            print(json.dumps({"error": "lake not empty; pass --resume"}))
            return 2
        start = 0

    t0 = time.perf_counter()
    total = 0

    def _evs(ep):
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import read_parquet_clean
        path = os.path.join(args.binlog_dir, f"ep{ep:04d}")
        if not os.path.isdir(path) or not os.listdir(path):
            raise SystemExit(
                f"binlog epoch dir {path} is missing or empty — "
                "regenerate with --generate (a crashed generate leaves "
                "empty dirs; they are now auto-cleaned)")
        return read_parquet_clean(path, override_num_blocks=32)

    if args.pipeline:
        stats = eng.ingest_epochs_pipelined(
            [(ep, _evs(ep)) for ep in range(start, args.epochs)],
            events_in=args.events_per_epoch)
        total = args.events_per_epoch * len(stats)
        for st in stats:
            print(json.dumps({"epoch": st.epoch, "rows_applied": st.rows_applied,
                              "lsn_watermark": st.lsn_watermark,
                              "partitions_touched": st.partitions_touched,
                              "bytes_written": st.bytes_written}))
    else:
        for ep in range(start, args.epochs):
            st = eng.ingest_epoch(_evs(ep), ep, events_in=args.events_per_epoch)
            total += args.events_per_epoch
            print(json.dumps({"epoch": ep, "rows_applied": st.rows_applied,
                              "lsn_watermark": st.lsn_watermark,
                              "partitions_touched": st.partitions_touched,
                              "bytes_written": st.bytes_written}))
    elapsed = time.perf_counter() - t0
    if args.optimize:
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        print(json.dumps({"optimize": _lake.optimize(args.lake_dir)}))
    if args.vacuum_keep is not None:
        from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
        print(json.dumps({"vacuum": _lake.vacuum(args.lake_dir,
                                                 keep_last=args.vacuum_keep)}))
    final_rows = (eng.read().count()
                  if eng.last_committed_epoch() is not None else 0)
    print(json.dumps({
        "status": "ok", "epochs_ingested": args.epochs - start,
        "events": total, "elapsed_s": round(elapsed, 3),
        "events_per_sec": round(total / elapsed) if elapsed > 0 else None,
        "final_rows": final_rows,
    }))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
