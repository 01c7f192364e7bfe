"""Benchmark harness — prints ONE JSON line.

Headline metric: CDC change-event ingest throughput. A deterministic binlog
(sized from the sf dir's lineitem row count) is pre-materialized to parquet
UNTIMED (a CDC engine tails an existing log); the timed section is the full
ingest: read -> normalize -> LWW combine -> hash shuffle -> merge-apply ->
sorted compacted write -> manifest commit, for every epoch, plus a final
lake read-back count.

Also times a representative subset of the operator-conformance queries over
$GRAFT_SF_DIR.

Usage:
    python bench.py                 # one JSON line on stdout
    python bench.py --scaling       # run at 8 and 32 CPUs in fresh
                                    # processes; report both + efficiency
Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))
BENCH_QUERIES = ["q1_pricing_summary", "q3_dedup_lww", "q6_hash_join",
                 "q11_window_agg", "q14_exact_dedup", "q15_token_stats",
                 "q17_knn_brute", "q18_minhash_pairs", "q25_sessionize",
                 "q33_analytics_cube", "q92_scd2_history",
                 "q95_lm_perplexity", "q96_duplicated_substrings",
                 "q107_bm25_indexed", "q108_pagerank",
                 "q110_incremental_dedup", "q111_incremental_neardup",
                 "q117_hll_registers", "q119_kmv_synopsis",
                 "q121_cms_counters", "q124_weighted_topk",
                 "q126_triangles", "q128_robust_outlier_filter",
                 "q130_patch_cdc", "q131_delete_where",
                 "q133_incremental_cms", "q134_knn_pq",
                 "q137_patch_feed", "q138_audio_logmel",
                 "q139_bloom_point_read",
                 # session 6: exactly-once DB replication, WAP branches,
                 # metadata-only stats, triple-pruned key history,
                 # CHECK-constraint quarantine
                 "q143_db_replica", "q144_branch_wap", "q145_table_stats",
                 "q146_key_history", "q147_check_constraint_dlq",
                 # session 8: merge-on-read deletion vectors, Gopher
                 # repetition signals, manifest delta-log, stream-stream
                 # interval join, the composed end-to-end corpus pipeline
                 "q159_deletion_vectors", "q160_gopher_repetition",
                 "q163_manifest_delta_log", "q164_stream_interval_join",
                 "q165_llm_corpus_pipeline",
                 # session 9: corpus-rewrite dedup, C4 + Gopher-A1 filters,
                 # budget selection, outer stream join
                 "q167_paragraph_dedup", "q168_c4_clean",
                 "q169_budget_select", "q170_stream_outer_join",
                 "q171_gopher_quality",
                 # round 5: incremental paragraph dedup, exact-substring
                 # removal, hybrid RRF retrieval, multi-table txn,
                 # per-group budget selection
                 "q172_incremental_paradedup",
                 "q173_exact_substring_removal", "q174_hybrid_rrf",
                 "q175_multi_table_txn", "q176_budget_select_grouped",
                 "q177_top_ngrams", "q178_cross_perplexity",
                 "q179_rag_chunk_bm25", "q180_incremental_corpus_select"]


def _lineitem_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows


def materialize_binlog(spec, epochs: int, out_dir: str) -> None:
    """UNTIMED: write the binlog epochs to parquet (the log the engine tails)."""
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    for ep in range(epochs):
        d = os.path.join(out_dir, f"ep{ep:04d}")  # no '=' -> no hive-partition column inference
        if os.path.isdir(d) and not os.listdir(d):
            os.rmdir(d)           # crashed earlier generate left an empty dir
        if not os.path.isdir(d):
            binlog.gen_epoch(spec, ep, override_num_blocks=32).write_parquet(d)


def run_bench() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        silence_empty_bundle_warnings,
    )
    silence_empty_bundle_warnings()
    ctx.read_op_min_num_blocks = 32   # constant across CPU levels; no sliver blocks
    # ~5-10% faster sort shuffle at this scale (was the deprecated
    # use_push_based_shuffle=True; BENCH_SHUFFLE=hash_shuffle selects Ray's
    # hash-shuffle backend instead for A/B runs)
    from ray.data.context import ShuffleStrategy
    ctx.shuffle_strategy = {
        "push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED,
        "pull": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
        "hash_shuffle": ShuffleStrategy.HASH_SHUFFLE,
    }[os.environ.get("BENCH_SHUFFLE", "push")]


    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import read_parquet_clean

    n_li = _lineitem_rows(SF_DIR)
    events_per_epoch = int(os.environ.get("BENCH_EVENTS", str(2 * n_li)))
    spec = binlog.BinlogSpec(
        events_per_epoch=events_per_epoch,
        n_repos=max(20, n_li // 2000),
        paths_per_repo=500,
        evolution_epoch=1,
        content_chars_min=64,
        content_chars_max=2048,
    )
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    log_dir = f"/tmp/bench_binlog_{sf_tag}_{events_per_epoch}"
    materialize_binlog(spec, EPOCHS, log_dir)

    lake_dir = f"/tmp/bench_lake_{sf_tag}_{os.getpid()}"

    # warm-up (untimed): page cache, worker pool, merge-actor code paths —
    # a full tiny ingest into a throwaway lake
    # page-cache warm per epoch dir: one read spanning all epochs mixes the
    # pre- and post-evolution schemas (epoch 1 adds `lang`) and Ray rightly
    # warns about the mixed-schema bundles — per-epoch reads are uniform
    for _ep in range(EPOCHS):
        read_parquet_clean(os.path.join(log_dir, f"ep{_ep:04d}")).count()
    warm_spec = binlog.BinlogSpec(events_per_epoch=20_000, n_repos=10,
                                  paths_per_repo=50, evolution_epoch=1,
                                  content_chars_min=32, content_chars_max=128)
    warm_lake = f"{lake_dir}.warm"
    shutil.rmtree(warm_lake, ignore_errors=True)
    warm_eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=warm_lake, num_partitions=16,
        merge_concurrency=max(2, NUM_CPUS // 2), cache_partitions=False,
        backend=os.environ.get("BENCH_BACKEND", "actor_pool")))
    warm_eng.ingest_epoch(binlog.gen_epoch(warm_spec, 0), 0)
    if warm_eng._pool is not None:
        warm_eng._pool.shutdown()
    shutil.rmtree(warm_lake, ignore_errors=True)

    # timed: best of BENCH_ROUNDS full ingests (sustained steady-state
    # throughput; identical back-to-back runs on this single host spread
    # 8.7-23.6 s from OS/scheduler noise, so best-of-3 is the floor for a
    # number worth recording)
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    cdc_sec = float("inf")
    final_rows = 0
    for _ in range(rounds):
        shutil.rmtree(lake_dir, ignore_errors=True)
        eng = engine.CDCEngine(engine.CDCConfig(
            lake_dir=lake_dir,
            num_partitions=int(os.environ.get("BENCH_PARTITIONS", "64")),
            merge_concurrency=max(2, NUM_CPUS // 2),
            cache_partitions=False,
            verify_sha=True,
            backend=os.environ.get("BENCH_BACKEND", "actor_pool"),
        ))
        # Epoch pipelining helps the actor_pool backend (it materializes
        # normalized blocks before the fan-out, so prefetching epoch N+1's
        # normalize overlaps real work). The map_groups backend already
        # streams normalize into the sort within an epoch — forcing a
        # materialize barrier there is a 2x LOSS, so keep it off.
        default_pipe = "1" if eng.cfg.backend == "actor_pool" else "0"
        pipelined = os.environ.get("BENCH_PIPELINE", default_pipe) == "1"
        t0 = time.perf_counter()
        if pipelined:
            eng.ingest_epochs_pipelined(
                [(ep, read_parquet_clean(os.path.join(log_dir, f"ep{ep:04d}"),
                                         override_num_blocks=32))
                 for ep in range(EPOCHS)],
                events_in=events_per_epoch)
        else:
            for ep in range(EPOCHS):
                evs = read_parquet_clean(os.path.join(log_dir, f"ep{ep:04d}"),
                                         override_num_blocks=32)
                eng.ingest_epoch(evs, ep, events_in=events_per_epoch)
        final_rows = eng.read().count()
        cdc_sec = min(cdc_sec, time.perf_counter() - t0)
        if eng._pool is not None:
            eng._pool.shutdown()
    total_events = events_per_epoch * EPOCHS

    # change-data-feed read over the full ingest (3 epochs x 64 partitions
    # of multi-100MB state): the per-partition diff kernel at bench scale
    from e_commerce_batch_etl_pipeline_ray.cdc import feed as cdc_feed
    tf = time.perf_counter()
    feed_rows = cdc_feed.change_feed(lake_dir, 0, EPOCHS - 1).count()
    feed_sec = round(time.perf_counter() - tf, 3)

    # OPTIMIZE ZORDER + stats-pruned range scan over the full bench lake
    # (64 partitions of multi-100MB state): rewrite cost and the pruned
    # scan wall vs the unpruned snapshot filter
    from e_commerce_batch_etl_pipeline_ray.cdc import zorder as cdc_zorder
    tz = time.perf_counter()
    cdc_zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    zorder_sec = round(time.perf_counter() - tz, 3)
    # mid-stream box: epoch-0 rows predate the lang column (all null), so
    # the lsn range targets epoch 1 where lang exists
    scan_pred = {"lang": ("go", "go"),
                 "lsn": (events_per_epoch, 2 * events_per_epoch)}
    ts = time.perf_counter()
    scan_rows = cdc_zorder.range_scan(lake_dir, scan_pred).count()
    scan_sec = round(time.perf_counter() - ts, 3)
    shutil.rmtree(lake_dir, ignore_errors=True)

    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = Q.QUERIES[name]
        tq = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize()
        q_times[name] = round(time.perf_counter() - tq, 3)

    return {
        "metric": "cdc_ingest_events_per_sec",
        "value": round(cdc_sec, 3),
        "unit": "sec",
        "events_per_sec": round(total_events / cdc_sec),
        "total_events": total_events,
        "epochs": EPOCHS,
        "final_rows": final_rows,
        "feed_sec": feed_sec,
        "feed_rows": feed_rows,
        "zorder_sec": zorder_sec,
        "scan_sec": scan_sec,
        "scan_rows": scan_rows,
        "queries": q_times,
        "sf": sf_tag,
        "num_cpus": NUM_CPUS,
    }


def run_scaling() -> None:
    """Fresh process per parallelism level, same input; efficiency =
    (T_low / T_high) / (cpus_high / cpus_low)."""
    lo = int(os.environ.get("BENCH_SCALE_LO", "8"))
    hi = int(os.environ.get("BENCH_SCALE_HI", "32"))
    out = {}
    for n in (lo, hi):
        # scaling evidence uses the cluster-shuffle backend (map_groups):
        # it is the multi-node-shaped path (real hash shuffle between
        # stages) and is CPU-bound, so CPU scaling is meaningful. The
        # actor_pool backend exploits single-host shared memory (block-ref
        # fan-out) and saturates this input well below 32 CPUs — higher
        # absolute throughput, but not a cluster-scaling measurement.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   BENCH_BACKEND=os.environ.get("BENCH_SCALE_BACKEND",
                                                "map_groups"),
                   # min-of-3 per level: single-host wall times vary by
                   # 10-20%; the scaling ratio needs tight per-level minima
                   BENCH_ROUNDS=os.environ.get("BENCH_SCALE_ROUNDS", "3"),
                   # scaling evidence runs LARGER epochs than the headline
                   # bench: short high-CPU runs (~20 s) carry 10-25% noise
                   # from per-epoch barriers and OS scheduling, which the
                   # efficiency RATIO amplifies; 2.4M-event epochs measure
                   # the amortized steady state (repeated runs: 0.85-0.95
                   # vs 0.72-0.95 at 1.2M)
                   BENCH_EVENTS=os.environ.get("BENCH_SCALE_EVENTS",
                                               "2400000"))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, check=True)
        out[n] = json.loads(r.stdout.strip().splitlines()[-1])
    t_lo, t_hi = out[lo]["value"], out[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "cpus_low": lo, "cpus_high": hi,
        "sec_low": t_lo, "sec_high": t_hi,
        "events_per_sec_low": out[lo]["events_per_sec"],
        "events_per_sec_high": out[hi]["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": out[hi]["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        result = run_bench()
        import ray
        ray.shutdown()
        print(json.dumps(result))
