"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: the CDC ingest engine (BASELINE.json north_star) on a small
    deterministic binlog — generate -> normalize+LWW combine -> hash shuffle
    -> merge-apply -> exactly-once manifest commit, two epochs across the
    schema-evolution boundary; returns the final live lake table. (The
    batch-relational showcase is queries()['q1_pricing_summary'].)"""
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine
    spec = binlog.BinlogSpec(events_per_epoch=3000, n_repos=12,
                             paths_per_repo=80, evolution_epoch=1,
                             content_chars_min=32, content_chars_max=256)
    lake_dir = tempfile.mkdtemp(prefix="entry_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(spec, ep), ep)
    return eng.read().sort(["repo", "path"])


# The driver's correctness gate evaluates the FIRST 50 queries() entries, so
# this ordering is curated: flagships first (q1/q24/q26), then a
# representative cross-section of every operator family — core relational,
# the exact-oracle near-dup chain, sampling/splits, window functions,
# rollup/cube, outer joins, and the CDC-lakehouse layer (time travel, change
# feed, SCD2, MERGE INTO, Z-order scan, indexed BM25, PageRank, incremental
# dedup states, watermarked windows). Every name below has a DuckDB oracle
# (full rows+schema+hash check); remaining queries keep registry order.
DRIVER_WINDOW = [
    "q1_pricing_summary", "q24_cdc_ingest", "q26_orders_pipeline",
    "q3_dedup_lww",
    "q6_hash_join",
    "q11_window_agg", "q13_dq_report",
    "q32_asof_join",
    "q33_analytics_cube",
    "q45_neardup_keep_exact",
    "q52_allpairs_jaccard",
    "q83_edit_distance_join",
    "q51_cube",
    "q71_full_outer_join", "q90_cdc_change_feed",
    "q95_lm_perplexity",
    "q96_duplicated_substrings", "q107_bm25_indexed",
    "q108_pagerank", "q110_incremental_dedup",
    "q111_incremental_neardup", "q114_windowed_watermark",
    "q116_session_windows",
    # round-4 session-2 families (sketches, set algebra, graph, robust)
    "q125_incremental_kmv",
    # round-4 session-3: CDC semantics depth + compressed ANN. Displaced
    # entries keep family coverage via siblings in the window: lookup join
    # via q6/q71, token stats via q20/q95/q96, IVF exact via q135 (which
    # drives the same probe/pruned-read shape through PQ), mixture via
    # q100, basic window fns via q11+q67.
    "q133_incremental_cms",
    "q135_knn_pq_exact", "q136_pk_change",
    # round-4 session-4/5: cell-grain feed over LSM boundaries and
    # bloom-pruned point reads (the one point-read entry in the window).
    # Displaced: q119/q121 one-shot sketches — their kernels are driven
    # through the lake protocol by q125/q133 above.
    "q137_patch_feed", "q139_bloom_point_read",
    # round-4 session-6: the WAP staging workflow (branch isolation +
    # audited fast-forward publish) and the triple-pruned per-key history.
    # Displaced: q46 (the exact near-dup family keeps q44/q45/q48/q52)
    # and q117 (the sketch family keeps q125/q133, which drive the
    # mergeable-sketch machinery through the lake protocol; HLL's
    # register kernel stays pytest-pinned and q117/q118 stay registered).
    "q144_branch_wap", "q146_key_history",
    # round-4 session-7: schema governance + optimistic concurrency —
    # metadata-only DROP COLUMN (hide-at-read + strip-at-ingest) and the
    # commit-CAS conflict retry whose scenario also drives RENAME COLUMN
    # end-to-end (alias translation at read AND old-name mapping at
    # ingest; q153 stays registered+oracled). Displaced: q48 (the exact
    # near-dup family keeps q44/q45/q52 and the incremental q111) and
    # q109 (ASOF semantics stay via q32, SCD2 via q92).
    "q152_drop_column", "q154_concurrent_schema_change",
    # round-4 session-8: merge-on-read DELETION VECTORS (q159 — displaces
    # q131, predicate-delete semantics stay covered since q159's oracle is
    # the same LWW-minus-predicate window and its engine path exercises
    # strictly more: masked reads, covers-pinned LSM safety), ADD COLUMN
    # with DEFAULT (q161 — schema governance family joins q152/q154), and
    # the MANIFEST DELTA-LOG (q163 — the metadata-plane scale shape).
    # Displaced besides q131: q126 (graph family keeps q108 pagerank) and
    # q127 (robust/agg family keeps q33/q50/q51/q67); all stay registered
    # and oracled past the window.
    "q159_deletion_vectors", "q161_add_column_default",
    "q163_manifest_delta_log",
    # round-4 session-9: the stream-stream interval-join family enters the
    # window via its OUTER superset (q170 drives inner pairs + buffer
    # crossing + timeout emission + finalize in one chain; q164 stays
    # registered+oracled) and corpus-rewrite paragraph dedup (q167, a new
    # family: in-place document rewrite, skinny winner shuffle).
    # Displaced: q17 (the brute-KNN kernel is the EQUALITY baseline inside
    # q135's exact-mode oracle) and q50 (q51 CUBE supersets ROLLUP's
    # grain machinery — both share the one finest-grain combiner scan).
    "q170_stream_outer_join", "q167_paragraph_dedup",
    # round-5: ~11 slots rotated toward families the driver has NEVER
    # externally gated (VERDICT r4 next-task #3) — feed-maintained index
    # views (q112), GDPR physical purge (q132), incremental histogram
    # state (q142), the remaining schema-governance trio (q153 rename /
    # q155 replaceWhere / q156 generated columns), the LLM corpus ops
    # (q165 composed pipeline, q166 DSIR, q169 token-budget selection),
    # incremental paragraph dedup (q172), and the new exact-substring
    # removal (q173). Displaced, each with its kernel still driven by an
    # in-window superset sibling (all stay registered + oracled):
    # q4 (grouped agg w/ distinct — q33/q51 drive the same combiner at
    # coarser+finer grains), q14 (exact dedup — q110 drives the kernel
    # through the lake protocol; q3 keeps LWW), q20 (lang-id — q165
    # composes it inside ONE oracled chain), q25 (sessionize — q116
    # session windows superset), q44 (near-dup pairs — q45/q52/q111 keep
    # the family end-to-end), q67 (frame aggs — q11/q114 keep windows),
    # q76 (time travel — q90/q146/q163 drive the manifest plane), q92
    # (SCD2 — q146 keys the same per-key history machinery), q94 (MERGE
    # INTO — q24's merge-apply + q159's delete path are its two halves),
    # q100 (group split — q169 represents sampling/selection), q105
    # (z-order scan — q139/q159/q163 keep pruned reads + metadata).
    # (continued) q175 atomic multi-table transaction joins the window —
    # a protocol family the driver has never gated; displaced q130, whose
    # cell-LWW merge kernel q137's oracle replays verbatim (it builds the
    # same patch lake and diffs its epoch prefix states).
    "q112_index_view", "q132_gdpr_purge", "q142_incremental_hist",
    "q153_rename_column", "q155_replace_where", "q156_generated_columns",
    "q165_llm_corpus_pipeline", "q166_dsir_selection", "q169_budget_select",
    "q172_incremental_paradedup", "q173_exact_substring_removal",
    "q175_multi_table_txn",
]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2,
    ordered so the driver's 50-query window sees a cross-section of the
    full surface (see DRIVER_WINDOW)."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    ordered = {name: Q.QUERIES[name] for name in DRIVER_WINDOW}
    ordered.update((n, f) for n, f in Q.QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys missing
    here get a rows-only check (non-SQL-expressible ops: near-dup sketches,
    model-scoring stages). q24 (CDC flagship) and q26 (orders chain) read
    deterministic parquet fixtures shared with their Ray pipelines —
    materialized here too so the driver may evaluate either side first."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    Q.ensure_oracle_fixtures()
    Q.ensure_q93_fixture()
    Q.ensure_patch_fixture()
    Q.ensure_rename_fixture()
    return dict(Q.ORACLE)
