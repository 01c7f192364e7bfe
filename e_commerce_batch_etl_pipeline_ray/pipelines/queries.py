"""Operator-conformance queries over the driver's TPC-H-ish testdata tables.

Every entry exercises one operator family from SURVEY.md §2 as a Ray Data
pipeline AND has a matching ANSI-SQL oracle (ORACLE dict) that DuckDB runs on
the same parquet files. Column names/aliases match exactly between the two —
the driver's compare hashes values after sorting columns by name.

Convention: each query fn takes ``sf_dir`` and returns a Dataset / pa.Table.
Small results may be materialized; large results stay Datasets.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.functions import scalar as F
from e_commerce_batch_etl_pipeline_ray.stages import (
    aggregates,
    blockutil,
    dedup,
    joins,
    maps,
    sorts,
)


_TUNED = False


def _tune_context() -> None:
    """One-time DataContext tuning: Ray's default read sharding
    (read_op_min_num_blocks=200) splits small/medium inputs into hundreds of
    sliver blocks and every downstream op pays 200x task overhead; cap the
    minimum at the CPU count."""
    global _TUNED
    if _TUNED:
        return
    import ray as _ray
    ctx = ray.data.DataContext.get_current()
    try:
        ncpu = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        ncpu = 8
    ctx.read_op_min_num_blocks = max(8, ncpu)
    _TUNED = True


def _strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). The testdata parquet carries
    a pandas metadata blob that makes pa.Schema UNHASHABLE — Ray then logs
    'Failed to hash the schemas (for deduplication)' per task and loses its
    block-schema dedup."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read with blocks sized from the ACTUAL row count —
    Ray's parallelism heuristic splits a 5k-row file into 64 sliver blocks
    and every downstream op (especially sorts) pays 64x task overhead.
    Metadata-stripped at the read (read_parquet_clean) so the READ
    operator's own block-schema dedup works."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    _tune_context()
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, f"{table}.parquet")
    rows = pq.read_metadata(path).num_rows
    blocks = max(1, min(64, rows // 8192))
    return read_parquet_clean(path, columns=columns,
                              override_num_blocks=blocks)


# ---------------------------------------------------------------------------
# q1 — pricing summary (A2 grouped multi-agg with pre-aggregation; TPC-H Q1 shape)

def q1_pricing_summary(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                    "l_extendedprice", "l_discount", "l_shipdate"])
    ds = maps.filter_expr(
        lambda t: pc.less_equal(t["l_shipdate"], pa.scalar("1998-09-02").cast(pa.timestamp("us"))),
        name="shipdate_filter").apply(ds)
    ds = maps.with_columns({
        "disc_price": lambda t: pc.multiply(t["l_extendedprice"],
                                            pc.subtract(pa.scalar(1.0), t["l_discount"])),
    }).apply(ds)
    out = aggregates.grouped_aggregate(
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty"),
         ("sum", "l_extendedprice", "sum_base_price"),
         ("sum", "disc_price", "sum_disc_price"),
         ("mean", "l_quantity", "avg_qty"),
         ("count", None, "count_order")],
        # 6 fixed groups (returnflag x linestatus): driver-side final merge
        # of the per-block partials — no all-to-all for a dashboard shape
        pre_aggregate=True, final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
            t = t.set_column(t.column_names.index(c), c, F.round2(t[c], 2))
        return t
    return out.map_batches(_round, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"])


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q2 — row-local filter + derived columns (M7/M8/M9/M10)

def q2_filter_derive(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity",
                                    "l_extendedprice", "l_discount", "l_shipdate",
                                    "l_returnflag"])
    ds = maps.filter_expr(
        lambda t: pc.and_(pc.greater(t["l_quantity"], 30.0),
                          pc.greater(t["l_discount"], 0.02)),
        name="qty_disc_filter").apply(ds)
    ds = maps.with_columns({
        "ship_year": lambda t: F.year(t["l_shipdate"]),
        "ship_month": lambda t: F.month(t["l_shipdate"]),
        "ship_quarter": lambda t: F.quarter(t["l_shipdate"]),
        "revenue": lambda t: F.round2(pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])), 2),
        "is_returned": lambda t: pc.equal(t["l_returnflag"], "R"),
    }).apply(ds)
    return maps.select(["l_orderkey", "l_linenumber", "ship_year", "ship_month",
                        "ship_quarter", "revenue", "is_returned"]).apply(ds)


Q2_SQL = """
SELECT l_orderkey, l_linenumber,
       EXTRACT(year FROM l_shipdate) AS ship_year,
       EXTRACT(month FROM l_shipdate) AS ship_month,
       EXTRACT(quarter FROM l_shipdate) AS ship_quarter,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue,
       (l_returnflag = 'R') AS is_returned
FROM lineitem
WHERE l_quantity > 30 AND l_discount > 0.02
"""


# ---------------------------------------------------------------------------
# q3 — keyed dedup, deterministic last-writer-wins (D2 / the CDC upsert core)

def q3_dedup_lww(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    ds = dedup.dedup_keyed(["user_id", "event_type"], ["ts", "event_id"],
                           descending=True, num_partitions=32).apply(ds)
    return maps.select(["user_id", "event_type", "event_id", "value"]).apply(ds)


Q3_SQL = """
SELECT user_id, event_type, event_id, value
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q4 — grouped multi-agg + exact count-distinct (A2)

def q4_group_agg_distinct(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                                  "o_totalprice", "o_orderdate"])
    ds = maps.with_columns({
        "order_year": lambda t: F.year(t["o_orderdate"]),
    }).apply(ds)
    base = aggregates.grouped_aggregate(
        ["order_year", "o_orderstatus"],
        [("count", None, "n_orders"),
         ("sum", "o_totalprice", "sum_price"),
         ("mean", "o_totalprice", "avg_price")],
        pre_aggregate=True, final="driver").apply(ds)
    distinct = aggregates.count_distinct(
        ["order_year", "o_orderstatus"], "o_custkey", "n_customers",
        final="driver").apply(ds)
    # both sides are tiny aggregate outputs -> driver-side merge is fine
    bt = blockutil.collect_arrow(base)
    dt = blockutil.collect_arrow(distinct)
    bdf = bt.to_pandas().merge(dt.to_pandas(), on=["order_year", "o_orderstatus"])
    bdf["sum_price"] = bdf["sum_price"].round(2)
    bdf["avg_price"] = bdf["avg_price"].round(2)
    return pa.Table.from_pandas(bdf.sort_values(["order_year", "o_orderstatus"]),
                                preserve_index=False)


Q4_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q5 — broadcast lookup join (J1): customer -> nation name, then rollup

def q5_lookup_join(sf_dir: str):
    nation = blockutil.collect_arrow(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    ds = joins.broadcast_lookup(
        nation, on="c_nationkey", small_key="n_nationkey",
        value_cols=["n_name"], defaults={"n_name": "UNKNOWN"}).apply(ds)
    out = aggregates.grouped_aggregate(
        ["n_name"],
        [("count", None, "n_customers"), ("sum", "c_acctbal", "sum_acctbal")],
        pre_aggregate=True, final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("sum_acctbal")
        return t.set_column(i, "sum_acctbal", F.round2(t["sum_acctbal"], 2))
    return out.map_batches(_round, batch_format="pyarrow").sort("n_name")


Q5_SQL = """
SELECT n.n_name AS n_name, COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS sum_acctbal
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# q6 — hash join (J3): orders x customer, revenue per market segment

def q6_hash_join(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = joins.hash_join(cust, on="o_custkey", right_on="c_custkey",
                             join_type="inner", num_partitions=8).apply(orders)
    out = aggregates.grouped_aggregate(
        ["c_mktsegment"],
        [("count", None, "n_orders"), ("sum", "o_totalprice", "revenue")],
        pre_aggregate=True, final="driver").apply(joined)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("revenue")
        return t.set_column(i, "revenue", F.round2(t["revenue"], 2))
    return out.map_batches(_round, batch_format="pyarrow").sort("c_mktsegment")


Q6_SQL = """
SELECT c.c_mktsegment AS c_mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# q7 — top-k without global sort (O3)

def q7_topk(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return sorts.top_k([("o_totalprice", "descending"),
                        ("o_orderkey", "ascending")], 10).apply(ds)


Q7_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# q8 — threshold bucketing (M11) + rollup

def q8_bucket(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    ds = maps.bucketize("p_retailprice", [500.0, 1000.0, 1500.0],
                        ["Low", "Medium", "High", "Premium"], "price_band").apply(ds)
    return aggregates.grouped_aggregate(
        ["price_band"], [("count", None, "n_parts")],
        pre_aggregate=True, final="driver").apply(ds).sort("price_band")


Q8_SQL = """
SELECT CASE WHEN p_retailprice < 500 THEN 'Low'
            WHEN p_retailprice < 1000 THEN 'Medium'
            WHEN p_retailprice < 1500 THEN 'High'
            ELSE 'Premium' END AS price_band,
       COUNT(*) AS n_parts
FROM part GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q9 — single-pass per-column null counts (A4)

def q9_null_counts(sf_dir: str):
    ds = _read(sf_dir, "documents")
    partials = aggregates.null_counts(["text", "lang", "source"]).apply(ds)
    totals = aggregates.sum_partials(partials)
    return pa.table({
        "text_nulls": pa.array([totals["text"]], pa.int64()),
        "lang_nulls": pa.array([totals["lang"]], pa.int64()),
        "source_nulls": pa.array([totals["source"]], pa.int64()),
        "n_rows": pa.array([totals["__rows"]], pa.int64()),
    })


Q9_SQL = """
SELECT COUNT(*) - COUNT(text) AS text_nulls,
       COUNT(*) - COUNT(lang) AS lang_nulls,
       COUNT(*) - COUNT(source) AS source_nulls,
       COUNT(*) AS n_rows
FROM documents
"""


# ---------------------------------------------------------------------------
# q10 — union expansion + count (S2/D1)

def q10_union_count(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    tripled = ds.union(ds, ds)
    return pa.table({"n": pa.array([tripled.count()], pa.int64())})


Q10_SQL = """
SELECT COUNT(*) AS n FROM (
  SELECT l_orderkey FROM lineitem
  UNION ALL SELECT l_orderkey FROM lineitem
  UNION ALL SELECT l_orderkey FROM lineitem
)
"""


# ---------------------------------------------------------------------------
# q11 — tumbling-window aggregate (custom operator: events have no native
# window op in Ray Data; expressed as floor-to-window + groupby, SURVEY §2.9)

def q11_window_agg(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    ds = maps.with_columns({
        "window_start": lambda t: pc.floor_temporal(t["ts"], unit="day"),
    }).apply(ds)
    out = aggregates.grouped_aggregate(
        ["event_type", "window_start"],
        [("count", None, "n_events"), ("sum", "value", "sum_value"),
         ("min", "value", "min_value"), ("max", "value", "max_value")],
        pre_aggregate=True).apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("sum_value", "min_value", "max_value"):
            t = t.set_column(t.column_names.index(c), c, F.round2(t[c], 2))
        return t
    return out.map_batches(_round, batch_format="pyarrow").sort(
        ["event_type", "window_start"])


Q11_SQL = """
SELECT event_type, date_trunc('day', ts) AS window_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value,
       ROUND(MIN(value), 2) AS min_value,
       ROUND(MAX(value), 2) AS max_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q12 — distinct pairs (D-family)

def q12_distinct(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return dedup.distinct(["user_id", "event_type"],
                          num_partitions=16).apply(ds)


Q12_SQL = "SELECT DISTINCT user_id, event_type FROM events"


# ---------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q2_filter_derive": q2_filter_derive,
    "q3_dedup_lww": q3_dedup_lww,
    "q4_group_agg_distinct": q4_group_agg_distinct,
    "q5_lookup_join": q5_lookup_join,
    "q6_hash_join": q6_hash_join,
    "q7_topk": q7_topk,
    "q8_bucket": q8_bucket,
    "q9_null_counts": q9_null_counts,
    "q10_union_count": q10_union_count,
    "q11_window_agg": q11_window_agg,
    "q12_distinct": q12_distinct,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q2_filter_derive": Q2_SQL,
    "q3_dedup_lww": Q3_SQL,
    "q4_group_agg_distinct": Q4_SQL,
    "q5_lookup_join": Q5_SQL,
    "q6_hash_join": Q6_SQL,
    "q7_topk": Q7_SQL,
    "q8_bucket": Q8_SQL,
    "q9_null_counts": Q9_SQL,
    "q10_union_count": Q10_SQL,
    "q11_window_agg": Q11_SQL,
    "q12_distinct": Q12_SQL,
}


# ---------------------------------------------------------------------------
# q13 — data-quality report (A4/A8 framework) on lineitem

def q13_dq_report(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.quality import checks
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity",
                                    "l_discount", "l_returnflag", "l_shipdate"])
    cfg = checks.DQConfig(
        min_rows=1,
        max_null_pct={"l_returnflag": 5.0},
        dup_keys=["l_orderkey", "l_linenumber"],
        max_dup_pct=5.0,
        non_positive_cols=["l_quantity"],
        year_col="l_shipdate", year_range=(1900, 2100),
        whitelist={"l_returnflag": ["A", "N", "R"]},
        range_checks={"l_discount": (0.0, 1.0)},
    )
    report, _overall = checks.run_checks(ds, cfg)
    return report


Q13_SQL = """
WITH s AS (
  SELECT COUNT(*) AS c,
         COUNT(*) - COUNT(l_returnflag) AS rf_nulls,
         SUM(CASE WHEN COALESCE(l_quantity, -1) <= 0 THEN 1 ELSE 0 END) AS nonpos,
         SUM(CASE WHEN EXTRACT(year FROM l_shipdate) < 1900
                    OR EXTRACT(year FROM l_shipdate) > 2100 THEN 1 ELSE 0 END) AS yr_bad,
         SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)
                  THEN 1 ELSE 0 END) AS wl_bad,
         SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS rg_bad,
         COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS dups
  FROM lineitem)
SELECT 'row_count' AS check_name, CAST(c AS DOUBLE) AS metric_value,
       1.0 AS threshold,
       CASE WHEN c >= 1 THEN 'PASS' ELSE 'FAIL' END AS status,
       'rows=' || c || ' min=1' AS detail FROM s
UNION ALL
SELECT 'null_pct__l_returnflag', ROUND(100.0 * rf_nulls / c, 4), 5.0,
       CASE WHEN 100.0 * rf_nulls / c > 5.0 THEN 'FAIL'
            WHEN 100.0 * rf_nulls / c > 2.5 THEN 'WARN' ELSE 'PASS' END,
       rf_nulls || ' nulls / ' || c FROM s
UNION ALL
SELECT 'non_positive__l_quantity', CAST(nonpos AS DOUBLE), 0.0,
       CASE WHEN nonpos = 0 THEN 'PASS' ELSE 'FAIL' END,
       nonpos || ' rows <= 0' FROM s
UNION ALL
SELECT 'year_out_of_range', CAST(yr_bad AS DOUBLE), 0.0,
       CASE WHEN yr_bad = 0 THEN 'PASS' ELSE 'FAIL' END,
       yr_bad || ' rows outside (1900, 2100)' FROM s
UNION ALL
SELECT 'whitelist__l_returnflag', CAST(wl_bad AS DOUBLE), 0.0,
       CASE WHEN wl_bad = 0 THEN 'PASS' ELSE 'FAIL' END,
       wl_bad || ' rows off-list' FROM s
UNION ALL
SELECT 'range__l_discount', CAST(rg_bad AS DOUBLE), 0.0,
       CASE WHEN rg_bad = 0 THEN 'PASS' ELSE 'FAIL' END,
       rg_bad || ' rows out of range' FROM s
UNION ALL
SELECT 'dup_pct', ROUND(100.0 * dups / c, 4), 5.0,
       CASE WHEN 100.0 * dups / c > 5.0 THEN 'FAIL'
            WHEN 100.0 * dups / c > 2.5 THEN 'WARN' ELSE 'PASS' END,
       dups || ' duplicate rows on [''l_orderkey'', ''l_linenumber'']' FROM s
"""


# ---------------------------------------------------------------------------
# q14 — exact content dedup on documents (training-data dedup family)

def q14_exact_dedup(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])
    out = neardup.exact_dedup(text_col="text", id_col="doc_id",
                              num_partitions=32).apply(ds)
    return maps.select(["doc_id", "source", "n_chars"]).apply(out)


Q14_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q15 — token counting (text analysis; vectorized RE2 both sides)

def q15_token_stats(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.token_stats().apply(ds)
    return maps.select(["doc_id", "n_tokens", "n_bpeish", "n_chars_text"]).apply(out)


Q15_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
       CAST(length(text) AS BIGINT) AS n_chars_text
FROM documents
"""


# ---------------------------------------------------------------------------
# q16 — quality scoring (text analysis)

def q16_quality(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.quality_score().apply(ds)
    return maps.select(["doc_id", "punct_ratio", "digit_ratio", "quality"]).apply(out)


Q16_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS DOUBLE) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digit,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_letters
  FROM documents)
SELECT doc_id,
       ROUND(n_punct / GREATEST(n_chars, 1.0), 6) AS punct_ratio,
       ROUND(n_digit / GREATEST(n_chars, 1.0), 6) AS digit_ratio,
       ROUND(
         0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000 THEN 1.0 ELSE 0.0 END)
       + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
       + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
       + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                       AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                      THEN 1.0 ELSE 0.0 END), 6) AS quality
FROM t
"""


# ---------------------------------------------------------------------------
# q17 — brute-force cosine top-k (similarity search baseline)

def q17_knn_brute(sf_dir: str):
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = [r for r in ds.take(3)]
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    return similarity.knn_brute(ds, (qids, qm), k=10)


Q17_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
  FROM embeddings e CROSS JOIN q),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(cos, 9) DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: sketches, model-ish scoring, CDC)

def q18_minhash_pairs(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return neardup.minhash_lsh_pairs(ds, threshold=0.8)


def q19_simhash_pairs(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return neardup.simhash_pairs(ds, max_hamming=3)


def q20_lang_id(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.lang_id().apply(ds)
    return maps.select(["doc_id", "lang_pred", "lang_score"]).apply(out)


def _q20_sql() -> str:
    """SQL mirror of the vectorized trigram scorer (stages/text.py LangId):
    non-overlapping gram counts via length-replace arithmetic (equal to the
    kernel's count_substring for these non-self-overlapping grams), integer
    weighted sum, one exact int/int double division per language — scores
    are bit-identical to the Arrow/numpy path."""
    from e_commerce_batch_etl_pipeline_ray.stages.text import _LANG_PROFILES
    score_exprs = []
    for lang, tris in _LANG_PROFILES.items():
        terms = [
            f"{len(tris) - i}*((length(s)-length(replace(s,'{g}','')))//3)"
            for i, g in enumerate(tris)]
        score_exprs.append(
            f"({' + '.join(terms)})::DOUBLE / total AS {lang}_score")
    langs = list(_LANG_PROFILES)
    best = f"greatest({', '.join(l + '_score' for l in langs)})"
    # first-max-wins in profile order == numpy argmax tie semantics
    case = [f"WHEN {best} <= 0 THEN 'und'"]
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"{l}_score >= {r}_score" for r in langs[i + 1:])
        case.append(f"WHEN {conds} THEN '{l}'")
    case_sql = "CASE " + " ".join(case) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH padded AS (
  SELECT doc_id, ' ' || lower(substr(coalesce(text, ''), 1, 400)) || ' ' AS s
  FROM documents
), t AS (
  SELECT doc_id, s, greatest(length(s) - 2, 1) AS total FROM padded
), sc AS (
  SELECT doc_id, {', '.join(score_exprs)} FROM t
)
SELECT doc_id, {case_sql} AS lang_pred, {best} AS lang_score
FROM sc
"""


Q20_SQL = _q20_sql()


def q21_fingerprint(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.fingerprint().apply(ds)
    return maps.select(["doc_id", "fingerprint"]).apply(out)


def _q21_sql() -> str:
    """SQL mirror of stages/text.py::Fingerprint — Rabin-Karp k-gram hashes
    (mod-2^64 HUGEINT arithmetic, powers of 1000003 precomputed mod 2^64),
    16-wide window minima via a ROWS window frame (truncated frames dropped
    to match numpy's n-w+1 sliding view), distinct minima sorted ascending,
    lowest 8 xor-folded with odd weights. Bit-identical to the numpy path
    for ASCII corpora with len >= k (this testdata: all-ASCII, len >= 48;
    the kernel's short-doc and non-ASCII byte paths are pytest-covered)."""
    M = 18446744073709551616           # 2^64 — uint64 wraparound modulus
    pows = [pow(1000003, 7 - j, M) for j in range(8)]
    terms = " + ".join(
        f"ord(substr(g,{j + 1},1))::HUGEINT * {pows[j]}::HUGEINT"
        for j in range(8))
    return f"""
WITH pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, substr(text, CAST(i AS INT), 8) AS g,
         length(text) - 7 AS npos
  FROM documents CROSS JOIN UNNEST(range(1, length(text) - 6)) AS t(i)
), h AS (
  SELECT doc_id, i, npos, CAST(({terms}) % {M}::HUGEINT AS HUGEINT) AS hv
  FROM pos
), wm AS (
  SELECT doc_id, i, npos,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wmin
  FROM h
), valid AS (
  SELECT DISTINCT doc_id, wmin FROM wm
  WHERE i <= npos - LEAST(16, npos) + 1
), sel AS (
  SELECT doc_id, wmin,
         row_number() OVER (PARTITION BY doc_id ORDER BY wmin) AS rn
  FROM valid
), folded AS (
  SELECT doc_id,
         bit_xor(CAST((wmin * (2*(rn-1)+1)::HUGEINT) % {M}::HUGEINT AS UBIGINT)) AS acc
  FROM sel WHERE rn <= 8 GROUP BY doc_id
)
SELECT doc_id, lower(lpad(to_hex(acc), 16, '0')) AS fingerprint
FROM folded
"""


Q21_SQL = _q21_sql()


def q22_embedding_neardup(sf_dir: str):
    """Near-dup vectors via SRP-LSH buckets + cosine verify. The driver's
    embeddings are random (no natural near-dups at 0.95 cosine), so K
    deterministic perturbed copies are planted; the operator must find
    exactly the planted pairs."""
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        take = [i for i, v in enumerate(ids) if v < 10]
        if not take:
            return t
        sub = t.take(pa.array(take))
        v = np.asarray(sub["embedding"].to_pylist(), dtype=np.float32)
        rng = np.random.RandomState(123)
        v = v + rng.randn(*v.shape).astype(np.float32) * 0.01
        planted = pa.table({
            "vec_id": pa.array([100000 + i for i in sub["vec_id"].to_pylist()],
                               pa.int64()),
            "embedding": pa.array([row.tolist() for row in v],
                                  t["embedding"].type),
        })
        return pa.concat_tables([t, planted])

    ds = ds.map_batches(_plant, batch_format="pyarrow")
    return neardup.embedding_neardup_pairs(ds, dim=64, threshold=0.95)


def q23_knn_ivf(sf_dir: str):
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = [r for r in ds.take(3)]
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    return similarity.knn_ivf(ds, (qids, qm), k=10, n_centroids=16, nprobe=4)


# ---------------------------------------------------------------------------
# oracle fixtures — deterministic non-testdata inputs that a query AND its
# DuckDB oracle share, materialized to a fixed /tmp path. Written
# idempotently + atomically (wip + os.replace) from BOTH the query fn and
# __ray_entry__.oracle_sql(), so the driver may evaluate either side first.

def _spec_tag(*parts) -> str:
    """Content-address a fixture on its generating spec AND the generator
    source: a spec/generator change moves the path, so a stale (or foreign)
    file at the old path can never be silently reused by both sides of the
    oracle compare (round-2 ADVICE)."""
    import hashlib
    import inspect
    blob = []
    for p in parts:
        blob.append(inspect.getsource(p) if callable(p) else repr(p))
    return hashlib.sha256("\x00".join(blob).encode()).hexdigest()[:12]


# per-user dir: a shared host must not let another user's files (or a
# tampered world-writable file) feed the oracle compare
_FIXTURE_DIR = f"/tmp/graft_oracle_fixtures-{os.getuid()}"
_Q24_PARAMS = dict(events_per_epoch=5000, n_repos=20, paths_per_repo=100,
                   evolution_epoch=1, content_chars_min=32,
                   content_chars_max=512)
Q24_EPOCHS = 2
_Q26_PARAMS = dict(n=20_000, seed=42)


def _q24_spec():
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    return binlog.BinlogSpec(**_Q24_PARAMS)


def _fixture_paths() -> tuple[str, str]:
    """(q24 binlog dir, q26 orders path), spec+generator content-addressed."""
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    from e_commerce_batch_etl_pipeline_ray.sources import generators
    q24 = os.path.join(_FIXTURE_DIR,
                       "q24_binlog_" + _spec_tag(_Q24_PARAMS, Q24_EPOCHS,
                                                 binlog.gen_epoch_table))
    q26 = os.path.join(_FIXTURE_DIR,
                       "q26_orders_" + _spec_tag(_Q26_PARAMS,
                                                 generators.orders_raw_table),
                       "orders_raw.parquet")
    return q24, q26


Q24_BINLOG_DIR, Q26_ORDERS_PATH = _fixture_paths()


def _atomic_write_parquet(table: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.wip.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ensure_oracle_fixtures() -> None:
    """Materialize the q24 binlog epochs and the q26 raw-orders table
    (driver-side, no Ray session needed — tiny, pure functions of a seed).
    Paths are content-addressed on spec+generator (_spec_tag), so an
    existing file is always the right one and reuse is safe."""
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    from e_commerce_batch_etl_pipeline_ray.sources import generators
    spec = _q24_spec()
    for ep in range(Q24_EPOCHS):
        p = os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet")
        if not os.path.exists(p):
            _atomic_write_parquet(binlog.gen_epoch_table(spec, ep), p)
    if not os.path.exists(Q26_ORDERS_PATH):
        _atomic_write_parquet(
            generators.orders_raw_table(_Q26_PARAMS["n"],
                                        seed=_Q26_PARAMS["seed"]),
            Q26_ORDERS_PATH)


def q24_cdc_ingest(sf_dir: str):
    """Full CDC engine drive, independently oracle-checked: the binlog
    epochs are parquet fixtures (tailed by the engine AND read by the DuckDB
    oracle), and the engine's final live table must equal the SQL
    last-writer-wins window query (ROW_NUMBER over (repo,path) by lsn DESC,
    tombstones dropped) — including schema evolution: epoch-0 has no `lang`
    column, union_by_name/Arrow-unify null-backfill must agree."""
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q24_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import read_parquet_clean
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    return eng.read().sort(["repo", "path"])


Q24_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({
    "q13_dq_report": q13_dq_report,
    "q14_exact_dedup": q14_exact_dedup,
    "q15_token_stats": q15_token_stats,
    "q16_quality": q16_quality,
    "q17_knn_brute": q17_knn_brute,
    "q18_minhash_pairs": q18_minhash_pairs,
    "q19_simhash_pairs": q19_simhash_pairs,
    "q20_lang_id": q20_lang_id,
    "q21_fingerprint": q21_fingerprint,
    "q22_embedding_neardup": q22_embedding_neardup,
    "q23_knn_ivf": q23_knn_ivf,
    "q24_cdc_ingest": q24_cdc_ingest,
})

ORACLE.update({
    "q13_dq_report": Q13_SQL,
    "q14_exact_dedup": Q14_SQL,
    "q15_token_stats": Q15_SQL,
    "q20_lang_id": Q20_SQL,
    "q21_fingerprint": Q21_SQL,
    "q16_quality": Q16_SQL,
    "q17_knn_brute": Q17_SQL,
    "q24_cdc_ingest": Q24_SQL,
})


# ---------------------------------------------------------------------------
# q25 — sessionization (stream-shaped op: per-key gap-based sessions)

def q25_sessionize(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    out = streaming.sessionize("user_id", "ts", gap_minutes=30.0,
                               order_cols=["event_id"]).apply(ds)
    return out.sort(["user_id", "session_id"])


Q25_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q26 — full orders-variant pipeline (rows-only: synthetic dirty input
# generated in-engine, notebook-variant transform chain + DQ report)

def q26_orders_pipeline(sf_dir: str):
    """The notebook-variant transform chain, oracle-checked end-to-end: the
    dirty input is a parquet fixture shared with the DuckDB oracle, which
    expresses the whole chain (fillna -> lenient ts parse -> bool cast ->
    critical-null drop -> total-order keyed dedup -> business filter ->
    deriveds -> revenue band -> 24-col contract) in SQL
    (notebooks/02_transformations.py:59-274 semantics)."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import orders as O
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import read_parquet_clean
    ensure_oracle_fixtures()
    raw = read_parquet_clean(Q26_ORDERS_PATH, override_num_blocks=8)
    ds, _report, _overall = O.run(raw, num_partitions=16, gate=False)
    return ds.sort("order_id")


Q26_SQL = f"""
WITH filled AS (
  SELECT order_id, customer_id, product_id, product_name,
         COALESCE(category, 'Unknown') AS category,
         quantity, unit_price, total_amount,
         try_strptime(order_date, '%Y-%m-%d %H:%M:%S') AS order_date,
         try_strptime(delivery_date, '%Y-%m-%d %H:%M:%S') AS delivery_date,
         COALESCE(payment_method, 'unknown') AS payment_method,
         order_status,
         COALESCE(customer_country, 'Unknown') AS customer_country,
         COALESCE(LOWER(is_premium_customer) = 'true', false) AS is_premium_customer,
         COALESCE(discount_percent, 0.0) AS discount_percent,
         COALESCE(shipping_cost, 0.0) AS shipping_cost
  FROM read_parquet('{Q26_ORDERS_PATH}')
), dropped AS (
  SELECT * FROM filled
  WHERE order_id IS NOT NULL AND customer_id IS NOT NULL
    AND quantity IS NOT NULL AND unit_price IS NOT NULL
    AND order_date IS NOT NULL
), deduped AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY order_id
      ORDER BY order_date DESC, customer_id DESC, product_id DESC,
               quantity DESC, unit_price DESC,
               total_amount DESC NULLS LAST,
               delivery_date DESC NULLS LAST,
               payment_method DESC, order_status DESC,
               customer_country DESC, is_premium_customer DESC,
               discount_percent DESC, shipping_cost DESC,
               category DESC, product_name DESC
    ) AS rn FROM dropped
  ) WHERE rn = 1
), derived AS (
  SELECT order_id, customer_id, product_id, product_name, category,
         quantity, unit_price,
         CASE WHEN total_amount IS NOT NULL THEN total_amount
              ELSE ROUND(quantity * unit_price, 2) END AS total_amount,
         order_date, delivery_date, payment_method, order_status,
         customer_country, is_premium_customer, discount_percent,
         shipping_cost,
         EXTRACT(year FROM order_date) AS order_year,
         EXTRACT(month FROM order_date) AS order_month,
         EXTRACT(quarter FROM order_date) AS order_quarter,
         dayofweek(order_date) + 1 AS order_dayofweek,
         monthname(order_date) AS order_month_name,
         date_diff('day', order_date, delivery_date) AS delivery_days,
         ROUND(unit_price * (1 - discount_percent / 100), 2) AS effective_price
  FROM deduped
  WHERE quantity > 0 AND unit_price > 0
)
SELECT *, CASE WHEN total_amount < 500 THEN 'Low'
               WHEN total_amount < 2000 THEN 'Medium'
               WHEN total_amount < 5000 THEN 'High'
               ELSE 'Premium' END AS revenue_band
FROM derived ORDER BY order_id
"""


QUERIES.update({
    "q25_sessionize": q25_sessionize,
    "q26_orders_pipeline": q26_orders_pipeline,
})
ORACLE.update({
    "q25_sessionize": Q25_SQL,
    "q26_orders_pipeline": Q26_SQL,
})


# ---------------------------------------------------------------------------
# q27/q28 — broadcast semi/anti join (blocklist pattern)

def q27_semi_join(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    vips = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    vips = maps.filter_expr(lambda t: pc.greater(t["c_acctbal"], 5000.0),
                            name="vip").apply(vips).select_columns(["c_custkey"])
    out = joins.broadcast_semi_join(vips, on="o_custkey").apply(ds)
    return out.sort("o_orderkey")


Q27_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
ORDER BY o_orderkey
"""


def q28_anti_join(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = maps.filter_expr(lambda t: pc.greater(t["o_totalprice"], 400_000.0),
                           name="big_orders").apply(big).select_columns(["o_custkey"])
    out = joins.broadcast_semi_join(big, on="c_custkey", anti=True).apply(ds)
    return out.sort("c_custkey")


Q28_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


QUERIES.update({"q27_semi_join": q27_semi_join, "q28_anti_join": q28_anti_join})
ORACLE.update({"q27_semi_join": Q27_SQL, "q28_anti_join": Q28_SQL})


# ---------------------------------------------------------------------------
# q29 — grouped top-k (top-3 orders per segment) via per-group select_k

def q29_grouped_topk(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import joins as J
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = J.hash_join(cust, on="o_custkey", right_on="c_custkey",
                         join_type="inner", num_partitions=8).apply(orders_ds)

    def _top3(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("o_totalprice", "descending"),
                                            ("o_orderkey", "ascending")])
        t = g.take(idx.slice(0, 3))
        return t.append_column("rk", pa.array(range(1, t.num_rows + 1), pa.int64()))

    out = joined.groupby("c_mktsegment").map_groups(_top3, batch_format="pyarrow")
    return out.select_columns(["c_mktsegment", "rk", "o_orderkey",
                               "o_totalprice"]).sort(["c_mktsegment", "rk"])


Q29_SQL = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rk <= 3 ORDER BY c_mktsegment, rk
"""


# ---------------------------------------------------------------------------
# q30 — per-key cumulative aggregate (running sum of event values)

def q30_running_sum(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    out = streaming.running_aggregate("user_id", "ts", "value",
                                      out="running_value",
                                      order_cols=["event_id"],
                                      num_partitions=32).apply(ds)
    return out.select_columns(["user_id", "event_id", "running_value"]) \
              .sort(["user_id", "event_id"])


Q30_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events ORDER BY user_id, event_id
"""


QUERIES.update({"q29_grouped_topk": q29_grouped_topk,
                "q30_running_sum": q30_running_sum})
ORACLE.update({"q29_grouped_topk": Q29_SQL, "q30_running_sum": Q30_SQL})


# ---------------------------------------------------------------------------
# q31 — composed multimodal pipeline (rows-only): opaque binary payloads ->
# actor-pool decode (fake kernel, real plumbing) -> feature vectors ->
# brute-force KNN over the features

def q31_multimodal_knn(sf_dir: str):
    """REAL decode path: deterministic PPM/BMP/PNG/baseline-JPEG payloads
    decoded by the pure-numpy kernels — stages/imagecodec.py implements
    PNG (zlib inflate + row unfiltering) and JPEG (Huffman + IDCT) from
    spec — pixel-histogram features, then brute KNN."""
    import numpy as np

    import ray.data as rd

    from e_commerce_batch_etl_pipeline_ray.stages import multimodal, similarity
    media = multimodal.real_media_table(512, seed=7)
    ds = rd.from_arrow(media).map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "image")),
        batch_format="pyarrow", zero_copy_batch=True)
    decoded = multimodal.decode_images(fake=False, batch_size=64).apply(ds)
    feats = decoded.select_columns(["media_id", "features"])
    qrows = feats.take(2)
    qids = [r["media_id"] for r in qrows]
    qm = np.asarray([r["features"] for r in qrows], dtype=np.float64)
    return similarity.knn_brute(feats, (qids, qm), k=5,
                                emb_col="features", id_col="media_id")


QUERIES.update({"q31_multimodal_knn": q31_multimodal_knn})


# ---------------------------------------------------------------------------
# q32 — as-of join (per-key merge_asof: last signup before each event)

def q32_asof_join(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    out = streaming.asof_join_last_event(
        "user_id", "ts", "event_type", "signup", out="last_signup_ts",
        tiebreak_cols=["event_id"]).apply(ds)
    return out.select_columns(["event_id", "user_id", "event_type",
                               "last_signup_ts"]).sort("event_id")


Q32_SQL = """
SELECT e.event_id, e.user_id, e.event_type,
       (SELECT MAX(s.ts) FROM events s
        WHERE s.user_id = e.user_id AND s.event_type = 'signup'
          AND s.ts <= e.ts) AS last_signup_ts
FROM events e
WHERE e.event_type <> 'signup'
ORDER BY e.event_id
"""


QUERIES.update({"q32_asof_join": q32_asof_join})
ORACLE.update({"q32_asof_join": Q32_SQL})


# ---------------------------------------------------------------------------
# q33 — the reference analytics cube (notebooks/06_optimizations.py:276-287):
# count + exact countDistinct + sum + avg + stddev + sum(bool) with a
# multi-key orderBy, all through the pre-aggregated combiner plan

def q33_analytics_cube(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                                  "o_totalprice", "o_orderdate"])
    ds = maps.with_columns({
        "order_year": lambda t: F.year(t["o_orderdate"]),
        "is_big": lambda t: pc.greater(t["o_totalprice"], 300_000.0),
    }).apply(ds)
    base = aggregates.grouped_aggregate(
        ["order_year", "o_orderstatus"],
        [("count", None, "n_orders"),
         ("sum", "o_totalprice", "sum_price"),
         ("mean", "o_totalprice", "avg_price"),
         ("std", "o_totalprice", "std_price"),
         ("sum_bool", "is_big", "n_big")],
        pre_aggregate=True, final="driver").apply(ds)
    distinct = aggregates.count_distinct(
        ["order_year", "o_orderstatus"], "o_custkey", "n_customers",
        final="driver").apply(ds)
    bt = blockutil.collect_arrow(base)
    dt = blockutil.collect_arrow(distinct)
    df = bt.to_pandas().merge(dt.to_pandas(), on=["order_year", "o_orderstatus"])
    for c in ("sum_price", "avg_price", "std_price"):
        df[c] = df[c].round(2)
    df = df.sort_values(["order_year", "o_orderstatus"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["order_year", "o_orderstatus", "n_orders", "n_customers",
            "sum_price", "avg_price", "std_price", "n_big"]],
        preserve_index=False)


Q33_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year, o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       ROUND(STDDEV(o_totalprice), 2) AS std_price,
       CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES.update({"q33_analytics_cube": q33_analytics_cube})
ORACLE.update({"q33_analytics_cube": Q33_SQL})


# ---------------------------------------------------------------------------
# q34 — Bloom-prefiltered semi-join: a fixed-size bitmap stands in for a key
# set too large to broadcast exactly; an exact semi-join refines the few
# false positives away, so the result equals the plain semi-join (q27 SQL)

def q34_bloom_semi_join(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    vips = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    vips = maps.filter_expr(lambda t: pc.greater(t["c_acctbal"], 5000.0),
                            name="vip").apply(vips).select_columns(["c_custkey"])
    vips = vips.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    pre = joins.bloom_semi_join(vips, on="o_custkey").apply(ds)
    out = joins.broadcast_semi_join(vips, on="o_custkey").apply(pre)
    return out.sort("o_orderkey")


QUERIES.update({"q34_bloom_semi_join": q34_bloom_semi_join})
ORACLE.update({"q34_bloom_semi_join": Q27_SQL})


# ---------------------------------------------------------------------------
# q35/q36 — deterministic dataset assembly (training-data ops): hash-based
# train/val/test split and a weighted two-source mixture. Assignment is a
# pure function of the row id (Knuth u32 hash) that the SQL oracle
# reproduces bit-for-bit — stable under retries, block layout, and resume.

def q35_hash_split(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = sampling.hash_split("doc_id", [0.8, 0.1, 0.1],
                             ["train", "val", "test"], seed=7).apply(ds)
    out = aggregates.grouped_aggregate(
        ["split"], [("count", None, "n_docs")], pre_aggregate=True,
        final="driver").apply(ds)
    return out.sort("split")


def _q35_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    u = sql_unit_hash("doc_id", seed=7)
    return f"""
SELECT CASE WHEN {u} < 0.8 THEN 'train'
            WHEN {u} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q36_mixture(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    docs = _read(sf_dir, "documents", ["doc_id"])
    evs = _read(sf_dir, "events", ["event_id"])
    evs = evs.map_batches(lambda t: _strip_meta(t).rename_columns(["doc_id"]),
                          batch_format="pyarrow", zero_copy_batch=True)
    mixed = sampling.mixture([("docs", docs), ("events", evs)],
                             id_cols=["doc_id", "doc_id"],
                             fractions=[0.5, 0.25], seed=3)
    out = aggregates.grouped_aggregate(
        ["_source"], [("count", None, "n_rows")], pre_aggregate=True,
        final="driver").apply(mixed)
    return out.sort("_source")


def _q36_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    ud = sql_unit_hash("doc_id", seed=3)
    ue = sql_unit_hash("event_id", seed=3)
    return f"""
SELECT _source, COUNT(*) AS n_rows FROM (
  SELECT 'docs' AS _source FROM documents WHERE {ud} < 0.5
  UNION ALL
  SELECT 'events' AS _source FROM events WHERE {ue} < 0.25
) GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"q35_hash_split": q35_hash_split, "q36_mixture": q36_mixture})
ORACLE.update({"q35_hash_split": _q35_sql(), "q36_mixture": _q36_sql()})


# ---------------------------------------------------------------------------
# q37 — sequence packing (rows-only: FFD bin assignment is algorithmic, not
# SQL-expressible; pytest asserts the budget/partition invariants). Returns
# per-doc pack assignment aggregated to per-pack stats.

def q37_pack_sequences(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import packing, text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.token_stats().apply(ds).select_columns(["doc_id", "n_tokens"])
    packed = packing.pack_sequences("doc_id", "n_tokens", budget=512,
                                    num_partitions=16).apply(ds)
    out = aggregates.grouped_aggregate(
        ["pack_id"], [("count", None, "n_docs"),
                      ("sum", "n_tokens", "pack_tokens")],
        pre_aggregate=True).apply(packed)
    return out.sort("pack_id")


# ---------------------------------------------------------------------------
# q38 — composed curation pipeline WITH full SQL oracle: quality score ->
# threshold filter -> deterministic train/val/test split -> per-split stats.
# Every stage is SQL-reproducible (q16's scoring expression + q35's hash).

def q38_quality_filtered_split(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling, text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.quality_score().apply(ds)
    ds = maps.filter_expr(lambda t: pc.greater_equal(t["quality"], 0.75),
                          name="quality_gate").apply(ds)
    ds = sampling.hash_split("doc_id", [0.9, 0.05, 0.05],
                             ["train", "val", "test"], seed=11).apply(ds)
    out = aggregates.grouped_aggregate(
        ["split"], [("count", None, "n_docs"),
                    ("mean", "quality", "avg_quality")],
        pre_aggregate=True, final="driver").apply(ds)
    out = out.map_batches(
        lambda t: t.set_column(t.column_names.index("avg_quality"),
                               "avg_quality", F.round2(t["avg_quality"], 4)),
        batch_format="pyarrow")
    return out.sort("split")


def _q38_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    u = sql_unit_hash("doc_id", seed=11)
    return rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS DOUBLE) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS n_digit,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_letters
  FROM documents),
scored AS (
  SELECT doc_id,
         ROUND(
           0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000 THEN 1.0 ELSE 0.0 END)
         + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                         AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                        THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM t),
gated AS (SELECT * FROM scored WHERE quality >= 0.75)
SELECT CASE WHEN {u} < 0.9 THEN 'train'
            WHEN {u} < 0.95 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       ROUND(AVG(quality), 4) AS avg_quality
FROM gated GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"q37_pack_sequences": q37_pack_sequences,
                "q38_quality_filtered_split": q38_quality_filtered_split})
ORACLE.update({"q38_quality_filtered_split": _q38_sql()})


# ---------------------------------------------------------------------------
# q39 — full near-dup dedup composition (rows-only: LSH candidates are not
# SQL-expressible): minhash pairs -> distributed transitive min-label
# dedup -> surviving documents. Exercises the whole corpus-safe pipeline
# (bucket-local verify, edge-set label propagation, id-partitioned filter).

def q39_neardup_dedup(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = neardup.minhash_lsh_pairs(ds, threshold=0.8)
    kept = neardup.dedup_by_pairs(ds, pairs, id_col="doc_id")
    return kept.select_columns(["doc_id"]).sort("doc_id")


QUERIES.update({"q39_neardup_dedup": q39_neardup_dedup})


# ---------------------------------------------------------------------------
# q44/q45 — GROUND-TRUTH oracles for the near-dup family (round-2 VERDICT #1).
# At smoke scale DuckDB can compute the EXACT all-pairs k-shingle Jaccard
# (500 docs -> 125k candidate pairs) and exact connected components (recursive
# CTE), so the LSH -> exact-verify -> transitive-dedup chain is checked against
# an independent exact oracle instead of verifying itself.
#
# The Ray side runs minhash at a recall-complete operating point for j>=0.8:
# bands=64 x rows=4 (num_hashes=256) has P(miss | j=0.8) = (1-0.8^4)^64
# ~= 4e-15, so every true pair is a candidate and the exact bucket-local
# verify makes output == ground truth. Precision is exact by construction
# (each emitted pair carries its exact shingle-set Jaccard).
#
# SQL shingles mirror stages/neardup.py::_shingle_hashes: lowercase, 5-char
# windows, space-pad-to-k for short texts, DISTINCT per doc. Jaccard is the
# same int/int double division, so values (and the >= threshold cut) are
# bit-identical modulo u64 shingle-hash collisions (~2e-9 for this corpus).

_Q44_NEARDUP_GROUND_TRUTH_CTES = """
WITH RECURSIVE docs AS (
  SELECT doc_id,
         CASE WHEN length(text) < 5 THEN rpad(lower(text), 5, ' ')
              ELSE lower(text) END AS s
  FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id, substr(s, CAST(i AS INT), 5) AS g
  FROM docs CROSS JOIN UNNEST(range(1, length(s) - 3)) AS t(i)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), pairs AS (
  SELECT id_a, id_b, ic::DOUBLE / (sa.sz + sb.sz - ic) AS jaccard
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ic
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2) i
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ic::DOUBLE / (sa.sz + sb.sz - ic) >= 0.8
)
"""


def _recall_complete_pairs(ds):
    """minhash_lsh_pairs at the recall-complete smoke-scale operating point
    (see q44 comment); carry-mode exact verify -> (id_a, id_b, jaccard)."""
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    return neardup.minhash_lsh_pairs(ds, threshold=0.8,
                                     num_hashes=256, bands=64)


def q44_neardup_pairs_exact(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _recall_complete_pairs(ds)


Q44_SQL = _Q44_NEARDUP_GROUND_TRUTH_CTES + """
SELECT id_a, id_b, jaccard FROM pairs
"""


def q45_neardup_keep_exact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = neardup.dedup_by_pairs(ds, _recall_complete_pairs(ds),
                                  id_col="doc_id")
    return kept.select_columns(["doc_id"])


Q45_SQL = _Q44_NEARDUP_GROUND_TRUTH_CTES + """,
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
), labels AS (
  SELECT node, min(r) AS label FROM reach GROUP BY node
)
SELECT node AS doc_id FROM labels WHERE node = label
"""


QUERIES.update({"q44_neardup_pairs_exact": q44_neardup_pairs_exact,
                "q45_neardup_keep_exact": q45_neardup_keep_exact})
ORACLE.update({"q44_neardup_pairs_exact": Q44_SQL,
               "q45_neardup_keep_exact": Q45_SQL})


# ---------------------------------------------------------------------------
# q40 — sliding (hopping) window aggregate: 60-minute windows every 30
# minutes over the events table; row-local window fan-out + pre-aggregated
# grouped sum (no shuffle beyond the final tiny groupby)

def q40_sliding_window(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["ts", "value"])
    ds = streaming.sliding_window("ts", window_minutes=60,
                                  slide_minutes=30).apply(ds)
    out = aggregates.grouped_aggregate(
        ["window_start"], [("count", None, "n_events"),
                           ("sum", "value", "sum_value")],
        pre_aggregate=True).apply(ds)
    out = out.map_batches(
        lambda t: t.set_column(t.column_names.index("sum_value"), "sum_value",
                               F.round2(t["sum_value"], 2)),
        batch_format="pyarrow")
    return out.sort("window_start")


Q40_SQL = """
WITH shifted AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM shifted GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"q40_sliding_window": q40_sliding_window})
ORACLE.update({"q40_sliding_window": Q40_SQL})


# ---------------------------------------------------------------------------
# q41 — EXACT distributed quantiles without a global sort (iterative range
# narrowing, O(log) streaming passes); rank semantics == DuckDB
# quantile_disc (inverted CDF)

def q41_exact_quantiles(sf_dir: str):
    ds = _read(sf_dir, "events", ["value"])
    q50, q90, q99 = aggregates.exact_quantiles(ds, "value",
                                               [0.5, 0.9, 0.99])
    return pa.table({"q50": pa.array([q50], pa.float64()),
                     "q90": pa.array([q90], pa.float64()),
                     "q99": pa.array([q99], pa.float64())})


Q41_SQL = """
SELECT quantile_disc(value, 0.5) AS q50,
       quantile_disc(value, 0.9) AS q90,
       quantile_disc(value, 0.99) AS q99
FROM events
"""


QUERIES.update({"q41_exact_quantiles": q41_exact_quantiles})
ORACLE.update({"q41_exact_quantiles": Q41_SQL})


# ---------------------------------------------------------------------------
# q42 — PII/URL redaction: chained vectorized RE2 global replacements;
# Arrow and DuckDB share the RE2 dialect so the oracle reproduces the
# transform byte-for-byte

def q42_redact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.redact("text", out="redacted").apply(ds)
    return ds.select_columns(["doc_id", "redacted"]).sort("doc_id")


Q42_SQL = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g'),
         '\d{9,}', '<NUM>', 'g') AS redacted
FROM documents ORDER BY doc_id
"""


QUERIES.update({"q42_redact": q42_redact})
ORACLE.update({"q42_redact": Q42_SQL})


# ---------------------------------------------------------------------------
# q43 — corpus-hygiene signals: stopword fraction (vectorized RE2 whole-word
# matches) + duplicate-line fraction (Gopher-style boilerplate detector)

def q43_text_hygiene(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.text_hygiene().apply(ds)
    return ds.select_columns(["doc_id", "stopword_frac",
                              "dup_line_frac"]).sort("doc_id")


Q43_SQL = r"""
SELECT doc_id,
       ROUND(len(regexp_extract_all(text,
             '\b(the|and|of|to|a|in|is|it|that|for|on|with|as|was|at|by|an|be|this|are)\b'))
             / GREATEST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')), 1.0),
             6) AS stopword_frac,
       ROUND((len(string_split(text, chr(10)))
              - len(list_distinct(string_split(text, chr(10)))))
             / len(string_split(text, chr(10))) * 1.0, 6) AS dup_line_frac
FROM documents ORDER BY doc_id
"""


QUERIES.update({"q43_text_hygiene": q43_text_hygiene})
ORACLE.update({"q43_text_hygiene": Q43_SQL})


# ---------------------------------------------------------------------------
# q46 — GROUND-TRUTH oracle for embedding cosine near-dup (the q44 pattern
# applied to the SRP-LSH family): DuckDB computes EXACT all-pairs cosine on
# the same corpus, so bucket -> verify -> cross-table dedup is checked
# against an independent exact oracle instead of a planted-recall assertion
# (q22 stays as the default operating point).
#
# The planted near-dups are SQL-mirrorable BY CONSTRUCTION (unlike q22's
# numpy-RandomState noise): planted[j] = float32(float64(v[j]) *
# (1 + 0.01*cos(j+1))) — IEEE double multiply + float32 round and libm cos
# are bit-identical between numpy and DuckDB (verified: planted vectors are
# bitwise equal), so both sides see the same float32 corpus. Planted-pair
# cosine ~0.99997; the raw corpus's max off-diagonal cosine is 0.51, so the
# >= 0.95 cut has no boundary cases.
#
# Recall-complete operating point: miss(c) = (1-(1-acos(c)/pi)^planes)^tables;
# at c=0.99997, planes=8, tables=8 -> ~1e-14. Every true pair reaches the
# exact in-bucket verify, so output == ground truth.

def _q46_planted(sf_dir: str):
    import numpy as np

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _plant(t: pa.Table) -> pa.Table:
        t = t.select(["vec_id", "embedding"])
        sub = t.filter(pc.less(t["vec_id"], 10))
        if sub.num_rows == 0:
            return t
        v64 = np.asarray(sub["embedding"].to_pylist(), dtype=np.float64)
        fac = 1.0 + 0.01 * np.cos(np.arange(1, v64.shape[1] + 1,
                                            dtype=np.float64))
        p32 = (v64 * fac).astype(np.float32)
        planted = pa.table({
            "vec_id": pc.add(sub["vec_id"], 100000),
            "embedding": pa.array([row.tolist() for row in p32],
                                  t["embedding"].type),
        })
        return pa.concat_tables([t, planted])

    return ds.map_batches(_plant, batch_format="pyarrow")


def q46_embedding_neardup_exact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    return neardup.embedding_neardup_pairs(
        _q46_planted(sf_dir), dim=64, threshold=0.95,
        n_planes=8, n_tables=8)


Q46_SQL = """
WITH planted AS (
  SELECT vec_id + 100000 AS vec_id,
         list_transform(range(1, len(embedding) + 1),
           i -> CAST(CAST(embedding[i] AS DOUBLE) * (1 + 0.01*cos(i)) AS FLOAT))
           AS embedding
  FROM embeddings WHERE vec_id < 10),
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id, embedding FROM planted),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, ROUND(cos, 6) AS cosine
FROM pairs WHERE cos >= 0.95
"""


# ---------------------------------------------------------------------------
# q47 — GROUND-TRUTH oracle for the persisted IVF index: searched with
# nprobe == n_centroids it reads EVERY list, so build -> partitioned write ->
# pruned read -> probe -> merge must reproduce exact brute-force top-k —
# checked against the SAME exact SQL oracle as q17. Any row lost between the
# partitioned write and the probed read (or a scoring/tiebreak divergence)
# shows as a hash mismatch. q23 stays as the approximate operating point.

def q47_knn_ivf_exact(sf_dir: str):
    import shutil
    import tempfile

    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = ds.take(3)
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    idx = tempfile.mkdtemp(prefix="q47_ivf_")
    try:
        similarity.ivf_index_build(ds, idx, n_centroids=16)
        return similarity.ivf_index_search(idx, (qids, qm), k=10, nprobe=16)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


QUERIES.update({"q46_embedding_neardup_exact": q46_embedding_neardup_exact,
                "q47_knn_ivf_exact": q47_knn_ivf_exact})
ORACLE.update({"q46_embedding_neardup_exact": Q46_SQL,
               "q47_knn_ivf_exact": Q17_SQL})


# ---------------------------------------------------------------------------
# q48 — GROUND-TRUTH oracle for the simhash chain (the q44/q46 pattern).
# The siphash token hash isn't SQL-expressible, but EXACT duplicates are
# invariant to the hash function: equal text => equal token sequence =>
# equal 64-bit simhash => hamming 0 => every 16-bit chunk collides => the
# pair is a candidate in ALL FOUR bands and is always emitted. Plant exact
# copies of doc_id < 10 at +100000, run the full signature -> banding ->
# bucket-shuffle -> hamming-verify -> cross-band pair-dedup chain, then
# keep the provably-deterministic subset: hamming == 0 AND text_a ==
# text_b (two id-partitioned joins). That set must EQUAL the SQL
# equal-text pair set — covering signature determinism, bucket routing,
# cross-band dedup and the join-back. q19 stays as the general
# hamming <= 3 operating point (probabilistic for 0 < d <= 3, rows-only).

def _q48_planted(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _plant(t: pa.Table) -> pa.Table:
        t = t.select(["doc_id", "text"])
        sub = t.filter(pc.less(t["doc_id"], 10))
        if sub.num_rows == 0:
            return t
        planted = pa.table({"doc_id": pc.add(sub["doc_id"], 100000),
                            "text": sub["text"]})
        return pa.concat_tables([t, planted])

    return ds.map_batches(_plant, batch_format="pyarrow")


def q48_simhash_exact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import joins, neardup
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import detach

    corpus = _q48_planted(sf_dir)
    pairs = neardup.simhash_pairs(corpus, max_hamming=3)

    def _zero(t: pa.Table) -> pa.Table:
        if "hamming" not in t.column_names:    # empty zero-column block
            return t
        return t.filter(pc.equal(t["hamming"], 0))

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                             ("hamming", pa.int32())])
    zero = detach(pairs.map_batches(_zero, batch_format="pyarrow",
                                    zero_copy_batch=True), pair_schema)
    doc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    docs = detach(corpus, doc_schema)

    def _keep(cols):
        def _fn(t: pa.Table) -> pa.Table:
            have = [c for c in cols if c in t.column_names]
            return t.select(have).rename_columns(
                [("text_a" if c == "text" else c) for c in have])
        return _fn

    j = joins.hash_join(docs, on="id_a", right_on="doc_id",
                        join_type="inner", num_partitions=8).apply(zero)
    j = detach(j.map_batches(_keep(["id_a", "id_b", "text"]),
                             batch_format="pyarrow"),
               pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("text_a", pa.string())]))
    j2 = joins.hash_join(docs, on="id_b", right_on="doc_id",
                         join_type="inner", num_partitions=8).apply(j)

    def _eq(t: pa.Table) -> pa.Table:
        if "text" not in t.column_names:
            return t.select([c for c in ("id_a", "id_b")
                             if c in t.column_names])
        t = t.filter(pc.equal(t["text_a"], t["text"]))
        return t.select(["id_a", "id_b"])

    return j2.map_batches(_eq, batch_format="pyarrow").sort(["id_a", "id_b"])


Q48_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 10
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id AND a.text = b.text
ORDER BY id_a, id_b
"""


QUERIES.update({"q48_simhash_exact": q48_simhash_exact})
ORACLE.update({"q48_simhash_exact": Q48_SQL})


# ---------------------------------------------------------------------------
# q49 — SQL window/ranking functions (row_number / rank / dense_rank /
# lag / lead / ntile over PARTITION BY user ORDER BY ts) — the reference's
# Spark Window.partitionBy().orderBy() surface, one hash-partition shuffle.

def q49_window_functions(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type", "value"])
    out = streaming.window_functions(
        "user_id", ["ts", "event_id"],
        [
            {"kind": "row_number", "out": "rn"},
            {"kind": "rank", "out": "rk", "order": ["event_type"]},
            {"kind": "dense_rank", "out": "drk", "order": ["event_type"]},
            {"kind": "lag", "col": "value", "offset": 1, "out": "prev_value"},
            {"kind": "lead", "col": "value", "offset": 1, "out": "next_value"},
            {"kind": "ntile", "n": 4, "out": "quartile"},
            {"kind": "percent_rank", "out": "prk", "order": ["event_type"]},
            {"kind": "cume_dist", "out": "cd", "order": ["event_type"]},
            {"kind": "first_value", "col": "value", "out": "first_v"},
            {"kind": "last_value", "col": "value", "out": "last_v"},
            {"kind": "nth_value", "col": "value", "n": 2, "out": "second_v"},
        ],
        num_partitions=32).apply(ds)
    return out.select_columns(["user_id", "event_id", "rn", "rk", "drk",
                               "prev_value", "next_value", "quartile",
                               "prk", "cd", "first_v", "last_v",
                               "second_v"]) \
              .sort(["user_id", "event_id"])


Q49_SQL = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS rk,
       DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS drk,
       LAG(value, 1) OVER w AS prev_value,
       LEAD(value, 1) OVER w AS next_value,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS prk,
       CUME_DIST() OVER (PARTITION BY user_id ORDER BY event_type) AS cd,
       FIRST_VALUE(value) OVER w AS first_v,
       LAST_VALUE(value) OVER wf AS last_v,
       NTH_VALUE(value, 2) OVER wf AS second_v
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
"""


QUERIES.update({"q49_window_functions": q49_window_functions})
ORACLE.update({"q49_window_functions": Q49_SQL})


# ---------------------------------------------------------------------------
# q50/q51 — GROUP BY ROLLUP / CUBE (Spark rollup()/cube(), the reference's
# analytics-cube family at multiple grains). ONE combiner scan at the finest
# grain; every coarser set is a re-merge of the tiny grain partials —
# no extra pass or shuffle per grouping set.

def q50_rollup(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus",
                                  "o_totalprice"])
    ds = maps.with_columns(
        {"o_year": lambda t: pc.year(t["o_orderdate"])}).apply(ds)
    out = aggregates.rollup(
        ["o_year", "o_orderstatus"],
        [("count", None, "n_orders"),
         ("sum", "o_totalprice", "sum_price"),
         ("mean", "o_totalprice", "avg_price"),
         ("max", "o_totalprice", "max_price")],
        final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("sum_price", "avg_price"):
            t = t.set_column(t.column_names.index(c), c, F.round2(t[c]))
        return t

    return out.map_batches(_round, batch_format="pyarrow",
                           zero_copy_batch=True)


Q50_SQL = """
WITH o AS (SELECT YEAR(o_orderdate) AS o_year, o_orderstatus, o_totalprice
           FROM orders)
SELECT o_year, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       MAX(o_totalprice) AS max_price
FROM o GROUP BY ROLLUP (o_year, o_orderstatus)
"""


def q51_cube(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_nationkey",
                                    "c_acctbal"])
    out = aggregates.cube(
        ["c_mktsegment", "c_nationkey"],
        [("count", None, "n_cust"),
         ("mean", "c_acctbal", "avg_bal"),
         ("min", "c_acctbal", "min_bal")],
        final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("avg_bal")
        return t.set_column(i, "avg_bal", F.round2(t["avg_bal"]))

    return out.map_batches(_round, batch_format="pyarrow",
                           zero_copy_batch=True)


Q51_SQL = """
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n_cust,
       ROUND(AVG(c_acctbal), 2) AS avg_bal,
       MIN(c_acctbal) AS min_bal
FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
"""


QUERIES.update({"q50_rollup": q50_rollup, "q51_cube": q51_cube})
ORACLE.update({"q50_rollup": Q50_SQL, "q51_cube": Q51_SQL})


# ---------------------------------------------------------------------------
# q52 — EXACT n-gram Jaccard similarity self-join (prefix-filtered AllPairs/
# PPJoin family): deterministic recall-1.0 alternative to the LSH sketches.
# Unlike q44 (minhash at a recall-complete operating point), this pipeline
# is exact BY CONSTRUCTION — the oracle equality is unconditional.

def q52_allpairs_jaccard(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return neardup.allpairs_jaccard(ds, threshold=0.8)


Q52_SQL = _Q44_NEARDUP_GROUND_TRUTH_CTES + """
SELECT id_a, id_b, jaccard FROM pairs
"""


QUERIES.update({"q52_allpairs_jaccard": q52_allpairs_jaccard})
ORACLE.update({"q52_allpairs_jaccard": Q52_SQL})


# ---------------------------------------------------------------------------
# q53/q54 — pivot (conditional aggregation, one partials-only shuffle) and
# unpivot/melt (row-local flat transform, no shuffle).

def q53_pivot(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderstatus",
                                  "o_totalprice"])
    ds = maps.with_columns(
        {"o_year": lambda t: pc.year(t["o_orderdate"])}).apply(ds)
    out = aggregates.pivot(["o_year"], "o_orderstatus",
                           values=["F", "O", "P"],
                           agg=("sum", "o_totalprice"),
                           prefix="sum_", final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("sum_F", "sum_O", "sum_P"):
            t = t.set_column(t.column_names.index(c), c, F.round2(t[c]))
        return t

    return out.map_batches(_round, batch_format="pyarrow",
                           zero_copy_batch=True).sort("o_year")


Q53_SQL = """
SELECT YEAR(o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS sum_F,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS sum_O,
       ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS sum_P
FROM orders GROUP BY 1 ORDER BY o_year
"""


def q54_unpivot(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber",
                                    "l_quantity", "l_extendedprice",
                                    "l_discount"])
    out = maps.unpivot(["l_orderkey", "l_linenumber"],
                       ["l_quantity", "l_extendedprice", "l_discount"],
                       var_name="measure", value_name="val").apply(ds)
    return out


Q54_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
"""


QUERIES.update({"q53_pivot": q53_pivot, "q54_unpivot": q54_unpivot})
ORACLE.update({"q53_pivot": Q53_SQL, "q54_unpivot": Q54_SQL})


# ---------------------------------------------------------------------------
# q55 — Pearson correlation / sample covariance as mergeable pair partials
# in the combiner plan (one partials-only shuffle; composes with
# rollup/cube because the partials merge across grains).

def q55_corr_covar(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity",
                                    "l_extendedprice", "l_discount"])
    out = aggregates.grouped_aggregate(
        ["l_returnflag"],
        [("corr", ("l_quantity", "l_extendedprice"), "corr_qty_price"),
         ("covar", ("l_quantity", "l_discount"), "covar_qty_disc"),
         ("count", None, "n_rows")],
        final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("corr_qty_price", "covar_qty_disc"):
            t = t.set_column(t.column_names.index(c),
                             c, pc.round(t[c], ndigits=6))
        return t

    return out.map_batches(_round, batch_format="pyarrow",
                           zero_copy_batch=True).sort("l_returnflag")


Q55_SQL = """
SELECT l_returnflag,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_discount, l_quantity), 6) AS covar_qty_disc,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES.update({"q55_corr_covar": q55_corr_covar})
ORACLE.update({"q55_corr_covar": Q55_SQL})


# ---------------------------------------------------------------------------
# q56 — exact per-group discrete quantiles (quantile_disc rank semantics),
# hash-partitioned groups + one vectorized pass per partition (no global
# sort, no per-group dispatch).

def q56_grouped_quantiles(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = aggregates.grouped_quantiles(
        ["o_orderpriority"], "o_totalprice", [0.25, 0.5, 0.9],
        aliases=["p25", "p50", "p90"], num_partitions=8).apply(ds)
    return out.sort("o_orderpriority")


Q56_SQL = """
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.50) AS p50,
       quantile_disc(o_totalprice, 0.90) AS p90
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES.update({"q56_grouped_quantiles": q56_grouped_quantiles})
ORACLE.update({"q56_grouped_quantiles": Q56_SQL})


# ---------------------------------------------------------------------------
# q57 — stratified (per-stratum) deterministic sampling: Spark sampleBy
# with the SQL-reproducible Knuth hash; strata absent from the fraction
# map fall back to the default rate.

def q57_stratified_sample(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    ds = sampling.stratified_sample(
        "event_id", "event_type",
        {"view": 0.1, "click": 0.5, "purchase": 1.0},
        default=0.25, seed=11).apply(ds)
    out = aggregates.grouped_aggregate(
        ["event_type"], [("count", None, "n_kept")], final="driver").apply(ds)
    return out.sort("event_type")


def _q57_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    u = sql_unit_hash("event_id", seed=11)
    return f"""
SELECT event_type, COUNT(*) AS n_kept
FROM events
WHERE {u} < CASE event_type WHEN 'view' THEN 0.1 WHEN 'click' THEN 0.5
            WHEN 'purchase' THEN 1.0 ELSE 0.25 END
GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"q57_stratified_sample": q57_stratified_sample})
ORACLE.update({"q57_stratified_sample": _q57_sql()})


# ---------------------------------------------------------------------------
# q58 — per-document top-3 TF-IDF terms: tokenize -> combiner document
# frequency -> term-shuffle join -> per-doc top-k. Whole-corpus statistic
# with an exact SQL mirror (same tokenizer, same ln(N/df) definition,
# same (score DESC, term) tiebreak).

def q58_tfidf_top_terms(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.tfidf_top_terms(ds, top_n=3)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("score")
        t = t.set_column(i, "score", F.round2(t["score"], ndigits=6))
        # upstream blocks are pandas (map_groups); the pandas->arrow
        # conversion re-attaches unhashable pandas metadata — strip before
        # the sort unifies block schemas
        return t.replace_schema_metadata(None)

    return out.map_batches(_round, batch_format="pyarrow",
                           zero_copy_batch=True).sort(["doc_id", "rk"])


Q58_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), dfq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), nd AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, term, tf, ROUND(score, 6) AS score, rk FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ln(CAST(nd.n AS DOUBLE) / dfq.df) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(nd.n AS DOUBLE) / dfq.df) DESC,
                                     tf.term) AS rk
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd
) WHERE rk <= 3 ORDER BY doc_id, rk
"""


QUERIES.update({"q58_tfidf_top_terms": q58_tfidf_top_terms})
ORACLE.update({"q58_tfidf_top_terms": Q58_SQL})


# ---------------------------------------------------------------------------
# q59/q60 — SQL set operations (INTERSECT / EXCEPT, distinct semantics) as
# ONE tagged-union shuffle (vs three for distinct+distinct+join).

def _q59_sides(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    ds = maps.with_columns(
        {"o_year": lambda t: pc.year(t["o_orderdate"])}).apply(ds)
    a = maps.filter_expr(lambda t: pc.equal(t["o_year"], pa.scalar(1996)),
                         name="y1996").apply(ds).select_columns(["o_custkey"])
    b = maps.filter_expr(lambda t: pc.equal(t["o_year"], pa.scalar(1997)),
                         name="y1997").apply(ds).select_columns(["o_custkey"])
    return a, b


def q59_intersect(sf_dir: str):
    a, b = _q59_sides(sf_dir)
    return dedup.set_op(a, b, "intersect").sort("o_custkey")


Q59_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
ORDER BY o_custkey
"""


def q60_except(sf_dir: str):
    a, b = _q59_sides(sf_dir)
    return dedup.set_op(a, b, "except").sort("o_custkey")


Q60_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
ORDER BY o_custkey
"""


QUERIES.update({"q59_intersect": q59_intersect, "q60_except": q60_except})
ORACLE.update({"q59_intersect": Q59_SQL, "q60_except": Q60_SQL})


# ---------------------------------------------------------------------------
# q61 — keyed interval/range join (events within each user's 2-hour signup
# window): bucketed-time replication of the interval side, ONE shuffle on
# (key, bucket), vectorized per-partition merge+filter.

def q61_interval_join(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import joins as J
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    sg = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    sg = maps.filter_expr(
        lambda t: pc.equal(t["event_type"], pa.scalar("signup")),
        name="signups").apply(sg)

    def _to_windows(t: pa.Table) -> pa.Table:
        two_h = pa.scalar(7_200_000_000, pa.duration("us"))
        return pa.table({
            "user_id": t["user_id"],
            "w_start": t["ts"],
            "w_end": pc.add(t["ts"], two_h),
            "signup_id": t["event_id"],
        })

    sg = sg.map_batches(_to_windows, batch_format="pyarrow",
                        zero_copy_batch=True)
    out = J.interval_join(ev, sg, ts_col="ts", start_col="w_start",
                          end_col="w_end", key_col="user_id",
                          bucket_minutes=60, num_partitions=32)
    return out.select_columns(["event_id", "signup_id"]) \
              .sort(["event_id", "signup_id"])


Q61_SQL = """
SELECT e.event_id AS event_id, s.event_id AS signup_id
FROM events e JOIN events s
  ON s.event_type = 'signup' AND e.user_id = s.user_id
 AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 2 HOUR
ORDER BY 1, 2
"""


QUERIES.update({"q61_interval_join": q61_interval_join})
ORACLE.update({"q61_interval_join": Q61_SQL})


# ---------------------------------------------------------------------------
# q62 — salted skew-safe shuffle join: q6's orders x customer join with the
# hot-key salting pattern (left salted per-row, right replicated per salt
# value; join on (key, salt)). Result must be IDENTICAL to the plain
# join — the oracle is exactly q6's SQL.

def q62_salted_join(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = joins.salted_join(cust, on="o_custkey", right_on="c_custkey",
                               salt=4, num_partitions=8).apply(orders)
    out = aggregates.grouped_aggregate(
        ["c_mktsegment"],
        [("count", None, "n_orders"), ("sum", "o_totalprice", "revenue")],
        pre_aggregate=True, final="driver").apply(joined)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("revenue")
        return t.set_column(i, "revenue", F.round2(t["revenue"], 2))
    return out.map_batches(_round, batch_format="pyarrow").sort("c_mktsegment")


QUERIES.update({"q62_salted_join": q62_salted_join})
ORACLE.update({"q62_salted_join": Q6_SQL})


# ---------------------------------------------------------------------------
# q63 — deterministic k-per-group sampling (distributed reservoir on the
# SQL-reproducible hash; per-batch combiner prune caps shuffle traffic at
# k rows per group per block).

def q63_sample_per_group(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "events", ["event_type", "event_id", "user_id"])
    out = sampling.sample_per_group(["event_type"], "event_id", 20,
                                    seed=13, num_partitions=8).apply(ds)
    return out.select_columns(["event_type", "event_id", "user_id"]) \
              .sort(["event_type", "event_id"])


def _q63_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    u = sql_unit_hash("event_id", seed=13)
    return f"""
SELECT event_type, event_id, user_id FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY {u}, event_id) <= 20
ORDER BY event_type, event_id
"""


QUERIES.update({"q63_sample_per_group": q63_sample_per_group})
ORACLE.update({"q63_sample_per_group": _q63_sql()})


# ---------------------------------------------------------------------------
# q64 — explode/posexplode (SQL UNNEST + ordinality): split documents into
# space-separated tokens, one row per (doc, position, token). Row-local
# Arrow list_flatten fan-out, no shuffle.

def q64_explode(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = maps.with_columns({
        "parts": lambda t: pc.split_pattern(pc.utf8_lower(t["text"]),
                                            pattern=" "),
    }).apply(ds)
    out = maps.explode("parts", out="token", pos_col="pos") \
        .apply(ds.select_columns(["doc_id", "parts"]))
    return out.select_columns(["doc_id", "pos", "token"]) \
              .sort(["doc_id", "pos"])


Q64_SQL = """
SELECT doc_id,
       generate_subscripts(string_split(lower(text), ' '), 1) AS pos,
       unnest(string_split(lower(text), ' ')) AS token
FROM documents ORDER BY doc_id, pos
"""


QUERIES.update({"q64_explode": q64_explode})
ORACLE.update({"q64_explode": Q64_SQL})


# ---------------------------------------------------------------------------
# q65 — grouped collect_set as deterministic sorted string_agg (one
# group-key shuffle with a local-distinct combiner).

def q65_grouped_collect(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])
    out = aggregates.grouped_collect(["c_mktsegment"], "c_nationkey",
                                     "nations", distinct=True,
                                     num_partitions=4).apply(ds)
    return out.sort("c_mktsegment")


Q65_SQL = """
SELECT c_mktsegment,
       string_agg(DISTINCT c_nationkey, ',' ORDER BY c_nationkey) AS nations
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# q66 — vectorized scalar extraction from the flat-JSON props column
# (one RE2 kernel per batch, no per-row json.loads) + grouped mean.

def q66_json_extract(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "props"])
    ds = maps.json_extract("props", "k", out="k_val",
                           value_type="int").apply(ds)
    out = aggregates.grouped_aggregate(
        ["event_type"],
        [("mean", "k_val", "avg_k"), ("count", None, "n_events")],
        final="driver").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        i = t.column_names.index("avg_k")
        return t.set_column(i, "avg_k", F.round2(t["avg_k"], 2))

    return out.map_batches(_round, batch_format="pyarrow").sort("event_type")


Q66_SQL = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS BIGINT)), 2) AS avg_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES.update({"q65_grouped_collect": q65_grouped_collect,
                "q66_json_extract": q66_json_extract})
ORACLE.update({"q65_grouped_collect": Q65_SQL,
               "q66_json_extract": Q66_SQL})


# ---------------------------------------------------------------------------
# q67 — frame (rolling) window aggregates: moving sum/avg over ROWS BETWEEN
# 3 PRECEDING AND CURRENT ROW and running min/max/count over UNBOUNDED
# PRECEDING — the Spark Window.rowsBetween surface. Same one-shuffle
# partition-level kernel as q49 (grouped pandas rolling/expanding).

def q67_frame_aggregates(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    out = streaming.window_functions(
        "user_id", ["ts", "event_id"],
        [
            {"kind": "sum", "col": "value", "rows_preceding": 3,
             "out": "mov_sum"},
            {"kind": "avg", "col": "value", "rows_preceding": 3,
             "out": "mov_avg"},
            {"kind": "min", "col": "value", "out": "run_min"},
            {"kind": "max", "col": "value", "out": "run_max"},
            {"kind": "count", "col": "value", "out": "run_cnt"},
        ],
        num_partitions=32).apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("mov_sum", "mov_avg"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, F.round2(t[c], 4))
        return t.replace_schema_metadata(None)

    return out.map_batches(_round, batch_format="pyarrow") \
              .select_columns(["user_id", "event_id", "mov_sum", "mov_avg",
                               "run_min", "run_max", "run_cnt"]) \
              .sort(["user_id", "event_id"])


Q67_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER w4, 4) AS mov_sum,
       ROUND(AVG(value) OVER w4, 4) AS mov_avg,
       MIN(value) OVER wu AS run_min,
       MAX(value) OVER wu AS run_max,
       COUNT(value) OVER wu AS run_cnt
FROM events
WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
       wu AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


QUERIES.update({"q67_frame_aggregates": q67_frame_aggregates})
ORACLE.update({"q67_frame_aggregates": Q67_SQL})


# ---------------------------------------------------------------------------
# q68 — grouped CONTINUOUS quantiles (median / percentile_cont): linear
# interpolation at q*(n-1), DuckDB quantile_cont parity. Same one-shuffle
# partition-level kernel as q56 (disc).

def q68_grouped_median(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    out = aggregates.grouped_quantiles(
        ["o_orderpriority"], "o_totalprice", [0.25, 0.5, 0.9],
        aliases=["p25", "p50", "p90"], interpolation="linear",
        num_partitions=8).apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("p25", "p50", "p90"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, F.round2(t[c], 4))
        return t.replace_schema_metadata(None)

    return out.map_batches(_round, batch_format="pyarrow") \
              .sort("o_orderpriority")


Q68_SQL = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(MEDIAN(o_totalprice), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES.update({"q68_grouped_median": q68_grouped_median})
ORACLE.update({"q68_grouped_median": Q68_SQL})


# ---------------------------------------------------------------------------
# q69 — grouped arg-max (SQL max_by / arg_max, Spark max_by): per market
# segment, the customer row with the highest account balance. LWW-dedup
# combiner shape: the shuffle carries one candidate row per group per
# block, deterministic tiebreak on c_custkey.

def q69_arg_max(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_custkey", "c_name",
                                    "c_acctbal"])
    out = aggregates.grouped_arg_extremum(
        ["c_mktsegment"], "c_acctbal", ["c_custkey", "c_name", "c_acctbal"],
        kind="max", tiebreak=["c_custkey"], num_partitions=8).apply(ds)
    return out.sort("c_mktsegment")


Q69_SQL = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
  FROM customer
) WHERE rn = 1 ORDER BY c_mktsegment
"""


QUERIES.update({"q69_arg_max": q69_arg_max})
ORACLE.update({"q69_arg_max": Q69_SQL})


# ---------------------------------------------------------------------------
# q70/q71 — OUTER joins (LEFT / FULL) on the shuffle hash-join path:
# null-extended non-matching rows, same single all-to-all as q6's inner
# join. Left side: nations; right side: per-nation customer counts over a
# filtered subset, so some nations have no match (exercises the null fill).

def _q70_sides(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import detach
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    # nation's key is int32 on disk; Arrow's hash join refuses mixed-width
    # keys — widen to match customer's int64
    nat = maps.with_columns(
        {"n_nationkey": lambda t: pc.cast(t["n_nationkey"], pa.int64())}
    ).apply(nat)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])
    rich = maps.filter_expr(
        lambda t: pc.greater(t["c_acctbal"], pa.scalar(9000.0)),
        name="rich").apply(cust)
    per_nation = aggregates.grouped_aggregate(
        ["c_nationkey"], [("count", None, "n_rich")],
        final="shuffle").apply(rich)
    # Ray 2.49 Dataset.join chokes on the empty/zero-column blocks a
    # groupby-aggregate can emit — drop them via block metadata first
    per_nation = detach(per_nation, pa.schema([
        ("c_nationkey", pa.int64()), ("n_rich", pa.int64())]))
    return nat, per_nation


def q70_left_outer_join(sf_dir: str):
    nat, per_nation = _q70_sides(sf_dir)
    out = joins.hash_join(per_nation, on="n_nationkey",
                          right_on="c_nationkey", join_type="left_outer",
                          num_partitions=8).apply(nat)
    out = maps.with_columns(
        {"n_rich": lambda t: pc.fill_null(
            pc.cast(t["n_rich"], pa.int64()), pa.scalar(0, pa.int64()))}
    ).apply(out)
    return out.select_columns(["n_nationkey", "n_name", "n_rich"]) \
              .sort("n_nationkey")


Q70_SQL = """
SELECT n.n_nationkey, n.n_name, COALESCE(r.n_rich, 0) AS n_rich
FROM nation n LEFT JOIN (
  SELECT c_nationkey, COUNT(*) AS n_rich FROM customer
  WHERE c_acctbal > 9000 GROUP BY c_nationkey
) r ON n.n_nationkey = r.c_nationkey
ORDER BY n.n_nationkey
"""


def q71_full_outer_join(sf_dir: str):
    # full outer: orders years vs a fixed year dimension that extends past
    # the data range — unmatched rows surface from BOTH sides
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    ds = maps.with_columns(
        {"o_year": lambda t: pc.cast(pc.year(t["o_orderdate"]), pa.int64())}
    ).apply(ds)
    per_year = aggregates.grouped_aggregate(
        ["o_year"], [("count", None, "n_orders")],
        final="shuffle").apply(ds)
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import detach
    per_year = detach(per_year, pa.schema([
        ("o_year", pa.int64()), ("n_orders", pa.int64())]))
    years = ray.data.from_arrow(pa.table({
        "dim_year": pa.array(list(range(1990, 2001)), pa.int64()),
        "is_dim": pa.array([True] * 11, pa.bool_()),
    }))
    out = joins.hash_join(years, on="o_year", right_on="dim_year",
                          join_type="full_outer",
                          num_partitions=4).apply(per_year)

    def _fill(t: pa.Table) -> pa.Table:
        # Ray's outer join coalesces the key pair into the LEFT key name
        n = pc.fill_null(pc.cast(t["n_orders"], pa.int64()),
                         pa.scalar(0, pa.int64()))
        return pa.table({"year": t["o_year"], "n_orders": n,
                         "in_dim": pc.is_valid(t["is_dim"])})

    return out.map_batches(_fill, batch_format="pyarrow").sort("year")


Q71_SQL = """
SELECT COALESCE(o.o_year, d.dim_year) AS year,
       COALESCE(o.n_orders, 0) AS n_orders,
       d.dim_year IS NOT NULL AS in_dim
FROM (
  SELECT YEAR(o_orderdate) AS o_year, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
) o FULL OUTER JOIN (
  SELECT UNNEST(RANGE(1990, 2001)) AS dim_year
) d ON o.o_year = d.dim_year
ORDER BY year
"""


QUERIES.update({"q70_left_outer_join": q70_left_outer_join,
                "q71_full_outer_join": q71_full_outer_join})
ORACLE.update({"q70_left_outer_join": Q70_SQL,
               "q71_full_outer_join": Q71_SQL})


# ---------------------------------------------------------------------------
# q72 — heavy hitters (approximate top-k frequent values, mergeable
# Misra-Gries combiner). At this capacity no batch exceeds the counter
# budget, so the sketch degrades to EXACT counts — which is what the SQL
# oracle pins; the error-bound regime is covered by the unit test.

def q72_heavy_hitters(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id"])
    ds = maps.drop_null_rows(["user_id"]).apply(ds)
    return aggregates.heavy_hitters("user_id", k=10,
                                    capacity=200_000).apply(ds)


Q72_SQL = """
SELECT user_id, COUNT(*) AS est_count
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id ORDER BY est_count DESC, user_id LIMIT 10
"""


# q73 — fixed-width histogram (per-batch bincount combiner; the shuffle
# carries nbins rows per block), empty bins included.

def q73_histogram(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    return aggregates.histogram("o_totalprice", 0.0, 600_000.0,
                                nbins=12).apply(ds)


Q73_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin
  FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 600000
), bins AS (SELECT UNNEST(RANGE(0, 12)) AS bin)
SELECT bins.bin,
       bins.bin * 50000.0 AS bin_lo,
       50000.0 + bins.bin * 50000.0 AS bin_hi,
       COUNT(b.bin) AS n
FROM bins LEFT JOIN b USING (bin)
GROUP BY bins.bin ORDER BY bins.bin
"""


QUERIES.update({"q72_heavy_hitters": q72_heavy_hitters,
                "q73_histogram": q73_histogram})
ORACLE.update({"q72_heavy_hitters": Q72_SQL,
               "q73_histogram": Q73_SQL})


# ---------------------------------------------------------------------------
# q74 — union by name (Spark unionByName(allowMissingColumns=True) /
# DuckDB UNION ALL BY NAME): differing column order AND presence,
# missing columns null-filled. Row-local projection + block-list union —
# zero shuffle.

def q74_union_by_name(sf_dir: str):
    clicks = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    clicks = maps.filter_expr(
        lambda t: pc.equal(t["event_type"], pa.scalar("click")),
        name="clicks").apply(clicks)
    views = _read(sf_dir, "events", ["event_id", "value", "event_type"])
    views = maps.filter_expr(
        lambda t: pc.equal(t["event_type"], pa.scalar("view")),
        name="views").apply(views).select_columns(["event_id", "value"])
    out = maps.union_by_name(clicks.select_columns(["event_id", "ts"]),
                             views)
    return out.sort("event_id")


Q74_SQL = """
SELECT event_id, ts, NULL::DOUBLE AS value FROM events
WHERE event_type = 'click'
UNION ALL BY NAME
SELECT event_id, value FROM events WHERE event_type = 'view'
ORDER BY event_id
"""


# q75 — CROSS JOIN against a broadcast dimension (vectorized cartesian
# per batch, no shuffle): every (priority x band) cell with its order
# count — a dense grid even where no orders fall.

def q75_cross_join(sf_dir: str):
    dim = pa.table({"band": pa.array(["lo", "mid", "hi"]),
                    "band_lo": pa.array([0.0, 100_000.0, 300_000.0]),
                    "band_hi": pa.array([100_000.0, 300_000.0, 1e12])})
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    ds = joins.cross_join(dim).apply(ds)
    ds = maps.with_columns({
        "in_band": lambda t: pc.and_(
            pc.greater_equal(t["o_totalprice"], t["band_lo"]),
            pc.less(t["o_totalprice"], t["band_hi"]))}).apply(ds)
    out = aggregates.grouped_aggregate(
        ["o_orderpriority", "band"],
        [("sum_bool", "in_band", "n_orders")], final="driver").apply(ds)
    return out.sort(["o_orderpriority", "band"])


Q75_SQL = """
SELECT o_orderpriority, band,
       CAST(SUM(CASE WHEN o_totalprice >= band_lo AND o_totalprice < band_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orders
FROM orders CROSS JOIN (
  VALUES ('lo', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
         ('hi', 300000.0, 1e12)
) AS d(band, band_lo, band_hi)
GROUP BY o_orderpriority, band ORDER BY o_orderpriority, band
"""


QUERIES.update({"q74_union_by_name": q74_union_by_name,
                "q75_cross_join": q75_cross_join})
ORACLE.update({"q74_union_by_name": Q74_SQL,
               "q75_cross_join": Q75_SQL})


# ---------------------------------------------------------------------------
# q76 — CDC lake TIME TRAVEL: ingest both binlog epochs, then snapshot-read
# the table AS OF epoch 0 (the pre-schema-evolution state — no `lang`
# column yet). The oracle replays only epoch-0 events: every epoch's
# manifest pins its files AND its schema, so the as-of read must equal the
# LWW window over the epoch-0 log alone.

def q76_cdc_time_travel(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q76_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    return eng.read(epoch=0).sort(["repo", "path"])


Q76_SQL = f"""
SELECT lsn, repo, path, commit, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet')
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q76_cdc_time_travel": q76_cdc_time_travel})
ORACLE.update({"q76_cdc_time_travel": Q76_SQL})


# ---------------------------------------------------------------------------
# q77 — per-GROUP heavy hitters (top-3 most frequent users per event type).
# One group-key shuffle carrying Misra-Gries partials; merge + per-group
# top-k in the same partition pass. Exact at this capacity (oracle regime).

def q77_grouped_heavy_hitters(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    ds = maps.drop_null_rows(["event_type", "user_id"]).apply(ds)
    out = aggregates.grouped_heavy_hitters(
        ["event_type"], "user_id", k=3, capacity=200_000,
        num_partitions=8).apply(ds)
    return out.sort(["event_type", "est_count", "user_id"])


Q77_SQL = """
SELECT event_type, user_id, est_count FROM (
  SELECT event_type, user_id, COUNT(*) AS est_count,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY COUNT(*) DESC, user_id) AS rn
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY event_type, user_id
) WHERE rn <= 3 ORDER BY event_type, est_count, user_id
"""


QUERIES.update({"q77_grouped_heavy_hitters": q77_grouped_heavy_hitters})
ORACLE.update({"q77_grouped_heavy_hitters": Q77_SQL})


# ---------------------------------------------------------------------------
# q78 — label encoding (string -> dense contiguous int ids in value-sorted
# order == DENSE_RANK - 1): vocab via hash-partitioned distinct + sort,
# contiguous ids from per-block offsets (driver holds one row per vocab
# block), broadcast join-back. q79 — shuffle-free feature scaling
# (z-score + min-max from ONE combiner pass) and explicit-category
# one-hot, the ML-prep trio.

def q78_label_encode(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import encode
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    ds = encode.label_encode("o_orderpriority", out="prio_id",
                             num_partitions=8).apply(ds)
    out = aggregates.grouped_aggregate(
        ["o_orderpriority", "prio_id"], [("count", None, "n_orders")],
        final="driver").apply(ds)
    return out.sort("prio_id")


Q78_SQL = """
SELECT o_orderpriority,
       DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS prio_id,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY prio_id
"""


def q79_feature_scaling(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import encode
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                  "o_orderstatus"])
    ds = encode.standard_scale(["o_totalprice"], suffix="_z").apply(ds)
    ds = encode.minmax_scale(["o_totalprice"], suffix="_mm").apply(ds)
    ds = encode.one_hot("o_orderstatus", ["F", "O", "P"],
                        prefix="st").apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("o_totalprice_z", "o_totalprice_mm"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, F.round2(t[c], 6))
        return t

    return ds.map_batches(_round, batch_format="pyarrow") \
             .select_columns(["o_orderkey", "o_totalprice_z",
                              "o_totalprice_mm", "st_F", "st_O", "st_P"]) \
             .sort("o_orderkey")


Q79_SQL = """
SELECT o_orderkey,
       ROUND((o_totalprice - AVG(o_totalprice) OVER ())
             / STDDEV_SAMP(o_totalprice) OVER (), 6) AS o_totalprice_z,
       ROUND((o_totalprice - MIN(o_totalprice) OVER ())
             / (MAX(o_totalprice) OVER () - MIN(o_totalprice) OVER ()),
             6) AS o_totalprice_mm,
       CASE WHEN o_orderstatus IS NULL THEN NULL
            WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS st_F,
       CASE WHEN o_orderstatus IS NULL THEN NULL
            WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS st_O,
       CASE WHEN o_orderstatus IS NULL THEN NULL
            WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS st_P
FROM orders ORDER BY o_orderkey
"""


QUERIES.update({"q78_label_encode": q78_label_encode,
                "q79_feature_scaling": q79_feature_scaling})
ORACLE.update({"q78_label_encode": Q78_SQL,
               "q79_feature_scaling": Q79_SQL})


# ---------------------------------------------------------------------------
# q80/q81 — distributed linear algebra over the embeddings table
# (rows-only: eigendecomposition / Lloyd's iterations are not
# SQL-expressible; exactness vs single-machine numpy is pinned by
# test_pca_fit_matches_numpy_exactly / test_kmeans_recovers_planted_clusters).

def q80_pca(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import embedding as E
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = E.pca_fit(ds, n_components=4)
    out = E.pca_transform(model, out="pca").apply(ds)

    def _explode(t: pa.Table) -> pa.Table:
        import numpy as np
        m = np.asarray([list(v) for v in t["pca"].to_pylist()],
                       dtype=np.float64) if t.num_rows else \
            np.zeros((0, 4))
        cols = {"vec_id": t["vec_id"]}
        for i in range(4):
            cols[f"p{i}"] = pa.array(np.round(m[:, i], 4), pa.float64())
        return pa.table(cols)

    return out.map_batches(_explode, batch_format="pyarrow").sort("vec_id")


def q81_kmeans(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import embedding as E
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    model = E.kmeans_fit(ds, k=8, max_iters=15, seed=3)
    ds = E.kmeans_assign(model["centroids"]).apply(ds)
    out = aggregates.grouped_aggregate(
        ["cluster"], [("count", None, "n_vecs"),
                      ("min", "label", "min_label"),
                      ("max", "label", "max_label")],
        final="driver").apply(ds)
    return out.sort("cluster")


QUERIES.update({"q80_pca": q80_pca, "q81_kmeans": q81_kmeans})


# ---------------------------------------------------------------------------
# q82 — time-RANGE frame aggregates: SUM/AVG/COUNT over RANGE BETWEEN
# INTERVAL 1 HOUR PRECEDING AND CURRENT ROW per user (the time-based
# moving window; duplicate-timestamp peers included per SQL RANGE
# semantics). Same one-shuffle kernel; pandas time-rolling per partition.

def q82_range_frame(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import streaming
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    out = streaming.window_functions(
        "user_id", ["ts", "event_id"],
        [
            {"kind": "sum", "col": "value", "range_preceding": "1h",
             "range_on": "ts", "out": "h_sum"},
            {"kind": "avg", "col": "value", "range_preceding": "1h",
             "range_on": "ts", "out": "h_avg"},
            {"kind": "count", "col": "value", "range_preceding": "1h",
             "range_on": "ts", "out": "h_cnt"},
        ],
        num_partitions=32).apply(ds)

    def _round(t: pa.Table) -> pa.Table:
        for c in ("h_sum", "h_avg"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, F.round2(t[c], 4))
        return t.replace_schema_metadata(None)

    return out.map_batches(_round, batch_format="pyarrow") \
              .select_columns(["user_id", "event_id", "h_sum", "h_avg",
                               "h_cnt"]) \
              .sort(["user_id", "event_id"])


Q82_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER w, 4) AS h_sum,
       ROUND(AVG(value) OVER w, 4) AS h_avg,
       COUNT(value) OVER w AS h_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


QUERIES.update({"q82_range_frame": q82_range_frame})
ORACLE.update({"q82_range_frame": Q82_SQL})


# ---------------------------------------------------------------------------
# q83 — EXACT fuzzy self-join on edit distance (FastSS deletion
# neighborhoods, Bocek et al. 2007): pairs of documents whose 16-char
# lowercased title keys are within Levenshtein distance 2. Candidates via
# a pure hash-join on deletion variants (no all-pairs), banded-DP verify;
# the DuckDB oracle is the unconditional all-pairs levenshtein() truth.

def q83_edit_distance_join(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = maps.with_columns({
        "key": lambda t: pc.utf8_slice_codeunits(
            pc.utf8_lower(t["text"]), 0, 16)}).apply(ds)
    out = neardup.edit_distance_join(ds, "key", id_col="doc_id",
                                     max_dist=2, num_partitions=16)
    return out.sort(["id_a", "id_b"])


Q83_SQL = """
WITH k AS (SELECT doc_id, lower(substr(text, 1, 16)) AS key FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.key, b.key) AS dist
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= 2
ORDER BY id_a, id_b
"""


QUERIES.update({"q83_edit_distance_join": q83_edit_distance_join})
ORACLE.update({"q83_edit_distance_join": Q83_SQL})


# ---------------------------------------------------------------------------
# q84 — one-pass dataset profile (describe): per-column row/null counts +
# numeric mean/std/min/max from ONE combiner scan, no shuffle.

def q84_describe(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type",
                                  "value"])
    t = aggregates.describe(ds)

    def _round(col):
        return pc.round(col, 4)
    for c in ("mean", "std", "min", "max"):
        t = t.set_column(t.column_names.index(c), c, _round(t[c]))
    return t.sort_by("column")


Q84_SQL = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM events)
SELECT col AS column, n.n_rows, s.n_nulls,
       ROUND(s.mean, 4) AS mean, ROUND(s.std, 4) AS std,
       ROUND(s.min, 4) AS min, ROUND(s.max, 4) AS max
FROM (
  SELECT 'event_id' AS col, COUNT(*) - COUNT(event_id) AS n_nulls,
         AVG(event_id) AS mean, STDDEV_SAMP(event_id) AS std,
         MIN(event_id)::DOUBLE AS min, MAX(event_id)::DOUBLE AS max
  FROM events
  UNION ALL
  SELECT 'user_id', COUNT(*) - COUNT(user_id), AVG(user_id),
         STDDEV_SAMP(user_id), MIN(user_id)::DOUBLE, MAX(user_id)::DOUBLE
  FROM events
  UNION ALL
  SELECT 'event_type', COUNT(*) - COUNT(event_type), NULL, NULL, NULL, NULL
  FROM events
  UNION ALL
  SELECT 'value', COUNT(*) - COUNT(value), AVG(value),
         STDDEV_SAMP(value), MIN(value), MAX(value)
  FROM events
) s CROSS JOIN n ORDER BY col
"""


QUERIES.update({"q84_describe": q84_describe})
ORACLE.update({"q84_describe": Q84_SQL})


# ---------------------------------------------------------------------------
# q85 — document chunking with overlap (context-window prep): chunk j
# covers [j*step, j*step+chunk) codepoints, step = chunk - overlap, tail
# chunk kept. Vectorized by chunk ordinal (one Arrow slice kernel per
# ordinal), zero shuffle; exact SQL mirror via generate_series + substr.

def q85_chunk_documents(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = T.chunk_documents(chunk_chars=512, overlap_chars=64).apply(ds)
    return out.sort(["doc_id", "chunk_idx"])


Q85_SQL = """
WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
c AS (
  SELECT doc_id, text,
         CASE WHEN len <= 512 THEN 1
              ELSE CAST(CEIL((len - 512) / 448.0) AS BIGINT) + 1 END AS nc
  FROM d
), e AS (
  SELECT doc_id, text, UNNEST(RANGE(0, nc)) AS chunk_idx FROM c
)
SELECT doc_id, chunk_idx,
       substr(text, chunk_idx * 448 + 1, 512) AS chunk_text,
       length(substr(text, chunk_idx * 448 + 1, 512)) AS n_chars
FROM e ORDER BY doc_id, chunk_idx
"""


QUERIES.update({"q85_chunk_documents": q85_chunk_documents})
ORACLE.update({"q85_chunk_documents": Q85_SQL})


# ---------------------------------------------------------------------------
# q86 — eval-set decontamination: per-doc fraction of distinct 16-char
# shingles (first 512 chars, lowercased) present in the "benchmark" set
# (docs 0-19 stand in for an eval set). Exact string shingles -> exact
# SQL mirror; benchmark set broadcast once, corpus streams.

def q86_contamination(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = maps.filter_expr(
        lambda t: pc.less(t["doc_id"], pa.scalar(20)),
        name="bench").apply(ds)
    out = T.contamination(ds, bench.materialize(), k=16, cap=512)
    return out.sort("doc_id")


Q86_SQL = """
WITH d AS (
  SELECT doc_id, lower(substr(text, 1, 512)) AS t
  FROM documents WHERE text IS NOT NULL
), idx AS (
  SELECT doc_id, t,
         UNNEST(RANGE(1, GREATEST(length(t) - 15, 1) + 1)) AS i
  FROM d
), sh AS (
  SELECT DISTINCT doc_id, substr(t, i, 16) AS sh FROM idx
), bench AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id < 20
)
SELECT s.doc_id,
       ROUND(AVG(CASE WHEN b.sh IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
           AS contamination,
       COUNT(*) AS n_shingles
FROM sh s LEFT JOIN bench b USING (sh)
GROUP BY s.doc_id ORDER BY s.doc_id
"""


QUERIES.update({"q86_contamination": q86_contamination})
ORACLE.update({"q86_contamination": Q86_SQL})


# ---------------------------------------------------------------------------
# q87 — scalar-function conformance gauntlet: 23 string/math kernels from
# functions/scalar (UPPER/TRIM/LPAD/SUBSTR/REPLACE/regexp/STRPOS/REVERSE/
# ABS/CEIL/FLOOR/SQRT/LN/LOG10/POWER/MOD/GREATEST/LEAST/SIGN/...) computed
# row-locally and mirrored 1:1 in SQL. q88 — temporal trio (date_trunc
# month/week, date_add) over event timestamps.

def q87_scalar_gauntlet(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment",
                                    "c_acctbal"])
    ds = maps.with_columns({
        "u": lambda t: F.upper(t["c_mktsegment"]),
        "tr": lambda t: F.trim(F.lpad(t["c_name"], 30)),
        "ln_c": lambda t: F.length(t["c_name"]),
        "sub": lambda t: F.substring(t["c_name"], 10, 8),
        "cw": lambda t: F.concat_ws("|", t["c_name"], t["c_mktsegment"]),
        "lp": lambda t: F.lpad(pc.cast(t["c_custkey"], pa.string()), 8, "0"),
        "rp": lambda t: F.rpad(t["c_mktsegment"], 12, "."),
        "rep": lambda t: F.replace(t["c_name"], "Customer#", "C-"),
        "rex": lambda t: F.regexp_extract(t["c_name"], "[1-9][0-9]*"),
        "rc": lambda t: F.regexp_contains(t["c_name"], "00[1-9]"),
        "ew": lambda t: F.ends_with(t["c_name"], "5"),
        "ct": lambda t: F.contains(t["c_name"], "007"),
        "sp": lambda t: F.strpos(t["c_name"], "#"),
        "rev": lambda t: F.reverse(t["c_mktsegment"]),
        "ab": lambda t: F.abs_(t["c_acctbal"]),
        "ce": lambda t: F.ceil(t["c_acctbal"]),
        "fl": lambda t: F.floor(t["c_acctbal"]),
        "sq": lambda t: F.round2(F.sqrt(F.abs_(t["c_acctbal"])), 6),
        "l1": lambda t: F.round2(F.ln(pc.add(F.abs_(t["c_acctbal"]),
                                             pa.scalar(1.0))), 6),
        "lg": lambda t: F.round2(F.log10(pc.add(F.abs_(t["c_acctbal"]),
                                                pa.scalar(1.0))), 6),
        "pw": lambda t: F.round2(F.power(t["c_acctbal"], 2), 4),
        "md": lambda t: F.mod(t["c_custkey"], pa.scalar(7, pa.int64())),
        "gr": lambda t: F.greatest(t["c_acctbal"], pa.scalar(0.0)),
        "ls": lambda t: F.least(t["c_acctbal"], pa.scalar(0.0)),
        "sg": lambda t: F.sign(t["c_acctbal"]),
    }).apply(ds)
    return ds.select_columns(
        ["c_custkey", "u", "tr", "ln_c", "sub", "cw", "lp", "rp", "rep",
         "rex", "rc", "ew", "ct", "sp", "rev", "ab", "ce", "fl", "sq",
         "l1", "lg", "pw", "md", "gr", "ls", "sg"]).sort("c_custkey")


Q87_SQL = """
SELECT c_custkey,
       UPPER(c_mktsegment) AS u,
       TRIM(LPAD(c_name, 30, ' ')) AS tr,
       LENGTH(c_name) AS ln_c,
       SUBSTR(c_name, 10, 8) AS sub,
       c_name || '|' || c_mktsegment AS cw,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS lp,
       RPAD(c_mktsegment, 12, '.') AS rp,
       REPLACE(c_name, 'Customer#', 'C-') AS rep,
       NULLIF(regexp_extract(c_name, '[1-9][0-9]*'), '') AS rex,
       regexp_matches(c_name, '00[1-9]') AS rc,
       c_name LIKE '%5' AS ew,
       CONTAINS(c_name, '007') AS ct,
       STRPOS(c_name, '#') AS sp,
       REVERSE(c_mktsegment) AS rev,
       ABS(c_acctbal) AS ab,
       CEIL(c_acctbal) AS ce,
       FLOOR(c_acctbal) AS fl,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS sq,
       ROUND(LN(ABS(c_acctbal) + 1), 6) AS l1,
       ROUND(LOG10(ABS(c_acctbal) + 1), 6) AS lg,
       ROUND(POWER(c_acctbal, 2), 4) AS pw,
       c_custkey % 7 AS md,
       GREATEST(c_acctbal, 0.0) AS gr,
       LEAST(c_acctbal, 0.0) AS ls,
       CAST(SIGN(c_acctbal) AS BIGINT) AS sg
FROM customer ORDER BY c_custkey
"""


def q88_temporal_trio(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "ts"])
    ds = maps.with_columns({
        "mstart": lambda t: F.date_trunc_month(t["ts"]),
        "wstart": lambda t: F.date_trunc_week(t["ts"]),
        "plus7": lambda t: F.date_add_days(t["ts"], 7),
    }).apply(ds)
    return ds.select_columns(["event_id", "mstart", "wstart", "plus7"]) \
             .sort("event_id")


Q88_SQL = """
SELECT event_id,
       DATE_TRUNC('month', ts)::TIMESTAMP AS mstart,
       DATE_TRUNC('week', ts)::TIMESTAMP AS wstart,
       ts + INTERVAL 7 DAY AS plus7
FROM events ORDER BY event_id
"""


QUERIES.update({"q87_scalar_gauntlet": q87_scalar_gauntlet,
                "q88_temporal_trio": q88_temporal_trio})
ORACLE.update({"q87_scalar_gauntlet": Q87_SQL,
               "q88_temporal_trio": Q88_SQL})


# ---------------------------------------------------------------------------
# q89 — incrementally-maintained aggregate (materialized-view maintenance):
# the orders-by-year cube folded in as THREE delta batches (partials are
# the persistent state; each update scans only its delta). The oracle is
# the full recompute over everything — incremental == batch, exactly.

def q89_incremental_aggregate(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                  "o_orderstatus", "o_totalprice"])
    ds = maps.with_columns(
        {"o_year": lambda t: pc.cast(pc.year(t["o_orderdate"]), pa.int64())}
    ).apply(ds)
    inc = aggregates.IncrementalAggregate(
        ["o_year", "o_orderstatus"],
        [("count", None, "n_orders"), ("sum", "o_totalprice", "sum_price"),
         ("mean", "o_totalprice", "avg_price"),
         ("min", "o_totalprice", "min_price"),
         ("max", "o_totalprice", "max_price"),
         ("std", "o_totalprice", "std_price")])
    # three deltas by key residue (deterministic, non-empty at every sf)
    for r in (0, 1, 2):
        delta = maps.filter_expr(
            lambda t, r=r: pc.equal(
                pc.mod_checked(t["o_orderkey"], pa.scalar(3, pa.int64()))
                if hasattr(pc, "mod_checked") else
                pc.subtract(t["o_orderkey"],
                            pc.multiply(pc.divide(t["o_orderkey"],
                                                  pa.scalar(3, pa.int64())),
                                        pa.scalar(3, pa.int64()))),
                pa.scalar(r, pa.int64())),
            name=f"delta{r}").apply(ds)
        inc.update(delta)
    out = inc.result()
    for c in ("sum_price", "avg_price", "std_price"):
        i = out.column_names.index(c)
        out = out.set_column(i, c, F.round2(out[c], 2))
    return out.sort_by([("o_year", "ascending"),
                        ("o_orderstatus", "ascending")])


Q89_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       ROUND(STDDEV_SAMP(o_totalprice), 2) AS std_price
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES.update({"q89_incremental_aggregate": q89_incremental_aggregate})
ORACLE.update({"q89_incremental_aggregate": Q89_SQL})


# ---------------------------------------------------------------------------
# q90 — CDC CHANGE DATA FEED: ingest both binlog fixture epochs, then read
# the row-level change stream (insert / update_preimage / update_postimage
# / delete + _commit_epoch) for epochs 0..1. Shuffle-free per-partition
# diff, untouched partitions pruned from the manifest alone. The oracle
# recomputes the two LWW snapshots in SQL and diffs them with joins —
# including the schema-evolution boundary (epoch-0 images have no `lang`,
# so every epoch-0-derived row must carry lang NULL).

def q90_cdc_change_feed(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, feed
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q90_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    return feed.change_feed(lake_dir, 0, 1).sort(
        ["repo", "path", "_commit_epoch", "_change_type", "lsn"])


Q90_SQL = f"""
WITH e0 AS (SELECT * FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet')),
s0 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM e0) WHERE rn = 1
),
s1 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1
),
feed AS (
  SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_epoch,
         lsn, repo, path, commit, CAST(NULL AS VARCHAR) AS lang,
         content, content_sha256
  FROM s0 WHERE op <> 'D'
  UNION ALL
  SELECT 'insert', 1, s1.lsn, s1.repo, s1.path, s1.commit, s1.lang,
         s1.content, s1.content_sha256
  FROM s1 LEFT JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND (s0.repo IS NULL OR s0.op = 'D')
  UNION ALL
  SELECT 'update_preimage', 1, s0.lsn, s0.repo, s0.path, s0.commit,
         CAST(NULL AS VARCHAR), s0.content, s0.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND s0.op <> 'D' AND s1.lsn <> s0.lsn
  UNION ALL
  SELECT 'update_postimage', 1, s1.lsn, s1.repo, s1.path, s1.commit,
         s1.lang, s1.content, s1.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND s0.op <> 'D' AND s1.lsn <> s0.lsn
  UNION ALL
  SELECT 'delete', 1, s1.lsn, s0.repo, s0.path, s0.commit,
         CAST(NULL AS VARCHAR), s0.content, s0.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op = 'D' AND s0.op <> 'D'
)
SELECT * FROM feed ORDER BY repo, path, _commit_epoch, _change_type, lsn
"""


QUERIES.update({"q90_cdc_change_feed": q90_cdc_change_feed})
ORACLE.update({"q90_cdc_change_feed": Q90_SQL})


# ---------------------------------------------------------------------------
# q91 — PRUNED POINT READ: exact-key lookups hash-routed straight to their
# partitions (manifest num_partitions), parquet row-group stats cutting
# inside each file — the whole lake is never scanned. 60 keys (20 repos x
# 3 paths, some never inserted / deleted) against the 2-epoch fixture
# lake; the oracle is the LWW window filtered to the same key set.

_Q91_PATHS = ("src/mod7/file7.py", "src/mod23/file23.py", "src/mod15/file55.py")


def q91_cdc_point_read(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q91_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    keys = [(f"org{r:03d}/proj", p)
            for r in range(_Q24_PARAMS["n_repos"]) for p in _Q91_PATHS]
    return lake.point_read(lake_dir, keys).sort(["repo", "path"])


_q91_inlist = ", ".join(f"'{p}'" for p in _Q91_PATHS)
Q91_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D' AND path IN ({_q91_inlist})
ORDER BY repo, path
"""


QUERIES.update({"q91_cdc_point_read": q91_cdc_point_read})
ORACLE.update({"q91_cdc_point_read": Q91_SQL})


# ---------------------------------------------------------------------------
# q92 — SCD TYPE 2 history over the binlog fixture: every key version with
# its validity interval [valid_from_lsn, valid_to_lsn) and is_current flag;
# delete events close chains but emit no version. One key-hash shuffle,
# chain derivation vectorized per partition (cdc/scd2.py). The oracle is
# the classic LEAD window over the deduped event log.

def q92_scd2_history(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, scd2
    from e_commerce_batch_etl_pipeline_ray.cdc.lake import _unify_to
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()

    def _unify(t: pa.Table) -> pa.Table:
        return _unify_to(t, binlog.EVENT_SCHEMA_V2)

    parts = []
    for ep in range(Q24_EPOCHS):
        ds = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=4)
        parts.append(ds.map_batches(_unify, batch_format="pyarrow",
                                    zero_copy_batch=True))
    events = parts[0].union(*parts[1:])
    hist = scd2.scd2_history(events, num_partitions=16)
    return hist.select_columns(
        ["repo", "path", "valid_from_lsn", "valid_to_lsn", "commit", "lang",
         "content_sha256", "is_current"]).sort(
        ["repo", "path", "valid_from_lsn"])


Q92_SQL = f"""
WITH ev AS (
  SELECT DISTINCT repo, path, lsn, op, commit, lang, content_sha256
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
),
v AS (
  SELECT *, LEAD(lsn) OVER (PARTITION BY repo, path ORDER BY lsn) AS valid_to_lsn
  FROM ev
)
SELECT repo, path, lsn AS valid_from_lsn, valid_to_lsn, commit, lang,
       content_sha256, (valid_to_lsn IS NULL) AS is_current
FROM v WHERE op <> 'D'
ORDER BY repo, path, valid_from_lsn
"""


QUERIES.update({"q92_scd2_history": q92_scd2_history})
ORACLE.update({"q92_scd2_history": Q92_SQL})


# ---------------------------------------------------------------------------
# q93 — incrementally-maintained MATERIALIZED JOIN VIEW over two CDC lakes
# sharing the (repo, path) key space: live(A) INNER JOIN live(B). The
# lakes are co-partitioned (same key hash, same modulus), so the view
# refreshes with zero shuffle — one task per partition whose inputs
# changed, everything else carried forward from the view manifest. Oracle:
# SQL join of the two LWW window states.

_Q93_PARAMS = dict(seed=7, events_per_epoch=4000, n_repos=20,
                   paths_per_repo=100, evolution_epoch=1,
                   content_chars_min=32, content_chars_max=256)
Q93_EPOCHS = 2


def _q93_dir() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    return os.path.join(
        _FIXTURE_DIR,
        "q93_binlog_" + _spec_tag(_Q93_PARAMS, Q93_EPOCHS,
                                  binlog.gen_epoch_table))


Q93_BINLOG_DIR = _q93_dir()


def ensure_q93_fixture() -> None:
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    spec = binlog.BinlogSpec(**_Q93_PARAMS)
    for ep in range(Q93_EPOCHS):
        p = os.path.join(Q93_BINLOG_DIR, f"epoch-{ep}.parquet")
        if not os.path.exists(p):
            _atomic_write_parquet(binlog.gen_epoch_table(spec, ep), p)


def q93_cdc_join_view(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, view
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    ensure_q93_fixture()
    root = tempfile.mkdtemp(prefix="q93_", dir="/tmp")
    for name, src_dir, n_ep in (("a", Q24_BINLOG_DIR, Q24_EPOCHS),
                                ("b", Q93_BINLOG_DIR, Q93_EPOCHS)):
        eng = engine.CDCEngine(engine.CDCConfig(
            lake_dir=os.path.join(root, name), num_partitions=16,
            merge_concurrency=2))
        for ep in range(n_ep):
            events = read_parquet_clean(
                os.path.join(src_dir, f"epoch-{ep}.parquet"),
                override_num_blocks=8)
            eng.ingest_epoch(events, ep)
    v = view.JoinView(os.path.join(root, "v"), os.path.join(root, "a"),
                      os.path.join(root, "b"))
    v.refresh()
    return v.read().sort(["repo", "path"])


Q93_SQL = f"""
WITH sa AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
),
sb AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q93_BINLOG_DIR}/epoch-0.parquet',
                       '{Q93_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
)
SELECT sa.repo, sa.path,
       sa.lsn AS lsn_l, sa.commit AS commit_l, sa.lang AS lang_l,
       sa.content AS content_l, sa.content_sha256 AS content_sha256_l,
       sb.lsn AS lsn_r, sb.commit AS commit_r, sb.lang AS lang_r,
       sb.content AS content_r, sb.content_sha256 AS content_sha256_r
FROM sa JOIN sb ON sa.repo = sb.repo AND sa.path = sb.path
ORDER BY sa.repo, sa.path
"""


QUERIES.update({"q93_cdc_join_view": q93_cdc_join_view})
ORACLE.update({"q93_cdc_join_view": Q93_SQL})


# ---------------------------------------------------------------------------
# q94 — MERGE INTO: conditional merge of one lake's live state into another
# (update when content sha changed, delete matched markdown rows, insert
# unmatched) committed through the standard epoch protocol. The oracle
# replays the same clause algebra in SQL over the two LWW states. NULL
# semantics pinned: clause predicates treat NULL as false (engine
# fill_null(False) == SQL COALESCE).

def q94_cdc_merge_into(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake, merge
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    ensure_q93_fixture()
    root = tempfile.mkdtemp(prefix="q94_", dir="/tmp")
    for name, src_dir, n_ep in (("a", Q24_BINLOG_DIR, Q24_EPOCHS),
                                ("b", Q93_BINLOG_DIR, Q93_EPOCHS)):
        eng = engine.CDCEngine(engine.CDCConfig(
            lake_dir=os.path.join(root, name), num_partitions=16,
            merge_concurrency=2))
        for ep in range(n_ep):
            events = read_parquet_clean(
                os.path.join(src_dir, f"epoch-{ep}.parquet"),
                override_num_blocks=8)
            eng.ingest_epoch(events, ep)

    def _bump(t: pa.Table) -> pa.Table:
        i = t.column_names.index("lsn")
        return t.set_column(i, "lsn", pc.add(t["lsn"], 10_000_000))

    source = lake.read_lake(os.path.join(root, "b")).map_batches(
        _bump, batch_format="pyarrow", zero_copy_batch=True)

    def upd(s: pa.Table, t: pa.Table):
        return pc.not_equal(s["content_sha256"], t["content_sha256"])

    def dele(s: pa.Table, t: pa.Table):
        return pc.equal(s["lang"], "md")

    merge.merge_into(os.path.join(root, "a"), source,
                     when_matched_update_if=upd,
                     when_matched_delete_if=dele,
                     when_not_matched_insert=True)
    return lake.read_lake(os.path.join(root, "a")).sort(["repo", "path"])


Q94_SQL = f"""
WITH t AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
),
s AS (
  SELECT * REPLACE (lsn + 10000000 AS lsn) FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q93_BINLOG_DIR}/epoch-0.parquet',
                       '{Q93_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
),
merged AS (
  -- kept target rows: unmatched, or matched but hit by neither clause
  SELECT t.lsn, t.repo, t.path, t.commit, t.lang, t.content, t.content_sha256
  FROM t LEFT JOIN s ON t.repo = s.repo AND t.path = s.path
  WHERE s.repo IS NULL
     OR (COALESCE(s.lang, '') <> 'md'
         AND s.content_sha256 = t.content_sha256)
  UNION ALL
  -- updates: matched, not deleted, sha changed
  SELECT s.lsn, s.repo, s.path, s.commit, s.lang, s.content, s.content_sha256
  FROM s JOIN t ON t.repo = s.repo AND t.path = s.path
  WHERE COALESCE(s.lang, '') <> 'md' AND s.content_sha256 <> t.content_sha256
  UNION ALL
  -- inserts: source keys with no live target
  SELECT s.lsn, s.repo, s.path, s.commit, s.lang, s.content, s.content_sha256
  FROM s LEFT JOIN t ON t.repo = s.repo AND t.path = s.path
  WHERE t.repo IS NULL
)
SELECT * FROM merged ORDER BY repo, path
"""


QUERIES.update({"q94_cdc_merge_into": q94_cdc_merge_into})
ORACLE.update({"q94_cdc_merge_into": Q94_SQL})


# ---------------------------------------------------------------------------
# q95 — char-bigram LM PERPLEXITY (CCNet/KenLM-style corpus quality
# signal): train a Laplace-smoothed byte-bigram model on the documents
# corpus in one mergeable streaming pass, then score every doc's
# perplexity vectorized off the Arrow buffer. The oracle rebuilds the
# identical model in SQL (unnest(generate_series) bigram expansion) —
# byte == char on this ASCII corpus. 2dp rounding on both sides (double
# summation-order tolerance).

def q95_lm_perplexity(sf_dir: str):
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import lm
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = lm.train_char_bigram(ds, "text")
    scored = lm.perplexity(ds, model, "text", round_to=2)
    return scored.select_columns(["doc_id", "perplexity"]).sort("doc_id")


Q95_SQL = """
WITH pos AS (
  SELECT doc_id, text, UNNEST(generate_series(1, length(text) - 1)) AS i
  FROM documents
),
bg AS (
  SELECT doc_id, substring(text, i, 1) AS c1, substring(text, i, 2) AS b
  FROM pos
),
cnt AS (SELECT b, COUNT(*)::DOUBLE AS n FROM bg GROUP BY b),
rs AS (SELECT substring(b, 1, 1) AS c1, SUM(n) AS row_n FROM cnt GROUP BY 1),
scored AS (
  SELECT bg.doc_id, LN((cnt.n + 1) / (rs.row_n + 256)) AS lp
  FROM bg JOIN cnt USING (b) JOIN rs ON rs.c1 = bg.c1
)
SELECT d.doc_id,
       ROUND(EXP(-AVG(s.lp)), 2) AS perplexity
FROM documents d LEFT JOIN scored s USING (doc_id)
GROUP BY d.doc_id ORDER BY d.doc_id
"""


QUERIES.update({"q95_lm_perplexity": q95_lm_perplexity})
ORACLE.update({"q95_lm_perplexity": Q95_SQL})


# ---------------------------------------------------------------------------
# q96 — DUPLICATED-SUBSTRING detection (Lee et al. exact-substring dedup
# signal): per document, how many of its 20-byte grams occur >1 time in
# the WHOLE corpus. Gram extraction is one strided view over the Arrow
# buffer; grams hash-partition by content so corpus counts are
# partition-local; only per-(doc, partition) tallies leave the shuffle.
# Oracle: full n-gram expansion + corpus counts in SQL (byte == char on
# this ASCII corpus).

def q96_duplicated_substrings(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import substr
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = substr.duplicated_ngrams(ds, n=20, num_partitions=32)
    return out.sort("doc_id")


Q96_SQL = """
WITH g AS (
  SELECT doc_id, substring(text, i, 20) AS gram
  FROM (SELECT doc_id, text,
               UNNEST(generate_series(1, length(text) - 19)) AS i
        FROM documents)
),
c AS (SELECT gram, COUNT(*) AS occ FROM g GROUP BY gram)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN c.occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(SUM(CASE WHEN c.occ > 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*),
             4) AS dup_frac
FROM g JOIN c USING (gram)
GROUP BY g.doc_id ORDER BY g.doc_id
"""


QUERIES.update({"q96_duplicated_substrings": q96_duplicated_substrings})
ORACLE.update({"q96_duplicated_substrings": Q96_SQL})


# ---------------------------------------------------------------------------
# q97 — exact per-group MODE (most frequent value, largest-value tiebreak)
# as the composition of two skew-immune reduces: pre-aggregated
# (group, value) counts, then the arg-max winner shuffle. Oracle: the
# ROW_NUMBER()=1 idiom over GROUP BY counts.

def q97_grouped_mode(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    out = aggregates.grouped_mode(["o_orderpriority"], "o_orderstatus",
                                  num_partitions=8).apply(ds)
    return out.sort("o_orderpriority")


Q97_SQL = """
SELECT o_orderpriority, o_orderstatus, mode_count FROM (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS mode_count,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY COUNT(*) DESC, o_orderstatus DESC) AS rn
  FROM orders WHERE o_orderstatus IS NOT NULL
  GROUP BY o_orderpriority, o_orderstatus
) WHERE rn = 1 ORDER BY o_orderpriority
"""


QUERIES.update({"q97_grouped_mode": q97_grouped_mode})
ORACLE.update({"q97_grouped_mode": Q97_SQL})


# ---------------------------------------------------------------------------
# q98 — temporal snapshot AS OF AN LSN (finer grain than epoch time
# travel): reconstruct the live table exactly as of transaction L from
# SCD2 history with a row-local validity filter. Oracle: the LWW window
# over only the events with lsn <= L.

_Q98_LSN = 7000        # mid-epoch-1 of the 2x5000-event fixture binlog


def q98_scd2_as_of_lsn(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, scd2
    from e_commerce_batch_etl_pipeline_ray.cdc.lake import _unify_to
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()

    def _unify(t: pa.Table) -> pa.Table:
        return _unify_to(t, binlog.EVENT_SCHEMA_V2)

    parts = []
    for ep in range(Q24_EPOCHS):
        ds = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=4)
        parts.append(ds.map_batches(_unify, batch_format="pyarrow",
                                    zero_copy_batch=True))
    hist = scd2.scd2_history(parts[0].union(*parts[1:]), num_partitions=16)
    snap = scd2.as_of_lsn(hist, _Q98_LSN)
    return snap.select_columns(
        ["repo", "path", "valid_from_lsn", "commit", "lang",
         "content_sha256"]).sort(["repo", "path"])


Q98_SQL = f"""
SELECT repo, path, lsn AS valid_from_lsn, commit, lang, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
  WHERE lsn <= {_Q98_LSN}
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q98_scd2_as_of_lsn": q98_scd2_as_of_lsn})
ORACLE.update({"q98_scd2_as_of_lsn": Q98_SQL})


# ---------------------------------------------------------------------------
# q99 — AGGREGATE VIEW MAINTAINED FROM THE CHANGE FEED: per-lang row count
# + total content length over the live table, kept current by processing
# only row-level changes (insert/post weigh +1, delete/pre weigh -1 — the
# retraction algebra), refreshed EPOCH BY EPOCH. Oracle: plain SQL
# aggregate over the final LWW live state.

def q99_feed_aggregate_view(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import aggview, engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    root = tempfile.mkdtemp(prefix="q99_", dir="/tmp")
    lake_dir = os.path.join(root, "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))

    def _add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len",
            pc.cast(pc.utf8_length(t["content"]), pa.float64()))

    view = aggview.AggregateView(lake_dir, os.path.join(root, "view.parquet"),
                                 by=["lang"], sums=[("content_len", "sum_len")],
                                 value_fn=_add_len)
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
        view.refresh()                    # incremental, per epoch
    out = view.read(with_avg=[("sum_len", "avg_len")])
    i = out.column_names.index("avg_len")
    out = out.set_column(i, "avg_len", F.round2(out["avg_len"], 2))
    return out.sort_by([("lang", "ascending")])


Q99_SQL = f"""
WITH live AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
)
SELECT lang, COUNT(*) AS n_rows,
       SUM(LENGTH(content))::DOUBLE AS sum_len,
       ROUND(SUM(LENGTH(content))::DOUBLE / COUNT(*), 2) AS avg_len
FROM live GROUP BY lang ORDER BY lang NULLS LAST
"""


QUERIES.update({"q99_feed_aggregate_view": q99_feed_aggregate_view})
ORACLE.update({"q99_feed_aggregate_view": Q99_SQL})


# ---------------------------------------------------------------------------
# q100 — GROUP-AWARE (leakage-safe) train/val/test split: the split is a
# pure function of the GROUP key (l_orderkey), so every row of a group
# lands in the same split by construction — the contamination guarantee a
# per-row split can't give. Output: per-split row and group counts.

def q100_group_split(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    ds = sampling.hash_split("l_orderkey", [0.8, 0.1, 0.1],
                             ["train", "val", "test"], seed=11).apply(ds)
    ds = ds.materialize()
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow
    rows = collect_arrow(aggregates.grouped_aggregate(
        ["split"], [("count", None, "n_rows")], final="driver").apply(ds))
    orders = collect_arrow(aggregates.count_distinct(
        ["split"], "l_orderkey", "n_orders", final="driver").apply(ds))
    # 3-row driver-side join of the two tiny grouped outputs (q33 pattern)
    pos = pc.index_in(rows["split"].combine_chunks(),
                      value_set=orders["split"].combine_chunks())
    out = rows.append_column("n_orders", orders["n_orders"].take(pos))
    return out.sort_by([("split", "ascending")])


def _q100_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import sql_unit_hash
    u = sql_unit_hash("l_orderkey", seed=11)
    return f"""
SELECT CASE WHEN {u} < 0.8 THEN 'train'
            WHEN {u} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY 1 ORDER BY 1
"""


QUERIES.update({"q100_group_split": q100_group_split})
ORACLE.update({"q100_group_split": _q100_sql()})


# ---------------------------------------------------------------------------
# q101 — distributed BPE tokenizer training + tokenization (rows-only:
# iterative corpus passes are not SQL-expressible; the trainer is verified
# by tests/test_bpe.py's merge-sequence parity with a reference
# implementation and block-invariance). Output: per-doc token counts +
# compression vs raw bytes under a 40-merge vocabulary.

def q101_bpe_tokenize(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import bpe
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe.bpe_train(ds, num_merges=40)
    toks = bpe.bpe_tokenize(ds, merges)
    out = toks.map_batches(
        lambda t: t.select(["doc_id", "n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort("doc_id")


QUERIES.update({"q101_bpe_tokenize": q101_bpe_tokenize})


# ---------------------------------------------------------------------------
# q102 — BM25 top-k retrieval: corpus stats (df / avg length) in one
# combiner pass, idf broadcast, vectorized tf scoring, per-block local
# top-k + tiny reduce. Oracle: the full BM25 formula in SQL over
# string_split tokens (list_filter lambdas), identical rounding and tie
# order.

_Q102_TERMS = ("hash", "window", "spark")


def q102_bm25_topk(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import retrieval
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return retrieval.bm25_topk(ds, list(_Q102_TERMS), k=10, round_to=4)


def _q102_sql() -> str:
    tf_cols = ",\n   ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_Q102_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(_Q102_TERMS)))
    score = " + ".join(
        f"LN((n - df{i} + 0.5)/(df{i} + 0.5) + 1) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_Q102_TERMS)))
    return f"""
WITH l AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
         len(string_split(COALESCE(text, ''), ' '))::DOUBLE AS dl
  FROM documents
),
stats AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM l),
tf AS (SELECT doc_id, dl,
   {tf_cols}
 FROM l),
df AS (SELECT {df_cols} FROM tf)
SELECT doc_id, ROUND({score}, 4) AS score
FROM tf, stats, df
ORDER BY score DESC, doc_id LIMIT 10
"""


QUERIES.update({"q102_bm25_topk": q102_bm25_topk})
ORACLE.update({"q102_bm25_topk": _q102_sql()})


# ---------------------------------------------------------------------------
# q103 — FUNNEL analysis as a pure composition of existing operators:
# users whose first 'view' precedes their first 'purchase' (per-user
# conditional-min via null-masked columns + one grouped_aggregate, then a
# row-local compare). No new kernels — the operator algebra composes.

def q103_funnel(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    ds = maps.with_columns({
        "ts_view": lambda t: pc.if_else(pc.equal(t["event_type"], "view"),
                                        t["ts"], pa.nulls(t.num_rows,
                                                          t["ts"].type)),
        "ts_purchase": lambda t: pc.if_else(
            pc.equal(t["event_type"], "purchase"), t["ts"],
            pa.nulls(t.num_rows, t["ts"].type)),
    }).apply(ds)
    per_user = aggregates.grouped_aggregate(
        ["user_id"], [("min", "ts_view", "first_view"),
                      ("min", "ts_purchase", "first_purchase")]).apply(ds)

    def _classify(t: pa.Table) -> pa.Table:
        converted = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t["first_view"]),
                          pc.is_valid(t["first_purchase"])),
            pc.less(t["first_view"], t["first_purchase"]))
        # one partial row per block: the driver folds blocks, never users
        def _n(mask):
            return pc.sum(pc.cast(pc.fill_null(mask, False),
                                  pa.int64())).as_py() or 0
        return pa.table({
            "one": pa.array([t.num_rows], pa.int64()),
            "viewed": pa.array([_n(pc.is_valid(t["first_view"]))], pa.int64()),
            "purchased": pa.array([_n(pc.is_valid(t["first_purchase"]))],
                                  pa.int64()),
            "converted": pa.array([_n(converted)], pa.int64()),
        })

    flags = per_user.map_batches(_classify, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = aggregates.sum_partials(flags)
    return pa.table({
        "n_users": pa.array([out["one"]], pa.int64()),
        "n_viewed": pa.array([out["viewed"]], pa.int64()),
        "n_purchased": pa.array([out["purchased"]], pa.int64()),
        "n_converted": pa.array([out["converted"]], pa.int64()),
    })


Q103_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viewed,
       CAST(SUM(CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchased,
       CAST(SUM(CASE WHEN first_view < first_purchase THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted
FROM per_user
"""


# ---------------------------------------------------------------------------
# q104 — COHORT RETENTION: users grouped by first-activity week; for each
# (cohort week, weeks since cohort) the distinct active users. Pure
# composition: per-user min-week, broadcast join back, distinct
# (cohort, offset, user), pre-aggregated count.

def q104_cohort_retention(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    ds = maps.with_columns({
        "week": lambda t: pc.cast(F.date_trunc_week(t["ts"]),
                                  pa.timestamp("us")),
    }).apply(ds)
    cohort = aggregates.grouped_aggregate(
        ["user_id"], [("min", "week", "cohort_week")]).apply(ds)
    joined = joins.hash_join(cohort, on=["user_id"],
                             num_partitions=8).apply(ds)
    ds2 = maps.with_columns({
        "weeks_since": lambda t: pc.cast(
            pc.divide(pc.cast(pc.subtract(t["week"], t["cohort_week"]),
                              pa.int64()),
                      pa.scalar(7 * 24 * 3600 * 1_000_000, pa.int64())),
            pa.int64()),
    }).apply(joined)
    out = aggregates.count_distinct(["cohort_week", "weeks_since"],
                                    "user_id", "n_users")
    return out.apply(ds2).sort(["cohort_week", "weeks_since"])


Q104_SQL = """
WITH w AS (
  SELECT user_id, DATE_TRUNC('week', ts)::TIMESTAMP AS week FROM events
),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
SELECT c.cohort_week, CAST(DATEDIFF('week', c.cohort_week, w.week) AS BIGINT)
         AS weeks_since,
       COUNT(DISTINCT w.user_id) AS n_users
FROM w JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES.update({"q103_funnel": q103_funnel,
                "q104_cohort_retention": q104_cohort_retention})
ORACLE.update({"q103_funnel": Q103_SQL,
               "q104_cohort_retention": Q104_SQL})


# ---------------------------------------------------------------------------
# q105 — Z-ORDER clustered lake + stats-pruned RANGE SCAN: ingest the
# binlog fixture, OPTIMIZE ZORDER BY (lang, lsn) (Morton-sorted files,
# per-file min/max stats in the manifest), then range-scan a (lang, lsn)
# box. Files whose stats are disjoint are never opened; row groups inside
# surviving files are pruned by the pushed-down parquet filter. Oracle:
# the LWW window query with a plain WHERE over the same fixture.

_Q105_PRED = {"lang": ("go", "js"), "lsn": (2000, 9000)}


def q105_zorder_scan(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, zorder
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q105_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    out = zorder.range_scan(
        lake_dir, _Q105_PRED,
        columns=["repo", "path", "lsn", "commit", "lang", "content_sha256"])
    return out.sort(["repo", "path"])


Q105_SQL = f"""
SELECT repo, path, lsn, commit, lang, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
  AND lang BETWEEN '{_Q105_PRED["lang"][0]}' AND '{_Q105_PRED["lang"][1]}'
  AND lsn BETWEEN {_Q105_PRED["lsn"][0]} AND {_Q105_PRED["lsn"][1]}
ORDER BY repo, path
"""


QUERIES.update({"q105_zorder_scan": q105_zorder_scan})
ORACLE.update({"q105_zorder_scan": Q105_SQL})


# ---------------------------------------------------------------------------
# q106 — SNAPSHOT BOOTSTRAP + binlog catch-up (Debezium-style initial
# load): the consistent snapshot after epoch 0 (replay-derived, captured
# at lsn0 = max epoch-0 lsn) bulk-loads as the lake's epoch 0 with NO
# merge machinery, then epoch-1 events catch up through normal ingest —
# redeliveries at or below lsn0 are dropped at the snapshot boundary (the
# snapshot holds no tombstones for pre-snapshot deletes). Oracle: the LWW
# window over BOTH fixture epochs (payload columns; snapshot rows carry
# lsn0, so lsn itself is excluded from the contract).

def q106_bootstrap_catchup(sf_dir: str):
    import tempfile

    import pyarrow.parquet as pq

    import ray.data

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.cdc import oracle as cdc_oracle
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    ep0 = pq.read_table(os.path.join(Q24_BINLOG_DIR, "epoch-0.parquet"))
    state = cdc_oracle.replay(ep0)
    live = cdc_oracle.live_rows(state)
    snap = pa.Table.from_pylist(
        [{"repo": k[0], "path": k[1], "commit": v["commit"],
          "lang": v["lang"], "content": v["content"],
          "content_sha256": v["content_sha256"]}
         for k, v in sorted(live.items())])
    lsn0 = int(pc.max(ep0["lsn"]).as_py())

    lake_dir = tempfile.mkdtemp(prefix="q106_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    eng.bootstrap(ray.data.from_arrow(snap).repartition(4), lsn0=lsn0)
    events = read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8)
    eng.ingest_epoch(events, 1)
    return eng.read(columns=["repo", "path", "commit", "lang",
                             "content_sha256"]).sort(["repo", "path"])


Q106_SQL = f"""
SELECT repo, path, commit, lang, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q106_bootstrap_catchup": q106_bootstrap_catchup})
ORACLE.update({"q106_bootstrap_catchup": Q106_SQL})


# ---------------------------------------------------------------------------
# q107 — BM25 off the PERSISTED INVERTED INDEX: build the term-partitioned
# postings index over the documents table, then answer q102's query
# reading ONLY the query terms' partitions (partition prune by term hash,
# row-group prune inside by term-sorted stats). Oracle: q102's full SQL
# formula restricted to docs matching >= 1 term (an index never ranks
# zero-score docs); identical rounding and tie order.

def q107_bm25_indexed(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.stages import retrieval
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="q107_idx_", dir="/tmp")
    retrieval.build_inverted_index(ds, index_dir, num_partitions=16)
    return retrieval.bm25_topk_indexed(index_dir, list(_Q102_TERMS), k=10,
                                       round_to=4)


def _q107_sql() -> str:
    tf_cols = ",\n   ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_Q102_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(_Q102_TERMS)))
    score = " + ".join(
        f"LN((n - df{i} + 0.5)/(df{i} + 0.5) + 1) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_Q102_TERMS)))
    any_hit = " + ".join(f"tf{i}" for i in range(len(_Q102_TERMS)))
    return f"""
WITH l AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
         len(string_split(COALESCE(text, ''), ' '))::DOUBLE AS dl
  FROM documents
),
stats AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM l),
tf AS (SELECT doc_id, dl,
   {tf_cols}
 FROM l),
df AS (SELECT {df_cols} FROM tf)
SELECT doc_id, ROUND({score}, 4) AS score
FROM tf, stats, df
WHERE {any_hit} > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


QUERIES.update({"q107_bm25_indexed": q107_bm25_indexed})
ORACLE.update({"q107_bm25_indexed": _q107_sql()})


# ---------------------------------------------------------------------------
# q108 — distributed PAGERANK over a link graph (the host-authority
# quality signal of web-crawl pipelines). Fixed iteration count makes the
# fixpoint SQL-expressible: the oracle replays the identical recurrence —
# dangling mass included — as a chain of k CTEs in DuckDB.

_Q108_ITERS = 3
_Q108_DAMP = 0.85


def _q108_edge_table() -> pa.Table:
    """Deterministic host link graph: 150 hosts, 900 zipf-skewed edges,
    3 dangling hosts (never a source)."""
    import numpy as np
    rng = np.random.default_rng(108)
    n = 150
    src, dst = [], []
    for _ in range(900):
        u = int(rng.integers(0, n - 3))
        v = int(rng.zipf(1.5)) % n
        if u == v:
            v = (v + 1) % n
        src.append(f"host{u:03d}")
        dst.append(f"host{v:03d}")
    src.append("host000")
    dst.append(f"host{n - 1:03d}")      # reach a dangler
    return pa.table({"src": pa.array(src, pa.string()),
                     "dst": pa.array(dst, pa.string())})


_Q108_EDGES_PATH = os.path.join(
    _FIXTURE_DIR, "q108_edges_" + _spec_tag(_q108_edge_table, 108),
    "edges.parquet")


def ensure_q108_fixture() -> None:
    if not os.path.exists(_Q108_EDGES_PATH):
        _atomic_write_parquet(_q108_edge_table(), _Q108_EDGES_PATH)


def q108_pagerank(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import graph
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_q108_fixture()
    edges = read_parquet_clean(_Q108_EDGES_PATH, override_num_blocks=4)
    out = graph.pagerank(edges, iterations=_Q108_ITERS, damping=_Q108_DAMP,
                         num_partitions=8, round_to=9)
    return out.sort("node")


def _q108_sql() -> str:
    d = _Q108_DAMP
    its = []
    for i in range(_Q108_ITERS):
        prev = f"r{i}"
        its.append(f"""
r{i + 1} AS (
  SELECT nd.node,
         (1 - {d}) / (SELECT n FROM params)
         + {d} * (SELECT COALESCE(SUM(pr), 0) FROM {prev}
                  WHERE node NOT IN (SELECT node FROM od))
               / (SELECT n FROM params)
         + {d} * COALESCE(s.in_sum, 0) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, SUM(r.pr / od.outdeg) AS in_sum
    FROM edges e JOIN {prev} r ON e.src = r.node
                 JOIN od ON od.node = e.src
    GROUP BY e.dst) s USING (node)
)""")
    return f"""
WITH edges AS (SELECT src, dst FROM read_parquet('{_Q108_EDGES_PATH}')),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges
           UNION SELECT dst AS node FROM edges)),
params AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
od AS (SELECT src AS node, COUNT(*)::DOUBLE AS outdeg
       FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM params) AS pr FROM nodes),
{",".join(its)}
SELECT node, ROUND(pr, 9) AS pr FROM r{_Q108_ITERS} ORDER BY node
"""


QUERIES.update({"q108_pagerank": q108_pagerank})
ORACLE.update({"q108_pagerank": _q108_sql()})


# ---------------------------------------------------------------------------
# q109 — TEMPORAL (point-in-time) JOIN: each change event joined against
# the key's OWN SCD2 history AT lsn-1 — "what version did this change
# replace" — the leakage-safe dimension-lookup primitive (a fact must
# never see attributes from its future). Oracle: DuckDB ASOF LEFT JOIN
# over the globally-deduped event log with the delete-gap rule inline.

def q109_temporal_join(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, scd2
    from e_commerce_batch_etl_pipeline_ray.cdc.lake import _unify_to
    from e_commerce_batch_etl_pipeline_ray.stages import dedup
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()

    def _unify(t: pa.Table) -> pa.Table:
        return _unify_to(t, binlog.EVENT_SCHEMA_V2)

    parts = []
    for ep in range(Q24_EPOCHS):
        ds = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=4)
        parts.append(ds.map_batches(_unify, batch_format="pyarrow",
                                    zero_copy_batch=True))
    events = parts[0].union(*parts[1:])
    # duplicate deliveries are byte-identical; global dedupe on (key, lsn)
    events = dedup.dedup_keyed(["repo", "path", "lsn"], ["lsn"],
                               num_partitions=8).apply(events).materialize()

    hist = scd2.scd2_history(events, num_partitions=16)
    facts = events.map_batches(
        lambda t: pa.table({"repo": t["repo"], "path": t["path"],
                            "event_lsn": t["lsn"],
                            "lsn": pc.subtract(t["lsn"], pa.scalar(
                                1, pa.int64()))}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = scd2.temporal_join(facts, hist, payload=["commit"],
                                num_partitions=16)
    out = joined.map_batches(
        lambda t: pa.table({"repo": t["repo"], "path": t["path"],
                            "event_lsn": t["event_lsn"],
                            "prev_commit": t["commit"],
                            "valid_from_lsn": t["valid_from_lsn"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["repo", "path", "event_lsn"])


Q109_SQL = f"""
WITH ev AS (
  SELECT DISTINCT repo, path, lsn, op, commit
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
),
f AS (SELECT repo, path, lsn AS event_lsn, lsn - 1 AS at FROM ev)
SELECT f.repo, f.path, f.event_lsn,
       CASE WHEN e.op = 'D' THEN NULL ELSE e.commit END AS prev_commit,
       CASE WHEN e.op = 'D' THEN NULL ELSE e.lsn END AS valid_from_lsn
FROM f ASOF LEFT JOIN ev e
  ON f.repo = e.repo AND f.path = e.path AND f.at >= e.lsn
ORDER BY f.repo, f.path, f.event_lsn
"""


QUERIES.update({"q109_temporal_join": q109_temporal_join})
ORACLE.update({"q109_temporal_join": Q109_SQL})


# ---------------------------------------------------------------------------
# q110 — INCREMENTAL EXACT DEDUP with persistent state: the documents
# table arrives as two micro-batches (epoch 0 = doc_id < 300; epoch 1 =
# doc_id >= 300 plus a replay of docs 50-99 under new ids — cross-epoch
# duplicates). Epoch 1's survivors must be exactly the never-seen texts,
# decided against the hash-partitioned on-disk state, not a corpus
# rescan. Oracle: within-epoch lowest-id winner + NOT IN the earlier
# epoch's text set, in SQL.

def q110_incremental_dedup(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import dedup_state
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    e1 = docs.filter(expr="doc_id < 300")
    replay = docs.filter(expr="doc_id >= 50 and doc_id < 100").map_batches(
        lambda t: t.set_column(t.column_names.index("doc_id"), "doc_id",
                               pc.add(t["doc_id"], pa.scalar(10000,
                                                             pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)
    e2 = docs.filter(expr="doc_id >= 300").union(replay)

    eng = dedup_state.IncrementalDedup(dedup_state.IncDedupConfig(
        state_dir=tempfile.mkdtemp(prefix="q110_state_", dir="/tmp"),
        num_partitions=16))
    eng.ingest(e1, 0)
    eng.ingest(e2, 1)
    out = eng.novel(1).map_batches(
        lambda t: t.select(["doc_id", "source"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort("doc_id")


Q110_SQL = """
WITH e1 AS (SELECT doc_id, text, source FROM documents WHERE doc_id < 300),
e2 AS (
  SELECT doc_id + 10000 AS doc_id, text, source FROM documents
  WHERE doc_id BETWEEN 50 AND 99
  UNION ALL
  SELECT doc_id, text, source FROM documents WHERE doc_id >= 300
),
w2 AS (SELECT doc_id, text, source,
       ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) rn FROM e2)
SELECT doc_id, source FROM w2
WHERE rn = 1 AND text NOT IN (SELECT text FROM e1)
ORDER BY doc_id
"""


QUERIES.update({"q110_incremental_dedup": q110_incremental_dedup})
ORACLE.update({"q110_incremental_dedup": Q110_SQL})


# ---------------------------------------------------------------------------
# q111 — INCREMENTAL NEAR-DUP (MinHash bucket state) against the exact
# ground truth: the documents table arrives as two micro-batches (doc_id
# < 300, then >= 300); epoch 1's survivors must satisfy the engine's
# greedy streaming rule — no exact-Jaccard >= 0.8 witness among (a) epoch
# 0's KEPT docs or (b) ANY lower-id epoch-1 doc. At the recall-complete
# smoke operating point (bands=64 x rows=4, see q44) every true pair is a
# candidate and verification is exact, so the rule is replayed verbatim
# in SQL over the q44 all-pairs-Jaccard CTE. Operating point: bands=32 x
# rows=4 — P(miss | j=0.8) = (1-0.8^4)^32 ~= 5e-8, recall-complete in
# practice and deterministic, at half the carried-text shuffle of q44's
# 64-band point.

def q111_incremental_neardup(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import neardup_state
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    eng = neardup_state.IncrementalMinHashDedup(
        neardup_state.IncNearDupConfig(
            state_dir=tempfile.mkdtemp(prefix="q111_state_", dir="/tmp"),
            k=5, num_hashes=128, bands=32, threshold=0.8,
            num_partitions=16))
    eng.ingest(docs.filter(expr="doc_id < 300"), 0)
    eng.ingest(docs.filter(expr="doc_id >= 300"), 1)
    out = eng.novel(1).map_batches(
        lambda t: t.select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort("doc_id")


Q111_SQL = _Q44_NEARDUP_GROUND_TRUTH_CTES + """
, kept0 AS (
  SELECT doc_id FROM docs WHERE doc_id < 300
  AND NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = docs.doc_id)
)
SELECT d.doc_id FROM docs d
WHERE d.doc_id >= 300
  AND NOT EXISTS (
    SELECT 1 FROM pairs p
    WHERE p.id_b = d.doc_id
      AND (p.id_a >= 300 OR p.id_a IN (SELECT doc_id FROM kept0)))
ORDER BY d.doc_id
"""


QUERIES.update({"q111_incremental_neardup": q111_incremental_neardup})
ORACLE.update({"q111_incremental_neardup": Q111_SQL})


# ---------------------------------------------------------------------------
# q112 — FEED-MAINTAINED INVERTED INDEX: the index over the CDC lake's
# live content is refreshed from the change feed after EVERY epoch (only
# changed docs tokenized, only their term partitions rewritten), then a
# BM25 search reads only the query terms' partitions. Oracle: the full
# BM25 formula in SQL over the LWW live state of the same fixture.

_Q112_TERMS = ("return", "x")


def q112_index_view(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, index_view
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    root = tempfile.mkdtemp(prefix="q112_", dir="/tmp")
    lake_dir = os.path.join(root, "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    view = index_view.IndexView(lake_dir, os.path.join(root, "idx"),
                                num_partitions=16)
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
        view.refresh()
    return view.search(list(_Q112_TERMS), k=10, round_to=4)


def _q112_sql() -> str:
    tf_cols = ",\n   ".join(
        f"len(list_filter(toks, t -> t = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_Q112_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(_Q112_TERMS)))
    score = " + ".join(
        f"LN((n - df{i} + 0.5)/(df{i} + 0.5) + 1) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_Q112_TERMS)))
    any_hit = " + ".join(f"tf{i}" for i in range(len(_Q112_TERMS)))
    return f"""
WITH live AS (
  SELECT repo, path, content FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)) WHERE rn = 1 AND op <> 'D'
),
l AS (
  SELECT repo, path, string_split(COALESCE(content, ''), ' ') AS toks,
         len(string_split(COALESCE(content, ''), ' '))::DOUBLE AS dl
  FROM live
),
stats AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM l),
tf AS (SELECT repo, path, dl,
   {tf_cols}
 FROM l),
df AS (SELECT {df_cols} FROM tf)
SELECT repo, path, ROUND({score}, 4) AS score
FROM tf, stats, df
WHERE {any_hit} > 0
ORDER BY score DESC, repo, path LIMIT 10
"""


QUERIES.update({"q112_index_view": q112_index_view})
ORACLE.update({"q112_index_view": _q112_sql()})


# ---------------------------------------------------------------------------
# q113 — ONE-PASS approximate quantile sketch (mergeable weighted-sample
# summary). At sketch_size >= block rows the summary is lossless and the
# weighted inverted-CDF answer is EXACTLY quantile_disc — so the oracle
# pins the sketch/merge/CDF machinery itself; the approximate regime's
# <= 1/sketch_size rank bound is pytest-asserted (test_transform_steps).

_Q113_QS = (0.1, 0.5, 0.9, 0.99)


def q113_approx_quantiles(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    got = aggregates.approx_quantiles(ds, "l_extendedprice",
                                      list(_Q113_QS), sketch_size=10**9)
    return pa.table({f"q{int(q * 100):02d}": pa.array([v], pa.float64())
                     for q, v in zip(_Q113_QS, got)})


Q113_SQL = """
SELECT quantile_disc(l_extendedprice, 0.1)::DOUBLE AS q10,
       quantile_disc(l_extendedprice, 0.5)::DOUBLE AS q50,
       quantile_disc(l_extendedprice, 0.9)::DOUBLE AS q90,
       quantile_disc(l_extendedprice, 0.99)::DOUBLE AS q99
FROM lineitem
"""


QUERIES.update({"q113_approx_quantiles": q113_approx_quantiles})
ORACLE.update({"q113_approx_quantiles": Q113_SQL})


# ---------------------------------------------------------------------------
# q114 — WATERMARKED TUMBLING-WINDOW AGGREGATE (event time, bounded
# out-of-orderness, allowed lateness — the Flink windowing contract on the
# engine's micro-batch spine): the events table arrives in 4 epochs
# (time-ordered, with every 37th event shifted one epoch late), windows
# finalize when the watermark (max event time - lateness) passes their
# end, and too-late rows are DROPPED by contract. Oracle: the identical
# accept/finalize recurrence in SQL (running-max watermarks over the
# epoch tags, microsecond math both sides).

_Q114_W_MIN = 360.0          # 6h tumbling windows
_Q114_L_MIN = 1440.0         # 1 day allowed lateness
_Q114_EPOCHS = 4


def q114_windowed_watermark(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import window_view
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    total = ds.count()
    chunk = -(-total // _Q114_EPOCHS)

    def _arrival_mask(ep):
        def _fn(t: pa.Table) -> pa.Table:
            eid = t["event_id"]
            base = pc.divide(eid, pa.scalar(chunk, pa.int64()))
            mod = pc.subtract(eid, pc.multiply(
                pc.divide(eid, pa.scalar(37, pa.int64())),
                pa.scalar(37, pa.int64())))
            bump = pc.cast(pc.equal(mod, pa.scalar(0, pa.int64())),
                           pa.int64())
            arr = pc.min_element_wise(
                pc.add(base, bump),
                pa.scalar(_Q114_EPOCHS - 1, pa.int64()))
            return t.filter(pc.equal(arr, pa.scalar(ep, pa.int64())))
        return _fn

    agg = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=tempfile.mkdtemp(prefix="q114_win_", dir="/tmp"),
        window_minutes=_Q114_W_MIN, lateness_minutes=_Q114_L_MIN,
        ts_col="ts", key_col="event_type", value_col="value",
        num_partitions=8))
    for ep in range(_Q114_EPOCHS):
        sub = ds.map_batches(_arrival_mask(ep), batch_format="pyarrow",
                             zero_copy_batch=True)
        agg.ingest(sub, ep)
    out = agg.finalized().map_batches(
        lambda t: pa.table({"window_us": t["window_us"],
                            "event_type": t["event_type"],
                            "n_rows": t["n_rows"],
                            "sum_val": F.round2(t["sum_val"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["window_us", "event_type"])


def _q114_sql() -> str:
    w_us = int(_Q114_W_MIN * 60 * 1_000_000)
    l_us = int(_Q114_L_MIN * 60 * 1_000_000)
    k = _Q114_EPOCHS
    return f"""
WITH n AS (SELECT CAST(CEIL(COUNT(*) / {k}.0) AS BIGINT) AS chunk
           FROM events),
e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value,
         LEAST(CAST(FLOOR(event_id / chunk) AS BIGINT)
               + CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END,
               {k - 1}) AS ep
  FROM events, n),
eps AS (SELECT ep, MAX(ts_us) AS mx FROM e GROUP BY ep),
wms AS (
  SELECT ep,
         MAX(mx) OVER (ORDER BY ep
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {l_us} AS prev_wm
  FROM eps),
acc AS (
  SELECT e.event_type, e.value,
         CAST(FLOOR(e.ts_us / {w_us}) AS BIGINT) * {w_us} AS window_us
  FROM e JOIN wms USING (ep)
  WHERE wms.prev_wm IS NULL
     OR CAST(FLOOR(e.ts_us / {w_us}) AS BIGINT) * {w_us} + {w_us}
        > wms.prev_wm),
final_wm AS (SELECT MAX(mx) - {l_us} AS wm FROM eps)
SELECT window_us, event_type, COUNT(*) AS n_rows,
       ROUND(SUM(value), 2) AS sum_val
FROM acc, final_wm
WHERE window_us + {w_us} <= final_wm.wm
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES.update({"q114_windowed_watermark": q114_windowed_watermark})
ORACLE.update({"q114_windowed_watermark": _q114_sql()})


# ---------------------------------------------------------------------------
# q115 — HOPPING (sliding) watermark windows: q114's contract with every
# row joining window/slide overlapping windows. Oracle: the same SQL
# recurrence with the window set expanded via UNNEST(range(k)).

_Q115_W_MIN = 360.0
_Q115_S_MIN = 120.0          # k = 3 overlapping windows per row
_Q115_L_MIN = 1440.0


def q115_hopping_windows(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import window_view
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    total = ds.count()
    chunk = -(-total // _Q114_EPOCHS)

    def _arrival_mask(ep):
        def _fn(t: pa.Table) -> pa.Table:
            eid = t["event_id"]
            base = pc.divide(eid, pa.scalar(chunk, pa.int64()))
            mod = pc.subtract(eid, pc.multiply(
                pc.divide(eid, pa.scalar(37, pa.int64())),
                pa.scalar(37, pa.int64())))
            bump = pc.cast(pc.equal(mod, pa.scalar(0, pa.int64())),
                           pa.int64())
            arr = pc.min_element_wise(
                pc.add(base, bump),
                pa.scalar(_Q114_EPOCHS - 1, pa.int64()))
            return t.filter(pc.equal(arr, pa.scalar(ep, pa.int64())))
        return _fn

    agg = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=tempfile.mkdtemp(prefix="q115_win_", dir="/tmp"),
        window_minutes=_Q115_W_MIN, lateness_minutes=_Q115_L_MIN,
        ts_col="ts", key_col="event_type", value_col="value",
        num_partitions=8, slide_minutes=_Q115_S_MIN))
    for ep in range(_Q114_EPOCHS):
        sub = ds.map_batches(_arrival_mask(ep), batch_format="pyarrow",
                             zero_copy_batch=True)
        agg.ingest(sub, ep)
    out = agg.finalized().map_batches(
        lambda t: pa.table({"window_us": t["window_us"],
                            "event_type": t["event_type"],
                            "n_rows": t["n_rows"],
                            "sum_val": F.round2(t["sum_val"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["window_us", "event_type"])


def _q115_sql() -> str:
    w_us = int(_Q115_W_MIN * 60 * 1_000_000)
    s_us = int(_Q115_S_MIN * 60 * 1_000_000)
    l_us = int(_Q115_L_MIN * 60 * 1_000_000)
    k = _Q114_EPOCHS
    n_copies = w_us // s_us
    return f"""
WITH n AS (SELECT CAST(CEIL(COUNT(*) / {k}.0) AS BIGINT) AS chunk
           FROM events),
e AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value,
         LEAST(CAST(FLOOR(event_id / chunk) AS BIGINT)
               + CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END,
               {k - 1}) AS ep
  FROM events, n),
eps AS (SELECT ep, MAX(ts_us) AS mx FROM e GROUP BY ep),
wms AS (
  SELECT ep,
         MAX(mx) OVER (ORDER BY ep
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {l_us} AS prev_wm
  FROM eps),
ex AS (
  SELECT e.*, CAST(FLOOR(e.ts_us / {s_us}) AS BIGINT) * {s_us}
              - i * {s_us} AS window_us
  FROM e CROSS JOIN UNNEST(range(0, {n_copies})) AS t(i)),
acc AS (
  SELECT ex.event_type, ex.value, ex.window_us
  FROM ex JOIN wms USING (ep)
  WHERE wms.prev_wm IS NULL OR ex.window_us + {w_us} > wms.prev_wm),
final_wm AS (SELECT MAX(mx) - {l_us} AS wm FROM eps)
SELECT window_us, event_type, COUNT(*) AS n_rows,
       ROUND(SUM(value), 2) AS sum_val
FROM acc, final_wm
WHERE window_us + {w_us} <= final_wm.wm
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES.update({"q115_hopping_windows": q115_hopping_windows})
ORACLE.update({"q115_hopping_windows": _q115_sql()})


# ---------------------------------------------------------------------------
# q116 — WATERMARKED SESSION WINDOWS (incremental gap-merge across
# epochs): the events table arrives in 4 time-ordered micro-batches
# (sessions straddling epoch boundaries must merge in state), sessions
# finalize when last_event + gap <= watermark. Time-ordered arrival is
# the DROP-FREE operating point, so the path-dependent drop rule can't
# diverge and the one-shot SQL sessionization + finalize filter is an
# exact oracle; the drop path is pinned by tests/test_window_view.py.

_Q116_GAP_MIN = 30.0
_Q116_L_MIN = 60.0


def q116_session_windows(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import window_view
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    total = ds.count()
    chunk = -(-total // _Q114_EPOCHS)

    agg = window_view.SessionAggregate(window_view.SessionConfig(
        state_dir=tempfile.mkdtemp(prefix="q116_sess_", dir="/tmp"),
        gap_minutes=_Q116_GAP_MIN, lateness_minutes=_Q116_L_MIN,
        ts_col="ts", key_col="user_id", value_col="value",
        num_partitions=8))
    for ep in range(_Q114_EPOCHS):
        lo, hi = ep * chunk, (ep + 1) * chunk
        sub = ds.filter(expr=f"event_id >= {lo} and event_id < {hi}")
        agg.ingest(sub, ep)
    out = agg.finalized().map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "start_us": t["start_us"],
                            "last_us": t["last_us"],
                            "n_rows": t["n_rows"],
                            "sum_val": F.round2(t["sum_val"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["user_id", "start_us"])


def _q116_sql() -> str:
    gap_us = int(_Q116_GAP_MIN * 60 * 1_000_000)
    l_us = int(_Q116_L_MIN * 60 * 1_000_000)
    return f"""
WITH o AS (
  SELECT user_id, value, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {gap_us} THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (
  SELECT user_id, value, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o),
f AS (
  SELECT user_id, MIN(us) AS start_us, MAX(us) AS last_us,
         COUNT(*) AS n_rows, ROUND(SUM(value), 2) AS sum_val
  FROM s GROUP BY user_id, sid),
wm AS (SELECT MAX(epoch_us(ts)) - {l_us} AS w FROM events)
SELECT user_id, start_us, last_us, n_rows, sum_val
FROM f, wm WHERE last_us + {gap_us} <= wm.w
ORDER BY user_id, start_us
"""


QUERIES.update({"q116_session_windows": q116_session_windows})
ORACLE.update({"q116_session_windows": _q116_sql()})


# ---------------------------------------------------------------------------
# q117 — HYPERLOGLOG distinct-count sketch (stages/sketch.py): the query
# returns the merged REGISTER STATE per event_type — pure integers, so
# the oracle is bit-exact (the splitmix64 hash is replayed in SQL over
# HUGEINT intermediates and the rank via length(bin(rest))). The
# approximation itself (hll_estimate / approx_ndv) is bounds-tested in
# tests/test_sketch.py; checking the registers here proves the whole
# distributed pipeline (per-block partials -> max-merge shuffle) exact.

def q117_hll_registers(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    regs = sketch.hll_registers(ds, "user_id", by=["event_type"], p=14)
    return regs.sort(["event_type", "idx"])


def _q117_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    frag = sketch.hll_rank_sql("user_id", 14)
    return f"""
WITH h AS (SELECT event_type, {frag} FROM events)
SELECT event_type, idx, MAX(reg) AS reg FROM h
GROUP BY event_type, idx
ORDER BY event_type, idx
"""


QUERIES.update({"q117_hll_registers": q117_hll_registers})
ORACLE.update({"q117_hll_registers": _q117_sql()})


# ---------------------------------------------------------------------------
# q118 — INCREMENTAL DISTINCT-COUNT state (cdc/ndv_state.py): the events
# table arrives as THREE micro-batches (event_id thirds); the persisted
# HLL register state after the last epoch must equal the one-shot SQL
# registers over the WHOLE table — register max-merge is confluent, so
# the multi-epoch LSM state (2 deltas + 1 compaction at
# compact_interval=2... epochs 0,1 delta, epoch 2 rides a fresh
# interval) replays bit-exactly. Same oracle shape as q117.

def q118_incremental_ndv(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import ndv_state
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    n = ds.count()
    cut1, cut2 = n // 3, 2 * n // 3
    eng = ndv_state.IncrementalNDV(ndv_state.IncNDVConfig(
        state_dir=tempfile.mkdtemp(prefix="q118_state_", dir="/tmp"),
        col="user_id", by=["event_type"], p=14, num_partitions=8,
        compact_interval=2))
    eng.ingest(ds.filter(expr=f"event_id < {cut1}"), 0)
    eng.ingest(ds.filter(
        expr=f"event_id >= {cut1} and event_id < {cut2}"), 1)
    eng.ingest(ds.filter(expr=f"event_id >= {cut2}"), 2)
    return eng.registers()


def _q118_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    frag = sketch.hll_rank_sql("user_id", 14)
    return f"""
WITH h AS (SELECT event_type, {frag} FROM events)
SELECT event_type, idx, MAX(reg) AS reg FROM h
GROUP BY event_type, idx
ORDER BY event_type, idx
"""


QUERIES.update({"q118_incremental_ndv": q118_incremental_ndv})
ORACLE.update({"q118_incremental_ndv": _q118_sql()})


# ---------------------------------------------------------------------------
# q119 — KMV (k-minimum-values) distinct synopsis (stages/sketch.py): the
# set-algebra sketch — unlike HLL registers, two independently-built
# synopses support union/intersection/Jaccard estimates. The query
# returns the merged synopsis per event_type: pure uint64 hashes, and
# the synopsis is exactly SQL-expressible (k smallest DISTINCT splitmix64
# hashes), so the oracle is bit-exact. k=128 < per-group NDV at sf>=0.01
# (truncation path) and > NDV at sf0.001 (exact path) — the smoke matrix
# exercises both.

_Q119_K = 128


def q119_kmv_synopsis(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return sketch.kmv_synopsis(ds, "user_id", by=["event_type"], k=_Q119_K)


def _q119_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    sm = sketch.splitmix64_sql("user_id")
    return f"""
WITH d AS (SELECT DISTINCT event_type, {sm} AS h FROM events),
r AS (SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM d)
SELECT event_type, h FROM r WHERE rn <= {_Q119_K}
ORDER BY event_type, h
"""


QUERIES.update({"q119_kmv_synopsis": q119_kmv_synopsis})
ORACLE.update({"q119_kmv_synopsis": _q119_sql()})


# ---------------------------------------------------------------------------
# q120 — CROSS-CORPUS OVERLAP from two KMV synopses (contamination-rate
# shape): corpus A (doc_id % 3 <> 0) and corpus B (doc_id % 2 = 0) are
# sketched INDEPENDENTLY — no join, no cross-corpus shuffle; each side
# ships k uint64s — and the driver combines the two synopses into
# Jaccard / |A u B| / |A n B| / per-side NDV estimates (Beyer et al.
# 2007). The oracle replays the ENTIRE estimator in SQL (same synopsis,
# same double arithmetic in the same operation order), so even the
# approximation's float output is checked, not just the state. True
# id-space overlap is (2,4) mod 6 over (0,1,2,4,5) mod 6 = 0.4 — the
# estimate test in tests/test_sketch.py pins the error bound.

_Q120_K = 128


def q120_corpus_overlap(sf_dir: str):
    import pyarrow as _pa

    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    import numpy as _np

    def _mod_filter(m: int, keep_zero: bool):
        def f(t: _pa.Table) -> _pa.Table:
            r = (t["doc_id"].combine_chunks().to_numpy() % m) == 0
            return t.filter(_pa.array(r if keep_zero else ~r))
        return f

    docs = _read(sf_dir, "documents", ["doc_id"])
    a = docs.map_batches(_mod_filter(3, False), batch_format="pyarrow",
                         zero_copy_batch=True)
    b = docs.map_batches(_mod_filter(2, True), batch_format="pyarrow",
                         zero_copy_batch=True)
    out = sketch.corpus_overlap(a, b, "doc_id", k=_Q120_K)
    names = {"jaccard": "jaccard", "union_ndv": "union",
             "intersection_ndv": "intersection",
             "ndv_a": "ndv_a", "ndv_b": "ndv_b"}
    return _pa.table({n: _pa.array([out[src]], _pa.float64())
                      for n, src in names.items()})


def _q120_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    k = _Q120_K
    sm = sketch.splitmix64_sql("doc_id")

    def est(n: str, h: str) -> str:
        # mirrors kmv_ndv: exact count below k, else (k-1) * 2^64 / h_k
        return (f"CASE WHEN {n} < {k} THEN CAST({n} AS DOUBLE) "
                f"ELSE CAST({k - 1} AS DOUBLE) * 18446744073709551616.0"
                f" / CAST({h} AS DOUBLE) END")

    return f"""
WITH a AS (SELECT DISTINCT {sm} AS h FROM documents WHERE doc_id % 3 <> 0),
b AS (SELECT DISTINCT {sm} AS h FROM documents WHERE doc_id % 2 = 0),
sa AS (SELECT h FROM a ORDER BY h LIMIT {k}),
sb AS (SELECT h FROM b ORDER BY h LIMIT {k}),
u AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) ORDER BY h
      LIMIT {k}),
c AS (SELECT
  (SELECT COUNT(*) FROM u) AS nu,
  (SELECT COUNT(*) FROM u
     WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)) AS nboth,
  (SELECT MAX(h) FROM u) AS hu,
  (SELECT COUNT(*) FROM sa) AS na, (SELECT MAX(h) FROM sa) AS ha,
  (SELECT COUNT(*) FROM sb) AS nb, (SELECT MAX(h) FROM sb) AS hb),
e AS (SELECT
  CASE WHEN nu = 0 THEN 1.0 ELSE CAST(nboth AS DOUBLE) / nu END AS jac,
  {est('nu', 'hu')} AS u_est, {est('na', 'ha')} AS ndv_a,
  {est('nb', 'hb')} AS ndv_b FROM c)
SELECT jac AS jaccard, u_est AS union_ndv, jac * u_est AS intersection_ndv,
       ndv_a, ndv_b FROM e
"""


QUERIES.update({"q120_corpus_overlap": q120_corpus_overlap})
ORACLE.update({"q120_corpus_overlap": _q120_sql()})


# ---------------------------------------------------------------------------
# q121 — COUNT-MIN frequency sketch (stages/sketch.py): the frequency
# complement of q117 (HLL/NDV) and q119 (KMV/set algebra). The query
# returns the merged d x w COUNTER STATE per event_type — pure integer
# sums, and each row's hash is splitmix64 with an additive per-row seed,
# so the oracle replays the full state bit-exactly in SQL (UNION ALL of
# d hash projections -> GROUP BY count). The estimator's e/w * N
# overestimate bound is tested in tests/test_sketch.py.

_Q121_D, _Q121_W = 4, 512


def q121_cms_counters(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    c = sketch.cms_counters(ds, "user_id", by=["event_type"],
                            d=_Q121_D, w=_Q121_W)
    return c.sort(["event_type", "row", "idx"])


def _q121_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sketch
    arms = "\nUNION ALL ".join(
        f"SELECT event_type, {j} AS row, "
        f"{sketch.cms_hash_sql('user_id', j, _Q121_W)} AS idx FROM events"
        for j in range(_Q121_D))
    return f"""
WITH h AS ({arms})
SELECT event_type, row, idx, COUNT(*) AS cnt FROM h
GROUP BY event_type, row, idx
ORDER BY event_type, row, idx
"""


QUERIES.update({"q121_cms_counters": q121_cms_counters})
ORACLE.update({"q121_cms_counters": _q121_sql()})


# ---------------------------------------------------------------------------
# q122 — VIDEO frame pipeline, REAL end-to-end (stages/multimodal.py +
# stages/imagecodec.py GIF codec): deterministic animated-GIF payloads ->
# actor-pool frame sampling (decode_gif, evenly-spaced picks, PNG
# re-encode) -> actor-pool image decode of each frame (pixel-histogram
# features) -> per-video aggregate. The whole chain is pure-numpy
# decode, no stub. Not SQL-expressible (binary codecs) — rows-only
# check, like q31; the codecs themselves are pinned by roundtrip +
# foreign-file tests in tests/test_imagecodec.py.

def q122_video_frames(sf_dir: str):
    import ray.data as rd

    from e_commerce_batch_etl_pipeline_ray.stages import (
        aggregates,
        multimodal,
    )
    media = multimodal.real_video_table(256, seed=13)
    ds = rd.from_arrow(media)
    frames = multimodal.sample_frames(n_frames=3, batch_size=32).apply(ds)
    frames = frames.rename_columns({"frame": "payload"})
    frames = frames.map_batches(            # DecodeImage metadata contract
        lambda t: t.append_column(
            "width", pa.array([None] * len(t), pa.int32())).append_column(
            "height", pa.array([None] * len(t), pa.int32())),
        batch_format="pyarrow", zero_copy_batch=True)
    decoded = multimodal.decode_images(fake=False, batch_size=64).apply(
        frames)
    agg = aggregates.grouped_aggregate(
        ["media_id"],
        [("count", "frame_no", "n_frames"),
         ("max", "width", "max_w"), ("max", "height", "max_h")],
    ).apply(decoded)
    return agg.sort("media_id")


QUERIES.update({"q122_video_frames": q122_video_frames})


# ---------------------------------------------------------------------------
# q123 — WEIGHTED Bernoulli sample (stages/sampling.weighted_sample):
# P(keep) = min(1, rate * n_chars) — the expected-count mixture
# primitive, pure row-local (zero shuffle, layout/retry-invariant).
# Bit-exact oracle: the unit hash is exact integer arithmetic and
# rate * weight is one correctly-rounded double multiply in both
# engines.

_Q123_RATE, _Q123_SEED = 1 / 3000.0, 7


def q123_weighted_sample(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    out = sampling.weighted_sample("doc_id", "n_chars", _Q123_RATE,
                                   seed=_Q123_SEED).apply(ds)
    return out.sort("doc_id")


def _q123_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    u = sampling.sql_unit_hash("doc_id", _Q123_SEED)
    return f"""
SELECT doc_id, n_chars, lang FROM documents
WHERE {u} < LEAST(1.0, {_Q123_RATE!r} * CAST(n_chars AS DOUBLE))
ORDER BY doc_id
"""


QUERIES.update({"q123_weighted_sample": q123_weighted_sample})
ORACLE.update({"q123_weighted_sample": _q123_sql()})


# ---------------------------------------------------------------------------
# q124 — WEIGHTED TOP-K WITHOUT REPLACEMENT (Efraimidis-Spirakis
# exponential race, stages/sampling.weighted_top_k): the k=64 documents
# winning the ln(u)/n_chars race — longer docs proportionally likelier,
# no resampling rounds, per-block prune + k-rows-per-block merge. The
# SQL twin replays the race (see the 1-ulp order-tie note in the
# docstring — verified green at every shipped sf).

_Q124_K, _Q124_SEED = 64, 11


def q124_weighted_topk(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = sampling.weighted_top_k(ds, "doc_id", "n_chars", _Q124_K,
                                  seed=_Q124_SEED)
    return out.sort("doc_id")


def _q124_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages import sampling
    u = sampling.sql_unit_hash_open("doc_id", _Q124_SEED)
    return f"""
SELECT doc_id, n_chars FROM documents
WHERE n_chars > 0
ORDER BY ln({u}) / CAST(n_chars AS DOUBLE) DESC, doc_id
LIMIT {_Q124_K}
"""


QUERIES.update({"q124_weighted_topk": q124_weighted_topk})
ORACLE.update({"q124_weighted_topk": _q124_sql()})


# ---------------------------------------------------------------------------
# q125 — INCREMENTAL KMV SYNOPSIS state (cdc/kmv_state.py): the events
# table arrives as THREE micro-batches; the persisted per-event_type
# synopsis after the last epoch must equal the one-shot SQL synopsis
# over the WHOLE table — union-then-truncate is confluent (the k
# smallest of A u B lie inside the k smallest of each side), so the
# multi-epoch LSM state (delta, delta, compact at compact_interval=3...
# epochs 0,1 delta, epoch 2 compacts) replays bit-exactly. Same oracle
# shape as q119.

def q125_incremental_kmv(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import kmv_state
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    n = ds.count()
    cut1, cut2 = n // 3, 2 * n // 3
    eng = kmv_state.IncrementalKMV(kmv_state.IncKMVConfig(
        state_dir=tempfile.mkdtemp(prefix="q125_state_", dir="/tmp"),
        col="user_id", by=["event_type"], k=_Q119_K, num_partitions=4,
        compact_interval=3))
    eng.ingest(ds.filter(expr=f"event_id < {cut1}"), 0)
    eng.ingest(ds.filter(
        expr=f"event_id >= {cut1} and event_id < {cut2}"), 1)
    eng.ingest(ds.filter(expr=f"event_id >= {cut2}"), 2)
    return eng.synopsis()


QUERIES.update({"q125_incremental_kmv": q125_incremental_kmv})
ORACLE.update({"q125_incremental_kmv": _q119_sql()})


# ---------------------------------------------------------------------------
# q126 — TRIANGLE COUNTS + local clustering coefficient over the q108
# host link graph (stages/graph.triangle_counts): degree-ordered
# orientation (every out-neighborhood O(sqrt(m)) — the skew armor), one
# co-partitioned wedge-close pass, exact counts. Oracle: canonical
# a<b<c three-way self-join in SQL crediting all three corners.

def q126_triangles(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import graph
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_q108_fixture()
    edges = read_parquet_clean(_Q108_EDGES_PATH, override_num_blocks=4)
    out = graph.triangle_counts(edges, num_partitions=8, round_to=9)
    return out.sort("node")


def _q126_sql() -> str:
    return f"""
WITH raw AS (SELECT src, dst FROM read_parquet('{_Q108_EDGES_PATH}')),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
deg AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
        GROUP BY node),
cr AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
       UNION ALL SELECT z FROM tri),
tc AS (SELECT node, COUNT(*) AS triangles FROM cr GROUP BY node)
SELECT d.node, d.degree, COALESCE(tc.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2
            THEN ROUND(2.0 * COALESCE(tc.triangles, 0)
                       / (d.degree * (d.degree - 1.0)), 9)
            ELSE 0.0 END AS clustering
FROM deg d LEFT JOIN tc USING (node)
ORDER BY d.node
"""


QUERIES.update({"q126_triangles": q126_triangles})
ORACLE.update({"q126_triangles": _q126_sql()})


# ---------------------------------------------------------------------------
# q127 — per-group ROBUST STATS (exact median + MAD + count,
# stages/aggregates.grouped_robust_stats): the outlier-resistant
# location/scale profile per language over doc lengths. Over the
# integer n_chars column every median/MAD intermediate is an exact
# .0/.5 double, so the oracle (DuckDB MEDIAN/MAD) is bit-exact.

def q127_robust_stats(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import aggregates
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    out = aggregates.grouped_robust_stats(["lang"], "n_chars",
                                          num_partitions=8).apply(ds)
    return out.sort("lang")


Q127_SQL = """
SELECT lang, median(n_chars) AS median, mad(n_chars) AS mad,
       COUNT(n_chars) AS n
FROM documents GROUP BY lang ORDER BY lang
"""


QUERIES.update({"q127_robust_stats": q127_robust_stats})
ORACLE.update({"q127_robust_stats": Q127_SQL})


# ---------------------------------------------------------------------------
# q128 — ROBUST OUTLIER FILTER (|x - median| <= c * MAD per language,
# stages/aggregates.robust_outlier_filter): the data-quality gate that
# drops length outliers without letting them poison the threshold
# itself. Stats shuffle once (one row per group), broadcast via
# ray.put, then a pure row-local filter.

_Q128_C = 2.0


def q128_robust_outlier_filter(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import aggregates
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = aggregates.robust_outlier_filter(
        ["lang"], "n_chars", c=_Q128_C, num_partitions=8).apply(ds)
    return out.sort("doc_id")


Q128_SQL = f"""
WITH s AS (SELECT lang, median(n_chars) AS med, mad(n_chars) AS mad
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN s USING (lang)
WHERE ABS(d.n_chars - s.med) <= {_Q128_C!r} * s.mad
ORDER BY d.doc_id
"""


QUERIES.update({"q128_robust_outlier_filter": q128_robust_outlier_filter})
ORACLE.update({"q128_robust_outlier_filter": Q128_SQL})


# ---------------------------------------------------------------------------
# q129 — END-TO-END CURRICULUM BUILD (pipelines/curriculum.py): the
# flagship composition — lang-ID -> quality gate -> robust length gate
# -> exact dedup -> near-dup dedup -> mixture sample -> BPE train +
# tokenize -> FFD packing -> sharded parquet. Returns the per-stage
# count lineage plus token totals; every stage is individually oracled
# elsewhere (q20/q16/q127-128/q14/q44-45/q36/q101/q37), the composition
# itself is iterative/binary (BPE, packing) so this is a rows-only
# entry. Deterministic at any layout (layout-invariance test).

def q129_curriculum_build(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.pipelines import curriculum
    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "lang", "source", "n_chars"])
    cfg = curriculum.CurriculumConfig(
        out_dir=tempfile.mkdtemp(prefix="q129_curr_", dir="/tmp"),
        num_merges=24, pack_budget=256, n_shards=4,
        lang_fractions={"en": 1.0}, default_fraction=0.5)
    m = curriculum.build_curriculum(docs, cfg)
    rows = sorted(m["counts"].items()) + [
        ("tokens_total", m["tokens_total"]),
        ("merges_trained", m["num_merges"])]
    return pa.table({"stage": pa.array([k for k, _ in rows]),
                     "value": pa.array([int(v) for _, v in rows],
                                       pa.int64())})


QUERIES.update({"q129_curriculum_build": q129_curriculum_build})


# ---------------------------------------------------------------------------
# q130 — PARTIAL-COLUMN (PATCH) CDC MERGE (cdc/patch.py): cell-grain LWW.
# The fixture binlog's U events are full images OR single-column patches
# (cols='commit' | 'lang' | 'content,content_sha256', chosen by splitmix64
# of the lsn so duplicate deliveries replay identically); patch rows keep
# generator values in their UNSET columns on purpose — engine and oracle
# must both ignore them. The DuckDB oracle replays the cell semantics with
# NULL-safe arg_max over one-field structs: per key, del_lsn = max D lsn;
# each column = value of the max-lsn post-delete event that SET it. Crosses
# the schema-evolution boundary (epoch-0 has no lang column: a pre-evolution
# full image must later LOSE to a lang patch, and a pre-evolution 'lang'
# patch sets NULL on both sides).

_PATCH_PARAMS = dict(events_per_epoch=5000, n_repos=20, paths_per_repo=100,
                     evolution_epoch=1, content_chars_min=32,
                     content_chars_max=256)
_PATCH_EPOCHS = 2
_PATCH_CELLS = ["commit", "lang", "content", "content_sha256"]


def _patch_fixture_dir() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    return os.path.join(
        _FIXTURE_DIR,
        "q130_patchlog_" + _spec_tag(_PATCH_PARAMS, _PATCH_EPOCHS,
                                     _patch.gen_patch_epoch_table))


PATCH_BINLOG_DIR = _patch_fixture_dir()
_PATCH_FILES = [os.path.join(PATCH_BINLOG_DIR, f"epoch-{ep}.parquet")
                for ep in range(_PATCH_EPOCHS)]


def ensure_patch_fixture() -> None:
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    spec = binlog.BinlogSpec(**_PATCH_PARAMS)
    for ep, p in enumerate(_PATCH_FILES):
        if not os.path.exists(p):
            _atomic_write_parquet(_patch.gen_patch_epoch_table(spec, ep), p)


def q130_patch_cdc(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_patch_fixture()
    lake_dir = tempfile.mkdtemp(prefix="q130_patchlake_", dir="/tmp")
    eng = _patch.PatchCDCEngine(_patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2))
    for ep, p in enumerate(_PATCH_FILES):
        eng.ingest_epoch(read_parquet_clean(p, override_num_blocks=8), ep)
    return eng.read().sort(["repo", "path"])


def _q130_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    return _patch.patch_oracle_sql(_PATCH_FILES, _PATCH_CELLS)


QUERIES.update({"q130_patch_cdc": q130_patch_cdc})
ORACLE.update({"q130_patch_cdc": _q130_sql()})


# ---------------------------------------------------------------------------
# q131 — PREDICATE DELETE (DELETE WHERE) through the standard epoch
# protocol: ingest the q24 binlog fixture, then engine.delete_where(lang =
# 'go') as epoch 2 — a snapshot read + D tombstones at watermark+1, so the
# delete is exactly-once, crash/resumable and feed-visible. Oracle: the q24
# LWW replay with the predicate's matches removed (NULL lang survives —
# SQL WHERE semantics on both sides).

def q131_delete_where(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q131_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    eng.delete_where(lambda t: pc.equal(t["lang"], "go"), Q24_EPOCHS,
                     columns=["lang"])
    return eng.read().sort(["repo", "path"])


Q131_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D' AND (lang IS NULL OR lang <> 'go')
ORDER BY repo, path
"""

QUERIES.update({"q131_delete_where": q131_delete_where})
ORACLE.update({"q131_delete_where": Q131_SQL})


# ---------------------------------------------------------------------------
# q132 — GDPR PURGE (physical erasure): ingest the q24 fixture, then
# lake.purge_keys two fixed keys — every committed epoch's partition files
# are rewritten in place (hash-routed, only the keys' partitions), so TIME
# TRAVEL to any epoch no longer returns them and the bytes are gone from
# disk (pytest asserts both; the oracle checks the final live state =
# replay minus the keys).

_PURGE_KEYS = [("org000/proj", "src/mod0/file0.py"),
               ("org001/proj", "src/mod1/file1.py")]


def q132_gdpr_purge(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q132_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.purge_keys(lake_dir, _PURGE_KEYS)
    return eng.read().sort(["repo", "path"])


Q132_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
  AND (repo, path) NOT IN (('org000/proj', 'src/mod0/file0.py'),
                           ('org001/proj', 'src/mod1/file1.py'))
ORDER BY repo, path
"""

QUERIES.update({"q132_gdpr_purge": q132_gdpr_purge})
ORACLE.update({"q132_gdpr_purge": Q132_SQL})


# ---------------------------------------------------------------------------
# q133 — INCREMENTAL COUNT-MIN state (cdc/cms_state.py): the frequency
# complement of the q118 HLL state and q125 KMV state — the events table
# arrives as THREE micro-batches (epochs 0,1 delta + epoch 2 compact);
# counter sum-merge is confluent under epoch SLICING (every event summed
# exactly once in any slicing), so the persisted per-event_type counter
# state after the last epoch equals the one-shot q121 SQL replay over
# the WHOLE table. Crash/redelivery safety is the manifest protocol's,
# not the algebra's (sum is not idempotent) — pinned by tests.

def q133_incremental_cms(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import cms_state
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    n = ds.count()
    cut1, cut2 = n // 3, 2 * n // 3
    eng = cms_state.IncrementalCMS(cms_state.IncCMSConfig(
        state_dir=tempfile.mkdtemp(prefix="q133_state_", dir="/tmp"),
        col="user_id", by=["event_type"], d=_Q121_D, w=_Q121_W,
        num_partitions=4, compact_interval=3))
    eng.ingest(ds.filter(expr=f"event_id < {cut1}"), 0)
    eng.ingest(ds.filter(
        expr=f"event_id >= {cut1} and event_id < {cut2}"), 1)
    eng.ingest(ds.filter(expr=f"event_id >= {cut2}"), 2)
    return eng.counters()


QUERIES.update({"q133_incremental_cms": q133_incremental_cms})
ORACLE.update({"q133_incremental_cms": _q121_sql()})


# ---------------------------------------------------------------------------
# q134/q135 — IVF-PQ quantized ANN (stages/similarity.py pq_index_*): the
# COMPRESSED scale path — the persisted index stores m-byte product-
# quantized residual codes instead of float vectors (~30x fewer bytes per
# probed read at m=16 over 64-dim float32), scores candidates by ADC
# lookup tables, and recovers exact accuracy by re-ranking the ADC
# shortlist against the true vectors (id-pruned read). q134 is the
# realistic operating point (nprobe=4 of 16, shortlist 4k, exact rerank)
# — approximate by design, rows-only check with recall pinned in pytest.
# q135 is the exact-mode oracle (probe ALL lists + rerank the FULL
# candidate set): the result must EQUAL brute force, i.e. the q17 SQL —
# covering build, codes roundtrip, probe routing, pruned read and rerank.

def _q134_index(sf_dir: str) -> tuple:
    import tempfile

    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = ds.take(3)
    qids = [r["vec_id"] for r in qrows]
    qm = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
    idx = tempfile.mkdtemp(prefix="q134_pq_", dir="/tmp")
    similarity.pq_index_build(ds, idx, n_centroids=16, m=16, ks=256)
    return ds, idx, (qids, qm)


def q134_knn_pq(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds, idx, q = _q134_index(sf_dir)
    return similarity.pq_index_search(idx, q, k=10, nprobe=4,
                                      rerank_ds=ds, rerank_factor=4)


def q135_knn_pq_exact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import similarity
    ds, idx, q = _q134_index(sf_dir)
    return similarity.pq_index_search(idx, q, k=10, nprobe=16,
                                      rerank_ds=ds, rerank_factor=None)


QUERIES.update({"q134_knn_pq": q134_knn_pq,
                "q135_knn_pq_exact": q135_knn_pq_exact})
ORACLE.update({"q135_knn_pq_exact": Q17_SQL})


# ---------------------------------------------------------------------------
# q136 — PRIMARY-KEY-CHANGE events (engine.expand_renames): Debezium emits
# an update that moves the key as DELETE(old)+CREATE(new); for source-code
# repos that is a FILE RENAME. Epoch 2 of the fixture is a deterministic
# rename log (op='R', new key + old_repo/old_path + full image) over the
# q24 keyspace, expanded batch-locally into the D/I pair at the same lsn
# and ingested through the standard protocol. The oracle replays the
# expansion with two UNION ALL arms, then the usual LWW window. Covers
# renames of live keys, renames of dead/never-live keys (D is a no-op
# tombstone, I creates), and double-renames of one source key.

_Q136_N = 300


def _gen_rename_table(n: int = _Q136_N, seed: int = 77) -> pa.Table:
    import hashlib as _hl

    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.cdc.binlog import LANGS
    from e_commerce_batch_etl_pipeline_ray.sources.generators import (
        rng_streams,
    )
    ids = np.arange(n, dtype=np.int64)
    r = (rng_streams(ids, seed, 240) % np.uint64(20)).astype(np.int64)
    p = (rng_streams(ids, seed, 241) % np.uint64(100)).astype(np.int64)
    li = (rng_streams(ids, seed, 242) % np.uint64(len(LANGS))).astype(int)
    content = [f"# moved file {int(i)}\ndef f{int(i)}(): return {int(i)}\n"
               for i in ids]
    sha = [_hl.sha256(c.encode()).hexdigest() for c in content]
    return pa.table({
        "lsn": pa.array(10_000 + ids, pa.int64()),
        "op": pa.array(["R"] * n, pa.string()),
        "repo": pa.array([f"org{int(x):03d}/proj" for x in r], pa.string()),
        "path": pa.array([f"src/moved/file{int(i)}.py" for i in ids],
                         pa.string()),
        "old_repo": pa.array([f"org{int(x):03d}/proj" for x in r],
                             pa.string()),
        "old_path": pa.array(
            [f"src/mod{int(x) % 40}/file{int(x)}.py" for x in p],
            pa.string()),
        "commit": pa.array([f"{int(x):040x}" for x in ids], pa.string()),
        "lang": pa.array([LANGS[i] for i in li], pa.string()),
        "content": pa.array(content, pa.string()),
        "content_sha256": pa.array(sha, pa.string()),
    })


def _rename_fixture_path() -> str:
    return os.path.join(
        _FIXTURE_DIR,
        "q136_renames_" + _spec_tag(_Q136_N, _gen_rename_table),
        "renames.parquet")


_Q136_RENAMES = _rename_fixture_path()


def ensure_rename_fixture() -> None:
    if not os.path.exists(_Q136_RENAMES):
        _atomic_write_parquet(_gen_rename_table(), _Q136_RENAMES)


def q136_pk_change(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    ensure_rename_fixture()
    lake_dir = tempfile.mkdtemp(prefix="q136_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    renames = read_parquet_clean(_Q136_RENAMES, override_num_blocks=4) \
        .map_batches(engine.expand_renames, batch_format="pyarrow")
    eng.ingest_epoch(renames, Q24_EPOCHS)
    return eng.read().sort(["repo", "path"])


def _q136_sql() -> str:
    return f"""
WITH ren AS (SELECT * FROM read_parquet('{_Q136_RENAMES}')),
ev AS (
  SELECT lsn, op, repo, path, commit, lang, content, content_sha256
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
  UNION ALL
  SELECT lsn, 'D', old_repo, old_path, NULL, NULL, NULL, NULL
  FROM ren WHERE NOT (repo = old_repo AND path = old_path)
  UNION ALL
  SELECT lsn, 'I', repo, path, commit, lang, content, content_sha256
  FROM ren
)
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM ev
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q136_pk_change": q136_pk_change})
ORACLE.update({"q136_pk_change": _q136_sql()})


# q137 — CELL-GRAIN CHANGE FEED on the patch lake (cdc/patch_feed.py): the
# downstream-consumer view of a partial-column CDC stream — per epoch
# boundary, which keys changed and WHICH CELLS moved (changed_cols =
# comma-joined sorted names of the value-distinct cells), with pre/post
# images, Debezium-style inserts (revives included) and deletes carrying
# the tombstone's lsn. Value-grain: an lsn advance that re-set every cell
# to the same value emits nothing, so duplicate delivery is invisible.
# The oracle replays every boundary in SQL: one q130-style cell-LWW state
# per epoch PREFIX (filename pushdown), full old-vs-new diff, changed_cols
# rebuilt via list_filter over per-cell IS DISTINCT FROM cases. The fixture
# extends the q130 binlog to 3 epochs so the feed crosses the schema
# evolution boundary AND covers two boundaries in one run.

_PFEED_EPOCHS = 3


def _pfeed_fixture_dir() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    return os.path.join(
        _FIXTURE_DIR,
        "q137_patchlog_" + _spec_tag(_PATCH_PARAMS, _PFEED_EPOCHS,
                                     _patch.gen_patch_epoch_table))


PFEED_BINLOG_DIR = _pfeed_fixture_dir()
_PFEED_FILES = [os.path.join(PFEED_BINLOG_DIR, f"epoch-{ep}.parquet")
                for ep in range(_PFEED_EPOCHS)]


def ensure_pfeed_fixture() -> None:
    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    spec = binlog.BinlogSpec(**_PATCH_PARAMS)
    for ep, p in enumerate(_PFEED_FILES):
        if not os.path.exists(p):
            _atomic_write_parquet(_patch.gen_patch_epoch_table(spec, ep), p)


def q137_patch_feed(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import patch as _patch
    from e_commerce_batch_etl_pipeline_ray.cdc import patch_feed as _pf
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_pfeed_fixture()
    lake_dir = tempfile.mkdtemp(prefix="q137_patchlake_", dir="/tmp")
    # compact_interval=2: epochs 0/2 write LSM deltas, epoch 1 compacts —
    # the driver's oracle gate exercises the delta read/diff path too
    eng = _patch.PatchCDCEngine(_patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2,
        compact_interval=2))
    for ep, p in enumerate(_PFEED_FILES):
        eng.ingest_epoch(read_parquet_clean(p, override_num_blocks=8), ep)
    return _pf.cell_change_feed(lake_dir, from_epoch=1).sort(
        ["_commit_epoch", "repo", "path", "_change_type"])


def _q137_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import patch_feed as _pf
    return _pf.cell_feed_oracle_sql(_PFEED_FILES, _PATCH_CELLS, from_epoch=1)


QUERIES.update({"q137_patch_feed": q137_patch_feed})
ORACLE.update({"q137_patch_feed": _q137_sql()})


# q138 — AUDIO LOG-MEL FEATURES (rows-only: FFT is not SQL-expressible;
# the DSP kernel is pinned by tests/test_audiodsp.py against a naive
# per-frame reference and physical sine-band sanity). Deterministic PCM16
# WAV clips (mixed 8/16 kHz, 1-3 seeded tones) -> REAL pure-numpy WAV
# decode -> strided-STFT log-mel spectrogram -> per-band mean+std clip
# embedding (actor pool, filterbank built once per actor per rate) ->
# brute cosine KNN over the embeddings: the full audio similarity chain.

def q138_audio_logmel(sf_dir: str):
    import numpy as np

    import ray.data as rd

    from e_commerce_batch_etl_pipeline_ray.stages import multimodal, similarity
    ds = rd.from_arrow(multimodal.real_audio_table(384, seed=11)) \
        .repartition(8)
    feats = multimodal.audio_features(batch_size=64).apply(ds) \
        .select_columns(["media_id", "audio_embedding"])
    qrows = feats.take(2)
    qids = [r["media_id"] for r in qrows]
    qm = np.asarray([r["audio_embedding"] for r in qrows], dtype=np.float64)
    return similarity.knn_brute(feats, (qids, qm), k=5,
                                emb_col="audio_embedding",
                                id_col="media_id")


QUERIES.update({"q138_audio_logmel": q138_audio_logmel})


# ---------------------------------------------------------------------------
# q139 — BLOOM-PRUNED POINT READ over an LSM delta chain (cdc/keybloom.py):
# every partition-file write emits a <file>.kbloom sidecar (Bloom over the
# file's fused keys — Delta-Lake-style bloom indexes); point_read skips
# files whose bloom proves no needle present BEFORE opening the footer.
# The lake is built base-less at compact_interval=3 (both fixture epochs
# are LSM deltas), so a lookup walks a 2-file delta chain per partition —
# the exact shape where blooms pay: a cold key's partition files all
# prune, a key touched only in epoch 1 skips the epoch-0 delta. Needles =
# the q91 key set PLUS never-inserted keys (miss path). The oracle is the
# same LWW window restricted to the key set; misses contribute no rows,
# so the result must be IDENTICAL with pruning on — correctness of the
# skip logic is what the hash check verifies.

def q139_bloom_point_read(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q139_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2,
        compact_interval=3, key_bloom_fpp=0.01))
    for ep in range(Q24_EPOCHS):
        events = read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)
        eng.ingest_epoch(events, ep)
    keys = [(f"org{r:03d}/proj", p)
            for r in range(_Q24_PARAMS["n_repos"]) for p in _Q91_PATHS]
    # guaranteed misses: repos/paths the generator never emits
    keys += [(f"ghost{r}/proj", "src/mod0/file0.py") for r in range(10)]
    keys += [("org000/proj", f"src/ghost/file{i}.py") for i in range(10)]
    return lake.point_read(lake_dir, keys).sort(["repo", "path"])


QUERIES.update({"q139_bloom_point_read": q139_bloom_point_read})
ORACLE.update({"q139_bloom_point_read": Q91_SQL})


# ---------------------------------------------------------------------------
# q140/q141 — DEAD-LETTER QUEUE ingest (cdc/dlq.py; Debezium/Kafka-Connect
# errors.deadletterqueue semantics): a dirty binlog (null keys, negative
# lsns, unknown ops, corrupted sha256s injected deterministically) ingests
# with CDCConfig(dlq=True, verify_sha=True) — malformed rows quarantine
# into dlq-NNNNN.parquet files riding the epoch's atomic promote, valid
# rows apply normally. q140 returns the DLQ table (reason per row, fixed
# precedence) — oracle = the SAME validity CASE over the fixture,
# including DuckDB's own sha256() recompute. q141 returns the lake's live
# state — oracle = the LWW window over VALID rows only, proving
# quarantine never leaks a bad row into state nor drops a good one.

def _dlq_dirty_table() -> pa.Table:
    """Deterministic dirty binlog: q24-generator events + four corruption
    families on disjoint row slices (every 41st row rotates a family)."""
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog
    spec = binlog.BinlogSpec(**_Q24_PARAMS)
    t = binlog.gen_epoch_table(spec, 0)
    n = t.num_rows
    idx = np.arange(n)
    fam = np.where(idx % 41 == 0, idx // 41 % 4, -1)
    path = pc.if_else(pa.array(fam == 0), pa.nulls(n, pa.string()),
                      t["path"].combine_chunks())
    lsn = pc.if_else(pa.array(fam == 1), pa.scalar(-7, pa.int64()),
                     t["lsn"].combine_chunks())
    op = pc.if_else(pa.array(fam == 2), pa.scalar("X"),
                    t["op"].combine_chunks())
    sha = pc.if_else(
        pa.array(fam == 3),
        pc.binary_join_element_wise(
            pa.array(["zz"] * n),
            pc.utf8_slice_codeunits(
                pc.fill_null(t["content_sha256"].combine_chunks(),
                             "0" * 64), 2, 64), ""),
        t["content_sha256"].combine_chunks())
    return pa.table({"lsn": lsn, "op": op,
                     "repo": t["repo"], "path": path,
                     "commit": t["commit"], "content": t["content"],
                     "content_sha256": sha})


_DLQ_BINLOG_PATH = os.path.join(
    _FIXTURE_DIR, "dlq_binlog_" + _spec_tag(_Q24_PARAMS, 41, "v1"),
    "epoch-0.parquet")


def ensure_dlq_fixture() -> None:
    if not os.path.exists(_DLQ_BINLOG_PATH):
        _atomic_write_parquet(_dlq_dirty_table(), _DLQ_BINLOG_PATH)


def _dlq_ingest(tag: str) -> str:
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_dlq_fixture()
    lake_dir = tempfile.mkdtemp(prefix=f"{tag}_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=8, merge_concurrency=2,
        dlq=True, verify_sha=True))
    eng.ingest_epoch(read_parquet_clean(_DLQ_BINLOG_PATH,
                                        override_num_blocks=8), 0)
    return lake_dir


def q140_dlq_quarantine(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import dlq
    lake_dir = _dlq_ingest("q140")
    # sort keys must be null-free (Ray's boundary sampling compares with
    # python <): repo/lsn/op are never nulled by the corruption families,
    # path is — and the driver's value hash is order-insensitive anyway
    return dlq.read_dlq(lake_dir) \
        .select_columns(["repo", "path", "lsn", "op", "_dlq_reason"]) \
        .sort(["repo", "lsn", "op"])


def _q140_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import dlq
    return f"""
SELECT repo, path, lsn, op, {dlq.reason_case_sql()} AS _dlq_reason
FROM read_parquet('{_DLQ_BINLOG_PATH}')
WHERE {dlq.reason_case_sql()} IS NOT NULL
ORDER BY repo, path, lsn, op, _dlq_reason
"""


def q141_dlq_clean_state(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import lake
    lake_dir = _dlq_ingest("q141")
    return lake.read_lake(lake_dir).sort(["repo", "path"])


def _q141_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.cdc import dlq
    return f"""
WITH valid AS (
  SELECT * FROM read_parquet('{_DLQ_BINLOG_PATH}')
  WHERE {dlq.reason_case_sql()} IS NULL
)
SELECT lsn, repo, path, commit, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                               ORDER BY lsn DESC) AS rn
  FROM valid)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q140_dlq_quarantine": q140_dlq_quarantine,
                "q141_dlq_clean_state": q141_dlq_clean_state})
ORACLE.update({"q140_dlq_quarantine": _q140_sql(),
               "q141_dlq_clean_state": _q141_sql()})


# ---------------------------------------------------------------------------
# q142 — INCREMENTAL HISTOGRAM state (cdc/hist_state.py): fixed-range bin
# counts per event_type maintained through the lake epoch/manifest
# protocol — completes the mergeable-summary family (HLL distinct / KMV
# overlap / CMS frequency / histogram DISTRIBUTION, the drift-alarm +
# approx-quantile state). Three micro-batches (event_id thirds) at
# compact_interval=2 (delta, compact, delta), and the final LSM state
# must equal the one-shot SQL bin counts over the WHOLE table — bin-count
# sum-merge is slicing-confluent; binning is pure integer arithmetic
# ((x-lo)//step + explicit under/overflow bins) so the oracle is
# bit-exact with no float floor edges.

# lo/hi sized to the events generator's user_id range: sf0.001
# populates ~8 bins per type, sf0.01 fills all 64 AND overflows
# (max id 149 >= hi) so the smoke matrix exercises both paths
_Q142_LO, _Q142_HI, _Q142_NBINS = 0, 128, 64


def q142_incremental_hist(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import hist_state
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    n = ds.count()
    cut1, cut2 = n // 3, 2 * n // 3
    eng = hist_state.IncrementalHist(hist_state.IncHistConfig(
        state_dir=tempfile.mkdtemp(prefix="q142_state_", dir="/tmp"),
        col="user_id", by=["event_type"], lo=_Q142_LO, hi=_Q142_HI,
        nbins=_Q142_NBINS, num_partitions=8, compact_interval=2))
    eng.ingest(ds.filter(expr=f"event_id < {cut1}"), 0)
    eng.ingest(ds.filter(
        expr=f"event_id >= {cut1} and event_id < {cut2}"), 1)
    eng.ingest(ds.filter(expr=f"event_id >= {cut2}"), 2)
    return eng.bins()


def _q142_sql() -> str:
    step = (_Q142_HI - _Q142_LO) // _Q142_NBINS
    return f"""
SELECT event_type,
       CASE WHEN user_id < {_Q142_LO} THEN -1
            WHEN user_id >= {_Q142_HI} THEN {_Q142_NBINS}
            ELSE (user_id - {_Q142_LO}) // {step} END AS bin,
       COUNT(*) AS cnt
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


QUERIES.update({"q142_incremental_hist": q142_incremental_hist})
ORACLE.update({"q142_incremental_hist": _q142_sql()})


# ---------------------------------------------------------------------------
# q143 — EXACTLY-ONCE DB REPLICATION from the change feed
# (cdc/db_replica.py; the Kafka-Connect-JDBC-sink upsert-mode shape,
# SQLite standing in for the warehouse per SURVEY §7.5): two sync windows
# over the q24 fixture lake — one per committed epoch, the second
# crossing the schema-evolution boundary (ALTER TABLE ADD COLUMN rides
# the same transaction) — each applying one final action per key
# (distributed keyed dedup over the manifest-pruned feed) and committing
# the consumer offset INSIDE the sink transaction. A third, caught-up
# sync must no-op. The read-back warehouse table must equal the lake's
# LWW window (the q24 oracle) — deletes really deleted, upserts really
# once.

def q143_db_replica(sf_dir: str):
    import tempfile

    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.cdc import db_replica, engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q143_lake_", dir="/tmp")
    db = os.path.join(tempfile.mkdtemp(prefix="q143_db_", dir="/tmp"),
                      "warehouse.sqlite3")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2))
    rep = db_replica.DBReplica(lake_dir, db, "files")
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
        rep.sync()                       # one window per epoch
    assert rep.sync()["epochs"] == 0     # caught up -> no-op
    df = rep.read().to_pandas()
    return pd.DataFrame({
        c: df[c] for c in ["lsn", "repo", "path", "commit", "lang",
                           "content", "content_sha256"]}) \
        .sort_values(["repo", "path"]).reset_index(drop=True)


QUERIES.update({"q143_db_replica": q143_db_replica})
ORACLE.update({"q143_db_replica": Q24_SQL})


# ---------------------------------------------------------------------------
# q144 — BRANCHES + WRITE-AUDIT-PUBLISH (cdc/branch.py; the Iceberg/
# Nessie-style staging workflow): main ingests epoch 0, a "staging"
# branch (a child lake seeded with ONE copied manifest, zero data copy)
# ingests epoch 1 across the schema-evolution boundary, the one-pass DQ
# framework audits the branch's LIVE post-merge state, and publish
# fast-forwards main onto the branch head (hardlinked files + path-
# rewritten manifests, each committed atomically). The branch is dropped
# AFTER publish — the hardlinks must keep main alive. Main's read-back
# must equal the lake's LWW window over both epochs (the q24 oracle):
# the audited epochs landed exactly as audited.

def q144_branch_wap(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import branch, engine
    from e_commerce_batch_etl_pipeline_ray.quality.checks import DQConfig
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q144_lake_", dir="/tmp")

    def _epoch(ep):
        return read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8)

    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2))
    eng.ingest_epoch(_epoch(0), 0)

    branch.create_branch(lake_dir, "staging")
    beng = engine.CDCEngine(branch.branch_config(lake_dir, "staging",
                                                 merge_concurrency=2))
    for ep in range(1, Q24_EPOCHS):
        beng.ingest_epoch(_epoch(ep), ep)

    _, status = branch.audit_branch(
        lake_dir, "staging",
        DQConfig(min_rows=1, max_null_pct={"repo": 0.0, "path": 0.0}))
    assert status in ("PASS", "WARN")
    branch.publish_branch(lake_dir, "staging", require_audit=True)
    branch.drop_branch(lake_dir, "staging")
    return eng.read().sort(["repo", "path"])


QUERIES.update({"q144_branch_wap": q144_branch_wap})
ORACLE.update({"q144_branch_wap": Q24_SQL})


# ---------------------------------------------------------------------------
# q145 — METADATA-ONLY TABLE STATS (lake.table_stats; Delta numRecords /
# Iceberg snapshot-summary shape): every compact write records the
# partition's LIVE row count + per-column min/max in its manifest record,
# so COUNT(*)/MIN/MAX of a compacted lake are answered WITHOUT OPENING A
# SINGLE DATA FILE — the assert pins partitions_read == 0, making the
# oracle certify the pure-metadata path. At 100 TB this is the difference
# between a catalog lookup and a full scan; uncompacted LSM chains fall
# back to reading only those partitions (tested, not exercised here).

def q145_table_stats(sf_dir: str):
    import tempfile

    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q145_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    st = lake.table_stats(lake_dir)
    assert st["partitions_read"] == 0, "metadata-only path must not read"
    return pd.DataFrame({"live_rows": [st["rows"]],
                         "min_lsn": [st["min"]["lsn"]],
                         "max_lsn": [st["max"]["lsn"]]})


Q145_SQL = f"""
SELECT COUNT(*) AS live_rows, MIN(lsn) AS min_lsn, MAX(lsn) AS max_lsn
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
"""

QUERIES.update({"q145_table_stats": q145_table_stats})
ORACLE.update({"q145_table_stats": Q145_SQL})


# ---------------------------------------------------------------------------
# q146 — PER-KEY VERSION HISTORY (feed.key_history; "DESCRIBE HISTORY of
# one key"): the change feed pruned to a key set with three stacked
# levels — partition routing (constant manifest modulus), manifest
# carry-forward, and key-bloom file skipping inside touched chains (two
# identically-pruned chains prove the keys' state unchanged, the whole
# diff task is skipped). Cost scales with the keys' own change history,
# never the lake. Driven over the q24 fixture lake for EVERY key of the
# lexicographically-first repo; the oracle replays the same per-epoch
# LWW diff in SQL (the q90 shape) restricted to that repo — including the
# evolution boundary (epoch-0-derived images carry lang NULL) and the
# Debezium delete-lsn rule.

def q146_key_history(sf_dir: str):
    import tempfile

    import pyarrow.parquet as _pq

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, feed
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q146_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    # every key (live or dead) of the first repo, from the fixture itself
    pairs = set()
    for ep in range(Q24_EPOCHS):
        t = _pq.read_table(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            columns=["repo", "path"])
        pairs |= set(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
    repo0 = min(r for r, _ in pairs)
    keys = sorted(k for k in pairs if k[0] == repo0)
    return feed.key_history(lake_dir, keys).sort(
        ["repo", "path", "_commit_epoch", "_change_type", "lsn"])


Q146_SQL = f"""
WITH e0 AS (SELECT * FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet')),
ea AS (SELECT * FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                                   '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                                  union_by_name=true)),
r0 AS (SELECT MIN(repo) AS repo FROM ea),
s0 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM e0 WHERE repo = (SELECT repo FROM r0)) WHERE rn = 1
),
s1 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) rn
    FROM ea WHERE repo = (SELECT repo FROM r0)) WHERE rn = 1
),
hist AS (
  SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_epoch,
         lsn, repo, path, commit, CAST(NULL AS VARCHAR) AS lang,
         content, content_sha256
  FROM s0 WHERE op <> 'D'
  UNION ALL
  SELECT 'insert', 1, s1.lsn, s1.repo, s1.path, s1.commit, s1.lang,
         s1.content, s1.content_sha256
  FROM s1 LEFT JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND (s0.repo IS NULL OR s0.op = 'D')
  UNION ALL
  SELECT 'update_preimage', 1, s0.lsn, s0.repo, s0.path, s0.commit,
         CAST(NULL AS VARCHAR), s0.content, s0.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND s0.op <> 'D' AND s1.lsn <> s0.lsn
  UNION ALL
  SELECT 'update_postimage', 1, s1.lsn, s1.repo, s1.path, s1.commit,
         s1.lang, s1.content, s1.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op <> 'D' AND s0.op <> 'D' AND s1.lsn <> s0.lsn
  UNION ALL
  SELECT 'delete', 1, s1.lsn, s0.repo, s0.path, s0.commit,
         CAST(NULL AS VARCHAR), s0.content, s0.content_sha256
  FROM s1 JOIN s0 ON s1.repo = s0.repo AND s1.path = s0.path
  WHERE s1.op = 'D' AND s0.op <> 'D'
)
SELECT * FROM hist ORDER BY repo, path, _commit_epoch, _change_type, lsn
"""

QUERIES.update({"q146_key_history": q146_key_history})
ORACLE.update({"q146_key_history": Q146_SQL})


# ---------------------------------------------------------------------------
# q147/q148 — CHECK CONSTRAINTS at ingest (CDCConfig.constraints; the
# Delta Lake ALTER TABLE ADD CONSTRAINT shape, composed with the DLQ so
# violating rows quarantine as reason "check:<name>" instead of failing
# the batch — Kafka-Connect errors.tolerance). SQL three-valued CHECK
# semantics: NULL passes, so a delete's null payload can never violate a
# content predicate — the oracle mirrors this with IS FALSE. q147 checks
# the quarantine table (structural reasons empty on the clean fixture,
# so every row is the check's), q148 checks the live state == LWW over
# the rows that SATISFY the constraint. The no-DLQ abort contract
# (ConstraintViolationError, lake untouched) is test-pinned.

_Q147_MIN_LEN = 50        # fixture contents are 49-50 chars: 49s violate


def _q147_ingest(tag: str) -> str:
    import tempfile

    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix=f"{tag}_lake_", dir="/tmp")
    check = ("content_min_len",
             lambda t: _pc.greater_equal(_pc.utf8_length(t["content"]),
                                         _Q147_MIN_LEN))
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2,
        dlq=True, constraints=(check,)))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    return lake_dir


def q147_check_constraint_dlq(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import dlq
    lake_dir = _q147_ingest("q147")
    return dlq.read_dlq(lake_dir) \
        .select_columns(["repo", "path", "lsn", "op", "_dlq_reason",
                         "_dlq_epoch"]) \
        .sort(["repo", "path", "lsn", "op"])


Q147_SQL = f"""
SELECT repo, path, lsn, op, 'check:content_min_len' AS _dlq_reason,
       CAST(CASE WHEN filename LIKE '%epoch-0%' THEN 0 ELSE 1 END
            AS BIGINT) AS _dlq_epoch
FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                   '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                  union_by_name=true, filename=true)
WHERE (LENGTH(content) >= {_Q147_MIN_LEN}) IS FALSE
ORDER BY repo, path, lsn, op
"""


def q148_check_constraint_state(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.cdc import lake
    lake_dir = _q147_ingest("q148")
    return lake.read_lake(lake_dir).sort(["repo", "path"])


Q148_SQL = f"""
WITH valid AS (
  SELECT * FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                              '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                             union_by_name=true)
  WHERE (LENGTH(content) >= {_Q147_MIN_LEN}) IS NOT FALSE
)
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                               ORDER BY lsn DESC) AS rn
  FROM valid)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""

QUERIES.update({"q147_check_constraint_dlq": q147_check_constraint_dlq,
                "q148_check_constraint_state": q148_check_constraint_state})
ORACLE.update({"q147_check_constraint_dlq": Q147_SQL,
               "q148_check_constraint_state": Q148_SQL})


# ---------------------------------------------------------------------------
# q149 — SEMANTIC DEDUP, exact mode (stages/neardup.semantic_dedup_pairs;
# SemDeDup, Abbas et al. 2023): k-means-bucketed within-cluster exact
# cosine pairs — the learned-structure sibling of the SRP-LSH operator.
# With n_clusters=1 every vector shares the one cluster, recall is 1.0
# by construction, and the full chain (kmeans fit -> broadcast assign ->
# cluster-partitioned segment matmul -> pair dedup) must EQUAL the
# all-pairs cosine join — the q46 SQL oracle, over the same planted
# corpus. The realistic operating point (n_clusters>1, ~N^2/k work) is
# pinned by tests (planted near-identical pairs recovered, output is a
# subset of all-pairs).

def q149_semantic_dedup_exact(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import neardup
    return neardup.semantic_dedup_pairs(
        _q46_planted(sf_dir), n_clusters=1, threshold=0.95)


QUERIES.update({"q149_semantic_dedup_exact": q149_semantic_dedup_exact})
ORACLE.update({"q149_semantic_dedup_exact": Q46_SQL})


# ---------------------------------------------------------------------------
# q150/q151 — RESTORE (rollback) of the CDC lake (cdc/lake.restore; the
# Delta `RESTORE TABLE t TO VERSION AS OF k` shape — reference has no
# rollback, its run overwrites the curated table, src/load.py).
# q150 pins the restore READ: ingest both fixture epochs, restore to
# epoch 0 (across the schema-evolution boundary — the schema reverts
# with the data, no `lang` column), read the head -> must equal the LWW
# window over the epoch-0 log alone (the q76 as-of SQL, because a
# restore commit re-references exactly epoch 0's files).
# q151 pins the stream CONTINUATION: after the rollback, re-deliver the
# epoch-1 binlog as the next epoch — because restore preserved the lsn
# watermark and the manifest chain, the replay must land exactly where
# the original head was: the q24 two-epoch LWW SQL.

def q150_restore_read(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q150_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.restore(lake_dir, 0)
    return eng.read().sort(["repo", "path"])


def q151_restore_reingest(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q151_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.restore(lake_dir, 0)
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8), eng.resume_point())
    return eng.read().sort(["repo", "path"])


QUERIES.update({"q150_restore_read": q150_restore_read,
                "q151_restore_reingest": q151_restore_reingest})
ORACLE.update({"q150_restore_read": Q76_SQL,
               "q151_restore_reingest": Q24_SQL})


# ---------------------------------------------------------------------------
# q152 — metadata-only DROP COLUMN (cdc/lake.drop_column; the Delta
# column-mapping drop shape). Ingest both fixture epochs (schema evolves
# to carry `lang` at epoch 1), DROP `lang` — one O(KB) manifest commit,
# zero files rewritten — then read: every reader projects files to the
# manifest schema, so the column vanishes instantly while the bytes
# still sit in the epoch-1 files. THEN re-deliver the epoch-1 binlog as
# a new epoch: the chain's dropped_columns marker makes the engine STRIP
# the column from the incoming events (the producer doesn't know the
# lake retired it) instead of resurrecting it. The oracle is the q24
# two-epoch LWW window WITHOUT lang — both the hidden-at-read and the
# stripped-at-ingest paths must land exactly there.

def q152_drop_column(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q152_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.drop_column(lake_dir, "lang")
    # re-delivery after the drop: events still carry lang; the engine
    # strips it (idempotent state, minus the retired column)
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8), eng.resume_point())
    return eng.read().sort(["repo", "path"])


Q152_SQL = f"""
SELECT lsn, repo, path, commit, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q152_drop_column": q152_drop_column})
ORACLE.update({"q152_drop_column": Q152_SQL})


# ---------------------------------------------------------------------------
# q153 — metadata-only RENAME COLUMN (cdc/lake.rename_column; the Delta
# column-mapping rename shape). Ingest both fixture epochs, RENAME
# `lang` -> `language` — one O(KB) manifest commit recording the old
# name as a field-metadata alias, zero files rewritten — then read:
# every reader's schema projection resolves the alias, so pre-rename
# files' bytes surface under the new name instantly. THEN re-deliver
# the epoch-1 binlog (events still carry `lang` — the producer doesn't
# know): the normalize projection maps the old name into the new
# column and _data_schema canonicalizes the event schema so `lang` can
# never re-appear as a fresh additive column. The oracle is the q24
# two-epoch LWW window with `lang AS language` — both the
# translated-at-read and the mapped-at-ingest paths must land exactly
# there, values intact.

def q153_rename_column(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q153_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.rename_column(lake_dir, "lang", "language")
    # re-delivery after the rename: events still carry `lang`; the engine
    # maps it into `language` (idempotent state under the new name)
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8), eng.resume_point())
    return eng.read().sort(["repo", "path"])


Q153_SQL = f"""
SELECT lsn, repo, path, commit, lang AS language, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q153_rename_column": q153_rename_column})
ORACLE.update({"q153_rename_column": Q153_SQL})


# ---------------------------------------------------------------------------
# q154 — OPTIMISTIC CONCURRENCY: ingest survives a concurrent schema
# change (manifest put-if-absent CAS, lake._commit_json). A rename
# commits BETWEEN the epoch-1 ingest's planning and its manifest write:
# the ingest loses the epoch-number CAS, reclaims its unreferenced data
# files, re-plans against the renamed head (fresh schema chain, next
# epoch) and lands exactly where the serial order rename->ingest would —
# the two-epoch LWW window with commit AS commit_sha (the fixture only
# evolves `lang` in at epoch 1, so the mid-ingest rename targets a
# column that exists at the epoch-0 head). The
# interleave is injected deterministically by wrapping the commit
# primitive, standing in for a second writer process.

def q154_concurrent_schema_change(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q154_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-0.parquet"),
        override_num_blocks=8), 0)

    real = lake._commit_json
    fired = []

    def race_once(path, manifest, overwrite=False):
        if not fired and "epoch-0001" in path:
            fired.append(1)
            lake._commit_json = real
            lake.rename_column(lake_dir, "commit", "commit_sha")
        return real(path, manifest, overwrite)

    lake._commit_json = race_once
    try:
        stats = eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
            override_num_blocks=8), 1)
    finally:
        lake._commit_json = real
    assert fired and stats.epoch == 2, "conflict retry did not engage"
    return eng.read().sort(["repo", "path"])


Q154_SQL = f"""
SELECT lsn, repo, path, commit AS commit_sha, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q154_concurrent_schema_change": q154_concurrent_schema_change})
ORACLE.update({"q154_concurrent_schema_change": Q154_SQL})


# ---------------------------------------------------------------------------
# q155 — replaceWhere / dynamic INSERT OVERWRITE (engine.replace_where):
# atomically replace the `lang='go'` region of the live table — every
# matching row deleted AND a deterministic replacement set inserted, in
# ONE epoch commit (readers never see the deleted-but-unreplaced
# intermediate state). Built on the stream primitives: D tombstones at
# wm+1, I events at wm+2, through the standard exactly-once pipeline.
# The oracle is pure SQL over the fixture binlog: the two-epoch LWW
# window minus the go-region, UNION ALL the same replacement rows
# (content rewritten, sha256 recomputed DuckDB-side) at wm+2.

def q155_replace_where(sf_dir: str):
    import hashlib
    import tempfile

    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q155_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)

    def pred(t):
        return _pc.equal(t["lang"], "go")

    def _replacement(t):
        t = t.filter(_pc.fill_null(pred(t), False))
        paths = t["path"].to_pylist()
        content = [f"OVERWRITTEN:{p}" for p in paths]
        sha = [hashlib.sha256(c.encode()).hexdigest() for c in content]
        import pyarrow as _pa
        return _pa.table({
            "repo": t["repo"], "path": t["path"],
            "commit": _pa.array(["overwrite"] * len(paths), _pa.string()),
            "lang": _pa.array(["go"] * len(paths), _pa.string()),
            "content": _pa.array(content, _pa.string()),
            "content_sha256": _pa.array(sha, _pa.string()),
        })

    rows = eng.read().map_batches(_replacement, batch_format="pyarrow")
    eng.replace_where(pred, rows, eng.resume_point(), columns=["lang"])
    return eng.read().sort(["repo", "path"])


Q155_SQL = f"""
WITH ev AS (
  SELECT * FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                              '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                             union_by_name=true)
), live AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT lsn, repo, path, commit, lang, content, content_sha256 FROM live
WHERE lang IS DISTINCT FROM 'go'
UNION ALL
SELECT (SELECT MAX(lsn) FROM ev) + 2 AS lsn, repo, path,
       'overwrite' AS commit, 'go' AS lang,
       'OVERWRITTEN:' || path AS content,
       sha256('OVERWRITTEN:' || path) AS content_sha256
FROM live WHERE lang = 'go'
ORDER BY repo, path
"""


QUERIES.update({"q155_replace_where": q155_replace_where})
ORACLE.update({"q155_replace_where": Q155_SQL})


# ---------------------------------------------------------------------------
# q156 — GENERATED ALWAYS AS columns (CDCConfig.generated; the Delta
# generated-columns shape). Two expressions ride every write through the
# normalize projection: repo_org = first path segment of the key (the
# classic derived-partition-column use) and content_len = utf8 length of
# the payload (null on tombstones' null payload). Events must not carry
# the names; values are recomputed at every write and stored physically,
# so stats/pruning/feed all see real columns. The oracle mirrors both
# expressions in SQL over the two-epoch LWW window.

def q156_generated_columns(sf_dir: str):
    import tempfile

    import pyarrow as _pa
    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q156_lake_", dir="/tmp")

    def gen_org(t):
        return _pc.list_element(_pc.split_pattern(t["repo"], "/"), 0)

    def gen_len(t):
        return _pc.utf8_length(t["content"])

    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=16, merge_concurrency=2,
        generated=(("repo_org", _pa.string(), gen_org),
                   ("content_len", _pa.int64(), gen_len))))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    return eng.read().sort(["repo", "path"])


Q156_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256,
       SPLIT_PART(repo, '/', 1) AS repo_org,
       LENGTH(content)::BIGINT AS content_len
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q156_generated_columns": q156_generated_columns})
ORACLE.update({"q156_generated_columns": Q156_SQL})


# ---------------------------------------------------------------------------
# q157 — CLONE TABLE (lake.clone_lake): an instant fully-independent copy
# — every referenced file hardlinked (zero bytes copied), one manifest
# commit, no parent contract (unlike a branch both sides then evolve
# independently and vacuum on either can never tear the other). The
# clone is taken at the two-epoch head and then the SOURCE receives a
# third (divergent) epoch — the clone must still read exactly the
# two-epoch LWW state it captured (the q24 oracle), proving isolation.

def q157_clone(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q157_lake_", dir="/tmp")
    clone_dir = tempfile.mkdtemp(prefix="q157_clone_", dir="/tmp") + "/lake"
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    lake.clone_lake(lake_dir, clone_dir)
    # diverge the SOURCE after the clone: re-deliver epoch-1 (idempotent
    # for the source) plus a predicate delete — neither may leak into
    # the clone's snapshot
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8), eng.resume_point())

    def pred(t):
        import pyarrow.compute as _pc
        return _pc.equal(t["lang"], "go")

    eng.delete_where(pred, eng.resume_point(), columns=["lang"])
    return lake.read_lake(clone_dir).sort(["repo", "path"])


QUERIES.update({"q157_clone": q157_clone})
ORACLE.update({"q157_clone": Q24_SQL})


# ---------------------------------------------------------------------------
# q158 — VALUE BLOOM FILTERS (CDCConfig.bloom_cols; the Parquet
# column-bloom-filter / Databricks bloom-index shape). The lake ingests
# with a value Bloom over `commit` embedded in every file's sidecar
# (keybloom v2); an equality scan for one commit sha then prunes every
# partition whose files provably never carried the value — probed on the
# driver from sidecars alone — before the surviving files are read and
# exactly masked. Needle: the commit of the lexicographically-first live
# key, chosen identically on both sides. Oracle: the LWW window filtered
# to that commit in SQL. The plan's pruning effectiveness is asserted
# in-query (a sha appears in ~1 partition of 16).

def q158_value_bloom_scan(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, zorder
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q158_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2,
                                            bloom_cols=("commit",)))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    first = eng.read().sort(["repo", "path"]).take(1)[0]
    needle = first["commit"]
    plan = zorder.plan_range_scan(lake_dir, {"commit": (needle, needle)})
    assert plan["files_pruned"] > 0, "value bloom pruned nothing"
    return zorder.range_scan(lake_dir, {"commit": (needle, needle)}) \
        .sort(["repo", "path"])


Q158_SQL = f"""
WITH live AS (
  SELECT lsn, repo, path, commit, lang, content, content_sha256 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                                 ORDER BY lsn DESC) AS rn
    FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                       '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                      union_by_name=true)
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT * FROM live
WHERE commit = (SELECT commit FROM live ORDER BY repo, path LIMIT 1)
ORDER BY repo, path
"""


QUERIES.update({"q158_value_bloom_scan": q158_value_bloom_scan})
ORACLE.update({"q158_value_bloom_scan": Q158_SQL})


# ---------------------------------------------------------------------------
# q159 — DELETION VECTORS (lake.delete_where_dv; the Delta deletion-vector
# / Iceberg delete-file shape). A predicate delete committed as per-
# partition deleted-KEY sidecars: zero data files rewritten, zero events
# shuffled — readers mask, the next compacting rewrite materializes. The
# query ingests the two-epoch fixture binlog, DV-deletes lang='go' over
# the LIVE LWW state, asserts in-query that NO data file changed (same
# inode set — the merge-on-read contract), and returns the masked read.
# Oracle: the q24 LWW window with the go rows filtered out in SQL.

def q159_deletion_vectors(sf_dir: str):
    import glob as _glob
    import tempfile

    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q159_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    part_glob = os.path.join(lake_dir, "epoch=*", "part-*.parquet")
    inodes = {f: os.stat(f).st_ino for f in _glob.glob(part_glob)}
    out = eng.delete_where_dv(lambda t: _pc.equal(t["lang"], "go"),
                              columns=["lang"])
    after = {f: os.stat(f).st_ino for f in _glob.glob(part_glob)}
    assert after == inodes, "deletion vectors must not rewrite data files"
    assert out["keys_deleted"] > 0, "fixture binlog carries go rows"
    return eng.read().sort(["repo", "path"])


Q159_SQL = f"""
SELECT lsn, repo, path, commit, lang, content, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
  FROM read_parquet(['{Q24_BINLOG_DIR}/epoch-0.parquet',
                     '{Q24_BINLOG_DIR}/epoch-1.parquet'],
                    union_by_name=true)
)
WHERE rn = 1 AND op <> 'D' AND lang IS DISTINCT FROM 'go'
ORDER BY repo, path
"""


QUERIES.update({"q159_deletion_vectors": q159_deletion_vectors})
ORACLE.update({"q159_deletion_vectors": Q159_SQL})


# ---------------------------------------------------------------------------
# q160 — Gopher repetition signals (Rae et al. 2021 A1.1; stages/text.py
# gopher_repetition): dup line/paragraph occurrence + character fractions
# and the top word-bigram character fraction — the repetition rules
# production LLM-data pipelines filter on. Row-local and fully vectorized
# (Arrow split/flatten + native group_by; no shuffle). The oracle mirrors
# every denominator exactly in SQL (unnest + FILTER aggregates + a list
# lambda for bigrams), so the hash pins the definitions bit-for-bit.

def q160_gopher_repetition(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages.text import (
        gopher_repetition,
    )
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = gopher_repetition("text").apply(ds)
    return out.select_columns([
        "doc_id", "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
        "top_2gram_char_frac"]).sort("doc_id")


Q160_SQL = """
WITH lc AS (
  SELECT doc_id, l, COUNT(*)::DOUBLE c, LENGTH(l)::DOUBLE ln
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  GROUP BY doc_id, l
), lstat AS (
  SELECT doc_id,
         COALESCE(SUM(c) FILTER (WHERE c > 1), 0) / SUM(c)
           AS dup_line_frac,
         COALESCE(COALESCE(SUM(c*ln) FILTER (WHERE c > 1), 0)
                  / NULLIF(SUM(c*ln), 0), 0) AS dup_line_char_frac
  FROM lc GROUP BY doc_id
), pc_ AS (
  SELECT doc_id, l, COUNT(*)::DOUBLE c, LENGTH(l)::DOUBLE ln
  FROM (SELECT doc_id,
               unnest(string_split(text, chr(10)||chr(10))) AS l
        FROM documents)
  GROUP BY doc_id, l
), pstat AS (
  SELECT doc_id,
         COALESCE(SUM(c) FILTER (WHERE c > 1), 0) / SUM(c)
           AS dup_para_frac,
         COALESCE(COALESCE(SUM(c*ln) FILTER (WHERE c > 1), 0)
                  / NULLIF(SUM(c*ln), 0), 0) AS dup_para_char_frac
  FROM pc_ GROUP BY doc_id
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), bc AS (
  SELECT doc_id, b, COUNT(*)::DOUBLE c FROM bg GROUP BY doc_id, b
), bstat AS (
  SELECT doc_id, MAX(c * LENGTH(b)) AS m FROM bc GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL ELSE ls.dup_line_frac END
         AS dup_line_frac,
       CASE WHEN d.text IS NULL THEN NULL ELSE ls.dup_line_char_frac END
         AS dup_line_char_frac,
       CASE WHEN d.text IS NULL THEN NULL ELSE ps.dup_para_frac END
         AS dup_para_frac,
       CASE WHEN d.text IS NULL THEN NULL ELSE ps.dup_para_char_frac END
         AS dup_para_char_frac,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE COALESCE(bs.m / NULLIF(LENGTH(d.text), 0), 0) END
         AS top_2gram_char_frac
FROM documents d
LEFT JOIN lstat ls USING (doc_id)
LEFT JOIN pstat ps USING (doc_id)
LEFT JOIN bstat bs USING (doc_id)
ORDER BY doc_id
"""


QUERIES.update({"q160_gopher_repetition": q160_gopher_repetition})
ORACLE.update({"q160_gopher_repetition": Q160_SQL})


# ---------------------------------------------------------------------------
# q161 — ADD COLUMN with DEFAULT (lake.add_column; the Delta default-
# column-values shape). Metadata-only commit between the two fixture
# epochs: pre-add rows read the default with ZERO files rewritten
# (in-query inode assert), epoch-1 winners keep their carried values —
# including EXPLICIT nulls, pinning the present-vs-absent contract line.
# The oracle replays the rule in SQL: LWW over (epoch0 tagged src=0,
# epoch1 tagged src=1 with the same deterministic stars expression),
# stars = carried value when the winner came from epoch 1, else 7.

def q161_add_column_default(sf_dir: str):
    import glob as _glob
    import tempfile

    import pyarrow as _pa
    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake as _lake
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q161_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    eng.ingest_epoch(read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-0.parquet"),
        override_num_blocks=8), 0)

    part_glob = os.path.join(lake_dir, "epoch=0000", "part-*.parquet")
    inodes = {f: os.stat(f).st_ino for f in _glob.glob(part_glob)}
    _lake.add_column(lake_dir, "stars", _pa.int64(), default=7)
    assert {f: os.stat(f).st_ino for f in _glob.glob(part_glob)} == inodes, \
        "add_column must be metadata-only"

    def _with_stars(t: _pa.Table) -> _pa.Table:
        mod = _pc.subtract(
            t["lsn"], _pc.multiply(_pc.divide(t["lsn"], 5), 5))
        stars = _pc.if_else(_pc.equal(mod, 0),
                            _pa.scalar(None, _pa.int64()),
                            mod.cast(_pa.int64()))
        return t.append_column("stars", stars)

    ev1 = read_parquet_clean(
        os.path.join(Q24_BINLOG_DIR, "epoch-1.parquet"),
        override_num_blocks=8).map_batches(
            _with_stars, batch_format="pyarrow", zero_copy_batch=True)
    eng.ingest_epoch(ev1, 2)
    return eng.read().sort(["repo", "path"])


Q161_SQL = f"""
WITH ev AS (
  SELECT *, 0 AS src, NULL::BIGINT AS stars
  FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet')
  UNION ALL BY NAME
  SELECT *, 1 AS src,
         CASE WHEN lsn % 5 = 0 THEN NULL ELSE lsn % 5 END AS stars
  FROM read_parquet('{Q24_BINLOG_DIR}/epoch-1.parquet')
)
SELECT lsn, repo, path, commit, lang, content, content_sha256,
       CASE WHEN src = 1 THEN stars ELSE 7 END AS stars
FROM (
  -- tie order src ASC: a redelivered duplicate (same key+lsn in both
  -- epochs) keeps the FIRST-ingested version in the engine (prior state
  -- sorts before the delta in the stable LWW combine) — without stars
  -- the duplicates were byte-identical and the tie was invisible
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                               ORDER BY lsn DESC, src ASC) AS rn
  FROM ev
)
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


QUERIES.update({"q161_add_column_default": q161_add_column_default})
ORACLE.update({"q161_add_column_default": Q161_SQL})


# ---------------------------------------------------------------------------
# q162 — GENERATED ALWAYS AS IDENTITY (CDCConfig.identity; the Delta
# identity-columns shape). Coordination-free deterministic surrogate ids:
# id = epoch*(P*stride) + pid*stride + rank — unique, monotone across
# epochs, gaps allowed (Delta's contract), exactly-once under crash/replay.
# NOT SQL-replayable (partition routing is siphash), so this entry is
# rows-only; semantics are pinned by tests/test_identity.py (uniqueness,
# update stability, re-insert freshness, mode/backend/replay parity) and
# by the in-query asserts below.

def q162_identity_column(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q162_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2,
                                            identity="row_id"))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    df = eng.read().to_pandas()
    assert df["row_id"].is_unique, "identity ids must be unique"
    # keys first seen in epoch 0 keep epoch-0 ids (stability under the
    # epoch-1 updates); every id is non-negative int64
    assert (df["row_id"] >= 0).all()
    return eng.read().sort(["repo", "path"])


QUERIES.update({"q162_identity_column": q162_identity_column})
# no ORACLE entry: identity values depend on siphash partition routing
# (genuinely non-SQL-expressible); driver records the rows-only check


# ---------------------------------------------------------------------------
# q163 — MANIFEST DELTA-LOG (CDCConfig.manifest_log; the Delta _delta_log
# + checkpoint shape). Ingest commits serialize only TOUCHED partitions —
# O(touched) metadata bytes per epoch instead of O(all partitions) — with
# a full checkpoint every K epochs bounding reconstruction; readers are
# byte-for-byte unaffected (read_manifest folds the chain). The query
# ingests the fixture binlog at manifest_log=2, asserts in-query that the
# odd epoch's raw manifest is a partial delta (and smaller than the
# checkpoint), and returns the standard LWW read against the q24 oracle.

def q163_manifest_delta_log(sf_dir: str):
    import json as _json
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    lake_dir = tempfile.mkdtemp(prefix="q163_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2,
                                            manifest_log=2))
    for ep in range(Q24_EPOCHS):
        eng.ingest_epoch(read_parquet_clean(
            os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
            override_num_blocks=8), ep)
    p1 = os.path.join(lake_dir, "manifests", "epoch-0001.json")
    with open(p1) as f:
        raw1 = _json.load(f)
    # the head commit is a PARTIAL delta listing only touched partitions
    # (the fixture touches all 16 here — the O(touched) win shows when
    # epochs touch a subset, pinned by tests/test_manifest_log.py); the
    # logical fold must cover every partition the checkpoint knows
    assert raw1.get("delta_log"), "odd epoch must be a partial delta"
    from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lk
    logical = _lk.read_manifest(lake_dir, 1)["partitions"]
    assert set(raw1["partitions"]) <= set(logical)
    return eng.read().sort(["repo", "path"])


QUERIES.update({"q163_manifest_delta_log": q163_manifest_delta_log})
ORACLE.update({"q163_manifest_delta_log": Q24_SQL})


# ---------------------------------------------------------------------------
# q164 — STREAM-STREAM INTERVAL JOIN (cdc/stream_join.py; the Flink
# interval-join contract on the micro-batch spine). Two keyed event
# streams — the fixture binlog's epoch-0 file as the left stream, epoch-1
# as the right — ingested in TWO join epochs (left first, right a whole
# epoch later), so every emitted pair crosses the buffer: left rows park
# in state, right arrivals complete them exactly once. With lateness
# unbounded by construction (wm_right stays -inf until the right epoch),
# the emitted set equals the full SQL interval join, which is the oracle.

def q164_stream_interval_join(sf_dir: str):
    import tempfile

    import ray.data as _rd

    from e_commerce_batch_etl_pipeline_ray.cdc.stream_join import (
        StreamJoin,
        StreamJoinConfig,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    sj = StreamJoin(StreamJoinConfig(
        state_dir=tempfile.mkdtemp(prefix="q164_sj_", dir="/tmp"),
        window=40, lateness=0, left_cols=("commit",),
        right_cols=("commit",), num_partitions=16))
    left = read_parquet_clean(os.path.join(Q24_BINLOG_DIR,
                                           "epoch-0.parquet"),
                              override_num_blocks=8)
    right = read_parquet_clean(os.path.join(Q24_BINLOG_DIR,
                                            "epoch-1.parquet"),
                               override_num_blocks=8)
    empty = _rd.from_arrow(left.schema().base_schema.empty_table())
    sj.ingest(left, empty, 0)
    sj.ingest(empty, right, 1)
    return sj.matches().sort(["repo", "path", "l_lsn", "r_lsn"])


Q164_SQL = f"""
SELECT l.repo, l.path, l.lsn AS l_lsn, r.lsn AS r_lsn,
       l.commit AS l_commit, r.commit AS r_commit
FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet') l
JOIN read_parquet('{Q24_BINLOG_DIR}/epoch-1.parquet') r
  USING (repo, path)
WHERE abs(l.lsn - r.lsn) <= 40
ORDER BY repo, path, l_lsn, r_lsn
"""


QUERIES.update({"q164_stream_interval_join": q164_stream_interval_join})
ORACLE.update({"q164_stream_interval_join": Q164_SQL})


# ---------------------------------------------------------------------------
# q165 — END-TO-END LLM CORPUS PIPELINE: the full preprocessing chain a
# training-data user runs, composed from this engine's operators in ONE
# streaming Ray Data pipeline — quality score (q16 kernel) -> Gopher
# repetition filter (q160 kernel) -> exact dedup keep-min-id (q14 kernel)
# -> overlapping chunking (q85 kernel) -> deterministic hash split, train
# shard out — and pinned by ONE composed SQL oracle built from the same
# stage mirrors as CTEs. Every stage is a vectorized map_batches or a
# hash-partitioned reduce; nothing materializes on the driver.

def q165_llm_corpus_pipeline(sf_dir: str):
    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.stages import (
        neardup,
        sampling,
    )
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.quality_score().apply(ds)
    ds = T.gopher_repetition().apply(ds)

    def _keep(t):
        return _pc.and_(
            _pc.and_(_pc.is_valid(t["text"]),
                     _pc.greater_equal(t["quality"], 0.5)),
            _pc.and_(_pc.less_equal(t["dup_line_frac"], 0.3),
                     _pc.less_equal(t["top_2gram_char_frac"], 0.2)))
    ds = maps.filter_expr(_keep, name="corpus_filter").apply(ds)
    ds = maps.select(["doc_id", "text"]).apply(ds)
    ds = neardup.exact_dedup(text_col="text", id_col="doc_id",
                             num_partitions=32).apply(ds)
    ds = sampling.hash_split("doc_id", [0.8, 0.1, 0.1],
                             ["train", "val", "test"], seed=7).apply(ds)
    ds = maps.filter_expr(lambda t: _pc.equal(t["split"], "train"),
                          name="train_only").apply(ds)
    ds = maps.select(["doc_id", "text"]).apply(ds)
    out = T.chunk_documents(chunk_chars=512, overlap_chars=64).apply(ds)
    return out.sort(["doc_id", "chunk_idx"])


def _q165_sql() -> str:
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        sql_unit_hash,
    )
    u = sql_unit_hash("doc_id", seed=7)
    return rf"""
WITH quality AS (
  SELECT doc_id,
         ROUND(
           0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000
                        THEN 1.0 ELSE 0.0 END)
         + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                         AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                        THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM (
    SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS DOUBLE)
             AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
             AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             AS n_digit,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             AS n_letters
    FROM documents)
), lc AS (
  SELECT doc_id, l, COUNT(*)::DOUBLE c
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  GROUP BY doc_id, l
), lstat AS (
  SELECT doc_id,
         COALESCE(SUM(c) FILTER (WHERE c > 1), 0) / SUM(c)
           AS dup_line_frac
  FROM lc GROUP BY doc_id
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), bc AS (
  SELECT doc_id, b, COUNT(*)::DOUBLE c FROM bg GROUP BY doc_id, b
), bstat AS (
  SELECT doc_id, MAX(c * LENGTH(b)) AS m FROM bc GROUP BY doc_id
), kept AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN quality q USING (doc_id)
  LEFT JOIN lstat ls USING (doc_id)
  LEFT JOIN bstat bs USING (doc_id)
  WHERE d.text IS NOT NULL
    AND q.quality >= 0.5
    AND COALESCE(ls.dup_line_frac, 0) <= 0.3
    AND COALESCE(bs.m / NULLIF(LENGTH(d.text), 0), 0) <= 0.2
), dedup AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
), train AS (
  SELECT doc_id, text FROM dedup WHERE {u} < 0.8
), c AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= 512 THEN 1
              ELSE CAST(CEIL((length(text) - 512) / 448.0) AS BIGINT) + 1
         END AS nc
  FROM train
), e AS (
  SELECT doc_id, text, UNNEST(RANGE(0, nc)) AS chunk_idx FROM c
)
SELECT doc_id, chunk_idx,
       substr(text, chunk_idx * 448 + 1, 512) AS chunk_text,
       length(substr(text, chunk_idx * 448 + 1, 512)) AS n_chars
FROM e ORDER BY doc_id, chunk_idx
"""


QUERIES.update({"q165_llm_corpus_pipeline": q165_llm_corpus_pipeline})
ORACLE.update({"q165_llm_corpus_pipeline": _q165_sql()})


# ---------------------------------------------------------------------------
# q166 — DSIR data selection (Xie et al. 2023; stages/dsir.py): per-doc
# importance score sum_positions log(p_target/q_corpus) over hashed
# char-8-gram buckets (target = docs 0-19, the q86 eval-set convention).
# Exact cross-engine by construction: the bucket hash is a polynomial
# codepoint hash in HUGEINT-safe range (replayed digit-for-digit in SQL)
# and the per-bucket log-ratios quantize to INTEGER micro-nats, so doc
# scores are integer sums — no float-reduction tie can flip the hash.

def q166_dsir_selection(sf_dir: str):
    import pyarrow.compute as _pc

    from e_commerce_batch_etl_pipeline_ray.stages.dsir import dsir_scores
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dsir_scores(ds, lambda t: _pc.less(t["doc_id"], 20),
                      buckets=64, k=8, cap=512)
    return out.sort("doc_id")


def _q166_sql() -> str:
    pows = [31 ** e for e in range(7, -1, -1)]
    digest = " + ".join(
        f"CAST(unicode(substr(sh, {j + 1}, 1)) AS HUGEINT) * {p}"
        for j, p in enumerate(pows))
    return f"""
WITH d AS (
  SELECT doc_id, lower(substr(text, 1, 512)) AS t
  FROM documents WHERE text IS NOT NULL
), idx AS (
  SELECT doc_id, t, UNNEST(RANGE(1, length(t) - 6)) AS i
  FROM d WHERE length(t) >= 8
), sh AS (
  SELECT doc_id, substr(t, i, 8) AS sh FROM idx
), fb AS (
  SELECT doc_id,
         CAST((({digest}) % 4294967296) % 64 AS BIGINT) AS b
  FROM sh
), tot AS (
  SELECT b, COUNT(*) FILTER (WHERE doc_id < 20) AS ct, COUNT(*) AS cq
  FROM fb GROUP BY b
), n AS (
  SELECT SUM(ct) AS nt, SUM(cq) AS nq FROM tot
), r AS (
  SELECT b, CAST(ROUND(1000000 * LN(
            ((ct + 1.0) * (nq + 64)) / ((cq + 1.0) * (nt + 64))))
            AS BIGINT) AS r
  FROM tot, n
)
SELECT fb.doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(r.r) AS BIGINT) AS dsir_score
FROM fb JOIN r USING (b)
GROUP BY fb.doc_id ORDER BY fb.doc_id
"""


QUERIES.update({"q166_dsir_selection": q166_dsir_selection})
ORACLE.update({"q166_dsir_selection": _q166_sql()})


# ---------------------------------------------------------------------------
# q167 — corpus-wide PARAGRAPH dedup with in-place rewrite (CCNet /
# BigScience-ROOTS boilerplate stripping; stages/paradedup.py). The
# testdata docs are single-line, so both sides first derive the same
# multi-paragraph corpus: 100 synthetic pages, each = a shared BOILER
# paragraph (the min-doc_id text — a site header) followed by its member
# docs' texts in sorted-text order. The operator must then remove the 99
# repeated boiler copies plus the member copy that duplicates the boiler
# inside page 0, keeping exactly the first (doc_id, idx) occurrence —
# winner = MIN(doc_id*2^21+idx) OVER (PARTITION BY para), exact integer
# math, replayed verbatim in SQL. Scale notes in the module docstring:
# the winner shuffle carries 32-byte sha-prefix rows, never text.

def q167_paragraph_dedup(sf_dir: str):
    import numpy as _np

    from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
        grouped_collect,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.paradedup import (
        paragraph_dedup,
    )
    sep = "\n\n"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    boiler = ds.sort("doc_id").take(1)[0]["text"]

    def _gid(t: pa.Table) -> pa.Table:
        gid = t["doc_id"].to_numpy(zero_copy_only=False) % 100
        return pa.table({"gid": pa.array(gid, pa.int64()),
                         "text": t["text"]})

    pages = ds.map_batches(_gid, batch_format="pyarrow",
                           zero_copy_batch=True)
    pages = grouped_collect(["gid"], "text", "body", sep=sep,
                            num_partitions=16).apply(pages)

    def _mk(t: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            pa.scalar(boiler), t["body"], pa.scalar(sep))
        return pa.table({"doc_id": t["gid"].cast(pa.int64()),
                         "text": text})

    pages = pages.map_batches(_mk, batch_format="pyarrow")
    out = paragraph_dedup(num_partitions=16).apply(pages)
    return out.select_columns(["doc_id", "text", "n_paras", "n_removed"]) \
        .sort("doc_id")


Q167_SQL = """
WITH b AS (
  SELECT text AS btext FROM documents
  WHERE doc_id = (SELECT min(doc_id) FROM documents)
), m AS (
  SELECT CAST(doc_id % 100 AS BIGINT) AS doc_id,
         (SELECT btext FROM b) || chr(10) || chr(10)
           || string_agg(text, chr(10) || chr(10) ORDER BY text) AS text
  FROM documents GROUP BY doc_id % 100
), p AS (
  SELECT doc_id, CAST(generate_subscripts(l, 1) AS BIGINT) - 1 AS idx,
         unnest(l) AS para
  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l FROM m)
), w AS (
  SELECT doc_id, idx, para,
         doc_id * 2097152 + idx AS fused,
         MIN(doc_id * 2097152 + idx) OVER (PARTITION BY para) AS win
  FROM p
), k AS (
  SELECT doc_id, idx, para FROM w WHERE LENGTH(para) = 0 OR fused = win
), a AS (
  SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text,
         COUNT(*) AS n_kept
  FROM k GROUP BY doc_id
), np AS (
  SELECT doc_id, COUNT(*) AS n_paras FROM p GROUP BY doc_id
)
SELECT m.doc_id, COALESCE(a.text, '') AS text,
       CAST(np.n_paras AS BIGINT) AS n_paras,
       CAST(np.n_paras - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM m JOIN np USING (doc_id) LEFT JOIN a USING (doc_id)
ORDER BY m.doc_id
"""


QUERIES.update({"q167_paragraph_dedup": q167_paragraph_dedup})
ORACLE.update({"q167_paragraph_dedup": Q167_SQL})


# ---------------------------------------------------------------------------
# q168 — C4 heuristic cleaning (Raffel et al. 2020 §2.2; stages/text.py
# c4_clean): terminal-punctuation lines with >=5 words and no
# 'javascript', pages dropped for <3 retained lines / 'lorem ipsum' /
# '{'. The testdata docs are single-line, so both sides first derive the
# same 50-page corpus: each base doc becomes a line (deterministic
# doc_id-keyed transforms inject every rule violation — 3-word
# truncations, ' javascript' suffixes, missing terminal punctuation) and
# page-level rules are keyed on the page id (lorem/curly footers).
# Row-local and fully vectorized; the oracle replays the line filter as
# the IDENTICAL list_filter lambda in SQL.

def q168_c4_clean(sf_dir: str):
    import numpy as _np

    from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
        grouped_collect,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.text import c4_clean
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _line(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        txt = t["text"]
        first3 = pc.binary_join(
            pc.list_slice(pc.split_pattern(txt, " "), 0, 3), " ")
        t1 = pc.if_else(pa.array(did % 7 == 2), first3, txt)
        t2 = pc.if_else(
            pa.array(did % 11 == 4),
            pc.binary_join_element_wise(t1, pa.scalar(" javascript"), ""),
            t1)
        suf = pa.array(_np.array([".", "!", "?", ""])[did % 4])
        line = pc.binary_join_element_wise(t2, suf, "")
        return pa.table({"gid": pa.array(did % 50, pa.int64()),
                         "line": line})

    ls = ds.map_batches(_line, batch_format="pyarrow", zero_copy_batch=True)
    pages = grouped_collect(["gid"], "line", "body", sep="\n",
                            num_partitions=16).apply(ls)

    def _page(t: pa.Table) -> pa.Table:
        gid = t["gid"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lorem = pc.if_else(pa.array(gid % 17 == 3),
                           pa.scalar("\nlorem ipsum dolor sit amet."),
                           pa.scalar(""))
        curly = pc.if_else(pa.array(gid % 19 == 5),
                           pa.scalar("\nfunction() {"), pa.scalar(""))
        text = pc.binary_join_element_wise(t["body"], lorem, curly, "")
        return pa.table({"doc_id": pa.array(gid, pa.int64()),
                         "text": text})

    pages = pages.map_batches(_page, batch_format="pyarrow")
    out = c4_clean("text").apply(pages)
    return out.select_columns(
        ["doc_id", "kept", "n_lines_kept", "clean_text"]).sort("doc_id")


Q168_SQL = """
WITH t1s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2
              THEN array_to_string(string_split(text, ' ')[1:3], ' ')
              ELSE text END AS t1
  FROM documents
), ls AS (
  SELECT doc_id % 50 AS gid,
         (CASE WHEN doc_id % 11 = 4 THEN t1 || ' javascript' ELSE t1 END)
         || (CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN '.' WHEN 1 THEN '!' WHEN 2 THEN '?'
             ELSE '' END) AS line
  FROM t1s
), pages AS (
  SELECT CAST(gid AS BIGINT) AS doc_id,
         string_agg(line, chr(10) ORDER BY line)
         || CASE WHEN gid % 17 = 3
                 THEN chr(10) || 'lorem ipsum dolor sit amet.'
                 ELSE '' END
         || CASE WHEN gid % 19 = 5
                 THEN chr(10) || 'function() {' ELSE '' END AS text
  FROM ls GROUP BY gid
), f AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
           l -> regexp_matches(l, '[.!?"]$')
                AND len(regexp_extract_all(l, '[A-Za-z0-9_]+')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kl
  FROM pages
)
SELECT doc_id,
       (NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{') AND len(kl) >= 3) AS kept,
       CAST(len(kl) AS BIGINT) AS n_lines_kept,
       CASE WHEN NOT contains(lower(text), 'lorem ipsum')
                 AND NOT contains(text, '{') AND len(kl) >= 3
            THEN array_to_string(kl, chr(10)) END AS clean_text
FROM f ORDER BY doc_id
"""


QUERIES.update({"q168_c4_clean": q168_c4_clean})
ORACLE.update({"q168_c4_clean": Q168_SQL})


# ---------------------------------------------------------------------------
# q169 — data selection under a TOKEN BUDGET (stages/sampling.py
# budget_select): rank docs by quality (q16's exact score, tie-broken by
# doc_id) and keep the greedy prefix whose running token sum stays within
# budget = (3 * total_tokens) // 10 — the standard corpus-assembly step
# when a training run fixes its token count. The operator does NO global
# sort: per-bucket weight sums (one tiny reduce), a driver prefix over
# <=1024 buckets, a vectorized keep/drop filter for fully-in/out buckets,
# and ONE ordered cut inside the single straddling bucket. The oracle is
# the window-function definition itself: SUM(n_tokens) OVER (ORDER BY
# quality DESC, doc_id) <= budget. Integer weights, 6dp-rounded scores
# (both already oracle-pinned by q15/q16), so the cut is exact.

def q169_budget_select(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        budget_select,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.text import (
        quality_score,
        token_stats,
    )
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = token_stats("text").apply(ds)
    ds = quality_score("text").apply(ds)
    ds = ds.select_columns(["doc_id", "quality", "n_tokens"])
    total = int(ds.sum("n_tokens"))
    budget = (3 * total) // 10
    out = budget_select(ds, budget, weight_col="n_tokens",
                        score_col="quality", id_col="doc_id")
    return out.sort("doc_id")


Q169_SQL = r"""
WITH q AS (
  SELECT doc_id, n_tokens,
         ROUND(
           0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000
                        THEN 1.0 ELSE 0.0 END)
         + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                         AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                        THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM (
    SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
             AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
             AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             AS n_digit,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             AS n_letters
    FROM documents)
), b AS (
  SELECT (3 * SUM(n_tokens)) // 10 AS budget FROM q
), c AS (
  SELECT doc_id, quality,
         CAST(n_tokens AS DOUBLE) AS n_tokens_d, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
  FROM q
)
SELECT doc_id, quality, n_tokens
FROM c, b WHERE cum <= b.budget
ORDER BY doc_id
"""


QUERIES.update({"q169_budget_select": q169_budget_select})
ORACLE.update({"q169_budget_select": Q169_SQL})


# ---------------------------------------------------------------------------
# q170 — STREAM-STREAM **LEFT OUTER** INTERVAL JOIN (cdc/stream_join.py
# outer="left"; the Flink SQL outer interval-join contract): a left row
# GC'd from the buffer WITHOUT ever matching emits (l, NULL) exactly once,
# in the epoch whose watermark advance evicted it — matched-ness rides the
# buffer state (_matched) so a row matched in epoch k can never time out
# in epoch k+n. Same buffer-crossing fixture as q164 (left stream a full
# epoch before the right), then a finalize (+INF watermark) epoch flushes
# the tail, so the emitted log equals the complete SQL LEFT JOIN —
# timeouts split across the eviction epochs, pairs across the arrival
# epochs, each row exactly once.

def q170_stream_outer_join(sf_dir: str):
    import tempfile

    import ray.data as _rd

    from e_commerce_batch_etl_pipeline_ray.cdc.stream_join import (
        StreamJoin,
        StreamJoinConfig,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    sj = StreamJoin(StreamJoinConfig(
        state_dir=tempfile.mkdtemp(prefix="q170_sj_", dir="/tmp"),
        window=40, lateness=0, left_cols=("commit",),
        right_cols=("commit",), num_partitions=16, outer="left"))
    left = read_parquet_clean(os.path.join(Q24_BINLOG_DIR,
                                           "epoch-0.parquet"),
                              override_num_blocks=8)
    right = read_parquet_clean(os.path.join(Q24_BINLOG_DIR,
                                            "epoch-1.parquet"),
                               override_num_blocks=8)
    empty = _rd.from_arrow(left.schema().base_schema.empty_table())
    m0 = sj.ingest(left, empty, 0)
    m1 = sj.ingest(empty, right, 1)
    m2 = sj.ingest(empty, empty, 2, finalize=True)
    # timeouts are emitted AT EVICTION (epoch 1's wm_right advance), not
    # parked until finalize; the finalize epoch here only flushes right
    # rows, which outer='left' never emits (pinned split in tests)
    assert m0["timeouts"] == 0 and m1["timeouts"] > 0
    assert m1["matches"] > 0 and m2["timeouts"] == 0
    return sj.matches().sort(["repo", "path", "l_lsn", "r_lsn"])


Q170_SQL = f"""
SELECT l.repo, l.path, l.lsn AS l_lsn, r.lsn AS r_lsn,
       l.commit AS l_commit, r.commit AS r_commit
FROM read_parquet('{Q24_BINLOG_DIR}/epoch-0.parquet') l
LEFT JOIN read_parquet('{Q24_BINLOG_DIR}/epoch-1.parquet') r
  ON l.repo = r.repo AND l.path = r.path AND abs(l.lsn - r.lsn) <= 40
ORDER BY l.repo, l.path, l_lsn, r_lsn
"""


QUERIES.update({"q170_stream_outer_join": q170_stream_outer_join})
ORACLE.update({"q170_stream_outer_join": Q170_SQL})


# ---------------------------------------------------------------------------
# q171 — Gopher QUALITY rules (Rae et al. 2021 A1; stages/text.py
# gopher_quality — the companion of q160's repetition signals, completing
# the Gopher filter set): word-count bounds, mean word length, symbol
# ratio, bullet/ellipsis line fractions, alpha-word fraction, distinct
# stopword presence, and the A1 conjunction flag (min_words=10 here so
# the flag actually splits this corpus; min_stopwords=1 — the synthetic
# docs carry at most one of the 8 Gopher stopwords). Row-local, vectorized;
# every metric is a denominator-exact int/int double so the SQL mirror
# hashes bit-for-bit (the q160 lesson).

def q171_gopher_quality(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages.text import gopher_quality
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = gopher_quality("text", min_words=10, min_stopwords=1).apply(ds)
    return out.select_columns([
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stop_distinct", "kept"]).sort("doc_id")


Q171_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
), ws AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_words,
         SUM(LENGTH(w))::DOUBLE / GREATEST(COUNT(*), 1) AS mean_word_len,
         SUM(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1
                  ELSE 0 END)::DOUBLE / GREATEST(COUNT(*), 1)
           AS alpha_word_frac,
         COUNT(DISTINCT CASE WHEN lower(w) IN
             ('the','be','to','of','and','that','have','with')
             THEN lower(w) END)::BIGINT AS n_stop_distinct
  FROM w GROUP BY doc_id
), ls AS (
  SELECT doc_id,
         SUM(CASE WHEN prefix(l, '- ') OR prefix(l, '•')
                  THEN 1 ELSE 0 END)::DOUBLE
           / GREATEST(COUNT(*), 1) AS bullet_line_frac,
         SUM(CASE WHEN suffix(l, '...') THEN 1 ELSE 0 END)::DOUBLE
           / GREATEST(COUNT(*), 1) AS ellipsis_line_frac
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  GROUP BY doc_id
), sym AS (
  SELECT d.doc_id,
         ((LENGTH(text) - LENGTH(replace(text, '#', '')))::DOUBLE
          + (LENGTH(text) - LENGTH(replace(text, '...', ''))) / 3)
           / GREATEST(ws.n_words, 1) AS symbol_ratio
  FROM documents d LEFT JOIN ws ON d.doc_id = ws.doc_id
)
SELECT d.doc_id, ws.n_words, ws.mean_word_len, sym.symbol_ratio,
       ls.bullet_line_frac, ls.ellipsis_line_frac, ws.alpha_word_frac,
       ws.n_stop_distinct,
       (d.text IS NOT NULL
        AND ws.n_words BETWEEN 10 AND 100000
        AND ws.mean_word_len BETWEEN 3.0 AND 10.0
        AND sym.symbol_ratio <= 0.1
        AND ls.bullet_line_frac <= 0.9
        AND ls.ellipsis_line_frac <= 0.3
        AND ws.alpha_word_frac >= 0.8
        AND ws.n_stop_distinct >= 1) AS kept
FROM documents d
LEFT JOIN ws ON d.doc_id = ws.doc_id
LEFT JOIN ls ON d.doc_id = ls.doc_id
LEFT JOIN sym ON d.doc_id = sym.doc_id
ORDER BY d.doc_id
"""
# ADVICE r4: LEFT JOINs (not inner) so a null-text document stays in the
# oracle exactly as the operator emits it — null metrics, kept=false
# (text IS NOT NULL short-circuits the conjunction to false). The
# testdata corpus has no null texts today; the mirror no longer relies
# on that.


QUERIES.update({"q171_gopher_quality": q171_gopher_quality})
ORACLE.update({"q171_gopher_quality": Q171_SQL})


# ---------------------------------------------------------------------------
# q172 — INCREMENTAL PARAGRAPH DEDUP with persistent state
# (cdc/paradedup_state.py): the streaming form of q167 — each micro-batch
# of documents is rewritten against the hash-partitioned seen-paragraph
# state on disk (probes pruned to the incoming shas), state rows are
# ~32-byte shas (never text — the q111 lesson), and the rewritten docs
# commit through the lake's exactly-once epoch/manifest protocol. The
# query feeds q167's derived 100-page corpus in TWO epochs split by
# doc_id; because epoch order follows doc order, the union of the two
# epochs' rewrites must equal the one-shot operator — the q167 SQL is
# the oracle verbatim.

def q172_incremental_paradedup(sf_dir: str):
    import tempfile

    import numpy as _np

    from e_commerce_batch_etl_pipeline_ray.cdc.paradedup_state import (
        IncParaDedupConfig,
        IncrementalParaDedup,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
        grouped_collect,
    )
    sep = "\n\n"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    boiler = ds.sort("doc_id").take(1)[0]["text"]

    def _gid(t: pa.Table) -> pa.Table:
        gid = t["doc_id"].to_numpy(zero_copy_only=False) % 100
        return pa.table({"gid": pa.array(gid, pa.int64()),
                         "text": t["text"]})

    pages = grouped_collect(["gid"], "text", "body", sep=sep,
                            num_partitions=16).apply(
        ds.map_batches(_gid, batch_format="pyarrow", zero_copy_batch=True))

    def _mk(t: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            pa.scalar(boiler), t["body"], pa.scalar(sep))
        return pa.table({"doc_id": t["gid"].cast(pa.int64()),
                         "text": text})

    pages = pages.map_batches(_mk, batch_format="pyarrow").materialize()
    ipd = IncrementalParaDedup(IncParaDedupConfig(
        state_dir=tempfile.mkdtemp(prefix="q172_ipd_", dir="/tmp"),
        num_partitions=8, compact_interval=2))
    ipd.ingest(pages.filter(lambda r: r["doc_id"] < 50), 0)
    ipd.ingest(pages.filter(lambda r: r["doc_id"] >= 50), 1)
    out = ipd.docs(0).union(ipd.docs(1))
    return out.select_columns(["doc_id", "text", "n_paras", "n_removed"]) \
        .sort("doc_id")


QUERIES.update({"q172_incremental_paradedup": q172_incremental_paradedup})
ORACLE.update({"q172_incremental_paradedup": Q167_SQL})


# ---------------------------------------------------------------------------
# q173 — EXACT-SUBSTRING DEDUP WITH REMOVAL (Lee et al. 2022 ExactSubstr;
# stages/substr.exact_substring_removal — VERDICT r4 next-task #5: q96
# only SCORES duplicated grams, this one excises them). Rule, mirrored
# verbatim in SQL: byte p of doc d is removed iff some gram start i with
# i <= p < i+50 has corpus-wide count(substr(d,i,50)) >= 2 — all
# occurrences removed (the released deduplicate-text-datasets behavior).
# n=50 is the paper's span length; on this corpus it touches ~45 of 500
# docs (~11k duplicated gram occurrences), so the rewrite is real but
# not degenerate. The oracle builds the same marks from the q96-style
# gram CTE, covers positions with a range join, and reassembles each doc
# with string_agg FILTER (ORDER BY p).

def q173_exact_substring_removal(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import substr
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = substr.exact_substring_removal(ds, n=50, num_partitions=32)
    return out.sort("doc_id")


Q173_SQL = """
WITH g AS (
  SELECT doc_id, i AS pos, substring(text, i, 50) AS gram
  FROM (SELECT doc_id, text,
               UNNEST(generate_series(1, length(text) - 49)) AS i
        FROM documents)
),
c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
m AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)),
ch AS (
  SELECT doc_id, p, substring(text, p, 1) AS c1
  FROM (SELECT doc_id, text,
               UNNEST(generate_series(1, length(text))) AS p
        FROM documents)
),
cov AS (
  SELECT DISTINCT ch.doc_id, ch.p
  FROM ch JOIN m ON m.doc_id = ch.doc_id
                AND ch.p >= m.pos AND ch.p < m.pos + 50
),
rw AS (
  SELECT ch.doc_id,
         COALESCE(string_agg(ch.c1, '' ORDER BY ch.p)
                  FILTER (WHERE cov.p IS NULL), '') AS text,
         CAST(COUNT(cov.p) AS BIGINT) AS n_removed
  FROM ch LEFT JOIN cov ON cov.doc_id = ch.doc_id AND cov.p = ch.p
  GROUP BY ch.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE COALESCE(rw.text, '') END AS text,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE COALESCE(rw.n_removed, 0) END AS n_removed
FROM documents d LEFT JOIN rw ON rw.doc_id = d.doc_id
ORDER BY d.doc_id
"""


QUERIES.update({"q173_exact_substring_removal": q173_exact_substring_removal})
ORACLE.update({"q173_exact_substring_removal": Q173_SQL})


# ---------------------------------------------------------------------------
# q174 — HYBRID RETRIEVAL with Reciprocal Rank Fusion (retrieval.
# hybrid_rrf; Cormack et al. 2009 — the standard RAG fusion rule): the
# engine's own BM25 top-k (q102 terms) and exact-cosine top-k (query =
# embedding of vec_id 0) candidate lists fuse by rrf(d) = 1/(60+r_bm25)
# + 1/(60+r_cos). Ranking keys pinned to the float-parity levels the
# existing oracles prove (BM25 ROUND 4 per q102, cosine ROUND 9 per
# q17); the SQL mirror replays both rankings and the fusion verbatim
# over a FULL OUTER JOIN of the two k=20 lists.

def q174_hybrid_rrf(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import retrieval
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qv = [r["embedding"] for r in emb.take(1)][0]
    out = retrieval.hybrid_rrf(docs, emb, list(_Q102_TERMS), qv,
                               k_each=20, k0=60, top=10)
    return out


def _q174_sql() -> str:
    tf_cols = ",\n   ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_Q102_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(_Q102_TERMS)))
    score = " + ".join(
        f"LN((n - df{i} + 0.5)/(df{i} + 0.5) + 1) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_Q102_TERMS)))
    return f"""
WITH l AS (
  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
         len(string_split(COALESCE(text, ''), ' '))::DOUBLE AS dl
  FROM documents
),
stats AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM l),
tf AS (SELECT doc_id, dl,
   {tf_cols}
 FROM l),
df AS (SELECT {df_cols} FROM tf),
bm AS (SELECT doc_id, {score} AS score FROM tf, stats, df),
bmk AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id) AS r
    FROM bm) WHERE r <= 20
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id = 0),
cs AS (
  SELECT e.vec_id AS doc_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
  FROM embeddings e CROSS JOIN q),
crk AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY ROUND(cos, 9) DESC, doc_id) AS r
    FROM cs) WHERE r <= 20
),
f AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         b.r AS bm25_rank, c.r AS cos_rank,
         COALESCE(1.0 / (60 + b.r), 0) + COALESCE(1.0 / (60 + c.r), 0)
           AS rrf_raw
  FROM bmk b FULL OUTER JOIN crk c ON b.doc_id = c.doc_id
)
SELECT doc_id, ROUND(rrf_raw, 6) AS rrf,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(cos_rank AS BIGINT) AS cos_rank
FROM f ORDER BY rrf_raw DESC, doc_id LIMIT 10
"""


QUERIES.update({"q174_hybrid_rrf": q174_hybrid_rrf})
ORACLE.update({"q174_hybrid_rrf": _q174_sql()})


# ---------------------------------------------------------------------------
# q175 — ATOMIC MULTI-TABLE TRANSACTION (cdc/multi.MultiTableCDC.
# ingest_transaction — two-phase staged-manifest commit with a
# write-ahead txn record; crash recovery rolls forward or aborts; tested
# in tests/test_cdc.py, oracled here for the first time): the q24 binlog
# fixture's two epochs land as ONE transaction into two independently-
# versioned tables under one root, and the result is the union of both
# tables' live reads tagged by table name. The oracle replays each
# table's LWW window over the same fixture file and unions — visibility
# is all-or-nothing through the txn record, so after commit the engine
# must equal the per-table replay exactly.

def q175_multi_table_txn(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import engine as _eng
    from e_commerce_batch_etl_pipeline_ray.cdc.multi import MultiTableCDC
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        read_parquet_clean,
    )
    ensure_oracle_fixtures()
    root = tempfile.mkdtemp(prefix="q175_multi_", dir="/tmp")
    mt = MultiTableCDC(root, _eng.CDCConfig(lake_dir="unused",
                                            num_partitions=8,
                                            merge_concurrency=2))
    ev = {f"t{ep}": read_parquet_clean(
              os.path.join(Q24_BINLOG_DIR, f"epoch-{ep}.parquet"),
              override_num_blocks=8)
          for ep in range(Q24_EPOCHS)}
    mt.ingest_transaction(ev)
    mt.shutdown()

    def _tag(name):
        def _fn(t):
            return t.append_column(
                "table_name", pa.array([name] * t.num_rows, pa.string()))
        return _fn

    parts = []
    for name in sorted(ev):
        d = mt.read(name).map_batches(_tag(name), batch_format="pyarrow")
        parts.append(d.select_columns([
            "table_name", "repo", "path", "lsn", "commit",
            "content_sha256"]))
    out = parts[0].union(*parts[1:])
    return out.sort(["table_name", "repo", "path"])


def _q175_sql() -> str:
    per = []
    for ep in range(Q24_EPOCHS):
        per.append(f"""
SELECT 't{ep}' AS table_name, repo, path, lsn, commit, content_sha256
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY repo, path
                               ORDER BY lsn DESC) AS rn
  FROM read_parquet('{Q24_BINLOG_DIR}/epoch-{ep}.parquet')
) WHERE rn = 1 AND op <> 'D'""")
    return ("SELECT table_name, repo, path, lsn, commit, content_sha256"
            " FROM (" + " UNION ALL ".join(per)
            + ") ORDER BY table_name, repo, path")


QUERIES.update({"q175_multi_table_txn": q175_multi_table_txn})
ORACLE.update({"q175_multi_table_txn": _q175_sql()})


# ---------------------------------------------------------------------------
# q176 — PER-GROUP TOKEN-BUDGET SELECTION (sampling.budget_select_grouped;
# the FineWeb/Dolma-style per-domain budget mixture): within every
# `source`, keep the greedy quality-ranked prefix while the source's
# running token sum stays <= 30% of that source's total tokens. The
# oracle replays SUM(w) OVER (PARTITION BY source ORDER BY quality DESC,
# doc_id) <= B_source over the q16/q169 exact quality score. Same
# no-sort scale shape as q169 (bucket classify + one straddle-bucket
# sort), group-aware: driver state is groups x nbuckets weight sums.

def q176_budget_select_grouped(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        budget_select_grouped,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.text import (
        quality_score,
        token_stats,
    )
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    ds = token_stats("text").apply(ds)
    ds = quality_score("text").apply(ds)
    ds = ds.select_columns(["doc_id", "source", "quality", "n_tokens"])
    totals = {r["source"]: r["sum(n_tokens)"]
              for r in ds.groupby("source").sum("n_tokens").take_all()}
    budgets = {s: (3 * int(t)) // 10 for s, t in totals.items()}
    out = budget_select_grouped(ds, budgets, group_col="source",
                                weight_col="n_tokens",
                                score_col="quality", id_col="doc_id")
    return out.sort("doc_id")


Q176_SQL = r"""
WITH q AS (
  SELECT doc_id, source, n_tokens,
         ROUND(
           0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000
                        THEN 1.0 ELSE 0.0 END)
         + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                         AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                        THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM (
    SELECT doc_id, source,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
             AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
             AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             AS n_digit,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             AS n_letters
    FROM documents)
), b AS (
  SELECT source, (3 * SUM(n_tokens)) // 10 AS budget
  FROM q GROUP BY source
), c AS (
  SELECT doc_id, source, quality, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id) AS cum
  FROM q
)
SELECT c.doc_id, c.source, c.quality, c.n_tokens
FROM c JOIN b ON b.source = c.source
WHERE c.cum <= b.budget
ORDER BY c.doc_id
"""


QUERIES.update({"q176_budget_select_grouped": q176_budget_select_grouped})
ORACLE.update({"q176_budget_select_grouped": Q176_SQL})


# ---------------------------------------------------------------------------
# q177 — TOP-K FREQUENT N-GRAMS (stages/substr.top_ngrams; corpus
# boilerplate / template mining — which exact byte snippets dominate):
# counts include within-doc overlapping occurrences; rank (cnt DESC,
# gram ASC). One content-hash shuffle makes each gram's global count
# partition-local, so a per-partition top-k is exact and only k*P rows
# reach the driver merge.

def q177_top_ngrams(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import substr
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return substr.top_ngrams(ds, n=12, k=25, num_partitions=32)


Q177_SQL = """
WITH g AS (
  SELECT substring(text, i, 12) AS gram
  FROM (SELECT text, UNNEST(generate_series(1, length(text) - 11)) AS i
        FROM documents)
)
SELECT gram, COUNT(*)::BIGINT AS cnt
FROM g GROUP BY gram
ORDER BY cnt DESC, gram LIMIT 25
"""


QUERIES.update({"q177_top_ngrams": q177_top_ngrams})
ORACLE.update({"q177_top_ngrams": Q177_SQL})


# ---------------------------------------------------------------------------
# q178 — CROSS-CORPUS PERPLEXITY (out-of-domain detection; KenLM-style
# quality probe production pipelines run: train the char-bigram LM on
# ONE reference slice — source='src0' — and score EVERY document against
# it; docs far from the reference distribution score high). Same
# mergeable 256x256-partial trainer and broadcast scorer as q95 — the
# composition, not the kernel, is new: train set != score set, so the
# oracle must COALESCE unseen-bigram/unseen-context smoothing
# ((0+1)/(0+256)) that q95's same-corpus join never exercises.

def q178_cross_perplexity(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import lm
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    train = ds.filter(expr="source == 'src0'")
    model = lm.train_char_bigram(train, "text")
    scored = lm.perplexity(ds, model, "text", round_to=2)
    return scored.select_columns(["doc_id", "perplexity"]).sort("doc_id")


Q178_SQL = """
WITH tr AS (
  SELECT doc_id, text FROM documents WHERE source = 'src0'
),
tpos AS (
  SELECT text, UNNEST(generate_series(1, length(text) - 1)) AS i FROM tr
),
cnt AS (
  SELECT substring(text, i, 2) AS b, COUNT(*)::DOUBLE AS n
  FROM tpos GROUP BY b
),
rs AS (SELECT substring(b, 1, 1) AS c1, SUM(n) AS row_n FROM cnt GROUP BY 1),
pos AS (
  SELECT doc_id, text, UNNEST(generate_series(1, length(text) - 1)) AS i
  FROM documents
),
bg AS (
  SELECT doc_id, substring(text, i, 1) AS c1, substring(text, i, 2) AS b
  FROM pos
),
scored AS (
  SELECT bg.doc_id,
         LN((COALESCE(cnt.n, 0) + 1)
            / (COALESCE(rs.row_n, 0) + 256)) AS lp
  FROM bg LEFT JOIN cnt USING (b) LEFT JOIN rs ON rs.c1 = bg.c1
)
SELECT d.doc_id,
       ROUND(EXP(-AVG(s.lp)), 2) AS perplexity
FROM documents d LEFT JOIN scored s USING (doc_id)
GROUP BY d.doc_id ORDER BY d.doc_id
"""


QUERIES.update({"q178_cross_perplexity": q178_cross_perplexity})
ORACLE.update({"q178_cross_perplexity": Q178_SQL})


# ---------------------------------------------------------------------------
# q179 — RAG CORPUS PREP + RETRIEVAL composition (chunk -> BM25 over the
# CHUNKS): the retrieval-side composition oracle, same philosophy as
# q165 — ONE SQL chain verifies the stage composition (q85's chunk
# expansion at 256/32 feeding q102's BM25 formula over chunk tokens),
# not just the stages. Chunk identity is doc_id*4096+chunk_idx (chunk
# counts here are « 4096); scores round to 4 before ranking so the
# mirror's ordering is float-parity-safe (the q102 lesson).

def q179_rag_chunk_bm25(sf_dir: str):
    from e_commerce_batch_etl_pipeline_ray.stages import retrieval
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = T.chunk_documents(chunk_chars=256, overlap_chars=32).apply(ds)

    def _cid(t: pa.Table) -> pa.Table:
        cid = pc.add(pc.multiply(t["doc_id"], pa.scalar(4096)),
                     t["chunk_idx"])
        return t.append_column("chunk_id", cid.cast(pa.int64()))

    ds = ds.map_batches(_cid, batch_format="pyarrow", zero_copy_batch=True)
    top = retrieval.bm25_topk(ds, list(_Q102_TERMS), k=10,
                              id_col="chunk_id", text_col="chunk_text",
                              round_to=4)

    def _split(t: pa.Table) -> pa.Table:
        did = pc.divide(t["chunk_id"], pa.scalar(4096)).cast(pa.int64())
        cix = pc.subtract(t["chunk_id"],
                          pc.multiply(did, pa.scalar(4096))).cast(pa.int64())
        return pa.table({"doc_id": did, "chunk_idx": cix,
                         "score": t["score"]})

    return top.map_batches(_split, batch_format="pyarrow",
                           zero_copy_batch=True)


def _q179_sql() -> str:
    tf_cols = ",\n   ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::DOUBLE AS tf{i}"
        for i, t in enumerate(_Q102_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(_Q102_TERMS)))
    score = " + ".join(
        f"LN((n - df{i} + 0.5)/(df{i} + 0.5) + 1) * tf{i} * 2.2"
        f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
        for i in range(len(_Q102_TERMS)))
    return f"""
WITH dd AS (SELECT doc_id, text, length(text) AS len FROM documents),
cc AS (
  SELECT doc_id, text,
         CASE WHEN len <= 256 THEN 1
              ELSE CAST(CEIL((len - 256) / 224.0) AS BIGINT) + 1 END AS nc
  FROM dd
), ch AS (
  SELECT doc_id, chunk_idx,
         substr(text, chunk_idx * 224 + 1, 256) AS chunk_text
  FROM (SELECT doc_id, text, UNNEST(RANGE(0, nc)) AS chunk_idx FROM cc)
), l AS (
  SELECT doc_id * 4096 + chunk_idx AS cid, doc_id, chunk_idx,
         string_split(COALESCE(chunk_text, ''), ' ') AS toks,
         len(string_split(COALESCE(chunk_text, ''), ' '))::DOUBLE AS dl
  FROM ch
),
stats AS (SELECT COUNT(*)::DOUBLE AS n, AVG(dl) AS avgdl FROM l),
tf AS (SELECT cid, doc_id, chunk_idx, dl,
   {tf_cols}
 FROM l),
df AS (SELECT {df_cols} FROM tf)
SELECT doc_id, chunk_idx, ROUND({score}, 4) AS score
FROM tf, stats, df
ORDER BY score DESC, cid LIMIT 10
"""


QUERIES.update({"q179_rag_chunk_bm25": q179_rag_chunk_bm25})
ORACLE.update({"q179_rag_chunk_bm25": _q179_sql()})


# ---------------------------------------------------------------------------
# q180 — INCREMENTAL-DEDUP -> BUDGETED-SELECTION composition (the
# streaming production shape: a corpus continuously deduplicated by the
# q172 persistent paragraph state, then assembled under a token budget):
# the q172 derived corpus lands in TWO epochs through
# IncrementalParaDedup, the union of the epochs' REWRITTEN docs is
# scored (q16 quality, exact) and budget-selected at 50% of the
# rewritten corpus's tokens (q169's no-sort operator). ONE SQL oracle
# chains the q167 rewrite CTEs (== the incremental union, the q172
# contract) into the q169 scoring + running-sum window cut — verifying
# the cross-family composition end to end.

def q180_incremental_corpus_select(sf_dir: str):
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc.paradedup_state import (
        IncParaDedupConfig,
        IncrementalParaDedup,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
        grouped_collect,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        budget_select,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.text import (
        quality_score,
        token_stats,
    )
    sep = "\n\n"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    boiler = ds.sort("doc_id").take(1)[0]["text"]

    def _gid(t: pa.Table) -> pa.Table:
        gid = t["doc_id"].to_numpy(zero_copy_only=False) % 100
        return pa.table({"gid": pa.array(gid, pa.int64()),
                         "text": t["text"]})

    pages = grouped_collect(["gid"], "text", "body", sep=sep,
                            num_partitions=16).apply(
        ds.map_batches(_gid, batch_format="pyarrow", zero_copy_batch=True))

    def _mk(t: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            pa.scalar(boiler), t["body"], pa.scalar(sep))
        return pa.table({"doc_id": t["gid"].cast(pa.int64()),
                         "text": text})

    pages = pages.map_batches(_mk, batch_format="pyarrow").materialize()
    ipd = IncrementalParaDedup(IncParaDedupConfig(
        state_dir=tempfile.mkdtemp(prefix="q180_ipd_", dir="/tmp"),
        num_partitions=8, compact_interval=2))
    ipd.ingest(pages.filter(lambda r: r["doc_id"] < 50), 0)
    ipd.ingest(pages.filter(lambda r: r["doc_id"] >= 50), 1)
    corpus = ipd.docs(0).union(ipd.docs(1)) \
        .select_columns(["doc_id", "text"])
    corpus = token_stats("text").apply(corpus)
    corpus = quality_score("text").apply(corpus)
    corpus = corpus.select_columns(["doc_id", "quality", "n_tokens"])
    budget = int(corpus.sum("n_tokens")) // 2
    out = budget_select(corpus, budget, weight_col="n_tokens",
                        score_col="quality", id_col="doc_id")
    return out.sort("doc_id")


def _q180_sql() -> str:
    rewrite = ORACLE["q167_paragraph_dedup"]
    # strip the final SELECT of the q167 mirror and re-expose the
    # rewritten docs as a CTE named rw
    head, _, _tail = rewrite.partition("SELECT m.doc_id, COALESCE")
    head = head.rstrip()
    assert head.endswith(")")
    return head + r""",
rw AS (
  SELECT m.doc_id, COALESCE(a.text, '') AS text
  FROM m LEFT JOIN a USING (doc_id)
), q AS (
  SELECT doc_id, n_tokens,
         ROUND(
           0.25 * (CASE WHEN n_chars >= 50 AND n_chars <= 100000
                        THEN 1.0 ELSE 0.0 END)
         + 0.25 * (1.0 - LEAST(n_punct / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (1.0 - LEAST(n_digit / GREATEST(n_chars, 1.0), 1.0))
         + 0.25 * (CASE WHEN n_letters / GREATEST(n_tokens, 1.0) >= 2.0
                         AND n_letters / GREATEST(n_tokens, 1.0) <= 12.0
                        THEN 1.0 ELSE 0.0 END), 6) AS quality
  FROM (
    SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS n_chars,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
             AS n_tokens,
           CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
             AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             AS n_digit,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             AS n_letters
    FROM rw)
), bb AS (
  SELECT SUM(n_tokens) // 2 AS budget FROM q
), cc AS (
  SELECT doc_id, quality, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
  FROM q
)
SELECT doc_id, quality, n_tokens
FROM cc, bb WHERE cum <= bb.budget
ORDER BY doc_id
"""


QUERIES.update({"q180_incremental_corpus_select":
                q180_incremental_corpus_select})
ORACLE.update({"q180_incremental_corpus_select": _q180_sql()})
