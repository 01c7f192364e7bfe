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
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from e_commerce_batch_etl_pipeline_ray.functions import scalar as F
from e_commerce_batch_etl_pipeline_ray.stages import aggregates, dedup, joins, maps, sorts


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


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
        pre_aggregate=True).apply(ds)

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
        pre_aggregate=True).apply(ds)
    distinct = aggregates.count_distinct(
        ["order_year", "o_orderstatus"], "o_custkey", "n_customers").apply(ds)
    # both sides are tiny aggregate outputs -> driver-side merge is fine
    bt = pa.concat_tables(ray.get(base.to_arrow_refs()), promote_options="default")
    dt = pa.concat_tables(ray.get(distinct.to_arrow_refs()), promote_options="default")
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
    nation = pa.concat_tables(ray.get(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_arrow_refs()),
        promote_options="default")
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    ds = joins.broadcast_lookup(
        nation, on="c_nationkey", small_key="n_nationkey",
        value_cols=["n_name"], defaults={"n_name": "UNKNOWN"}).apply(ds)
    out = aggregates.grouped_aggregate(
        ["n_name"],
        [("count", None, "n_customers"), ("sum", "c_acctbal", "sum_acctbal")],
        pre_aggregate=True).apply(ds)

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
        pre_aggregate=True).apply(joined)

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
        pre_aggregate=True).apply(ds).sort("price_band")


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
