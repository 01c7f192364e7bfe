"""The reference's primary pipeline (src/pipeline.py run(), SURVEY.md §3.1)
re-expressed as a fused Ray Data chain:

  read raw -> rename -> parse ts -> casts -> drop critical nulls -> fill GUEST
  -> keyed dedup -> business filter -> derived cols -> price bucket ->
  14-col contract -> region broadcast lookup

Every row-local step is a zero-copy Arrow map_batches; the only shuffle is
the keyed dedup. The DQ gate and sinks are applied by callers
(quality.checks / sources.parquet_io).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import Pipeline, TableSpec
from e_commerce_batch_etl_pipeline_ray.functions import scalar as F
from e_commerce_batch_etl_pipeline_ray.stages import dedup, joins, maps

# the 8 -> snake_case renames, src/transform.py:10-27
RENAMES = {
    "Invoice": "invoice_id", "StockCode": "stock_code",
    "Description": "description", "Quantity": "quantity",
    "InvoiceDate": "invoice_date_raw", "Price": "unit_price",
    "Customer ID": "customer_id", "Country": "country",
}

# 15-row country->region lookup, src/pipeline.py:71-87
COUNTRY_REGION = {
    "United Kingdom": "Europe", "Germany": "Europe", "France": "Europe",
    "Netherlands": "Europe", "Ireland": "Europe", "Spain": "Europe",
    "Italy": "Europe", "Belgium": "Europe", "Switzerland": "Europe",
    "Portugal": "Europe", "Australia": "Oceania", "Japan": "Asia",
    "Singapore": "Asia", "USA": "Americas", "Canada": "Americas",
}

# 14-column output contract, src/transform.py:150-165
CURATED_COLUMNS = [
    "invoice_id", "stock_code", "description", "quantity", "unit_price",
    "total_amount", "invoice_date", "invoice_year", "invoice_month",
    "invoice_day", "customer_id", "country", "is_return", "price_bucket",
]

CURATED_SPEC = TableSpec("retail_curated", pa.schema([
    ("invoice_id", pa.string()), ("stock_code", pa.string()),
    ("description", pa.string()), ("quantity", pa.int32()),
    ("unit_price", pa.float64()), ("total_amount", pa.float64()),
    ("invoice_date", pa.timestamp("us")), ("invoice_year", pa.int64()),
    ("invoice_month", pa.int64()), ("invoice_day", pa.int64()),
    ("customer_id", pa.string()), ("country", pa.string()),
    ("is_return", pa.bool_()), ("price_bucket", pa.string()),
]))


def _business_filter(t: pa.Table):
    """qty>0 AND price>0 AND invoice_date not null AND country not null and
    != 'Unspecified' (src/transform.py:101-107)."""
    m = pc.and_(pc.greater(t["quantity"], 0),
                pc.greater(t["unit_price"], 0.0))
    m = pc.and_(m, pc.is_valid(t["invoice_date"]))
    m = pc.and_(m, pc.is_valid(t["country"]))
    return pc.and_(m, pc.not_equal(t["country"], "Unspecified"))


def transform_pipeline(num_partitions: int = 64) -> Pipeline:
    """M13 — the full transform chain (src/transform.py:168-184).

    Dedup keeps the first row per (invoice_id, stock_code) by invoice_date
    then invoice_id — the reference's documented intent ("first occurrence
    ordered by invoice_date", src/transform.py:78) made deterministic.
    """
    p = Pipeline(name="retail_transform")
    p.add(maps.rename_columns(RENAMES))
    p.add(maps.parse_timestamp("invoice_date_raw", "%m/%d/%Y %H:%M",
                               out="invoice_date", drop_source=True))
    p.add(maps.cast_columns({"quantity": pa.int32(), "unit_price": pa.float64()}))
    p.add(maps.drop_null_rows(["invoice_id", "stock_code", "quantity", "unit_price"]))
    p.add(maps.fill_nulls({"customer_id": "GUEST"}))
    # order_by extends past invoice_date to the full remaining row: two rows
    # sharing key AND timestamp would otherwise pick a block-composition-
    # dependent winner (dedup.py's determinism contract needs a TOTAL order).
    p.add(dedup.dedup_keyed(["invoice_id", "stock_code"],
                            order_by=["invoice_date", "quantity", "unit_price",
                                      "customer_id", "country", "description"],
                            descending=False, num_partitions=num_partitions))
    p.add(maps.filter_expr(_business_filter, name="business_rules"))
    p.add(maps.with_columns({
        "total_amount": lambda t: F.total_amount(t["quantity"], t["unit_price"]),
        "invoice_year": lambda t: F.year(t["invoice_date"]),
        "invoice_month": lambda t: F.month(t["invoice_date"]),
        "invoice_day": lambda t: F.day_of_month(t["invoice_date"]),
        "is_return": lambda t: F.starts_with(t["invoice_id"], "C"),
    }))
    p.add(maps.bucketize("unit_price", [1.0, 5.0, 20.0, 100.0],
                         ["Very Low", "Low", "Medium", "High", "Premium"],
                         out="price_bucket"))
    p.add(maps.select(CURATED_COLUMNS))
    p.add(CURATED_SPEC.enforce_step())
    return p


def enrich_pipeline() -> Pipeline:
    """J1 — region lookup + fillna 'Other' (src/pipeline.py:61-99)."""
    p = Pipeline(name="retail_enrich")
    p.add(joins.broadcast_dict_lookup(COUNTRY_REGION, on="country",
                                      out="region", default="Other"))
    return p


def run(raw: ray.data.Dataset, num_partitions: int = 64) -> ray.data.Dataset:
    """Transform + enrich; returns the curated, enriched Dataset (lazy)."""
    ds = transform_pipeline(num_partitions).apply(raw)
    return enrich_pipeline().apply(ds)


# ---------------------------------------------------------------------------
# Full pipeline lifecycle — mirrors src/pipeline.py run() (SURVEY.md §3.1):
# extract -> expand -> transform -> broadcast join -> stats -> cache+DQ gate ->
# partitioned parquet -> batched DB load -> JSON report -> run log.

RETAIL_DQ = None  # built lazily to avoid import cycle


def _dq_config():
    from e_commerce_batch_etl_pipeline_ray.quality import checks
    return checks.DQConfig(
        min_rows=1,
        max_null_pct={"description": 5.0, "customer_id": 0.0},
        dup_keys=["invoice_id", "stock_code"],
        max_dup_pct=5.0,
        non_positive_cols=["quantity", "unit_price"],
        year_col="invoice_date", year_range=(2009, 2012),
        whitelist={},
    )


RETAIL_DDL = """
CREATE TABLE IF NOT EXISTS retail_curated (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    invoice_id TEXT, stock_code TEXT, description TEXT,
    quantity INTEGER, unit_price REAL, total_amount REAL,
    invoice_date TEXT, invoice_year INTEGER, invoice_month INTEGER,
    invoice_day INTEGER, customer_id TEXT, country TEXT,
    is_return INTEGER, price_bucket TEXT, region TEXT,
    UNIQUE (invoice_id, stock_code)
)
"""


def run_full(n_rows: int = 50_000, target_rows: int | None = None,
             out_dir: str = "/tmp/retail_out", seed: int = 42,
             num_partitions: int = 32, db_batch_rows: int = 5000,
             gate: bool = False) -> dict:
    """End-to-end run; returns the run summary (the reference's
    PipelineTracker record, src/logger_setup.py:61-71). Caller owns the Ray
    session."""
    import os
    import time

    import pyarrow.compute as pc

    from e_commerce_batch_etl_pipeline_ray.quality import checks as qchecks
    from e_commerce_batch_etl_pipeline_ray.sources import (
        db_sink,
        generators,
        memory,
        parquet_io,
    )

    t_start = time.time()
    summary: dict = {"pipeline": "retail", "stages": {}}

    def _stage(name, t0):
        summary["stages"][name] = round(time.time() - t0, 3)

    # 1. extract (+ S2 expansion to target size, src/extract.py:72-91)
    t0 = time.time()
    raw = generators.retail_raw(n_rows, seed=seed)
    if target_rows and target_rows > n_rows:
        raw = memory.expand_to_target(raw, target_rows, current_rows=n_rows)
    _stage("extract", t0)

    # 2-4. transform chain + broadcast enrich
    t0 = time.time()
    curated = run(raw, num_partitions=num_partitions)
    curated = curated.materialize()      # ST1: pin before multi-action DQ
    n_out = curated.count()
    _stage("transform", t0)

    # 5. plan observability (explain() equivalent)
    summary["stats_head"] = curated.stats().split("\n")[0]

    # 6. DQ gate
    t0 = time.time()
    report, overall = qchecks.run_checks(curated, _dq_config(), gate=gate)
    _stage("quality", t0)
    summary["dq_overall"] = overall

    # 7. partitioned parquet (S5)
    t0 = time.time()
    pq_dir = os.path.join(out_dir, "curated_parquet")
    parquet_io.write_parquet_partitioned(
        curated, pq_dir, partition_cols=["invoice_year"], mode="overwrite")
    assert parquet_io.verify_parquet_roundtrip(pq_dir, n_out)   # S8
    _stage("parquet", t0)

    # 8. batched DB load (S6), truncate-then-append idempotent
    t0 = time.time()
    db_path = os.path.join(out_dir, "retail.db")
    db_cols = [c for c in CURATED_COLUMNS if c != "invoice_date"] + ["region"]
    cast_for_db = curated.map_batches(
        lambda t: t.set_column(
            t.column_names.index("is_return"), "is_return",
            t["is_return"].cast(pa.int8())),
        batch_format="pyarrow")
    rows_db = db_sink.write_table(cast_for_db, db_path, "retail_curated",
                                  db_cols, RETAIL_DDL,
                                  batch_rows=db_batch_rows, concurrency=4)
    check = db_sink.read_query(db_path,
                               "SELECT COUNT(*) AS n FROM retail_curated")  # S9
    # DB count is authoritative (rows_written may over-count under task
    # retries with the idempotent INSERT OR REPLACE)
    assert check["n"][0].as_py() == n_out, (check["n"][0], n_out, rows_db)
    _stage("db_load", t0)

    # 9. DQ report persist (S7)
    parquet_io.write_json_report(report, os.path.join(out_dir, "dq_report.json"))

    summary["records_out"] = n_out
    summary["duration_s"] = round(time.time() - t_start, 3)
    summary["status"] = "SUCCESS" if overall != "FAIL" else "DQ_FAIL"
    # 10. run-log append (notebooks/07_pipeline_orchestrator.py:382-387)
    import json
    with open(os.path.join(out_dir, "run_log.jsonl"), "a") as f:
        f.write(json.dumps(summary, default=str) + "\n")
    return summary
