"""The notebook-variant orders pipeline (SURVEY.md §3.2/§3.3; FIXTURES.md F4)
— the second reference implementation with its own schema and derived set:

  fillna dict (7 defaults) -> timestamp parse (drop unparsed) -> boolean
  cast -> keyed dedup on order_id -> audited business filters -> derived
  cols (quarter, dayofweek, month name, delivery_days, effective_price,
  revenue recompute) -> revenue_band bucketing -> 22-col contract

Reference: notebooks/01_data_ingestion.py:183-200 (schema),
notebooks/02_transformations.py (transforms), notebooks/03_data_quality.py
(checks), notebooks/07_pipeline_orchestrator.py (stage logging + DQ abort).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import Pipeline
from e_commerce_batch_etl_pipeline_ray.functions import scalar as F
from e_commerce_batch_etl_pipeline_ray.quality import checks
from e_commerce_batch_etl_pipeline_ray.stages import dedup, maps

# fillna defaults, notebooks/02_transformations.py:59-68
FILL_DEFAULTS = {
    "category": "Unknown",
    "payment_method": "unknown",
    "customer_country": "Unknown",
    "discount_percent": 0.0,
    "shipping_cost": 0.0,
}

STATUS_WHITELIST = ["delivered", "shipped", "processing", "cancelled", "returned"]

CURATED_COLUMNS = [
    "order_id", "customer_id", "product_id", "product_name", "category",
    "quantity", "unit_price", "total_amount", "order_date", "delivery_date",
    "payment_method", "order_status", "customer_country",
    "is_premium_customer", "discount_percent", "shipping_cost",
    "order_year", "order_month", "order_quarter", "order_dayofweek",
    "order_month_name", "delivery_days", "effective_price", "revenue_band",
]


def _business_filter(t: pa.Table):
    """quantity>0 AND unit_price>0 (null-tolerant forms,
    notebooks/02_transformations.py:240-274)."""
    return pc.and_(pc.greater(pc.fill_null(t["quantity"], -1), 0),
                   pc.greater(pc.fill_null(t["unit_price"], -1.0), 0.0))


def transform_pipeline(num_partitions: int = 64) -> Pipeline:
    p = Pipeline(name="orders_transform")
    p.add(maps.fill_nulls(FILL_DEFAULTS))
    p.add(maps.parse_timestamp("order_date", "%Y-%m-%d %H:%M:%S",
                               drop_unparsed=True))
    p.add(maps.parse_timestamp("delivery_date", "%Y-%m-%d %H:%M:%S"))
    p.add(maps.bool_from_string("is_premium_customer"))
    p.add(maps.drop_null_rows(["order_id", "customer_id", "quantity",
                               "unit_price", "order_date"]))
    # dedup on order_id: "in production keep latest updated_at"
    # (notebooks/02_transformations.py:90-94) -> keep max order_date; the
    # tiebreak extends to the full remaining row so the winner is TOTALLY
    # ordered (SQL-expressible too — the q26 oracle mirrors this exact
    # ORDER BY in its ROW_NUMBER window).
    p.add(dedup.dedup_keyed(
        ["order_id"],
        ["order_date", "customer_id", "product_id", "quantity", "unit_price",
         "total_amount", "delivery_date", "payment_method", "order_status",
         "customer_country", "is_premium_customer", "discount_percent",
         "shipping_cost", "category", "product_name"],
        descending=True, num_partitions=num_partitions))
    p.add(maps.filter_expr(_business_filter, name="orders_business_rules"))
    p.add(maps.with_columns({
        "total_amount": lambda t: pc.if_else(
            pc.is_valid(t["total_amount"]), t["total_amount"],
            F.total_amount(t["quantity"], t["unit_price"])),
        "order_year": lambda t: F.year(t["order_date"]),
        "order_month": lambda t: F.month(t["order_date"]),
        "order_quarter": lambda t: F.quarter(t["order_date"]),
        "order_dayofweek": lambda t: F.day_of_week(t["order_date"]),
        "order_month_name": lambda t: F.month_name(t["order_date"]),
        "delivery_days": lambda t: F.date_diff_days(t["delivery_date"],
                                                    t["order_date"]),
        "effective_price": lambda t: F.effective_price(t["unit_price"],
                                                       t["discount_percent"]),
    }))
    p.add(maps.bucketize("total_amount", [500.0, 2000.0, 5000.0],
                         ["Low", "Medium", "High", "Premium"],
                         out="revenue_band"))
    p.add(maps.select(CURATED_COLUMNS))
    return p


def dq_config() -> checks.DQConfig:
    """The notebook's check set (notebooks/03_data_quality.py:333-358):
    status whitelist, discount range, null thresholds, dup rate."""
    return checks.DQConfig(
        min_rows=1,
        max_null_pct={"customer_id": 5.0, "category": 0.0},
        dup_keys=["order_id"],
        max_dup_pct=0.5,
        non_positive_cols=["quantity", "unit_price"],
        year_col="order_date", year_range=(2020, 2030),
        whitelist={"order_status": STATUS_WHITELIST},
        range_checks={"discount_percent": (0.0, 100.0)},
    )


def run(raw: ray.data.Dataset, num_partitions: int = 64,
        gate: bool = True) -> tuple[ray.data.Dataset, pa.Table, str]:
    """Transform + DQ. Returns (curated_ds, dq_report, overall_status).
    ``gate=True`` reproduces the orchestrator's abort-on-FAIL
    (notebooks/07_pipeline_orchestrator.py:250-252)."""
    ds = transform_pipeline(num_partitions).apply(raw)
    ds = ds.materialize()   # ST1: pin before the multi-pass DQ checks
    report, overall = checks.run_checks(ds, dq_config(), gate=gate)
    return ds, report, overall
