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
    p.add(dedup.dedup_keyed(["invoice_id", "stock_code"],
                            order_by=["invoice_date"], descending=False,
                            num_partitions=num_partitions))
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
