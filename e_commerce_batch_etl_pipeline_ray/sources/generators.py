"""S3/S4 — deterministic, distributed synthetic data generators.

The reference generates dirty data single-threaded with random.seed(42)
(data/sample/generate_sample.py:14-143: 1% null descriptions, 0.5% null
prices, 2% 'C'-prefixed cancellations, 10% negative qty, 3% injected
duplicates, UK=52% country skew; notebooks/01_data_ingestion.py:77-165:
5% duplicate order_ids, two date formats). ~2-3 min for 500K rows.

Here generation is ``ray.data.range(n).map_batches(gen)`` — parallel and
**order-independent deterministic**: every field is a pure function of the
row id through a counter-based splitmix64 hash, so the same (seed, id) gives
the same row no matter how blocks/batches are split. This same pattern drives
the CDC binlog generator (cdc/binlog.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the per-row counter-based RNG."""
    x = x.astype(_U64)
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        x = x ^ (x >> _U64(31))
    return x


def rng_streams(ids: np.ndarray, seed: int, stream: int) -> np.ndarray:
    """Independent u64 stream per (seed, stream, id)."""
    with np.errstate(over="ignore"):
        base = splitmix64(np.asarray([seed], dtype=np.uint64)
                          + _U64(stream) * _U64(0x9E3779B97F4A7C15))[0]
    return splitmix64(ids.astype(_U64) ^ base)


def uniform(ids, seed, stream) -> np.ndarray:
    """U[0,1) per id."""
    return (rng_streams(ids, seed, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def choice(ids, seed, stream, values: list, weights: list[float] | None = None) -> np.ndarray:
    u = uniform(ids, seed, stream)
    if weights is None:
        idx = (u * len(values)).astype(np.int64).clip(0, len(values) - 1)
    else:
        cum = np.cumsum(np.asarray(weights, dtype=np.float64))
        cum = cum / cum[-1]
        idx = np.searchsorted(cum, u, side="right").clip(0, len(values) - 1)
    return np.asarray(values, dtype=object)[idx]


# ---------------------------------------------------------------------------
# Retail (Online Retail II shape) — FIXTURES.md F3

_COUNTRIES = ["United Kingdom", "Germany", "France", "Netherlands", "Ireland",
              "Spain", "Italy", "Belgium", "Unspecified", "Australia"]
_COUNTRY_W = [0.52, 0.10, 0.09, 0.06, 0.06, 0.05, 0.04, 0.03, 0.02, 0.03]
_DESCRIPTIONS = ["WHITE HANGING HEART HOLDER", "REGENCY CAKESTAND", "JUMBO BAG RED",
                 "PARTY BUNTING", "LUNCH BAG BLACK", "ASSORTED COLOUR BIRD",
                 "SET OF 3 CAKE TINS", "PACK OF 72 CAKE CASES"]

RETAIL_RAW_SCHEMA = pa.schema([
    ("Invoice", pa.string()), ("StockCode", pa.string()),
    ("Description", pa.string()), ("Quantity", pa.int32()),
    ("InvoiceDate", pa.string()), ("Price", pa.float64()),
    ("Customer ID", pa.string()), ("Country", pa.string()),
])


def _retail_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch["id"].to_numpy()
    n = len(ids)
    # ~3% duplicate rows: map a dup row's id onto an earlier id -> identical row
    is_dup = uniform(ids, seed, 99) < 0.03
    eff = np.where(is_dup & (ids > 100), ids - (rng_streams(ids, seed, 98) % _U64(100)).astype(np.int64) - 1, ids)

    invoice_num = 489000 + (eff // 3)
    cancel = uniform(eff, seed, 1) < 0.02
    invoice = np.where(cancel, "C", "").astype(object) + np.char.mod("%d", invoice_num).astype(object)
    stock = np.char.mod("%05d", 10000 + (rng_streams(eff, seed, 2) % _U64(4000)).astype(np.int64))
    desc = choice(eff, seed, 3, _DESCRIPTIONS).astype(object)
    desc[uniform(eff, seed, 4) < 0.01] = None
    qty = 1 + (rng_streams(eff, seed, 5) % _U64(48)).astype(np.int64)
    qty = np.where(uniform(eff, seed, 6) < 0.10, -qty, qty).astype(np.int32)
    # dates in 2010-2011, "M/d/yyyy H:mm"
    day_off = (rng_streams(eff, seed, 7) % _U64(730)).astype(np.int64)
    base = np.datetime64("2010-01-04") + day_off.astype("timedelta64[D]")
    hours = 6 + (rng_streams(eff, seed, 8) % _U64(14)).astype(np.int64)
    mins = (rng_streams(eff, seed, 9) % _U64(60)).astype(np.int64)
    ymd = np.datetime_as_string(base)  # "2010-01-04"
    y = np.char.ljust(ymd, 4).astype(object)
    m = [s[5:7].lstrip("0") for s in ymd]
    d = [s[8:10].lstrip("0") for s in ymd]
    yy = [s[0:4] for s in ymd]
    date_str = np.array([f"{mm}/{dd}/{yyyy} {hh}:{mi:02d}" for mm, dd, yyyy, hh, mi
                         in zip(m, d, yy, hours, mins)], dtype=object)
    price = np.round(0.5 + uniform(eff, seed, 10) * 120.0, 2)
    price_obj = price.astype(object)
    price_obj[uniform(eff, seed, 11) < 0.005] = None
    neg_price = uniform(eff, seed, 17) < 0.01
    price_obj = np.where(neg_price, [-p if p is not None else None for p in price_obj], price_obj)
    cust = np.char.mod("%d", 12000 + (rng_streams(eff, seed, 12) % _U64(4000)).astype(np.int64)).astype(object)
    cust[uniform(eff, seed, 13) < 0.24] = None
    country = choice(eff, seed, 14, _COUNTRIES, _COUNTRY_W)
    return pa.table({
        "Invoice": pa.array(invoice, pa.string()),
        "StockCode": pa.array(stock.astype(object), pa.string()),
        "Description": pa.array(desc, pa.string()),
        "Quantity": pa.array(qty, pa.int32()),
        "InvoiceDate": pa.array(date_str, pa.string()),
        "Price": pa.array(price_obj, pa.float64()),
        "Customer ID": pa.array(cust, pa.string()),
        "Country": pa.array(country.astype(object), pa.string()),
    })


def retail_raw(n_rows: int, seed: int = 42, **range_kwargs) -> ray.data.Dataset:
    """Distributed deterministic dirty retail table (FIXTURES.md F3)."""
    return ray.data.range(n_rows, **range_kwargs).map_batches(
        lambda b: _retail_batch(b, seed), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Orders (notebook variant) — FIXTURES.md F4

_CATEGORIES = ["Electronics", "Clothing", "Home", "Books", "Toys", "Sports", None]
_STATUS = ["delivered", "shipped", "processing", "cancelled", "returned"]
_PAYMENT = ["credit_card", "debit_card", "paypal", "cod"]
_COUNTRIES2 = ["USA", "UK", "Germany", "India", "Canada"]

ORDERS_RAW_SCHEMA = pa.schema([
    ("order_id", pa.string()), ("customer_id", pa.string()),
    ("product_id", pa.string()), ("product_name", pa.string()),
    ("category", pa.string()), ("quantity", pa.int32()),
    ("unit_price", pa.float64()), ("total_amount", pa.float64()),
    ("order_date", pa.string()), ("delivery_date", pa.string()),
    ("payment_method", pa.string()), ("order_status", pa.string()),
    ("customer_country", pa.string()), ("is_premium_customer", pa.string()),
    ("discount_percent", pa.float64()), ("shipping_cost", pa.float64()),
])


def _orders_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch["id"].to_numpy()
    # 5% duplicate order_ids drawn from a virtual pool of earlier ids
    dup = uniform(ids, seed, 50) < 0.05
    eff = np.where(dup & (ids > 50), ids - (rng_streams(ids, seed, 51) % _U64(50)).astype(np.int64) - 1, ids)
    order_id = np.char.mod("ORD%08d", eff).astype(object)
    customer = np.char.mod("CUST%05d", (rng_streams(ids, seed, 52) % _U64(20000)).astype(np.int64)).astype(object)
    customer[uniform(ids, seed, 53) < 0.02] = None
    product_i = (rng_streams(ids, seed, 54) % _U64(1000)).astype(np.int64)
    product_id = np.char.mod("PROD%04d", product_i).astype(object)
    product_name = np.char.mod("Product %d", product_i).astype(object)
    category = choice(ids, seed, 55, _CATEGORIES)
    qty = (1 + rng_streams(ids, seed, 56) % _U64(10)).astype(np.int32)
    qty = np.where(uniform(ids, seed, 64) < 0.01, None, qty.astype(object))
    price = np.round(1.0 + uniform(ids, seed, 57) * 499.0, 2)
    price = np.where(uniform(ids, seed, 58) < 0.02, -price, price)
    day_off = (rng_streams(ids, seed, 59) % _U64(365)).astype(np.int64)
    od = np.datetime64("2023-01-01T08:00:00") + day_off.astype("timedelta64[D]") \
        + (rng_streams(ids, seed, 60) % _U64(36000)).astype("timedelta64[s]")
    dd = od + (1 + rng_streams(ids, seed, 61) % _U64(14)).astype("timedelta64[D]")
    order_date = np.datetime_as_string(od.astype("datetime64[s]"), unit="s")
    order_date = np.char.replace(order_date, "T", " ").astype(object)
    delivery_date = np.char.replace(
        np.datetime_as_string(dd.astype("datetime64[s]"), unit="s"), "T", " ").astype(object)
    delivery_date[uniform(ids, seed, 62) < 0.05] = None
    qty_arr = pa.array(list(qty), pa.int32())
    total = []
    for q, p in zip(qty_arr.to_pylist(), price):
        total.append(round(q * p, 2) if q is not None else None)
    disc = np.round(choice(ids, seed, 63, [0.0, 5.0, 10.0, 15.0, 20.0]).astype(np.float64), 1)
    disc_obj = disc.astype(object)
    disc_obj[uniform(ids, seed, 65) < 0.03] = None
    premium = choice(ids, seed, 66, ["true", "false", "True", "FALSE", None],
                     [0.2, 0.55, 0.1, 0.1, 0.05])
    return pa.table({
        "order_id": pa.array(order_id, pa.string()),
        "customer_id": pa.array(customer, pa.string()),
        "product_id": pa.array(product_id, pa.string()),
        "product_name": pa.array(product_name, pa.string()),
        "category": pa.array(category.astype(object), pa.string()),
        "quantity": qty_arr,
        "unit_price": pa.array(price, pa.float64()),
        "total_amount": pa.array(total, pa.float64()),
        "order_date": pa.array(order_date, pa.string()),
        "delivery_date": pa.array(delivery_date, pa.string()),
        "payment_method": pa.array(choice(ids, seed, 67, _PAYMENT).astype(object), pa.string()),
        "order_status": pa.array(choice(ids, seed, 68, _STATUS).astype(object), pa.string()),
        "customer_country": pa.array(choice(ids, seed, 69, _COUNTRIES2).astype(object), pa.string()),
        "is_premium_customer": pa.array(premium, pa.string()),
        "discount_percent": pa.array(disc_obj, pa.float64()),
        "shipping_cost": pa.array(np.round(uniform(ids, seed, 70) * 25.0, 2), pa.float64()),
    })


def orders_raw(n_rows: int, seed: int = 42, **range_kwargs) -> ray.data.Dataset:
    """Distributed deterministic dirty orders table (FIXTURES.md F4)."""
    return ray.data.range(n_rows, **range_kwargs).map_batches(
        lambda b: _orders_batch(b, seed), batch_format="pyarrow")


def orders_raw_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Driver-side materialized orders_raw — every row is a pure function of
    its index, so this equals the distributed generator at any parallelism
    (used to share one parquet fixture between the Ray pipeline and its
    DuckDB oracle)."""
    ids = pa.table({"id": pa.array(np.arange(n_rows, dtype=np.int64))})
    return _orders_batch(ids, seed)
