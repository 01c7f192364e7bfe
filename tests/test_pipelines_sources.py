"""Tests for sources (CSV parse modes S1, expansion S2, partitioned parquet
S5, DB sink S6/S9, JSON report S7) and the two composed pipelines (retail
src-variant incl. full lifecycle run_full, orders notebook-variant)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import TableSpec
from e_commerce_batch_etl_pipeline_ray.pipelines import orders, retail
from e_commerce_batch_etl_pipeline_ray.sources import (
    csv_source,
    db_sink,
    generators,
    memory,
    parquet_io,
)

CSV_SPEC = TableSpec("t", pa.schema([
    ("name", pa.string()), ("qty", pa.int32()), ("price", pa.float64()),
]))


def _write_csv(path, text):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


# --- S1 CSV parse modes ----------------------------------------------------

def test_csv_permissive_nulls_bad_values(tmp_path):
    p = _write_csv(tmp_path / "a.csv", "name,qty,price\nx,5,1.5\ny,notanint,2.0\nz,,3.5\n")
    out = sorted(csv_source.read_csv(p, CSV_SPEC, mode="PERMISSIVE").take_all(),
                 key=lambda r: r["name"])
    assert [r["qty"] for r in out] == [5, None, None]       # bad value -> null, row kept
    assert [r["name"] for r in out] == ["x", "y", "z"]


def test_csv_permissive_whitespace_padded_values(tmp_path):
    # ' 5 ' passes the prefilter regex but pyarrow's string->int cast rejects
    # padding; mixed with a genuinely bad value this used to fail the whole
    # read instead of nulling just the bad field (ADVICE r1).
    p = _write_csv(tmp_path / "ws.csv",
                   'name,qty,price\nx," 5 "," 1.5 "\ny,abc,2.0\n')
    out = sorted(csv_source.read_csv(p, CSV_SPEC, mode="PERMISSIVE").take_all(),
                 key=lambda r: r["name"])
    assert [r["qty"] for r in out] == [5, None]
    assert [r["price"] for r in out] == [1.5, 2.0]


def test_csv_failfast_raises(tmp_path):
    p = _write_csv(tmp_path / "b.csv", "name,qty,price\nx,notanint,1.0\n")
    with pytest.raises(Exception):
        csv_source.read_csv(p, CSV_SPEC, mode="FAILFAST").take_all()


def test_csv_dropmalformed_skips_bad_rows(tmp_path):
    # structurally malformed row (wrong column count) is dropped
    p = _write_csv(tmp_path / "c.csv", "name,qty,price\nx,5,1.5\nbad,row\ny,2,2.5\n")
    out = csv_source.read_csv(p, CSV_SPEC, mode="DROPMALFORMED").take_all()
    assert [r["name"] for r in out] == ["x", "y"]


def test_csv_multiline_quoted(tmp_path):
    p = _write_csv(tmp_path / "d.csv", 'name,qty,price\n"two\nlines",1,9.9\n')
    out = csv_source.read_csv(p, CSV_SPEC, mode="PERMISSIVE").take_all()
    assert out[0]["name"] == "two\nlines"


# --- S2 expansion ----------------------------------------------------------

def test_expand_to_target():
    ds = ray.data.from_arrow(pa.table({"x": list(range(10))}))
    assert memory.expand_to_target(ds, 25, current_rows=10).count() == 25
    assert memory.expand_to_target(ds, 4, current_rows=10).count() == 4


# --- S5/S7/S8 parquet + report --------------------------------------------

def test_partitioned_parquet_roundtrip(tmp_path):
    ds = ray.data.from_arrow(pa.table({
        "year": [2020, 2020, 2021], "v": [1.0, 2.0, 3.0]}))
    out = str(tmp_path / "pq")
    parquet_io.write_parquet_partitioned(ds, out, partition_cols=["year"])
    assert parquet_io.verify_parquet_roundtrip(out, 3)
    assert sorted(os.listdir(out)) == ["year=2020", "year=2021"]


def test_json_report_atomic(tmp_path):
    t = pa.table({"check_name": ["a"], "status": ["PASS"]})
    p = str(tmp_path / "rep" / "report.json")
    parquet_io.write_json_report(t, p)
    assert json.loads(open(p).read().strip()) == {"check_name": "a", "status": "PASS"}


# --- S6/S9 DB sink ---------------------------------------------------------

DDL = "CREATE TABLE IF NOT EXISTS t (k TEXT, v INTEGER, UNIQUE(k))"


def test_db_sink_batched_parallel_idempotent(tmp_path):
    db = str(tmp_path / "x.db")
    rows = [{"k": f"k{i}", "v": i} for i in range(1000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(8)
    n = db_sink.write_table(ds, db, "t", ["k", "v"], DDL,
                            batch_rows=100, concurrency=4)
    assert n == 1000
    got = db_sink.read_query(db, "SELECT COUNT(*) AS n, SUM(v) AS s FROM t")
    assert got["n"][0].as_py() == 1000
    # truncate-then-append idempotency: second run leaves the same state
    db_sink.write_table(ds, db, "t", ["k", "v"], DDL, mode="truncate",
                        batch_rows=100, concurrency=2)
    got2 = db_sink.read_query(db, "SELECT COUNT(*) AS n FROM t")
    assert got2["n"][0].as_py() == 1000


# --- retail pipeline lifecycle --------------------------------------------

def test_retail_run_full_lifecycle(tmp_path):
    out = str(tmp_path / "retail_out")
    s = retail.run_full(n_rows=5_000, target_rows=8_000, out_dir=out,
                        num_partitions=8)
    assert s["status"] == "SUCCESS" and s["dq_overall"] in ("PASS", "WARN")
    assert s["records_out"] > 3000
    assert os.path.exists(os.path.join(out, "dq_report.json"))
    assert os.path.exists(os.path.join(out, "run_log.jsonl"))
    # parquet partitioned by invoice_year
    pq_dir = os.path.join(out, "curated_parquet")
    assert any(d.startswith("invoice_year=") for d in os.listdir(pq_dir))
    # curated retention sanity: dedup + filters drop ~10-40%
    assert 0.4 < s["records_out"] / 8_000 < 1.0


def test_retail_curated_schema_contract():
    raw = generators.retail_raw(2_000)
    cur = retail.run(raw, num_partitions=8)
    names = cur.schema().names
    assert names == retail.CURATED_COLUMNS + ["region"]


# --- orders pipeline -------------------------------------------------------

def test_orders_pipeline_semantics():
    raw = generators.orders_raw(5_000)
    ds, report, overall = orders.run(raw, num_partitions=8, gate=False)
    df = ds.to_pandas()
    # contract
    assert list(df.columns) == orders.CURATED_COLUMNS
    # dedup: unique order ids
    assert df["order_id"].is_unique
    # business rules: positive qty/price
    assert (df["quantity"] > 0).all() and (df["unit_price"] > 0).all()
    # boolean cast
    assert df["is_premium_customer"].dtype == bool
    # fillna defaults
    assert df["category"].notna().all()
    # deriveds
    assert df["order_year"].between(2023, 2024).all()
    assert df["order_dayofweek"].between(1, 7).all()
    assert set(df["revenue_band"].unique()) <= {"Low", "Medium", "High", "Premium"}
    dd = df["delivery_days"].dropna()
    assert (dd >= 1).all() and (dd <= 15).all()
    # effective price respects discount
    disc = df[df["discount_percent"] > 0]
    assert (disc["effective_price"] < disc["unit_price"]).all()
    rep = {r["check_name"] for r in report.to_pylist()}
    assert "whitelist__order_status" in rep and "dup_pct" in rep


# --- JSONL source (beyond-reference: the standard text-corpus format) -------

from e_commerce_batch_etl_pipeline_ray.sources import jsonl_source  # noqa: E402

JSONL_SPEC = TableSpec("j", pa.schema([
    ("name", pa.string()), ("qty", pa.int32()), ("price", pa.float64()),
]))


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(path)


def test_jsonl_permissive_nulls_bad_fields_keeps_rows(tmp_path):
    p = _write_jsonl(tmp_path / "a.jsonl", [
        '{"name": "x", "qty": 5, "price": 1.5}',
        '{"name": "y", "qty": "notanint", "price": 2.0}',   # bad field -> null
        '{"name": "z"}',                                     # missing -> null
        'this is not json at all',                           # bad line -> null row
    ])
    out = jsonl_source.read_jsonl(p, JSONL_SPEC, mode="PERMISSIVE").take_all()
    assert len(out) == 4
    by = sorted(out, key=lambda r: (r["name"] is None, r["name"] or ""))
    assert by[0]["name"] == "x" and by[0]["qty"] == 5 and by[0]["price"] == 1.5
    assert by[1]["name"] == "y" and by[1]["qty"] is None and by[1]["price"] == 2.0
    assert by[2]["name"] == "z" and by[2]["qty"] is None
    assert by[3]["name"] is None                             # the bad line


def test_jsonl_dropmalformed_skips_bad_lines(tmp_path):
    p = _write_jsonl(tmp_path / "b.jsonl", [
        '{"name": "x", "qty": 1, "price": 0.5}',
        'garbage line',
        '{"name": "y", "qty": 2, "price": 1.0}',
    ])
    out = jsonl_source.read_jsonl(p, JSONL_SPEC, mode="DROPMALFORMED").take_all()
    assert sorted(r["name"] for r in out) == ["x", "y"]


def test_jsonl_failfast_raises_on_bad_value(tmp_path):
    p = _write_jsonl(tmp_path / "c.jsonl", [
        '{"name": "x", "qty": "NaNsense", "price": 1.0}',
    ])
    with pytest.raises(Exception):
        jsonl_source.read_jsonl(p, JSONL_SPEC, mode="FAILFAST").take_all()
