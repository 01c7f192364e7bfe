"""DQ gate on CDC ingest: a failing epoch aborts BEFORE any merge work
(lake untouched), the report persists next to the manifests either way,
and gate-off mode records the failure but commits."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake
from e_commerce_batch_etl_pipeline_ray.quality.checks import (
    DataQualityError,
    DQConfig,
)

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64)

DQ = DQConfig(min_rows=10,
              max_null_pct={"repo": 0.0, "path": 0.0},
              whitelist={"op": ["I", "U", "D"]})


def _eng(tmp_path, **kw):
    return engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=8,
        merge_concurrency=2, dq=DQ, **kw))


def _bad_epoch() -> "ray.data.Dataset":
    import ray.data
    t = binlog.gen_epoch_table(SPEC, 1)
    ops = t["op"].to_pylist()
    for i in range(0, len(ops), 3):
        ops[i] = "X"                        # corrupt a third of the ops
    t = t.set_column(t.column_names.index("op"), "op",
                     pa.array(ops, pa.string()))
    return ray.data.from_arrow(t).repartition(4)


def test_clean_epochs_pass_and_report_persists(tmp_path):
    eng = _eng(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    p = os.path.join(str(tmp_path / "lake"), lake.MANIFEST_DIR,
                     "dq-epoch-0000.json")
    rep = json.load(open(p))
    assert rep["status"] in ("PASS", "WARN")
    assert any(r["check_name"] == "whitelist__op" for r in rep["report"])
    assert lake.last_committed_epoch(str(tmp_path / "lake")) == 0


def test_failing_epoch_aborts_without_commit(tmp_path):
    eng = _eng(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    with pytest.raises(DataQualityError, match="failed the DQ gate"):
        eng.ingest_epoch(_bad_epoch(), 1)
    # lake untouched: still at epoch 0, no epoch-1 debris that resume
    # would not clean
    assert lake.last_committed_epoch(str(tmp_path / "lake")) == 0
    assert eng.resume_point() == 1
    # the failing report is preserved for debugging
    rep = json.load(open(os.path.join(str(tmp_path / "lake"),
                                      lake.MANIFEST_DIR,
                                      "dq-epoch-0001.json")))
    assert rep["status"] == "FAIL"
    fails = [r for r in rep["report"] if r["status"] == "FAIL"]
    assert any(r["check_name"] == "whitelist__op" for r in fails)


def test_gate_off_records_fail_but_commits(tmp_path):
    eng = _eng(tmp_path, dq_gate=False)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    eng.ingest_epoch(_bad_epoch(), 1)
    assert lake.last_committed_epoch(str(tmp_path / "lake")) == 1
    rep = json.load(open(os.path.join(str(tmp_path / "lake"),
                                      lake.MANIFEST_DIR,
                                      "dq-epoch-0001.json")))
    assert rep["status"] == "FAIL"


def test_bootstrap_runs_the_same_gate(tmp_path):
    """bootstrap() accepts raw rows and must honor CDCConfig.dq exactly
    like ingest_epoch: FAIL aborts with the lake EMPTY (no epoch 0), the
    report persists as dq-bootstrap-0000.json, and a clean snapshot then
    bootstraps normally (with its PASS report)."""
    import ray.data

    dq = DQConfig(min_rows=10, max_null_pct={"repo": 0.0, "path": 0.0})
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=8,
        merge_concurrency=2, dq=dq))
    bad = ray.data.from_arrow(pa.table({
        "repo": pa.array(["r0", None, "r2"] * 10, pa.string()),
        "path": pa.array([f"p{i}" for i in range(30)], pa.string()),
        "content_sha256": pa.array(["x" * 64] * 30, pa.string()),
    }))
    with pytest.raises(DataQualityError, match="bootstrap 0 failed"):
        eng.bootstrap(bad, lsn0=100)
    assert lake.last_committed_epoch(str(tmp_path / "lake")) is None
    rep = json.load(open(os.path.join(str(tmp_path / "lake"),
                                      lake.MANIFEST_DIR,
                                      "dq-bootstrap-0000.json")))
    assert rep["status"] == "FAIL"

    good = ray.data.from_arrow(pa.table({
        "repo": pa.array([f"r{i % 3}" for i in range(30)], pa.string()),
        "path": pa.array([f"p{i}" for i in range(30)], pa.string()),
        "content_sha256": pa.array(["x" * 64] * 30, pa.string()),
    }))
    st = eng.bootstrap(good, lsn0=100)
    assert st.events_in == 30
    assert lake.last_committed_epoch(str(tmp_path / "lake")) == 0
    rep = json.load(open(os.path.join(str(tmp_path / "lake"),
                                      lake.MANIFEST_DIR,
                                      "dq-bootstrap-0000.json")))
    assert rep["status"] in ("PASS", "WARN")


def test_replicate_plumbs_the_gate_and_cursor_stays_put(tmp_path):
    """replicate(dq=...) gates the reconstructed events on the DESTINATION
    engine: on FAIL the replica is untouched AND the feed cursor does not
    advance, so the same batch re-drains once the gate passes."""
    from e_commerce_batch_etl_pipeline_ray.cdc import feed

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "cursor.json")
    src_eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=src, num_partitions=8, merge_concurrency=2))
    src_eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)

    impossible = DQConfig(min_rows=10**9)
    with pytest.raises(DataQualityError, match="failed the DQ gate"):
        feed.replicate(src, dst, state, merge_concurrency=2, dq=impossible)
    assert lake.last_committed_epoch(dst) is None
    assert not os.path.exists(state)        # cursor did not advance

    # same batch re-drains under a passing gate
    out = feed.replicate(src, dst, state, merge_concurrency=2, dq=DQ)
    assert out["epochs_applied"] == 1 and out["events"] > 0
    assert lake.last_committed_epoch(dst) == 0
    rep = json.load(open(os.path.join(dst, lake.MANIFEST_DIR,
                                      "dq-epoch-0000.json")))
    assert rep["status"] in ("PASS", "WARN")
