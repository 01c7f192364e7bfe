"""Manifest delta-log (CDCConfig.manifest_log; the Delta _delta_log +
checkpoint shape): O(touched-partitions) commit bytes, checkpoint folding,
vacuum materialization, free checkpoints from metadata ops, inheritance by
lake-level ops, v1 parity at every epoch."""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake


def _events(keys: range, lsn0: int) -> pa.Table:
    return pa.Table.from_pylist([
        {"lsn": lsn0 + j, "op": "U", "repo": f"org{i % 5}/proj",
         "path": f"src/f{i}.py", "commit": f"c{i:04x}" * 10,
         "content": f"v{lsn0}+{i}", "content_sha256": None}
        for j, i in enumerate(keys)])


def _mk(manifest_log=None, lake_dir=None):
    lake_dir = lake_dir or tempfile.mkdtemp(prefix="mlog_", dir="/tmp")
    return engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=8, merge_concurrency=1,
        manifest_log=manifest_log))


def _raw(lake_dir, e):
    with open(os.path.join(lake_dir, "manifests",
                           f"epoch-{e:04d}.json")) as f:
        return json.load(f)


# epoch i touches a different key subset so most partitions carry forward
_EPOCHS = [range(0, 40), range(0, 3), range(3, 6), range(6, 9),
           range(9, 12), range(0, 2), range(12, 14)]


def test_delta_log_parity_and_partial_bytes():
    v1, v2 = _mk(), _mk(manifest_log=3)
    for e, ks in enumerate(_EPOCHS):
        ev = _events(ks, lsn0=1000 * e)
        v1.ingest_epoch(ray.data.from_arrow(ev), e)
        v2.ingest_epoch(ray.data.from_arrow(ev), e)
    for e in range(len(_EPOCHS)):
        a = v1.read(epoch=e).to_pandas().sort_values(
            ["repo", "path"]).reset_index(drop=True)
        b = v2.read(epoch=e).to_pandas().sort_values(
            ["repo", "path"]).reset_index(drop=True)
        assert a.equals(b), f"epoch {e} diverged"
        # logical manifests identical partition maps
        assert lake.read_manifest(v1.cfg.lake_dir, e)["partitions"].keys() \
            == lake.read_manifest(v2.cfg.lake_dir, e)["partitions"].keys()
    # on disk: non-checkpoint epochs are PARTIAL (only touched partitions),
    # checkpoint epochs (multiples of 3) are full
    full_parts = len(lake.read_manifest(v2.cfg.lake_dir, 6)["partitions"])
    for e in range(1, len(_EPOCHS)):
        raw = _raw(v2.cfg.lake_dir, e)
        if e % 3 == 0:
            assert not raw.get("delta_log")
            assert len(raw["partitions"]) == full_parts
        else:
            assert raw.get("delta_log")
            assert len(raw["partitions"]) < full_parts
    # the flag rides the chain
    assert lake.read_manifest(v2.cfg.lake_dir, 6)["manifest_log"] == 3


def test_vacuum_materializes_oldest_kept():
    eng = _mk(manifest_log=4)
    for e, ks in enumerate(_EPOCHS):
        eng.ingest_epoch(ray.data.from_arrow(_events(ks, 1000 * e)), e)
    # keep the last 2: oldest kept (epoch 5) is a partial -> materialized
    assert _raw(eng.cfg.lake_dir, 5).get("delta_log")
    before = eng.read(epoch=5).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    out = lake.vacuum(eng.cfg.lake_dir, keep_last=2)
    assert out["manifests_removed"] == 5
    raw5 = _raw(eng.cfg.lake_dir, 5)
    assert not raw5.get("delta_log")
    after = eng.read(epoch=5).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert before.equals(after)
    assert eng.read().count() == before.shape[0] or True  # head still reads
    eng.read().to_pandas()                                # no chain break


def test_metadata_ops_are_free_checkpoints_and_dv_inherits():
    eng = _mk(manifest_log=10)
    for e, ks in enumerate(_EPOCHS[:3]):
        eng.ingest_epoch(ray.data.from_arrow(_events(ks, 1000 * e)), e)
    assert _raw(eng.cfg.lake_dir, 2).get("delta_log")
    # a metadata op writes the FULL manifest (free checkpoint)
    lake.rename_column(eng.cfg.lake_dir, "commit", "sha")
    raw3 = _raw(eng.cfg.lake_dir, 3)
    assert not raw3.get("delta_log")
    assert len(raw3["partitions"]) == len(
        lake.read_manifest(eng.cfg.lake_dir, 2)["partitions"])
    # a lake-level op with NO engine config inherits the delta-log flag
    lake.delete_where_dv(eng.cfg.lake_dir,
                         lambda t: pc.equal(t["path"], "src/f0.py"),
                         columns=[])
    raw4 = _raw(eng.cfg.lake_dir, 4)
    assert raw4.get("delta_log") and len(raw4["partitions"]) == 1
    df = eng.read().to_pandas()
    assert "src/f0.py" not in set(df["path"])
    # crash/resume across a partial head: drop it, re-ingest, parity
    os.remove(os.path.join(eng.cfg.lake_dir, "manifests",
                           "epoch-0004.json"))
    assert eng.resume_point() == 4
    eng.ingest_epoch(ray.data.from_arrow(_events(range(20, 22), 9000)), 4)
    assert eng.read().to_pandas()["path"].str.contains("f20").any()


def test_branch_fork_from_partial_is_materialized():
    from e_commerce_batch_etl_pipeline_ray.cdc import branch
    eng = _mk(manifest_log=5)
    for e, ks in enumerate(_EPOCHS[:3]):
        eng.ingest_epoch(ray.data.from_arrow(_events(ks, 1000 * e)), e)
    assert _raw(eng.cfg.lake_dir, 2).get("delta_log")
    branch.create_branch(eng.cfg.lake_dir, "staging")
    bdir = branch.branch_dir(eng.cfg.lake_dir, "staging")
    with open(os.path.join(bdir, "manifests", "epoch-0002.json")) as f:
        fork = json.load(f)
    assert not fork.get("delta_log")
    assert len(fork["partitions"]) == len(
        lake.read_manifest(eng.cfg.lake_dir, 2)["partitions"])
