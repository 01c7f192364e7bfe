"""Metadata-only table stats (lake.table_stats): COUNT/MIN/MAX answered
from the manifest without opening data files on compacted lakes, exact
fallback reads for LSM delta chains, and parity through every rewrite
path (optimize, zorder, MERGE, delete_where, purge, bootstrap)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake
from e_commerce_batch_etl_pipeline_ray.cdc.merge import merge_into

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=6, paths_per_repo=30,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2000)


def _brute(lake_dir):
    df = lake.read_lake(lake_dir).to_pandas()
    return {"rows": len(df), "min_lsn": int(df["lsn"].min()),
            "max_lsn": int(df["lsn"].max())}


def _assert_matches(lake_dir, *, metadata_only=None):
    st = lake.table_stats(lake_dir)
    b = _brute(lake_dir)
    assert st["rows"] == b["rows"]
    assert st["min"]["lsn"] == b["min_lsn"]
    assert st["max"]["lsn"] == b["max_lsn"]
    if metadata_only is True:
        assert st["partitions_read"] == 0
    elif metadata_only is False:
        assert st["partitions_read"] > 0
    return st


@pytest.mark.parametrize("backend", ["map_groups", "actor_pool"])
def test_compact_lake_is_pure_metadata(tmp_path, ray_session, backend):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2, backend=backend, cache_partitions=False))
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    st = _assert_matches(eng.cfg.lake_dir, metadata_only=True)
    assert st["partitions_from_metadata"] == st["partitions_total"]
    # tombstones must NOT count: rows_total (incl. tombstones) > live rows
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert sum(r["rows_total"] for r in m["partitions"].values()) > st["rows"]


def test_lsm_deltas_fall_back_then_optimize_restores(tmp_path, ray_session):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2, compact_interval=3))
    for ep in range(2):                     # epoch 1 is a delta epoch
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    _assert_matches(eng.cfg.lake_dir, metadata_only=False)
    lake.optimize(eng.cfg.lake_dir)         # on-demand compaction
    _assert_matches(eng.cfg.lake_dir, metadata_only=True)


def test_survives_zorder_merge_delete_purge(tmp_path, ray_session):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    ld = eng.cfg.lake_dir

    from e_commerce_batch_etl_pipeline_ray.cdc import zorder
    zorder.optimize_zorder(ld, by=["lsn"])
    _assert_matches(ld, metadata_only=True)

    # MERGE INTO (insert a new key + update an existing one)
    row = lake.read_lake(ld).take(1)[0]
    wm = lake.read_manifest(ld, lake.last_committed_epoch(ld))["lsn_watermark"]
    src = ray.data.from_arrow(pa.table({
        "lsn": pa.array([wm + 1, wm + 2], pa.int64()),
        "repo": pa.array([row["repo"], "brand-new-repo"], pa.string()),
        "path": pa.array([row["path"], "brand/new/file.py"], pa.string()),
        "commit": pa.array(["m1", "m2"], pa.string()),
        "content": pa.array(["updated", "inserted"], pa.string()),
        "content_sha256": pa.array(["x", "y"], pa.string()),
    }))
    merge_into(ld, src, merge_concurrency=2)
    st = _assert_matches(ld, metadata_only=True)
    assert st["max"]["lsn"] == wm + 2

    # delete_where rides the standard compact epoch
    eng.delete_where(lambda t: pc.equal(t["repo"], "brand-new-repo"),
                     lake.last_committed_epoch(ld) + 1, columns=["repo"])
    _assert_matches(ld, metadata_only=True)

    # purge invalidates live metadata on touched partitions -> fallback,
    # still exact
    lake.purge_keys(ld, [(row["repo"], row["path"])])
    _assert_matches(ld, metadata_only=False)


def test_bootstrap_records_metadata(tmp_path, ray_session):
    t = binlog.gen_epoch_table(SPEC, 0)
    snap = (t.filter(pc.equal(t["op"], "I"))
            .group_by(["repo", "path"]).aggregate([("lsn", "max")]))
    base = (t.join(snap.rename_columns(["repo", "path", "lsn"]),
                   keys=["repo", "path", "lsn"])
            .drop_columns(["op", "lsn"]))
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2))
    eng.bootstrap(ray.data.from_arrow(base).repartition(4),
                  lsn0=int(pc.max(t["lsn"]).as_py()))
    _assert_matches(eng.cfg.lake_dir, metadata_only=True)
