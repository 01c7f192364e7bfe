"""Value Bloom sidecars (CDCConfig.bloom_cols, keybloom v2): equality-scan
file skipping on non-key columns — pruning effectiveness, LWW safety over
LSM delta chains (a value updated away must stay invisible; a value only
in a delta must be found), rewrite inheritance, and v1 compatibility."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    engine,
    keybloom,
    lake,
    zorder,
)

SPEC = binlog.BinlogSpec(events_per_epoch=1000, n_repos=8, paths_per_repo=30,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1200)


def _engine(path, **kw):
    cfg = engine.CDCConfig(lake_dir=str(path), num_partitions=8,
                           merge_concurrency=2, bloom_cols=("commit",), **kw)
    return engine.CDCEngine(cfg)


def _scan(lake_dir, col, val):
    df = zorder.range_scan(lake_dir, {col: (val, val)}).to_pandas()
    if len(df):
        df = df.sort_values(["repo", "path"]).reset_index(drop=True)
    return df


def test_eq_scan_parity_and_pruning(tmp_path, ray_session):
    eng = _engine(tmp_path / "lake")
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    df = eng.read().to_pandas()
    needle = df.sort_values(["repo", "path"]).iloc[0]["commit"]
    plan = zorder.plan_range_scan(str(tmp_path / "lake"),
                                  {"commit": (needle, needle)})
    assert plan["files_pruned"] > 0          # a sha lives in ~1/8 partitions
    got = _scan(str(tmp_path / "lake"), "commit", needle)
    want = df[df["commit"] == needle].sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])
    # a value that never existed prunes (almost) everything — blooms admit
    # ~fpp false positives per file, and survivors are exactly masked
    plan = zorder.plan_range_scan(str(tmp_path / "lake"),
                                  {"commit": ("nope" * 10, "nope" * 10)})
    assert plan["files_pruned"] >= plan["files_total"] - 1 > 0
    assert len(_scan(str(tmp_path / "lake"), "commit", "nope" * 10)) == 0


def test_lsm_delta_chain_lww_safety(tmp_path, ray_session):
    eng = _engine(tmp_path / "lake", compact_interval=4)
    ev0 = pa.table({
        "lsn": pa.array([1, 2], pa.int64()),
        "op": pa.array(["I", "I"], pa.string()),
        "repo": pa.array(["a/r", "a/r"], pa.string()),
        "path": pa.array(["k1.py", "k2.py"], pa.string()),
        "commit": pa.array(["c_old", "c_keep"], pa.string()),
        "content": pa.array(["x", "y"], pa.string()),
    })
    eng.ingest_epoch(ray.data.from_arrow(ev0), 0)
    # delta epoch updates k1 AWAY from c_old and introduces c_new
    ev1 = pa.table({
        "lsn": pa.array([3], pa.int64()),
        "op": pa.array(["U"], pa.string()),
        "repo": pa.array(["a/r"], pa.string()),
        "path": pa.array(["k1.py"], pa.string()),
        "commit": pa.array(["c_new"], pa.string()),
        "content": pa.array(["z"], pa.string()),
    })
    eng.ingest_epoch(ray.data.from_arrow(ev1), 1)
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert any(r.get("deltas") for r in m["partitions"].values())
    # c_old exists only in the BASE, but k1's winner moved away — the
    # partition is NOT prunable (base bloom says may-contain) and the
    # exact mask must return nothing
    assert len(_scan(eng.cfg.lake_dir, "commit", "c_old")) == 0
    # a value born in the DELTA is found through the chain
    got = _scan(eng.cfg.lake_dir, "commit", "c_new")
    assert got["path"].tolist() == ["k1.py"]
    # a value in NO file prunes the whole chain (safe: no version of any
    # key ever carried it)
    plan = zorder.plan_range_scan(eng.cfg.lake_dir,
                                  {"commit": ("ghost", "ghost")})
    assert plan["files_pruned"] >= plan["files_total"] - 1 > 0


def test_rewrites_inherit_value_blooms(tmp_path, ray_session):
    eng = _engine(tmp_path / "lake")
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    zorder.optimize_zorder(eng.cfg.lake_dir, by=["lsn"])
    m = lake.read_manifest(eng.cfg.lake_dir,
                           lake.last_committed_epoch(eng.cfg.lake_dir))
    f = next(r["file"] for r in m["partitions"].values() if r.get("file"))
    assert keybloom.sidecar_value_cols([f]) == ("commit",)
    plan = zorder.plan_range_scan(eng.cfg.lake_dir,
                                  {"commit": ("ghost", "ghost")})
    assert plan["files_pruned"] >= plan["files_total"] - 1 > 0
    # the rename-alias probe keeps pruning after a rename of the column
    lake.rename_column(eng.cfg.lake_dir, "commit", "commit_sha")
    plan = zorder.plan_range_scan(eng.cfg.lake_dir,
                                  {"commit_sha": ("ghost", "ghost")})
    assert plan["files_pruned"] >= plan["files_total"] - 1 > 0


def test_v1_lakes_unaffected(tmp_path, ray_session):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2)          # no bloom_cols
    eng = engine.CDCEngine(cfg)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    df = eng.read().to_pandas()
    needle = df.iloc[0]["commit"]
    # no value blooms -> no eq pruning, result still exact
    plan = zorder.plan_range_scan(eng.cfg.lake_dir,
                                  {"commit": ("ghost", "ghost")})
    assert plan["files_pruned"] == 0
    got = _scan(eng.cfg.lake_dir, "commit", needle)
    want = df[df["commit"] == needle].sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])
    # point reads still work against v2 sidecars (key bloom untouched)
    eng2 = _engine(tmp_path / "v2lake")
    eng2.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    df2 = eng2.read().to_pandas()
    k = (df2.iloc[0]["repo"], df2.iloc[0]["path"])
    pr = lake.point_read(eng2.cfg.lake_dir, [k]).to_pandas()
    assert len(pr) == 1
