"""CLONE TABLE (lake.clone_lake): instant independent copy — hardlinked
zero-copy files, full read parity, two-way independence (ingest and vacuum
on either side never affect the other), LSM chains, crash re-run."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1000, n_repos=8, paths_per_repo=30,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1200)


def _engine(path, **kw):
    cfg = engine.CDCConfig(lake_dir=str(path), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _df(lake_dir, **kw):
    df = lake.read_lake(lake_dir, **kw).to_pandas()
    if len(df) == 0:
        return df
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_clone_parity_zero_copy_and_independence(tmp_path, ray_session):
    src = _engine(tmp_path / "src")
    for ep in range(2):
        src.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    snap = _df(src.cfg.lake_dir)
    res = lake.clone_lake(src.cfg.lake_dir, str(tmp_path / "dst"))
    assert res["epoch"] == 1 and res["files_linked"] > 0
    assert _df(str(tmp_path / "dst")).equals(snap)
    # zero-copy: the clone's files share inodes with the source
    m = lake.read_manifest(str(tmp_path / "dst"), 1)
    f = next(r["file"] for r in m["partitions"].values() if r.get("file"))
    assert os.stat(f).st_nlink >= 2
    # kbloom sidecars came along (point reads stay pruned)
    assert os.path.exists(f + ".kbloom")
    # independence: divergent ingest on EACH side is invisible to the other
    dst = _engine(tmp_path / "dst")
    assert dst.resume_point() == 2
    src.ingest_epoch(binlog.gen_epoch(SPEC, 2), 2)
    assert _df(dst.cfg.lake_dir).equals(snap)
    dst.delete_where(lambda t: pc.is_valid(t["repo"]), dst.resume_point())
    assert len(_df(dst.cfg.lake_dir)) == 0
    assert len(_df(src.cfg.lake_dir)) > len(snap) - 5
    # vacuum on the source cannot tear the clone (hardlinked inodes)
    lake.vacuum(src.cfg.lake_dir, keep_last=1)
    dstm = lake.read_manifest(dst.cfg.lake_dir, 1)
    for rec in dstm["partitions"].values():
        for p in ([rec["file"]] if rec.get("file") else []) \
                + list(rec.get("deltas", [])):
            assert os.path.exists(p)


def test_clone_lsm_chain_and_guards(tmp_path, ray_session):
    src = _engine(tmp_path / "src", compact_interval=3)
    for ep in range(2):
        src.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    m = lake.read_manifest(src.cfg.lake_dir, 1)
    assert any(r.get("deltas") for r in m["partitions"].values())
    lake.clone_lake(src.cfg.lake_dir, str(tmp_path / "dst"))
    assert _df(str(tmp_path / "dst")).equals(_df(src.cfg.lake_dir))
    # guards: empty source, occupied destination
    with pytest.raises(FileNotFoundError, match="empty lake"):
        lake.clone_lake(str(tmp_path / "nope"), str(tmp_path / "x"))
    with pytest.raises(FileExistsError, match="already holds"):
        lake.clone_lake(src.cfg.lake_dir, str(tmp_path / "dst"))


def test_clone_crash_rerun_finishes(tmp_path, ray_session):
    src = _engine(tmp_path / "src")
    for ep in range(2):
        src.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    dst = str(tmp_path / "dst")
    # simulate a crash: links happened but the manifest commit did not
    try:
        real = lake._commit_json
        lake._commit_json = lambda *a, **k: (_ for _ in ()).throw(
            OSError("crash"))
        with pytest.raises(OSError):
            lake.clone_lake(src.cfg.lake_dir, dst)
    finally:
        lake._commit_json = real
    assert lake.last_committed_epoch(dst) is None    # invisible
    res = lake.clone_lake(src.cfg.lake_dir, dst)     # re-run completes
    assert res["epoch"] == 1
    assert _df(dst).equals(_df(src.cfg.lake_dir))
