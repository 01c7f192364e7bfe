"""Metadata-only DROP COLUMN (cdc/lake.drop_column / undrop_column):
instant hide at read, strip at ingest, progressive physical removal on
compact rewrites, the retired-name contract (undrop only after a
verified full rewrite), restore reverting the drop, and the guards."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1200, n_repos=8, paths_per_repo=40,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=96, dup_lookback=1500)


def _engine(tmp_path, **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _state(ds, with_lang=False) -> dict:
    df = ds.to_pandas()
    return {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256)
            + ((getattr(r, "lang", None),) if with_lang else ())
            for r in df.itertuples()}


def test_drop_hides_instantly_and_time_travel_keeps_it(tmp_path,
                                                       ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    before = _state(eng.read())
    assert "lang" in eng.read().schema().names
    res = lake.drop_column(eng.cfg.lake_dir, "lang")
    assert res["epoch"] == 2
    t = eng.read()
    assert "lang" not in t.schema().names
    assert _state(t) == before                    # values untouched
    # zero data rewritten: the drop epoch re-references the same files
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    m2 = lake.read_manifest(eng.cfg.lake_dir, 2)
    assert m2["partitions"] == m1["partitions"]
    assert m2["lsn_watermark"] == m1["lsn_watermark"]
    # time travel to a pre-drop epoch still shows the column
    assert "lang" in eng.read(epoch=1).schema().names
    # point_read projects to the head schema too
    k = sorted(before)[0]
    pr = lake.point_read(eng.cfg.lake_dir, [k]).to_pandas()
    assert "lang" not in pr.columns and len(pr) == 1
    # the row-grain feed sees no change at the drop boundary
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    assert collect_arrow(feed.change_feed(eng.cfg.lake_dir, 2, 2)).num_rows \
        == 0


def test_ingest_after_drop_strips_and_rewrites_remove_bytes(tmp_path,
                                                            ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.drop_column(eng.cfg.lake_dir, "lang")
    # epoch 3 events still carry lang — stripped, never resurrected
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), eng.resume_point())
    t = eng.read()
    assert "lang" not in t.schema().names
    # parity: same three epochs into a fresh lake, minus the column
    ref = _engine(tmp_path / "ref")
    for ep in range(3):
        ref.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _state(t) == _state(ref.read())
    # compact rewrites physically removed the bytes from every partition
    # epoch 3 touched
    m = lake.read_manifest(eng.cfg.lake_dir, 3)
    touched = [r["file"] for r in m["partitions"].values()
               if r.get("file") and "epoch=0003" in r["file"]]
    assert touched
    for f in touched:
        assert "lang" not in pq.read_schema(f).names


def test_undrop_requires_full_rewrite_then_fresh_readdition(tmp_path,
                                                            ray_session):
    from e_commerce_batch_etl_pipeline_ray.cdc import zorder
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.drop_column(eng.cfg.lake_dir, "lang")
    with pytest.raises(ValueError, match="physical bytes"):
        lake.undrop_column(eng.cfg.lake_dir, "lang")
    # a full Z-order rewrite projects every file to the head schema —
    # the bytes are gone, the name is reusable
    zorder.optimize_zorder(eng.cfg.lake_dir, by=["lsn"])
    res = lake.undrop_column(eng.cfg.lake_dir, "lang")
    assert res["dropped_columns"] == []
    wm_before = lake.read_manifest(
        eng.cfg.lake_dir, lake.last_committed_epoch(eng.cfg.lake_dir)
    )["lsn_watermark"]
    # the next ingest re-adds lang as a FRESH additive column: rows the
    # new epoch wrote carry it, pre-existing surviving rows read as null
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), eng.resume_point())
    t = eng.read()
    assert "lang" in t.schema().names
    df = t.to_pandas()
    old = df[df["lsn"] <= wm_before]
    new = df[df["lsn"] > wm_before]
    assert len(old) and len(new)
    assert old["lang"].isna().all()
    assert new["lang"].notna().any()


def test_restore_reverts_drop(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    with_lang = _state(eng.read(), with_lang=True)
    lake.drop_column(eng.cfg.lake_dir, "lang")
    lake.restore(eng.cfg.lake_dir, 1)
    t = eng.read()
    assert "lang" in t.schema().names
    assert _state(t, with_lang=True) == with_lang
    m = lake.read_manifest(eng.cfg.lake_dir, 3)
    assert "dropped_columns" not in m


def test_guards(tmp_path, ray_session):
    eng = _engine(tmp_path)
    with pytest.raises(FileNotFoundError, match="empty lake"):
        lake.drop_column(eng.cfg.lake_dir, "lang")
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    for col in ("repo", "path", "lsn", "_deleted"):
        with pytest.raises(ValueError, match="key/protocol"):
            lake.drop_column(eng.cfg.lake_dir, col)
    with pytest.raises(ValueError, match="not in lake schema"):
        lake.drop_column(eng.cfg.lake_dir, "nope")
    with pytest.raises(ValueError, match="not dropped"):
        lake.undrop_column(eng.cfg.lake_dir, "lang")
