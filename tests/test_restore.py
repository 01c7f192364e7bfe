"""RESTORE (rollback) of the CDC lake — cdc/lake.restore, the Delta
`RESTORE TABLE t TO VERSION AS OF k` shape: metadata-only rollback
commit. Pins: restored read == as-of read (incl. the schema-evolution
revert), time travel through the boundary, stream continuation (replay
after rollback lands exactly on the original head), the change feed's
inverse diff + apply_feed roundtrip, vacuum keeping re-referenced files,
LSM-chain restore, preserved lsn watermark (delete_where still mints a
fresh lsn), and the guards."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=50,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=128, dup_lookback=2000)


def _engine(tmp_path, sub="lake", **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / sub), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _state(ds) -> dict:
    df = ds.to_pandas()
    return {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256,
                               getattr(r, "lang", None))
            for r in df.itertuples()}


def test_restore_read_equals_as_of_and_schema_reverts(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    as_of_1 = _state(eng.read(epoch=1))
    head_before = _state(eng.read())
    res = lake.restore(eng.cfg.lake_dir, 1)
    assert res["epoch"] == 3 and res["restored_from"] == 1
    assert _state(eng.read()) == as_of_1
    # time travel to the pre-restore head still works (manifests immutable)
    assert _state(eng.read(epoch=2)) == head_before

    # schema-evolution revert: epoch 0 predates `lang`
    lake.restore(eng.cfg.lake_dir, 0)
    t = eng.read()
    assert "lang" not in t.schema().names
    assert _state(t) == _state(eng.read(epoch=0))


def test_replay_after_rollback_lands_on_original_head(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    head = _state(eng.read())
    head_wm = lake.read_manifest(eng.cfg.lake_dir, 1)["lsn_watermark"]
    lake.restore(eng.cfg.lake_dir, 0)
    m = lake.read_manifest(eng.cfg.lake_dir, 2)
    # stream position never rewinds
    assert m["lsn_watermark"] == head_wm
    # re-deliver epoch 1 as the next epoch: exact original head state
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), eng.resume_point())
    assert _state(eng.read()) == head


def test_feed_inverse_diff_and_apply_roundtrip(tmp_path, ray_session):
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    eng = _engine(tmp_path)
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.restore(eng.cfg.lake_dir, 1)

    # apply the restore epoch's feed onto the pre-restore head snapshot:
    # must reconstruct the restored state (the feed at the rollback
    # boundary IS the inverse of the undone epochs' changes)
    by_key = [("repo", "ascending"), ("path", "ascending")]
    head_snap = collect_arrow(
        lake.read_lake(eng.cfg.lake_dir, epoch=2)).sort_by(by_key)
    restored = collect_arrow(
        lake.read_lake(eng.cfg.lake_dir, epoch=3)).sort_by(by_key)
    f = collect_arrow(feed.change_feed(eng.cfg.lake_dir, 3, 3))
    assert f.num_rows > 0          # the rollback IS a change set
    got = feed.apply_feed(head_snap, f)
    assert got.select(restored.column_names).cast(restored.schema) \
        .sort_by(by_key).equals(restored)


def test_vacuum_keeps_restored_files_and_restore_window_guard(
        tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    as_of_0 = _state(eng.read(epoch=0))
    lake.restore(eng.cfg.lake_dir, 0)
    lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    # the restore manifest re-references epoch-0 files: still readable
    assert _state(eng.read()) == as_of_0
    # the target manifests are gone now — restoring into the vacuumed
    # window must refuse with a clear error
    with pytest.raises(FileNotFoundError, match="vacuum"):
        lake.restore(eng.cfg.lake_dir, 1)


def test_restore_partition_born_after_target_is_emptied(tmp_path,
                                                        ray_session):
    """A key whose partition got its FIRST file after the target epoch
    must disappear on restore (explicit empty record, not a missing pid)
    — and the feed must see its deletion."""
    import hashlib

    def ev(lsn, repo, path):
        c = f"v{lsn}"
        return {"lsn": lsn, "op": "I", "repo": repo, "path": path,
                "commit": f"c{lsn}", "lang": None, "content": c,
                "content_sha256": hashlib.sha256(c.encode()).hexdigest()}

    def to_ds(rows):
        return ray.data.from_arrow(
            pa.Table.from_pylist(rows, schema=binlog.EVENT_SCHEMA_V2))

    eng = _engine(tmp_path)
    eng.ingest_epoch(to_ds([ev(1, "r1", "a.py")]), 0)
    # many distinct keys in epoch 1 -> some land in partitions epoch 0
    # never touched
    eng.ingest_epoch(to_ds([ev(10 + i, "r2", f"f{i}.py")
                            for i in range(32)]), 1)
    m0 = lake.read_manifest(eng.cfg.lake_dir, 0)
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert len(m1["partitions"]) > len(m0["partitions"])
    lake.restore(eng.cfg.lake_dir, 0)
    m2 = lake.read_manifest(eng.cfg.lake_dir, 2)
    # every pid head knew about is present (empty, not absent)
    assert set(m2["partitions"]) == set(m1["partitions"])
    assert _state(eng.read()) == {("r1", "a.py"): (1, "c1", ev(1, "r1", "a.py")["content_sha256"], None)}
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    f = collect_arrow(feed.change_feed(eng.cfg.lake_dir, 2, 2)).to_pandas()
    assert set(f[f["_change_type"] == "delete"]["repo"]) == {"r2"}
    assert len(f[f["_change_type"] == "delete"]) == 32


def test_restore_lsm_chain_and_table_stats(tmp_path, ray_session):
    eng = _engine(tmp_path, compact_interval=3)
    for ep in range(4):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    as_of_1 = _state(eng.read(epoch=1))       # epoch 1 is an LSM delta
    lake.restore(eng.cfg.lake_dir, 1)
    assert _state(eng.read()) == as_of_1
    # table_stats answers the restored state (fallback reads the restored
    # chains, never the pre-restore head's)
    st = lake.table_stats(eng.cfg.lake_dir)
    assert st["rows"] == len(as_of_1)


def test_restore_preserves_deletes_and_guards(tmp_path, ray_session):
    import pyarrow.compute as pc
    eng = _engine(tmp_path)
    with pytest.raises(FileNotFoundError, match="empty lake"):
        lake.restore(eng.cfg.lake_dir, 0)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    with pytest.raises(ValueError, match="outside committed"):
        lake.restore(eng.cfg.lake_dir, 5)
    lake.restore(eng.cfg.lake_dir, 0)
    # delete_where after restore mints a FRESH lsn above the preserved
    # watermark — a later replay of the undone epoch cannot tie it
    wm = lake.read_manifest(eng.cfg.lake_dir, 2)["lsn_watermark"]
    repo = sorted(_state(eng.read()))[0][0]
    st = eng.delete_where(lambda t: pc.equal(t["repo"], repo),
                          eng.resume_point(), columns=["repo"])
    assert st.lsn_watermark == wm + 1
    assert all(k[0] != repo for k in _state(eng.read()))
