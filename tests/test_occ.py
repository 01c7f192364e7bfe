"""Optimistic concurrency control: the manifest chain is a commit log and
epoch numbers are claimed with a put-if-absent CAS (lake._commit_json) —
two writers racing an epoch can never silently overwrite each other.
Covers: the CAS itself (+ idempotent replay), metadata-op auto-retry, and
ingest losing its commit to a concurrent schema change (reclaim + re-plan
lands the same state the serial order would)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake

SPEC = binlog.BinlogSpec(events_per_epoch=900, n_repos=6, paths_per_repo=30,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1200)


def _engine(tmp_path, name="lake", **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / name), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _state(ds, lang_col="lang") -> dict:
    df = ds.to_pandas()
    return {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256,
                               getattr(r, lang_col))
            for r in df.itertuples()}


def test_cas_refuses_silent_overwrite_allows_replay(tmp_path, ray_session):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    head = lake.read_manifest(eng.cfg.lake_dir, 0)
    schema = lake.schema_from_b64(head["schema"])
    # a second writer committing DIFFERENT content for epoch 1 after we do
    lake.commit_manifest(eng.cfg.lake_dir, 1, {}, schema, head,
                         metrics={"writer": "a"})
    with pytest.raises(lake.CommitConflictError, match="another writer"):
        lake.commit_manifest(eng.cfg.lake_dir, 1, {}, schema, head,
                             metrics={"writer": "b"})
    # the loser never clobbered the winner
    assert lake.read_manifest(eng.cfg.lake_dir, 1)["metrics"] == \
        {"writer": "a"}
    # byte-identical replay of the SAME commit (crash recovery) is a no-op
    lake.commit_manifest(eng.cfg.lake_dir, 1, {}, schema, head,
                         metrics={"writer": "a"})
    # no tmp debris left behind either way
    mdir = os.path.join(eng.cfg.lake_dir, lake.MANIFEST_DIR)
    assert not [f for f in os.listdir(mdir) if ".tmp" in f]


def test_metadata_op_retries_after_lost_cas(tmp_path, ray_session,
                                            monkeypatch):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    # interloper: between rename's head-read and its commit, another
    # writer claims the epoch with a restore commit
    real = lake._commit_json
    fired = []

    def race_once(path, manifest, overwrite=False):
        if not fired:
            fired.append(1)
            lake._commit_json = real      # the interloper commits cleanly
            lake.restore(eng.cfg.lake_dir, 0)
            monkeypatch.undo()
        return real(path, manifest, overwrite)

    monkeypatch.setattr(lake, "_commit_json", race_once)
    res = lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    # first attempt lost epoch 1 to the restore; the retry re-read the
    # head and landed on top of it
    assert fired and res["epoch"] == 2
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert m1.get("restored_from") == 0
    assert "language" in eng.read().schema().names


def test_ingest_conflict_reclaims_and_replans(tmp_path, ray_session,
                                              monkeypatch):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    # a rename lands between ingest's planning and its manifest commit:
    # the ingest loses the CAS for epoch 1, reclaims its files, re-plans
    # from the renamed head and commits as epoch 2 — with the old-name
    # events mapped through the fresh schema chain
    real = lake._commit_json
    fired = []

    def race_once(path, manifest, overwrite=False):
        if not fired and "epoch-0001" in path:
            fired.append(1)
            lake._commit_json = real
            lake.rename_column(eng.cfg.lake_dir, "lang", "language")
            monkeypatch.undo()
        return real(path, manifest, overwrite)

    monkeypatch.setattr(lake, "_commit_json", race_once)
    stats = eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    assert fired and stats.epoch == 2
    # serial-order parity: rename FIRST, then the epoch-1 events
    ref = _engine(tmp_path, "ref")
    ref.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    lake.rename_column(ref.cfg.lake_dir, "lang", "language")
    ref.ingest_epoch(binlog.gen_epoch(SPEC, 1), ref.resume_point())
    assert _state(eng.read(), "language") == _state(ref.read(), "language")
    # the loser's contested files were reclaimed: every referenced file
    # exists, and the epoch-1 dir holds no orphans (the rename wrote none)
    head = lake.read_manifest(eng.cfg.lake_dir, 2)
    for rec in head["partitions"].values():
        for f in ([rec["file"]] if rec.get("file") else []) \
                + list(rec.get("deltas", [])):
            assert os.path.exists(f)
    assert not os.path.isdir(lake.epoch_dir(eng.cfg.lake_dir, 1))


def test_ingest_conflict_surfaces_when_retries_off(tmp_path, ray_session,
                                                   monkeypatch):
    eng = _engine(tmp_path, commit_retries=0)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    real = lake._commit_json
    fired = []

    def race_once(path, manifest, overwrite=False):
        if not fired and "epoch-0001" in path:
            fired.append(1)
            lake._commit_json = real
            lake.drop_column(eng.cfg.lake_dir, "lang")
            monkeypatch.undo()
        return real(path, manifest, overwrite)

    monkeypatch.setattr(lake, "_commit_json", race_once)
    with pytest.raises(lake.CommitConflictError):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    # manual recovery: resume_point + re-ingest lands cleanly on the
    # dropped-column head
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), eng.resume_point())
    names = eng.read().schema().names
    assert "lang" not in names
    ref = _engine(tmp_path, "ref")
    for ep in range(2):
        ref.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    want = {k: v[:3] for k, v in _state(ref.read()).items()}
    got = {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256)
           for r in eng.read().to_pandas().itertuples()}
    assert got == want


def test_data_writing_racer_never_auto_reclaimed(tmp_path, ray_session,
                                                 monkeypatch):
    """If the winning commit references files inside the contested epoch
    dir (i.e. a second DATA writer — unsupported), ingest must NOT delete
    the dir or silently retry."""
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    real = lake._commit_json
    fired = []

    def race_once(path, manifest, overwrite=False):
        if not fired and "epoch-0001" in path:
            fired.append(1)
            # forge a winner whose record points INTO the contested dir
            head = lake.read_manifest(eng.cfg.lake_dir, 0)
            forged = dict(head)
            forged["epoch"] = 1
            forged["partitions"] = {"0": {
                "file": os.path.join(
                    lake.epoch_dir(eng.cfg.lake_dir, 1), "part-00000.parquet"),
                "deltas": [], "lsn_watermark": 1, "rows_applied": 1,
                "rows_total": 1, "bytes_written": 1}}
            real(lake._manifest_path(eng.cfg.lake_dir, 1), forged)
            lake._commit_json = real
            monkeypatch.undo()
        return real(path, manifest, overwrite)

    monkeypatch.setattr(lake, "_commit_json", race_once)
    with pytest.raises(lake.CommitConflictError):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    # the contested dir was left alone (the winner's files live there)
    assert os.path.isdir(lake.epoch_dir(eng.cfg.lake_dir, 1))
