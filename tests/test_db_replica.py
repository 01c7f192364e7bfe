"""Exactly-once DB replication (cdc/db_replica.py): replica == lake
across the evolution boundary, offset commits atomically with the data
(crash before COMMIT leaves both untouched), redelivery is idempotent,
deletes propagate, caught-up syncs no-op."""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pyarrow.compute as pc
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    db_replica,
    engine,
    lake,
)

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2500)


def _setup(tmp_path, epochs=2):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2))
    for ep in range(epochs):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    rep = db_replica.DBReplica(eng.cfg.lake_dir,
                               str(tmp_path / "wh.sqlite3"), "files")
    return eng, rep


def _norm(df):
    cols = sorted(df.columns)
    out = df[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    return out.astype(object).where(out.notna(), None)


def _assert_replica_equals_lake(eng, rep):
    a = _norm(rep.read().to_pandas())
    b = _norm(eng.read().to_pandas())
    assert len(a) and a.equals(b)


def test_replica_follows_lake_incl_evolution(tmp_path, ray_session):
    eng, rep = _setup(tmp_path)
    r1 = rep.sync()
    assert r1["epochs"] == 2 and r1["next_epoch"] == 2
    _assert_replica_equals_lake(eng, rep)
    assert rep.sync()["epochs"] == 0          # caught up
    # a fresh handle sees the durable offset
    rep2 = db_replica.DBReplica(eng.cfg.lake_dir, rep.db_path, "files")
    assert rep2.offset() == 2
    # next lake epoch flows through incrementally
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 2)
    assert rep.sync()["epochs"] == 1
    _assert_replica_equals_lake(eng, rep)


def test_deletes_propagate(tmp_path, ray_session):
    eng, rep = _setup(tmp_path)
    rep.sync()
    # delete a live key through the standard protocol, then sync
    row = lake.read_lake(eng.cfg.lake_dir).take(1)[0]
    key = (row["repo"], row["path"])
    eng.delete_where(
        lambda t: pc.and_(pc.equal(t["repo"], key[0]),
                          pc.equal(t["path"], key[1])), 2,
        columns=["repo", "path"])
    assert rep.sync()["deleted"] >= 1
    con = sqlite3.connect(rep.db_path)
    n = con.execute("SELECT COUNT(*) FROM files WHERE repo=? AND path=?",
                    key).fetchone()[0]
    con.close()
    assert n == 0
    _assert_replica_equals_lake(eng, rep)


def test_crash_before_commit_is_invisible_then_retry(tmp_path, ray_session,
                                                     monkeypatch):
    eng, rep = _setup(tmp_path)

    class BoomCon(sqlite3.Connection):
        # sqlite3.Connection is an immutable C type, so the crash is
        # injected through the connect() factory instead of setattr
        def commit(self):
            raise RuntimeError("crash before COMMIT")

    real_connect = sqlite3.connect
    with monkeypatch.context() as mp:
        mp.setattr(db_replica.sqlite3, "connect",
                   lambda path: real_connect(path, factory=BoomCon))
        with pytest.raises(RuntimeError):
            rep.sync()
    # nothing landed: no offset, no table rows
    assert rep.offset() == 0
    con = sqlite3.connect(rep.db_path)
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    if "files" in tables:
        assert con.execute("SELECT COUNT(*) FROM files").fetchone()[0] == 0
    con.close()
    # retry applies the identical window fully
    assert rep.sync()["epochs"] == 2
    _assert_replica_equals_lake(eng, rep)


def test_redelivery_is_idempotent(tmp_path, ray_session):
    eng, rep = _setup(tmp_path)
    rep.sync()
    before = _norm(rep.read().to_pandas())
    # simulate a lost offset (the at-least-once edge): rewind and re-apply
    con = sqlite3.connect(rep.db_path)
    con.execute("UPDATE _cdc_offsets SET next_epoch = 0 WHERE tbl='files'")
    con.commit()
    con.close()
    assert rep.sync()["epochs"] == 2
    after = _norm(rep.read().to_pandas())
    assert before.equals(after)
