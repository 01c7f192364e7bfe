"""Change Data Feed correctness: per-epoch row-level diffs vs the
sequential replay oracle, feed->snapshot reconstruction, manifest-only
pruning of untouched partitions, LSM-delta-mode compatibility."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake, oracle

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=10, paths_per_repo=60,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=256, dup_lookback=3000)
N_EPOCHS = 3


def _ingest(tmp_path, **cfg_kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2, **cfg_kw)
    eng = engine.CDCEngine(cfg)
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    if eng._pool is not None:
        eng._pool.shutdown()
    return cfg.lake_dir


def _replay_state(n_epochs: int) -> dict:
    if n_epochs == 0:
        return {}
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(n_epochs)],
        promote_options="permissive")
    return oracle.replay(evs)


def _expected_changes(epoch: int) -> set[tuple]:
    """(change_type, repo, path, lsn) tuples the feed must emit for
    ``epoch``, derived from the sequential replay oracle."""
    prev, cur = _replay_state(epoch), _replay_state(epoch + 1)
    out = set()
    for key, row in cur.items():
        p = prev.get(key)
        p_live = p is not None and p["op"] != "D"
        c_live = row["op"] != "D"
        if c_live and not p_live:
            out.add(("insert", *key, row["lsn"]))
        elif c_live and p_live and row["lsn"] != p["lsn"]:
            out.add(("update_preimage", *key, p["lsn"]))
            out.add(("update_postimage", *key, row["lsn"]))
        elif not c_live and p_live:
            # delete rows carry the DELETE's lsn (cur's tombstone)
            out.add(("delete", *key, row["lsn"]))
    return out


def _feed_tuples(t: pa.Table) -> set[tuple]:
    return {(r["_change_type"], r["repo"], r["path"], r["lsn"])
            for r in t.to_pylist()}


@pytest.fixture(params=[1, 2], ids=["compact", "lsm"])
def lake_dir(request, tmp_path):
    return _ingest(tmp_path, compact_interval=request.param)


def test_change_feed_matches_replay_diff(lake_dir):
    """Every epoch's feed equals the replay-oracle state diff — across the
    schema-evolution boundary (epoch-0 rows have no lang; the feed
    null-backfills) and in both compaction modes."""
    for ep in range(N_EPOCHS):
        got = {(r["_change_type"], r["repo"], r["path"], r["lsn"])
               for r in feed.change_feed(lake_dir, ep, ep).take_all()}
        assert got == _expected_changes(ep), f"epoch {ep} feed mismatch"


def test_feed_change_rows_carry_full_payload(lake_dir):
    """Postimage/insert rows carry the winning event's full payload
    (commit + content sha), not just the key."""
    ds = feed.change_feed(lake_dir, 1, 1)
    rows = ds.take_all()
    cur = _replay_state(2)
    for r in rows:
        if r["_change_type"] in ("insert", "update_postimage"):
            exp = cur[(r["repo"], r["path"])]
            assert (r["commit"], r["content_sha256"], r["lsn"]) == \
                (exp["commit"], exp["content_sha256"], exp["lsn"])
            assert r["_commit_epoch"] == 1


def test_feed_applies_to_snapshot(lake_dir):
    """snapshot(N-1) + feed(N..M) == snapshot(M): the feed is a complete,
    minimal delta. Spans the schema-evolution boundary (epoch 0 -> 2)."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow

    snap0 = collect_arrow(
        lake.read_lake(lake_dir, epoch=0)).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
    snap2 = collect_arrow(
        lake.read_lake(lake_dir, epoch=2)).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
    fd = collect_arrow(feed.change_feed(lake_dir, 1, 2))
    rebuilt = feed.apply_feed(snap0, fd)
    assert rebuilt.select(snap2.column_names).cast(snap2.schema).equals(snap2)


def test_feed_delete_then_reinsert_across_epochs(tmp_path):
    """apply_feed resolves multi-epoch chains per key: insert -> delete
    leaves the key out; delete -> re-insert keeps the new row."""
    schema = pa.schema([("lsn", pa.int64()), ("op", pa.string()),
                        ("repo", pa.string()), ("path", pa.string()),
                        ("commit", pa.string()), ("content", pa.string()),
                        ("content_sha256", pa.string())])
    import hashlib

    def ev(lsn, op, path, content=""):
        sha = hashlib.sha256(content.encode()).hexdigest() if op != "D" else None
        return {"lsn": lsn, "op": op, "repo": "r", "path": path,
                "commit": f"c{lsn}", "content": content if op != "D" else None,
                "content_sha256": sha}

    import ray.data
    epochs = [
        [ev(1, "I", "a", "xa"), ev(2, "I", "b", "xb"), ev(3, "I", "c", "xc")],
        [ev(4, "D", "a"), ev(5, "U", "b", "xb2")],
        [ev(6, "I", "a", "xa2"), ev(7, "D", "c")],
    ]
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                           merge_concurrency=1)
    eng = engine.CDCEngine(cfg)
    for i, evs in enumerate(epochs):
        eng.ingest_epoch(
            ray.data.from_arrow(pa.Table.from_pylist(evs, schema=schema)), i)

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow
    fd = collect_arrow(feed.change_feed(cfg.lake_dir, 0, 2))
    got = _feed_tuples(fd)
    assert got == {
        ("insert", "r", "a", 1), ("insert", "r", "b", 2),
        ("insert", "r", "c", 3),
        ("delete", "r", "a", 4),
        ("update_preimage", "r", "b", 2), ("update_postimage", "r", "b", 5),
        ("insert", "r", "a", 6), ("delete", "r", "c", 7),
    }
    empty = fd.schema.empty_table()
    # drop feed metadata to get a bare snapshot shape
    rebuilt = feed.apply_feed(
        empty.drop_columns(["_change_type", "_commit_epoch"]), fd)
    final = {(r["repo"], r["path"], r["lsn"]) for r in rebuilt.to_pylist()}
    assert final == {("r", "a", 6), ("r", "b", 5)}


def test_feed_prunes_untouched_partitions(tmp_path):
    """An epoch that touches one key schedules diff tasks ONLY for that
    key's partition — every carried-forward partition is pruned from the
    plan without reading data."""
    lake_dir = _ingest(tmp_path)
    # epoch 3: a single new key
    import hashlib

    import ray.data
    content = "solo"
    row = {"lsn": 10_000_000, "op": "I", "repo": "solo_repo",
           "path": "solo/path.py", "commit": "deadbeef",
           "lang": "py", "content": content,
           "content_sha256": hashlib.sha256(content.encode()).hexdigest()}
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist([row])), 3)

    items, _, _ = feed._plan(lake_dir, 3, 3)
    assert len(items) == 1                        # 1 of 8 partitions touched
    rows = feed.change_feed(lake_dir, 3, 3).take_all()
    assert [(r["_change_type"], r["repo"]) for r in rows] == \
        [("insert", "solo_repo")]


def test_feed_epoch_zero_is_all_inserts(lake_dir):
    t = feed.change_feed(lake_dir, 0, 0)
    types = t.unique("_change_type")
    assert types == ["insert"]
    live0 = {k for k, v in _replay_state(1).items() if v["op"] != "D"}
    assert t.count() == len(live0)


def test_feed_rejects_bad_range(lake_dir):
    with pytest.raises(ValueError):
        feed.change_feed(lake_dir, 2, 1)
    with pytest.raises(ValueError):
        feed.change_feed(lake_dir, 0, 99)


def test_feed_cursor_exactly_once_progress(tmp_path):
    """poll -> consume -> commit advances the durable offset; a crash
    between poll and commit redelivers the identical epochs; caught-up
    cursors poll None."""
    lake_dir = _ingest(tmp_path)
    state = str(tmp_path / "cursor.json")
    cur = feed.FeedCursor(lake_dir, state)
    assert cur.offset() is None

    batch = cur.poll()
    assert batch is not None
    first = _feed_tuples(pa.Table.from_pylist(batch.take_all()))
    assert cur.commit() == N_EPOCHS - 1
    assert cur.offset() == N_EPOCHS - 1
    assert cur.poll() is None                       # caught up

    # crash-before-commit: a fresh cursor on the same state file re-polls
    # the same epochs byte-identically
    cur2 = feed.FeedCursor(lake_dir, str(tmp_path / "cursor2.json"))
    b1 = _feed_tuples(pa.Table.from_pylist(cur2.poll().take_all()))
    # (no commit — simulate crash)
    cur3 = feed.FeedCursor(lake_dir, str(tmp_path / "cursor2.json"))
    b2 = _feed_tuples(pa.Table.from_pylist(cur3.poll().take_all()))
    assert b1 == b2 == first

    # new epoch -> only the delta is delivered
    import ray.data
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC, N_EPOCHS), N_EPOCHS)
    nxt = cur.poll()
    rows = nxt.take_all()
    assert rows and all(r["_commit_epoch"] == N_EPOCHS for r in rows)
    assert cur.commit() == N_EPOCHS

    with pytest.raises(RuntimeError, match="poll"):
        cur.commit()


def test_sync_feed_to_db_exactly_once(tmp_path):
    """CDC -> relational sink: table equals the live lake state after every
    sync; crash-before-commit redelivery is idempotent; deletes and
    delete-then-reinsert chains net correctly."""
    import sqlite3

    lake_dir = _ingest(tmp_path)
    db = str(tmp_path / "sink.db")
    state = str(tmp_path / "sync_cursor.json")

    def db_state():
        con = sqlite3.connect(db)
        rows = con.execute(
            'SELECT repo, path, lsn, content_sha256 FROM "files"').fetchall()
        con.close()
        return {(r[0], r[1]): (r[2], r[3]) for r in rows}

    def lake_state():
        rows = lake.read_lake(lake_dir).take_all()
        return {(r["repo"], r["path"]): (r["lsn"], r["content_sha256"])
                for r in rows}

    stats = feed.sync_feed_to_db(lake_dir, db, "files", state)
    assert stats["epochs_applied"] == N_EPOCHS
    assert db_state() == lake_state()

    # caught up -> no-op
    assert feed.sync_feed_to_db(lake_dir, db, "files", state) == \
        {"epochs_applied": 0, "upserts": 0, "deletes": 0}

    # crash-before-commit: replay the SAME epochs with a fresh cursor into
    # the SAME table -> identical state (idempotent upserts/deletes)
    feed.sync_feed_to_db(lake_dir, db, "files",
                         str(tmp_path / "cursor2.json"))
    assert db_state() == lake_state()

    # next epoch syncs incrementally
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC, N_EPOCHS), N_EPOCHS)
    stats = feed.sync_feed_to_db(lake_dir, db, "files", state)
    assert stats["epochs_applied"] == 1
    assert db_state() == lake_state()


def test_replicate_lake_matches_source(tmp_path):
    """Feed-driven replica: after draining, replica live state == source
    live state (payload parity incl. deletes); crash-between-poll-and-
    commit redelivery is idempotent."""
    from e_commerce_batch_etl_pipeline_ray.cdc import feed as F2

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    state = str(tmp_path / "cursor.json")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=src, num_partitions=8,
                                            merge_concurrency=2))
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        F2.replicate(src, dst, state, merge_concurrency=2)

    def _snap(lk):
        return {(r["repo"], r["path"]): (r["lsn"], r["commit"],
                                         r["content_sha256"])
                for r in lake.read_lake(lk).take_all()}
    assert _snap(dst) == _snap(src)

    # crash redelivery: wipe the cursor back one epoch and re-replicate —
    # LWW on preserved lsns makes the re-apply a no-op
    import json as _json
    with open(state, "w") as f:
        _json.dump({"epoch": N_EPOCHS - 2}, f)
    F2.replicate(src, dst, state, merge_concurrency=2)
    assert _snap(dst) == _snap(src)
