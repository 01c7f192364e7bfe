"""Primary-key-change (rename) events — engine.expand_renames: the
Debezium DELETE(old)+CREATE(new) expansion, its edge cases, and protocol
composition (change feed sees the move as delete + insert)."""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, feed


def _ev(lsn, op, repo, path, commit=None, old_repo=None, old_path=None):
    return {"lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": commit, "old_repo": old_repo, "old_path": old_path}


def test_expand_renames_rowlevel():
    t = pa.Table.from_pylist([
        _ev(1, "I", "r", "a.py", "c1"),
        _ev(2, "R", "r", "b.py", "c2", old_repo="r", old_path="a.py"),
        _ev(3, "R", "r", "c.py", "c3", old_repo="r", old_path="c.py"),  # self
    ])
    out = engine.expand_renames(t)
    assert "old_repo" not in out.column_names
    rows = sorted(out.to_pylist(), key=lambda r: (r["lsn"], r["op"]))
    # R@2 -> D(a.py)@2 + I(b.py)@2; self-rename R@3 -> only I(c.py)@3
    assert [(r["lsn"], r["op"], r["path"]) for r in rows] == [
        (1, "I", "a.py"), (2, "D", "a.py"), (2, "I", "b.py"),
        (3, "I", "c.py")]
    d = next(r for r in rows if r["op"] == "D")
    assert d["commit"] is None


def test_rename_through_engine_and_feed():
    events = pa.Table.from_pylist([
        _ev(1, "I", "r", "a.py", "c1"),
        _ev(2, "I", "r", "x.py", "cx"),
    ]).drop_columns(["old_repo", "old_path"])
    lake_dir = tempfile.mkdtemp(prefix="ren_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=4,
                                            merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(events), 0)
    renames = pa.Table.from_pylist([
        _ev(10, "R", "r", "b.py", "c2", old_repo="r", old_path="a.py"),
        # rename of a never-live key: D is a no-op tombstone, I creates
        _ev(11, "R", "r", "new.py", "c3", old_repo="r", old_path="ghost.py"),
    ])
    eng.ingest_epoch(ray.data.from_arrow(renames).map_batches(
        engine.expand_renames, batch_format="pyarrow"), 1)
    live = {r["path"]: r for r in eng.read().take_all()}
    assert set(live) == {"b.py", "x.py", "new.py"}
    assert live["b.py"]["commit"] == "c2" and live["b.py"]["lsn"] == 10
    # the feed sees the move as a delete + an insert
    f = feed.change_feed(lake_dir, from_epoch=1).to_pandas()
    kinds = {(r["path"], r["_change_type"]) for _, r in f.iterrows()}
    assert ("a.py", "delete") in kinds and ("b.py", "insert") in kinds


def test_double_rename_of_one_source_key():
    events = pa.Table.from_pylist(
        [_ev(1, "I", "r", "a.py", "c1")]).drop_columns(
        ["old_repo", "old_path"])
    lake_dir = tempfile.mkdtemp(prefix="ren2_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=4,
                                            merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(events), 0)
    renames = pa.Table.from_pylist([
        _ev(10, "R", "r", "b.py", "c2", old_repo="r", old_path="a.py"),
        _ev(11, "R", "r", "c.py", "c3", old_repo="r", old_path="a.py"),
    ])
    eng.ingest_epoch(ray.data.from_arrow(renames).map_batches(
        engine.expand_renames, batch_format="pyarrow"), 1)
    live = {r["path"] for r in eng.read().take_all()}
    assert live == {"b.py", "c.py"}       # both targets exist, source dead
