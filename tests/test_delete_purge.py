"""Predicate deletes (engine.delete_where) and GDPR physical purge
(lake.purge_keys): protocol composition (feed visibility, time travel),
physical erasure (bytes actually gone from every file), idempotence."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, feed, lake


def _mini_events(n_keys: int = 30) -> pa.Table:
    rows = []
    langs = ["py", "go", "rs"]
    for i in range(n_keys):
        rows.append({"lsn": i, "op": "I", "repo": f"org{i % 3}/proj",
                     "path": f"src/f{i}.py", "commit": f"c{i:04x}" * 10,
                     "lang": langs[i % 3],
                     "content": f"def f{i}(): pass",
                     "content_sha256": None})
    return pa.Table.from_pylist(rows)


def _mk_lake(tmp=None) -> tuple[engine.CDCEngine, pa.Table]:
    ev = _mini_events()
    lake_dir = tempfile.mkdtemp(prefix="delpurge_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=4,
                                            merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(ev).repartition(3), 0)
    return eng, ev


def test_delete_where_removes_matches_and_feeds():
    eng, ev = _mk_lake()
    stats = eng.delete_where(lambda t: pc.equal(t["lang"], "go"), 1,
                             columns=["lang"])
    live = eng.read().to_pandas()
    assert set(live["lang"]) == {"py", "rs"}
    n_go = sum(1 for lang in ev["lang"].to_pylist() if lang == "go")
    assert stats.events_in == n_go
    # tombstones beat every prior event (watermark + 1)
    assert stats.lsn_watermark == 30
    # the delete is an ordinary epoch: the change feed sees the D rows
    f = feed.change_feed(eng.cfg.lake_dir, from_epoch=1).to_pandas()
    deletes = f[f["_change_type"] == "delete"]
    assert len(deletes) == n_go
    # time travel to epoch 0 still shows the pre-delete table
    assert len(eng.read(epoch=0).to_pandas()) == 30


def test_delete_where_null_predicate_is_false():
    eng, _ = _mk_lake()
    # predicate over a column with NULLs: lang IS NULL rows must survive
    # (SQL WHERE semantics); here compare against a never-matching value
    eng.delete_where(lambda t: pc.equal(t["content"], "nope"), 1,
                     columns=["content"])
    assert len(eng.read().to_pandas()) == 30


def test_purge_keys_erases_bytes_everywhere():
    eng, ev = _mk_lake()
    # second epoch updates a few keys so the purged key exists in MULTIPLE
    # epoch files (carry-forward + rewrite paths both exercised)
    upd = pa.Table.from_pylist([{
        "lsn": 100, "op": "U", "repo": "org0/proj", "path": "src/f0.py",
        "commit": "d" * 40, "lang": "py", "content": "def f0(): return 1",
        "content_sha256": None}])
    eng.ingest_epoch(ray.data.from_arrow(upd), 1)
    victim = ("org0/proj", "src/f0.py")
    audit = lake.purge_keys(eng.cfg.lake_dir, [victim])
    assert audit["rows_removed"] >= 1
    # audit carries digests, never the key itself
    import json
    apath = glob.glob(os.path.join(eng.cfg.lake_dir, "manifests",
                                   "purge-*.json"))[0]
    blob = open(apath).read()
    assert "src/f0.py" not in blob
    assert json.loads(blob)["rows_removed"] == audit["rows_removed"]
    # live read, point-in-time reads, and RAW BYTES are all clean
    for epoch in (None, 0, 1):
        df = eng.read(epoch=epoch).to_pandas()
        assert not ((df["repo"] == victim[0])
                    & (df["path"] == victim[1])).any()
    for f in glob.glob(os.path.join(eng.cfg.lake_dir, "**", "*.parquet"),
                       recursive=True):
        assert b"src/f0.py" not in open(f, "rb").read()
    # untouched keys intact
    assert len(eng.read().to_pandas()) == 29


def test_purge_is_idempotent_and_updates_lineage():
    eng, _ = _mk_lake()
    victim = ("org1/proj", "src/f1.py")
    a1 = lake.purge_keys(eng.cfg.lake_dir, [victim])
    a2 = lake.purge_keys(eng.cfg.lake_dir, [victim])
    assert a1["rows_removed"] == 1 and a2["rows_removed"] == 0
    # lineage rows_total refreshed: manifest sum equals actual live+tomb rows
    m = lake.read_manifest(eng.cfg.lake_dir, 0)
    total = sum(r["rows_total"] for r in m["partitions"].values())
    files = lake.manifest_files(m)
    assert total == sum(pq.read_table(f).num_rows for f in files) == 29
    # ingest continues normally after a purge
    nxt = pa.Table.from_pylist([{
        "lsn": 200, "op": "I", "repo": "orgX/proj", "path": "src/new.py",
        "commit": "e" * 40, "lang": "py", "content": "x",
        "content_sha256": None}])
    eng.ingest_epoch(ray.data.from_arrow(nxt), 1)
    assert len(eng.read().to_pandas()) == 30
