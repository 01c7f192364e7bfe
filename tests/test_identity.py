"""GENERATED ALWAYS AS IDENTITY (CDCConfig.identity): coordination-free
deterministic surrogate ids — uniqueness, stability under updates, fresh id
on re-insert over a tombstone, wire guard, crash/replay determinism,
compact-vs-LSM and backend parity, bootstrap assignment."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake


def _events(n: int = 18, lsn0: int = 0, op: str = "I") -> pa.Table:
    return pa.Table.from_pylist([
        {"lsn": lsn0 + i, "op": op, "repo": f"org{i % 3}/proj",
         "path": f"src/f{i}.py", "commit": f"c{i:04x}" * 10,
         "content": f"def f{i}(): pass", "content_sha256": None}
        for i in range(n)])


def _mk(**kw) -> engine.CDCEngine:
    lake_dir = tempfile.mkdtemp(prefix="ident_", dir="/tmp")
    cfg = dict(lake_dir=lake_dir, num_partitions=4, merge_concurrency=1,
               identity="row_id", identity_stride=1 << 10)
    cfg.update(kw)
    return engine.CDCEngine(engine.CDCConfig(**cfg))


def _ids(eng, **kw):
    df = eng.read(**kw).to_pandas().sort_values(["repo", "path"])
    return dict(zip(zip(df["repo"], df["path"]), df["row_id"]))


def test_identity_unique_stable_monotone():
    eng = _mk()
    eng.ingest_epoch(ray.data.from_arrow(_events()).repartition(3), 0)
    ids0 = _ids(eng)
    assert len(set(ids0.values())) == 18          # unique
    # update 6 keys + insert 3 new
    upd = _events(6, lsn0=100, op="U")
    new = pa.Table.from_pylist([
        {"lsn": 200 + i, "op": "I", "repo": "neworg/proj",
         "path": f"src/n{i}.py", "commit": "d" * 40,
         "content": "new", "content_sha256": None} for i in range(3)])
    eng.ingest_epoch(ray.data.from_arrow(pa.concat_tables([upd, new])), 1)
    ids1 = _ids(eng)
    # updates keep their ids; new keys get ids above every epoch-0 id
    for k, v in ids0.items():
        assert ids1[k] == v
    fresh = [v for k, v in ids1.items() if k not in ids0]
    assert len(fresh) == 3 and len(set(fresh)) == 3
    assert min(fresh) > max(ids0.values())
    # manifest records the spec (chain-constant contract)
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert m["identity"] == ["row_id", 1 << 10]


def test_identity_reinsert_gets_fresh_id_delete_inherits():
    eng = _mk()
    eng.ingest_epoch(ray.data.from_arrow(_events()), 0)
    victim = ("org0/proj", "src/f0.py")
    old_id = _ids(eng)[victim]
    import pyarrow.compute as pc
    eng.delete_where(lambda t: pc.equal(t["path"], "src/f0.py"), 1,
                     columns=["path"])
    # the tombstone INHERITS the dead row's id (feed consumers see it)
    dead = eng.read(include_tombstones=True).to_pandas()
    dead = dead[(dead["repo"] == victim[0]) & (dead["path"] == victim[1])]
    assert int(dead.iloc[0]["row_id"]) == old_id
    # re-insert -> FRESH id (Delta insert contract)
    ev = pa.Table.from_pylist([{
        "lsn": 900, "op": "I", "repo": victim[0], "path": victim[1],
        "commit": "e" * 40, "content": "back", "content_sha256": None}])
    eng.ingest_epoch(ray.data.from_arrow(ev), 2)
    assert _ids(eng)[victim] != old_id
    # a THIRD epoch touching other keys must not churn the carried rows
    eng.ingest_epoch(ray.data.from_arrow(_events(3, lsn0=950, op="U")), 3)
    assert _ids(eng)[victim] == _ids(eng, epoch=2)[victim]


def test_identity_wire_guard_and_spec_pinning():
    eng = _mk()
    ev = _events().append_column("row_id", pa.array(range(18), pa.int64()))
    with pytest.raises(ValueError, match="identity column"):
        eng.ingest_epoch(ray.data.from_arrow(ev), 0)
    eng.ingest_epoch(ray.data.from_arrow(_events()), 0)
    # a different stride on resume is rejected (uniqueness contract)
    eng2 = engine.CDCEngine(engine.CDCConfig(
        lake_dir=eng.cfg.lake_dir, num_partitions=4, merge_concurrency=1,
        identity="row_id", identity_stride=1 << 12))
    with pytest.raises(ValueError, match="chain-constant"):
        eng2.ingest_epoch(ray.data.from_arrow(_events(2, lsn0=50)), 1)


def test_identity_replay_and_mode_backend_parity():
    # same input -> byte-identical ids across: crash/replay, compact vs
    # LSM-delta mode, map_groups vs actor_pool backend
    runs = {}
    for tag, kw in {
        "compact": {},
        "lsm": {"compact_interval": 100},
        "pool": {"backend": "actor_pool"},
    }.items():
        eng = _mk(**kw)
        eng.ingest_epoch(ray.data.from_arrow(_events()).repartition(3), 0)
        eng.ingest_epoch(ray.data.from_arrow(
            _events(6, lsn0=100, op="U")), 1)
        runs[tag] = _ids(eng)
        if tag == "compact":
            # crash/replay: drop the head manifest, resume, re-ingest
            os.remove(os.path.join(eng.cfg.lake_dir, "manifests",
                                   "epoch-0001.json"))
            assert eng.resume_point() == 1
            eng.ingest_epoch(ray.data.from_arrow(
                _events(6, lsn0=100, op="U")), 1)
            assert _ids(eng) == runs[tag]
    assert runs["compact"] == runs["lsm"] == runs["pool"]


def test_identity_bootstrap_then_catchup():
    eng = _mk()
    snap = pa.Table.from_pylist([
        {"repo": f"org{i % 3}/proj", "path": f"src/f{i}.py",
         "commit": "a" * 40, "content": f"v{i}", "content_sha256": None}
        for i in range(12)])
    eng.bootstrap(ray.data.from_arrow(snap), lsn0=1000)
    ids0 = _ids(eng)
    assert len(set(ids0.values())) == 12
    # catch-up updates inherit; a brand-new key gets a fresh epoch-1 id
    ev = pa.Table.from_pylist([
        {"lsn": 2000, "op": "U", "repo": "org0/proj", "path": "src/f0.py",
         "commit": "b" * 40, "content": "upd", "content_sha256": None},
        {"lsn": 2001, "op": "I", "repo": "org9/proj", "path": "src/new.py",
         "commit": "b" * 40, "content": "new", "content_sha256": None}])
    eng.ingest_epoch(ray.data.from_arrow(ev), 1)
    ids1 = _ids(eng)
    assert ids1[("org0/proj", "src/f0.py")] == ids0[("org0/proj", "src/f0.py")]
    assert ids1[("org9/proj", "src/new.py")] > max(ids0.values())
