"""Pruned point reads: hash-routed exact-key lookups against the lake —
parity with the replay oracle, partition pruning, tombstone semantics,
LSM-delta merge, and the constant-modulus guard."""

from __future__ import annotations

import pyarrow as pa
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, oracle

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
    return cfg.lake_dir


def _replay():
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
        promote_options="permissive")
    return oracle.replay(evs)


@pytest.fixture(params=[1, 2], ids=["compact", "lsm"])
def lake_dir(request, tmp_path):
    return _ingest(tmp_path, compact_interval=request.param)


def test_point_read_matches_replay(lake_dir):
    state = _replay()
    live = {k: v for k, v in state.items() if v["op"] != "D"}
    dead = [k for k, v in state.items() if v["op"] == "D"]
    some_live = sorted(live)[::7][:20]
    keys = some_live + dead[:2] + [("org999/proj", "src/nope.py")]
    rows = lake.point_read(lake_dir, keys).take_all()
    got = {(r["repo"], r["path"]): (r["lsn"], r["commit"], r["content_sha256"])
           for r in rows}
    exp = {k: (live[k]["lsn"], live[k]["commit"], live[k]["content_sha256"])
           for k in some_live}
    assert got == exp          # dead + missing keys absent, live keys exact


def test_point_read_tombstones_visible_on_request(lake_dir):
    state = _replay()
    dead = [k for k, v in state.items() if v["op"] == "D"][:3]
    assert dead, "fixture must contain deletes"
    rows = lake.point_read(lake_dir, dead, include_tombstones=True).take_all()
    got = {(r["repo"], r["path"]): (r["lsn"], r["_deleted"]) for r in rows}
    assert got == {k: (state[k]["lsn"], True) for k in dead}


def test_point_read_prunes_to_one_partition(lake_dir):
    state = _replay()
    key = sorted(k for k, v in state.items() if v["op"] != "D")[0]
    ds = lake.point_read(lake_dir, [key])
    # single key -> single partition -> single lookup task/block
    assert ds.materialize().num_blocks() == 1
    assert ds.count() == 1


def test_point_read_rejects_changed_modulus(tmp_path):
    lake_dir = _ingest(tmp_path)
    bad = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=16,
                                            merge_concurrency=2))
    with pytest.raises(ValueError, match="constant modulus"):
        bad.ingest_epoch(binlog.gen_epoch(SPEC, N_EPOCHS), N_EPOCHS)


def test_point_read_empty_key_list(lake_dir):
    assert lake.point_read(lake_dir, []).count() == 0


def test_rebucket_migrates_modulus(tmp_path):
    """Offline partition-count migration: state bit-identical (tombstones
    included), point reads route with the NEW modulus, ingest continues on
    the destination lake, non-empty destination rejected."""
    src = _ingest(tmp_path)
    stats = lake.rebucket(src, str(tmp_path / "wide"), num_partitions=16)
    dst = str(tmp_path / "wide")

    def _full(d):
        rows = lake.read_lake(d, include_tombstones=True).take_all()
        return {(r["repo"], r["path"]): (r["lsn"], r["_deleted"],
                                         r["content_sha256"]) for r in rows}

    assert _full(dst) == _full(src)
    assert lake.read_manifest(dst, 0)["num_partitions"] == 16
    assert stats["rows"] == len(_full(src))

    # point read routes correctly under the new modulus
    state = _replay()
    key = sorted(k for k, v in state.items() if v["op"] != "D")[0]
    got = lake.point_read(dst, [key]).take_all()
    assert len(got) == 1 and got[0]["lsn"] == state[key]["lsn"]

    # ingest continues on the destination (next epoch of the same binlog)
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=dst, num_partitions=16,
                                            merge_concurrency=2))
    assert eng.resume_point() == 1
    eng.ingest_epoch(binlog.gen_epoch(SPEC, N_EPOCHS), 1)
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS + 1)],
        promote_options="permissive")
    live = oracle.live_rows(oracle.replay(evs))
    rows = lake.read_lake(dst).take_all()
    assert {(r["repo"], r["path"]): r["lsn"] for r in rows} == \
        {k: v["lsn"] for k, v in live.items()}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not empty"):
        lake.rebucket(src, dst, num_partitions=32)
