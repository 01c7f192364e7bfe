"""On-demand lake compaction (optimize): state preserved bit-for-bit,
deltas cleared, ingest resumes after it, time travel intact, crash debris
in a view dir tolerated."""

from __future__ import annotations

import os

import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, oracle

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=128, dup_lookback=2000)


def _state(lake_dir, epoch=None):
    rows = lake.read_lake(lake_dir, epoch=epoch).take_all()
    return {(r["repo"], r["path"]): (r["lsn"], r["content_sha256"])
            for r in rows}


def test_optimize_compacts_lsm_deltas(tmp_path):
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2,
                                            compact_interval=5))
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    man = lake.read_manifest(lake_dir, 2)
    assert any(rec.get("deltas") for rec in man["partitions"].values()), \
        "fixture must leave uncompacted deltas"
    before = _state(lake_dir)

    stats = lake.optimize(lake_dir)
    assert stats["epoch"] == 3
    assert stats["partitions_compacted"] > 0
    man = lake.read_manifest(lake_dir, 3)
    assert not any(rec.get("deltas") for rec in man["partitions"].values())
    assert _state(lake_dir) == before
    # replay-oracle parity still holds post-optimize
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(3)],
        promote_options="permissive")
    live = oracle.live_rows(oracle.replay(evs))
    assert _state(lake_dir) == {k: (v["lsn"], v["content_sha256"])
                                for k, v in live.items()}
    # time travel to the pre-optimize epoch unaffected
    assert _state(lake_dir, epoch=2) == before

    # idempotent: nothing left to compact -> NO epoch burned
    stats2 = lake.optimize(lake_dir)
    assert stats2["partitions_compacted"] == 0
    assert lake.last_committed_epoch(lake_dir) == 3

    # ingest resumes cleanly after the optimize epoch
    next_ep = eng.resume_point()
    assert next_ep == 4
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 3), next_ep)
    evs4 = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(4)],
        promote_options="permissive")
    live4 = oracle.live_rows(oracle.replay(evs4))
    assert _state(lake_dir) == {k: (v["lsn"], v["content_sha256"])
                                for k, v in live4.items()}


def test_view_refresh_survives_crash_debris(tmp_path):
    """A .tmp-epoch dir left by a crashed refresh must not corrupt the
    next refresh (promote clears debris)."""
    from e_commerce_batch_etl_pipeline_ray.cdc import view

    for name, seed in (("a", 42), ("b", 7)):
        spec = binlog.BinlogSpec(seed=seed, events_per_epoch=800, n_repos=8,
                                 paths_per_repo=40, evolution_epoch=0,
                                 content_chars_min=16, content_chars_max=64,
                                 dup_lookback=1000)
        eng = engine.CDCEngine(engine.CDCConfig(
            lake_dir=str(tmp_path / name), num_partitions=8,
            merge_concurrency=2))
        eng.ingest_epoch(binlog.gen_epoch(spec, 0), 0)

    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"))
    debris = os.path.join(str(tmp_path / "v"), ".tmp-epoch=0000")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-00000.parquet"), "w") as f:
        f.write("garbage")
    v.refresh()
    assert v.read().count() > 0
