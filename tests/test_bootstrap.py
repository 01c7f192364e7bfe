"""Snapshot bootstrap (Debezium-style initial load) + binlog catch-up:
final state parity with a full-binlog replay, overlap/stale-redelivery
semantics at the snapshot boundary, and the fresh-lake guard."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, oracle

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=10, paths_per_repo=60,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=256, dup_lookback=3000)
N_EPOCHS = 3
SNAP_EPOCHS = 2           # snapshot covers epochs 0..1; catch-up = epoch 2


def _snapshot_table() -> tuple[pa.Table, int]:
    """Consistent snapshot of the source after epochs 0..SNAP_EPOCHS-1:
    live rows only, captured at the max applied LSN."""
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(SNAP_EPOCHS)],
        promote_options="permissive")
    state = oracle.replay(evs)
    live = oracle.live_rows(state)
    rows = [{"repo": k[0], "path": k[1], "commit": v["commit"],
             "lang": v["lang"], "content": v["content"],
             "content_sha256": v["content_sha256"]}
            for k, v in sorted(live.items())]
    lsn0 = max(v["lsn"] for v in state.values())
    return pa.Table.from_pylist(rows), lsn0


def _full_replay_live():
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
        promote_options="permissive")
    return oracle.live_rows(oracle.replay(evs))


def test_bootstrap_then_catch_up_matches_full_replay(tmp_path):
    snap, lsn0 = _snapshot_table()
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "lake"),
                                            num_partitions=8,
                                            merge_concurrency=2))
    st = eng.bootstrap(ray.data.from_arrow(snap).repartition(4), lsn0=lsn0)
    assert st.epoch == 0 and st.rows_applied == snap.num_rows
    assert eng.resume_point() == 1
    # catch-up: the remaining binlog epoch, including events that REDELIVER
    # lsn <= lsn0 (dup_lookback) — those must lose to the snapshot rows
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 1)
    got = {(r["repo"], r["path"]):
           (r["commit"], r["lang"], r["content_sha256"])
           for r in eng.read().take_all()}
    exp_live = _full_replay_live()
    exp = {k: (v["commit"], v["lang"], v["content_sha256"])
           for k, v in exp_live.items()}
    assert got == exp


def test_bootstrap_lsn_stamps_and_watermark(tmp_path):
    snap, lsn0 = _snapshot_table()
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "lake"),
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.bootstrap(ray.data.from_arrow(snap), lsn0=lsn0)
    t = pa.Table.from_pylist(eng.read().take_all())
    assert pc.min(t["lsn"]).as_py() == lsn0
    assert pc.max(t["lsn"]).as_py() == lsn0
    from e_commerce_batch_etl_pipeline_ray.cdc import lake
    assert lake.read_manifest(str(tmp_path / "lake"), 0)["lsn_watermark"] == lsn0


def test_bootstrap_refuses_nonempty_lake(tmp_path):
    snap, lsn0 = _snapshot_table()
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "lake"),
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.bootstrap(ray.data.from_arrow(snap), lsn0=lsn0)
    with pytest.raises(ValueError, match="not empty"):
        eng.bootstrap(ray.data.from_arrow(snap), lsn0=lsn0)


def test_bootstrap_rejects_event_shaped_input(tmp_path):
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "lake"),
                                            num_partitions=8,
                                            merge_concurrency=2))
    events = binlog.gen_epoch(SPEC, 0)
    with pytest.raises(ValueError, match="must not carry"):
        eng.bootstrap(events, lsn0=0)


def test_bootstrap_point_read_and_feed_compose(tmp_path):
    """The bootstrap epoch is a first-class epoch: point reads route and
    the change feed treats epoch 0 as the insert baseline."""
    from e_commerce_batch_etl_pipeline_ray.cdc import feed, lake
    snap, lsn0 = _snapshot_table()
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.bootstrap(ray.data.from_arrow(snap), lsn0=lsn0)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 1)
    key = (snap["repo"][0].as_py(), snap["path"][0].as_py())
    rows = lake.point_read(lake_dir, [key]).take_all()
    exp = _full_replay_live().get(key)
    if exp is None:
        assert rows == []
    else:
        assert len(rows) == 1 and rows[0]["content_sha256"] == \
            exp["content_sha256"]
    changes = feed.change_feed(lake_dir, 1, 1)
    assert changes.count() > 0
