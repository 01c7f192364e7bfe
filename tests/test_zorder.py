"""Z-order clustering + stats-based data skipping: scan parity with the
replay oracle, file pruning, carry-forward stats survival, and ingest
continuing cleanly after a zorder epoch."""

from __future__ import annotations

import pyarrow as pa
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    engine,
    lake,
    oracle,
    zorder,
)

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=10, paths_per_repo=60,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=256, dup_lookback=3000)
N_EPOCHS = 3
PRED = {"lang": ("go", "js"), "lsn": (1000, 4500)}


def _ingest(tmp_path, n_epochs=N_EPOCHS, **cfg_kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2, **cfg_kw)
    eng = engine.CDCEngine(cfg)
    for ep in range(n_epochs):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    return cfg.lake_dir


def _expected(n_epochs=N_EPOCHS, pred=PRED):
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(n_epochs)],
        promote_options="permissive")
    state = oracle.replay(evs)
    out = set()
    for (repo, path), v in state.items():
        if v["op"] == "D":
            continue
        ok = True
        for col, (lo, hi) in pred.items():
            val = v.get(col)
            if val is None or (lo is not None and val < lo) or \
                    (hi is not None and val > hi):
                ok = False
        if ok:
            out.add((repo, path, v["lsn"]))
    return out


def _got(lake_dir, pred=PRED):
    rows = zorder.range_scan(lake_dir, pred).take_all()
    return {(r["repo"], r["path"], r["lsn"]) for r in rows}


def test_range_scan_matches_replay_after_zorder(tmp_path):
    lake_dir = _ingest(tmp_path)
    res = zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    assert res["partitions_rewritten"] > 0
    exp = _expected()
    assert exp, "fixture must produce matches"
    assert _got(lake_dir) == exp


def test_range_scan_correct_without_zorder(tmp_path):
    # no stats anywhere -> zero pruning, still correct
    lake_dir = _ingest(tmp_path)
    assert _got(lake_dir) == _expected()
    plan = zorder.plan_range_scan(lake_dir, PRED)
    assert plan["files_pruned"] == 0


def test_zorder_prunes_files(tmp_path):
    lake_dir = _ingest(tmp_path)
    zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    # selective single-lang, narrow-lsn predicate: most partitions cannot
    # match on lsn once files record their true bounds? lsn spans the whole
    # lake per partition (hash layout), so prune on a lang that never occurs
    plan = zorder.plan_range_scan(lake_dir, {"lang": ("zz_aa", "zz_zz")})
    assert plan["files_total"] > 0
    assert plan["files_pruned"] == plan["files_total"]
    assert zorder.range_scan(lake_dir, {"lang": ("zz_aa", "zz_zz")}).count() == 0


def test_zorder_stats_survive_carry_forward_and_later_epochs(tmp_path):
    lake_dir = _ingest(tmp_path, n_epochs=2)
    zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    # ingest another epoch AFTER the zorder epoch: touched partitions lose
    # stats (rewritten key-sorted), untouched ones carry them forward
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    ep = eng.resume_point()
    assert ep == 3             # 0,1 data + zorder epoch 2
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), ep)
    assert _got(lake_dir) == _expected(n_epochs=3)
    m = lake.read_manifest(lake_dir, lake.last_committed_epoch(lake_dir))
    # invariant: every stats record is delta-free; records still carrying
    # LANG stats are carried-forward zorder files (epoch 2), while
    # partitions rewritten by the epoch-3 ingest carry fresh lsn-only
    # stats (compact ingest records stats_cols by default)
    for r in m["partitions"].values():
        st = r.get("stats")
        assert st is not None and not r.get("deltas")
        if "lang" in st:
            assert "epoch=0002" in r["file"]
        else:
            assert "epoch=0003" in r["file"] and "lsn" in st


def test_zorder_on_lsm_folds_deltas(tmp_path):
    lake_dir = _ingest(tmp_path, compact_interval=2)
    zorder.optimize_zorder(lake_dir, by=["lang", "lsn"])
    m = lake.read_manifest(lake_dir, lake.last_committed_epoch(lake_dir))
    assert all(not r.get("deltas") for r in m["partitions"].values())
    assert _got(lake_dir) == _expected()
    # read_lake snapshot unaffected by the rewrite
    assert lake.read_lake(lake_dir).count() == \
        sum(1 for v in oracle.replay(pa.concat_tables(
            [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
            promote_options="permissive")).values() if v["op"] != "D")


def test_zorder_rejects_unknown_column(tmp_path):
    lake_dir = _ingest(tmp_path, n_epochs=1)
    with pytest.raises(ValueError, match="not in lake schema"):
        zorder.optimize_zorder(lake_dir, by=["nope"])


def test_ingest_stats_prune_without_zorder(tmp_path):
    """Compact ingest records per-file lsn stats by default, so an
    out-of-range lsn scan prunes every file on a VANILLA lake."""
    lake_dir = _ingest(tmp_path)
    wm = lake.read_manifest(lake_dir,
                            lake.last_committed_epoch(lake_dir))["lsn_watermark"]
    plan = zorder.plan_range_scan(lake_dir, {"lsn": (wm + 1, None)})
    assert plan["files_total"] > 0
    assert plan["files_pruned"] == plan["files_total"]
    assert zorder.range_scan(lake_dir, {"lsn": (wm + 1, None)}).count() == 0
    # in-range scans still exact
    assert _got(lake_dir) == _expected()
