"""Feed-maintained inverted index: incremental refresh == full rebuild,
delete/update maintenance, stats deltas, pruned search parity."""

from __future__ import annotations

import math

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    engine,
    index_view,
    lake,
    oracle,
)

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=128, dup_lookback=1000)
N_EPOCHS = 3
TERMS = ["return", "x"]


def _brute_bm25(live: dict, terms, k=10, k1=1.2, b=0.75):
    docs = {k2: (v["content"] or "").split(" ") for k2, v in live.items()}
    n = len(docs)
    dl = {k2: len(t) for k2, t in docs.items()}
    avglen = sum(dl.values()) / n
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    idf = {t: math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
           for t in terms}
    scores = {}
    for key, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1.0) / (
                    tf + k1 * (1 - b + b * dl[key] / avglen))
        if s > 0:
            scores[key] = round(s, 6)
    fused = sorted(scores.items(),
                   key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))
    return fused[:k]


def test_incremental_index_matches_rebuild_and_bruteforce(tmp_path):
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    view = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                num_partitions=8)
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        res = view.refresh()              # incremental, EVERY epoch
        assert res["refreshed"]

    evs = pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
        promote_options="permissive")
    live = oracle.live_rows(oracle.replay(evs))
    # stats parity
    m = lake.read_manifest(str(tmp_path / "idx"),
                           lake.last_committed_epoch(str(tmp_path / "idx")))
    assert m["metrics"]["n_docs"] == len(live)
    assert m["metrics"]["total_len"] == sum(
        len((v["content"] or "").split(" ")) for v in live.values())

    got = view.search(TERMS, k=10, round_to=6)
    got_rows = [((r["repo"], r["path"]), r["score"])
                for r in got.to_pylist()]
    assert got_rows == _brute_bm25(live, TERMS, k=10)


def test_refresh_noop_when_caught_up(tmp_path):
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    view = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                num_partitions=8)
    assert view.refresh()["refreshed"]
    assert view.refresh()["refreshed"] is False


def test_incremental_equals_one_shot_refresh(tmp_path):
    """Refreshing per epoch equals one refresh over all epochs."""
    lake_a, lake_b = str(tmp_path / "la"), str(tmp_path / "lb")
    views = []
    for lk, mode in ((lake_a, "per_epoch"), (lake_b, "once")):
        eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lk,
                                                num_partitions=8,
                                                merge_concurrency=2))
        view = index_view.IndexView(lk, lk + ".idx", num_partitions=8)
        for ep in range(N_EPOCHS):
            eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
            if mode == "per_epoch":
                view.refresh()
        if mode == "once":
            view.refresh()
        views.append(view)
    a = views[0].search(TERMS, k=20, round_to=6).to_pylist()
    b = views[1].search(TERMS, k=20, round_to=6).to_pylist()
    assert a == b


def test_time_travel_search(tmp_path):
    """search(epoch=0) answers from the index state after epoch 0 only."""
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    view = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                num_partitions=8)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        view.refresh()
    live0 = oracle.live_rows(oracle.replay(binlog.gen_epoch_table(SPEC, 0)))
    got0 = [((r["repo"], r["path"]), r["score"])
            for r in view.search(TERMS, k=10, round_to=6,
                                 epoch=0).to_pylist()]
    assert got0 == _brute_bm25(live0, TERMS, k=10)
    # and the latest epoch differs from epoch 0 (updates changed the corpus)
    got1 = [((r["repo"], r["path"]), r["score"])
            for r in view.search(TERMS, k=10, round_to=6).to_pylist()]
    assert got1 != got0


def test_lsm_compaction_boundary_and_vacuum(tmp_path):
    """compact_interval=2: refresh 0 appends deltas + removal log,
    refresh 1 compacts (log cleared, deltas folded); searches identical
    to a compact-every-time view at every step; vacuum keeps the live
    state."""
    lake_a, lake_b = str(tmp_path / "la"), str(tmp_path / "lb")
    views = []
    for lk, ci in ((lake_a, 2), (lake_b, 1)):
        eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lk,
                                                num_partitions=8,
                                                merge_concurrency=2))
        view = index_view.IndexView(lk, lk + ".idx", num_partitions=8,
                                    compact_interval=ci)
        for ep in range(N_EPOCHS):
            eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
            view.refresh()
        views.append(view)
    a, b = views
    assert a.search(TERMS, k=15, round_to=6).to_pylist() == \
        b.search(TERMS, k=15, round_to=6).to_pylist()
    # epoch 1 (2nd refresh) compacted: no deltas, no removal log
    m1 = lake.read_manifest(lake_a + ".idx", 1)
    assert m1["metrics"]["mode"] == "compact"
    assert not m1.get("removal_log")
    assert all(not r.get("deltas") for r in m1["partitions"].values())
    # epoch 2 delta again, with a log iff keys changed
    m2 = lake.read_manifest(lake_a + ".idx", 2)
    assert m2["metrics"]["mode"] == "delta"
    before = a.search(TERMS, k=15, round_to=6).to_pylist()
    lake.vacuum(lake_a + ".idx", keep_last=1)
    assert a.search(TERMS, k=15, round_to=6).to_pylist() == before


def test_index_view_crash_resume(tmp_path):
    """Kill after the refresh commit, wipe the manifest (simulating a
    crash between dir promote and manifest write on re-run), re-refresh:
    search results byte-identical."""
    import os
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    view = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                num_partitions=8)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    view.refresh()
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    view.refresh()
    before = view.search(TERMS, k=12, round_to=6).to_pylist()
    os.remove(lake._manifest_path(str(tmp_path / "idx"), 1))
    res = view.refresh()                  # cleans debris, redoes epoch 1
    assert res["refreshed"] and res["view_epoch"] == 1
    assert view.search(TERMS, k=12, round_to=6).to_pylist() == before


def test_removal_log_is_atomic_with_manifest(tmp_path):
    """The removal log rides the SAME manifest write (review fix): a
    delta-epoch manifest read back immediately contains removal_log, and
    a re-read after process 'restart' (fresh view object) preserves it."""
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    view = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                num_partitions=8, compact_interval=8)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        view.refresh()
    m1 = lake.read_manifest(str(tmp_path / "idx"), 1)
    assert m1["metrics"]["mode"] == "delta"
    assert m1.get("removal_log"), "epoch 1 changed keys -> log must exist"
    # a fresh view object (new process) sees the same chain and search
    view2 = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                                 num_partitions=8, compact_interval=8)
    assert view2.search(TERMS, k=8, round_to=6).to_pylist() == \
        view.search(TERMS, k=8, round_to=6).to_pylist()
    import pytest
    bad = index_view.IndexView(lake_dir, str(tmp_path / "idx"),
                               num_partitions=16)
    with pytest.raises(ValueError, match="constant modulus|num_partitions"):
        bad.search(TERMS, k=5)
