"""Incrementally-maintained materialized join view: parity with a replay
join oracle, incremental refresh == full recompute, partition pruning,
left-join nulls, co-partitioning guard."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, oracle, view

SPEC_A = binlog.BinlogSpec(seed=42, events_per_epoch=1500, n_repos=8,
                           paths_per_repo=40, evolution_epoch=1,
                           content_chars_min=16, content_chars_max=128,
                           dup_lookback=2000)
SPEC_B = binlog.BinlogSpec(seed=7, events_per_epoch=1200, n_repos=8,
                           paths_per_repo=40, evolution_epoch=1,
                           content_chars_min=16, content_chars_max=128,
                           dup_lookback=2000)
P = 8


def _ingest(lake_dir: str, spec: binlog.BinlogSpec, epochs: range):
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=P,
                                            merge_concurrency=2))
    for ep in epochs:
        eng.ingest_epoch(binlog.gen_epoch(spec, ep), ep)
    return eng


def _live(spec: binlog.BinlogSpec, n_epochs: int) -> dict:
    evs = pa.concat_tables(
        [binlog.gen_epoch_table(spec, e) for e in range(n_epochs)],
        promote_options="permissive")
    return oracle.live_rows(oracle.replay(evs))


def _expected_inner(n_a: int, n_b: int) -> dict:
    la, lb = _live(SPEC_A, n_a), _live(SPEC_B, n_b)
    return {k: (la[k]["lsn"], la[k]["commit"], lb[k]["lsn"], lb[k]["commit"])
            for k in la.keys() & lb.keys()}


def _view_tuples(v: view.JoinView) -> dict:
    return {(r["repo"], r["path"]): (r["lsn_l"], r["commit_l"],
                                     r["lsn_r"], r["commit_r"])
            for r in v.read().take_all()}


def test_inner_view_matches_replay_join(tmp_path):
    _ingest(str(tmp_path / "a"), SPEC_A, range(2))
    _ingest(str(tmp_path / "b"), SPEC_B, range(2))
    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"))
    stats = v.refresh()
    assert stats["partitions_recomputed"] == P
    assert _view_tuples(v) == _expected_inner(2, 2)


def test_incremental_refresh_equals_full(tmp_path):
    ea = _ingest(str(tmp_path / "a"), SPEC_A, range(1))
    eb = _ingest(str(tmp_path / "b"), SPEC_B, range(1))
    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"))
    v.refresh()
    assert _view_tuples(v) == _expected_inner(1, 1)
    # advance only lake A, then refresh incrementally
    ea.ingest_epoch(binlog.gen_epoch(SPEC_A, 1), 1)
    stats = v.refresh()
    assert stats["refresh_epoch"] == 1
    assert _view_tuples(v) == _expected_inner(2, 1)
    # advance B too
    eb.ingest_epoch(binlog.gen_epoch(SPEC_B, 1), 1)
    v.refresh()
    got = _view_tuples(v)
    assert got == _expected_inner(2, 2)
    # fresh full view over the same lakes agrees
    v2 = view.JoinView(str(tmp_path / "v2"), str(tmp_path / "a"),
                       str(tmp_path / "b"))
    v2.refresh()
    assert _view_tuples(v2) == got


def test_refresh_prunes_untouched_partitions(tmp_path):
    _ingest(str(tmp_path / "a"), SPEC_A, range(2))
    _ingest(str(tmp_path / "b"), SPEC_B, range(2))
    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"))
    v.refresh()
    # no input changes at all -> zero recomputes
    stats = v.refresh()
    assert stats["partitions_recomputed"] == 0
    assert stats["partitions_carried"] == P
    # touch ONE key in lake A -> exactly one partition recomputes
    content = "solo"
    row = {"lsn": 10_000_000, "op": "I", "repo": "org001/proj",
           "path": "src/mod0/file0.py", "commit": "d" * 40, "lang": "py",
           "content": content,
           "content_sha256": hashlib.sha256(content.encode()).hexdigest()}
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "a"),
                                            num_partitions=P,
                                            merge_concurrency=2))
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist([row])), 2)
    stats = v.refresh()
    assert stats["partitions_recomputed"] == 1
    assert stats["partitions_carried"] == P - 1
    exp = _expected_inner(2, 2)
    k = ("org001/proj", "src/mod0/file0.py")
    if k in _live(SPEC_B, 2):
        exp[k] = (10_000_000, "d" * 40, *exp.get(k, (None, None, None, None))[2:])
    assert _view_tuples(v) == exp


def test_left_join_nulls_unmatched(tmp_path):
    _ingest(str(tmp_path / "a"), SPEC_A, range(1))
    _ingest(str(tmp_path / "b"), SPEC_B, range(1))
    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"), how="left")
    v.refresh()
    la, lb = _live(SPEC_A, 1), _live(SPEC_B, 1)
    rows = {(r["repo"], r["path"]): (r["lsn_l"], r["lsn_r"])
            for r in v.read().take_all()}
    assert set(rows) == set(la)
    for k, (lsn_l, lsn_r) in rows.items():
        assert lsn_l == la[k]["lsn"]
        assert lsn_r == (lb[k]["lsn"] if k in lb else None)


def test_copartitioning_guard(tmp_path):
    _ingest(str(tmp_path / "a"), SPEC_A, range(1))
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=str(tmp_path / "b"),
                                            num_partitions=P * 2,
                                            merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC_B, 0), 0)
    v = view.JoinView(str(tmp_path / "v"), str(tmp_path / "a"),
                      str(tmp_path / "b"))
    with pytest.raises(ValueError, match="co-partitioned"):
        v.refresh()
