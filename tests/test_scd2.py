"""SCD Type 2: one-shot operator vs a brute-force chain oracle, the
incrementally-maintained engine vs the one-shot batch, current() == CDC
live table, late-arrival mid-chain insertion, epoch-order guard."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, oracle, scd2

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=128, dup_lookback=2000)
N_EPOCHS = 3


def _all_events() -> pa.Table:
    return pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
        promote_options="permissive")


def _expected_history(events: pa.Table) -> set[tuple]:
    """Brute-force chain walk in plain Python."""
    seen = set()
    per_key: dict[tuple, list[dict]] = {}
    for r in events.to_pylist():
        k = (r["repo"], r["path"], r["lsn"])
        if k in seen:
            continue
        seen.add(k)
        per_key.setdefault((r["repo"], r["path"]), []).append(r)
    out = set()
    for key, evs in per_key.items():
        evs.sort(key=lambda r: r["lsn"])
        for i, r in enumerate(evs):
            if r["op"] == "D":
                continue
            nxt = evs[i + 1]["lsn"] if i + 1 < len(evs) else None
            out.add((*key, r["lsn"], nxt, nxt is None, r["commit"],
                     r["content_sha256"], r.get("lang")))
    return out


def _tuples(rows: list[dict]) -> set[tuple]:
    return {(r["repo"], r["path"], r["valid_from_lsn"], r["valid_to_lsn"],
             r["is_current"], r["commit"], r["content_sha256"], r.get("lang"))
            for r in rows}


def test_scd2_one_shot_matches_chain_oracle():
    events = _all_events()
    got = _tuples(scd2.scd2_history(ray.data.from_arrow(events),
                                    num_partitions=8).take_all())
    assert got == _expected_history(events)


def test_scd2_incremental_equals_batch(tmp_path):
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "scd2"),
                                          num_partitions=8,
                                          merge_concurrency=2))
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(
            ray.data.from_arrow(binlog.gen_epoch_table(SPEC, ep)), ep)
    inc = _tuples(eng.history().take_all())
    batch = _tuples(scd2.scd2_history(ray.data.from_arrow(_all_events()),
                                      num_partitions=8).take_all())
    assert inc == batch


def test_scd2_current_equals_lww_live(tmp_path):
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "scd2"),
                                          num_partitions=8,
                                          merge_concurrency=2))
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(
            ray.data.from_arrow(binlog.gen_epoch_table(SPEC, ep)), ep)
    cur = {(r["repo"], r["path"]): (r["valid_from_lsn"], r["commit"])
           for r in eng.current().take_all()}
    live = oracle.live_rows(oracle.replay(_all_events()))
    assert cur == {k: (v["lsn"], v["commit"]) for k, v in live.items()}
    assert all(r["valid_to_lsn"] is None and r["is_current"]
               for r in eng.current().take_all())


def _ev(lsn, op, path, content=""):
    sha = hashlib.sha256(content.encode()).hexdigest() if op != "D" else None
    return {"lsn": lsn, "op": op, "repo": "r", "path": path,
            "commit": f"c{lsn}", "content": content if op != "D" else None,
            "content_sha256": sha}


def test_scd2_late_arrival_inserts_mid_chain(tmp_path):
    """An event with lsn=5 delivered an epoch AFTER lsn=9 splices into the
    middle: v3's validity shortens to [3,5) and the late v5 gets [5,9)."""
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "scd2"),
                                          num_partitions=4,
                                          merge_concurrency=1))
    e0 = [_ev(3, "I", "a", "v3"), _ev(9, "U", "a", "v9")]
    e1 = [_ev(5, "U", "a", "v5")]                       # late, mid-chain
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist(e0)), 0)
    after0 = {(r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
              for r in eng.history().take_all()}
    assert after0 == {(3, 9, False), (9, None, True)}
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist(e1)), 1)
    after1 = {(r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
              for r in eng.history().take_all()}
    assert after1 == {(3, 5, False), (5, 9, False), (9, None, True)}


def test_scd2_delete_closes_without_version(tmp_path):
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "scd2"),
                                          num_partitions=4,
                                          merge_concurrency=1))
    evs = [_ev(1, "I", "a", "x"), _ev(2, "D", "a"), _ev(4, "I", "b", "y")]
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist(evs)), 0)
    rows = {(r["path"], r["valid_from_lsn"], r["valid_to_lsn"], r["is_current"])
            for r in eng.history().take_all()}
    # 'a' closed by the delete (valid_to=2, not current); no row FOR the delete
    assert rows == {("a", 1, 2, False), ("b", 4, None, True)}
    cur = eng.current().take_all()
    assert [(r["path"],) for r in cur] == [("b",)]


def test_scd2_epoch_order_guard(tmp_path):
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "scd2"),
                                          num_partitions=4,
                                          merge_concurrency=1))
    eng.ingest_epoch(
        ray.data.from_arrow(pa.Table.from_pylist([_ev(1, "I", "a", "x")])), 0)
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest_epoch(
            ray.data.from_arrow(pa.Table.from_pylist([_ev(2, "I", "b", "y")])), 2)


def test_scd2_crash_resume(tmp_path):
    """Crash debris (promoted-but-unmanifested epoch + tmp dir) is cleaned
    by resume_point; re-running the epoch reproduces identical history."""
    import os
    import shutil

    lake_dir = str(tmp_path / "scd2")
    eng = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=lake_dir,
                                          num_partitions=4,
                                          merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(binlog.gen_epoch_table(SPEC, 0)), 0)
    before = _tuples(eng.history().take_all())

    # simulate a crash AFTER data promote, BEFORE manifest commit
    os.makedirs(os.path.join(lake_dir, "epoch=0001"))
    with open(os.path.join(lake_dir, "epoch=0001", "part-00000.parquet"),
              "w") as f:
        f.write("partial garbage")
    os.makedirs(os.path.join(lake_dir, ".tmp-epoch=0001"))

    assert eng.resume_point() == 1            # debris cleaned
    assert not os.path.exists(os.path.join(lake_dir, "epoch=0001"))
    assert _tuples(eng.history().take_all()) == before

    eng.ingest_epoch(ray.data.from_arrow(binlog.gen_epoch_table(SPEC, 1)), 1)
    got = _tuples(eng.history().take_all())
    batch = _tuples(scd2.scd2_history(
        ray.data.from_arrow(pa.concat_tables(
            [binlog.gen_epoch_table(SPEC, e) for e in range(2)],
            promote_options="permissive")), num_partitions=4).take_all())
    assert got == batch
    shutil.rmtree(lake_dir)


def test_scd2_lsm_delta_mode_parity(tmp_path):
    """compact_interval=3: delta epochs append O(epoch) event-log files;
    history equals the compact-every-epoch engine at every epoch; log-mode
    optimize() compacts without losing versions."""
    from e_commerce_batch_etl_pipeline_ray.cdc import lake

    lsm = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "lsm"),
                                          num_partitions=8,
                                          merge_concurrency=2,
                                          compact_interval=3))
    ref = scd2.SCD2Engine(scd2.SCD2Config(lake_dir=str(tmp_path / "ref"),
                                          num_partitions=8,
                                          merge_concurrency=2))
    for ep in range(N_EPOCHS):
        t = binlog.gen_epoch_table(SPEC, ep)
        lsm.ingest_epoch(ray.data.from_arrow(t), ep)
        ref.ingest_epoch(ray.data.from_arrow(t), ep)
        assert _tuples(lsm.history(epoch=ep).take_all()) == \
            _tuples(ref.history(epoch=ep).take_all()), f"epoch {ep}"
    # epochs 0,1 were deltas (compact at (e+1)%3==0 -> epoch 2)
    man1 = lake.read_manifest(str(tmp_path / "lsm"), 1)
    assert any(rec.get("deltas") for rec in man1["partitions"].values())

    # ingest one more delta epoch, then optimize in log mode
    t3 = binlog.gen_epoch_table(SPEC, 3)
    lsm.ingest_epoch(ray.data.from_arrow(t3), 3)
    ref.ingest_epoch(ray.data.from_arrow(t3), 3)
    before = _tuples(lsm.history().take_all())
    stats = lake.optimize(str(tmp_path / "lsm"), mode="log")
    assert stats["partitions_compacted"] > 0
    man = lake.read_manifest(str(tmp_path / "lsm"), stats["epoch"])
    assert not any(rec.get("deltas") for rec in man["partitions"].values())
    assert _tuples(lsm.history().take_all()) == before
    assert before == _tuples(ref.history().take_all())
