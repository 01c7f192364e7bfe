"""Deletion vectors (lake.delete_where_dv): merge-on-read predicate deletes
— zero data files rewritten, per-partition deleted-key sidecars, readers
mask, compaction/zorder materialize, LSM re-inserts stay visible, feed
emits deletes, clone/vacuum/branch carry the sidecars.

Reference lineage: Delta Lake deletion vectors / Iceberg delete files —
the reference repo has no merge-on-read delete; its closest shape is the
full-table rewrite its batch ETL implies (src/transform.py filters), which
is exactly the O(state) cost this operator avoids.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, feed, lake, zorder


def _events(n_keys: int = 30, lsn0: int = 0, op: str = "I") -> pa.Table:
    langs = ["py", "go", "rs"]
    return pa.Table.from_pylist([
        {"lsn": lsn0 + i, "op": op, "repo": f"org{i % 3}/proj",
         "path": f"src/f{i}.py", "commit": f"c{i:04x}" * 10,
         "lang": langs[i % 3], "content": f"def f{i}(): pass",
         "content_sha256": None}
        for i in range(n_keys)])


def _mk(compact_interval: int = 1) -> engine.CDCEngine:
    lake_dir = tempfile.mkdtemp(prefix="dv_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=4, merge_concurrency=1,
        compact_interval=compact_interval))
    eng.ingest_epoch(ray.data.from_arrow(_events()).repartition(3), 0)
    return eng


def _lang(val):
    return lambda t: pc.equal(t["lang"], val)


def _live(eng, **kw):
    df = eng.read(**kw).to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_dv_parity_zero_rewrite_and_reads():
    eng_t, eng_d = _mk(), _mk()
    # tombstone twin (the ground truth the DV lake must match)
    eng_t.delete_where(_lang("go"), 1, columns=["lang"])

    data_files = sorted(glob.glob(os.path.join(
        eng_d.cfg.lake_dir, "epoch=*", "part-*.parquet")))
    inodes = {f: os.stat(f).st_ino for f in data_files}
    out = eng_d.delete_where_dv(_lang("go"), columns=["lang"])
    assert out["keys_deleted"] == 10 and out["epoch"] == 1
    # ZERO data files rewritten — same inodes, no new part files
    assert {f: os.stat(f).st_ino for f in data_files} == inodes
    assert sorted(glob.glob(os.path.join(
        eng_d.cfg.lake_dir, "epoch=*", "part-*.parquet"))) == data_files

    want = _live(eng_t)[["repo", "path", "lang", "content"]]
    got = _live(eng_d)[["repo", "path", "lang", "content"]]
    assert want.equals(got)
    assert set(got["lang"]) == {"py", "rs"}
    # time travel to the pre-delete epoch still shows every row
    assert len(_live(eng_d, epoch=0)) == 30

    # point_read: a DV'd key is gone; a surviving key still resolves
    gone = [(r, p) for r, p, l in zip(*[
        _live(eng_d, epoch=0)[c] for c in ("repo", "path", "lang")])
        if l == "go"][0]
    kept = [(r, p) for r, p, l in zip(*[
        _live(eng_d, epoch=0)[c] for c in ("repo", "path", "lang")])
        if l == "py"][0]
    assert lake.point_read(eng_d.cfg.lake_dir, [gone]).count() == 0
    assert lake.point_read(eng_d.cfg.lake_dir, [kept]).count() == 1

    # table_stats falls back for DV'd partitions and counts live rows right
    st = lake.table_stats(eng_d.cfg.lake_dir)
    assert st["rows"] == 20
    assert st["partitions_read"] >= 1

    # a second DV delete stacks (entries accumulate until a rewrite)
    out2 = eng_d.delete_where_dv(_lang("rs"), columns=["lang"])
    assert out2["keys_deleted"] == 10
    assert set(_live(eng_d)["lang"]) == {"py"}


def test_dv_lsm_reinsert_visible_and_optimize_materializes():
    eng = _mk(compact_interval=100)          # every ingest appends a delta
    eng.ingest_epoch(ray.data.from_arrow(
        _events(6, lsn0=100, op="U")), 1)    # chain: base-less deltas x2
    eng.delete_where_dv(_lang("go"), columns=["lang"])      # epoch 2
    assert set(_live(eng)["lang"]) == {"py", "rs"}

    # re-insert ONE deleted key in a LATER delta: not covered by the DV,
    # so the re-born row must win the merge
    reborn = _live(eng, epoch=1)
    reborn = [(r, p) for r, p, l in zip(reborn["repo"], reborn["path"],
                                        reborn["lang"]) if l == "go"][0]
    ev = pa.Table.from_pylist([{
        "lsn": 500, "op": "I", "repo": reborn[0], "path": reborn[1],
        "commit": "e" * 40, "lang": "go", "content": "reborn",
        "content_sha256": None}])
    eng.ingest_epoch(ray.data.from_arrow(ev), 3)
    live = _live(eng)
    back = live[(live["repo"] == reborn[0]) & (live["path"] == reborn[1])]
    assert len(back) == 1 and back.iloc[0]["content"] == "reborn"
    # the OTHER go keys stay deleted
    assert len(live[live["lang"] == "go"]) == 1

    # optimize materializes the DV: fresh bases, no dv entries, same reads
    before = live[["repo", "path", "lang", "content"]]
    res = lake.optimize(eng.cfg.lake_dir)
    assert res["partitions_compacted"] >= 1
    m = lake.read_manifest(eng.cfg.lake_dir,
                           lake.last_committed_epoch(eng.cfg.lake_dir))
    assert not any(r.get("dv") for r in m["partitions"].values())
    assert _live(eng)[["repo", "path", "lang", "content"]].equals(before)
    # the dv sidecars are unreferenced now: vacuum reclaims them
    lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    assert not glob.glob(os.path.join(eng.cfg.lake_dir, "epoch=*",
                                      "dv-*.parquet"))
    assert _live(eng)[["repo", "path", "lang", "content"]].equals(before)


def test_dv_feed_and_key_history_see_the_deletes():
    eng = _mk()
    eng.delete_where_dv(_lang("go"), columns=["lang"])
    f = feed.change_feed(eng.cfg.lake_dir, from_epoch=1).to_pandas()
    deletes = f[f["_change_type"] == "delete"]
    assert len(deletes) == 10 and set(deletes["lang"]) == {"go"}
    # preimage lsn (no tombstone row exists to supply a delete lsn)
    pre = _live(eng, epoch=0)
    want = dict(zip(zip(pre["repo"], pre["path"]), pre["lsn"]))
    for _, r in deletes.iterrows():
        assert r["lsn"] == want[(r["repo"], r["path"])]
    # key_history: the DV'd key's timeline ends in a delete row
    victim = (deletes.iloc[0]["repo"], deletes.iloc[0]["path"])
    h = feed.key_history(eng.cfg.lake_dir, [victim]).to_pandas()
    assert list(h.sort_values("_commit_epoch")["_change_type"]) == \
        ["insert", "delete"]


def test_dv_crash_before_manifest_leaves_lake_unchanged(monkeypatch):
    eng = _mk()
    real = lake.commit_manifest

    def boom(*a, **k):
        raise RuntimeError("crash before manifest CAS")
    monkeypatch.setattr(lake, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="crash before"):
        lake.delete_where_dv(eng.cfg.lake_dir, _lang("go"), columns=["lang"])
    monkeypatch.setattr(lake, "commit_manifest", real)
    # nothing visible: head unchanged, reads untouched, debris vacuum-able
    assert lake.last_committed_epoch(eng.cfg.lake_dir) == 0
    assert len(_live(eng)) == 30
    lake.clean_uncommitted(eng.cfg.lake_dir)
    # re-run completes
    out = lake.delete_where_dv(eng.cfg.lake_dir, _lang("go"),
                               columns=["lang"])
    assert out["keys_deleted"] == 10 and len(_live(eng)) == 20


def test_dv_clone_vacuum_and_range_scan():
    eng = _mk()
    eng.delete_where_dv(_lang("go"), columns=["lang"])
    # vacuum keeps the dv sidecar (committed state) — reads stay masked
    lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    assert len(_live(eng)) == 20
    assert glob.glob(os.path.join(eng.cfg.lake_dir, "epoch=*",
                                  "dv-*.parquet"))
    # range_scan masks too (lsn is in the default stats cols)
    got = zorder.range_scan(eng.cfg.lake_dir, {"lsn": (0, 999)}).to_pandas()
    assert len(got) == 20 and set(got["lang"]) == {"py", "rs"}
    # clone carries the dv entries with rewritten paths
    dst = os.path.join(tempfile.mkdtemp(prefix="dvclone_", dir="/tmp"),
                       "lake")
    lake.clone_lake(eng.cfg.lake_dir, dst)
    cdf = lake.read_lake(dst).to_pandas()
    assert len(cdf) == 20 and set(cdf["lang"]) == {"py", "rs"}
    m = lake.read_manifest(dst, lake.last_committed_epoch(dst))
    for rec in m["partitions"].values():
        for e in rec.get("dv", []):
            assert e["file"].startswith(dst)
            assert all(c.startswith(dst) for c in e["covers"])


def test_dv_then_compact_ingest_materializes():
    eng = _mk()                              # compact mode
    eng.delete_where_dv(_lang("go"), columns=["lang"])
    # next ingest touches EVERY partition -> compact rewrite materializes
    # the dv (masked prior) and re-inserts one deleted key via the stream
    pre = _live(eng, epoch=0)
    victim = [(r, p) for r, p, l in zip(pre["repo"], pre["path"],
                                        pre["lang"]) if l == "go"][0]
    upd = _events(30, lsn0=1000, op="U")
    # update only the SURVIVORS — an event stream that re-upserts a
    # DV-deleted key legitimately recreates it (LWW over the masked state)
    upd = upd.filter(pc.invert(pc.equal(upd["lang"], "go")))
    ev = pa.concat_tables([
        upd,
        pa.Table.from_pylist([{
            "lsn": 2000, "op": "I", "repo": victim[0], "path": victim[1],
            "commit": "f" * 40, "lang": "go", "content": "back",
            "content_sha256": None}])])
    eng.ingest_epoch(ray.data.from_arrow(ev), 2)
    live = _live(eng)
    # 20 survivors (all updated) + 1 re-insert; other 9 go keys stay gone
    assert len(live) == 21
    assert len(live[live["lang"] == "go"]) == 1
    m = lake.read_manifest(eng.cfg.lake_dir, 2)
    assert not any(r.get("dv") for r in m["partitions"].values())


def test_vacuum_dry_run_reports_without_deleting():
    eng = _mk()
    eng.ingest_epoch(ray.data.from_arrow(_events(6, lsn0=100, op="U")), 1)
    before = sorted(glob.glob(os.path.join(eng.cfg.lake_dir, "epoch=*",
                                           "*")))
    out = lake.vacuum(eng.cfg.lake_dir, keep_last=1, dry_run=True)
    assert out["dry_run"] and out["files_removed"] > 0
    assert sorted(out["files"]) == sorted(
        f for f in out["files"])  # list present
    # NOTHING deleted, manifests intact, reads untouched
    assert sorted(glob.glob(os.path.join(eng.cfg.lake_dir, "epoch=*",
                                         "*"))) == before
    assert lake.last_committed_epoch(eng.cfg.lake_dir) == 1
    assert len(_live(eng, epoch=0)) == 30
    # the real vacuum then removes exactly the reported candidates
    real = lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    assert real["files_removed"] == out["files_removed"]
    assert real["bytes_reclaimed"] == out["bytes_reclaimed"]
    for f in out["files"]:
        assert not os.path.exists(f)
