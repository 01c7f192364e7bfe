"""replaceWhere / dynamic INSERT OVERWRITE (engine.replace_where): atomic
region overwrite in one epoch — delete-every-match + insert-replacements,
with the Delta constraint that replacements must satisfy the predicate,
crash atomicity, feed visibility, and key reuse semantics."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow

SPEC = binlog.BinlogSpec(events_per_epoch=1200, n_repos=8, paths_per_repo=40,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=96, dup_lookback=1500)


def _engine(tmp_path, **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _go_pred():
    # defined inside a factory so it pickles by VALUE (cloudpickle closure)
    # — a module-level test function would serialize by reference and the
    # Ray workers cannot import the tests package
    def pred(t):
        import pyarrow.compute as _pc
        return _pc.equal(t["lang"], "go")
    return pred


def _mkrows(pairs, lang="go"):
    n = len(pairs)
    content = [f"NEW:{p}" for _, p in pairs]
    return ray.data.from_arrow(pa.table({
        "repo": pa.array([r for r, _ in pairs], pa.string()),
        "path": pa.array([p for _, p in pairs], pa.string()),
        "commit": pa.array(["ow"] * n, pa.string()),
        "lang": pa.array([lang] * n, pa.string()),
        "content": pa.array(content, pa.string()),
        "content_sha256": pa.array(
            [hashlib.sha256(c.encode()).hexdigest() for c in content],
            pa.string()),
    }))


def test_replace_where_region_semantics(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    df = eng.read().to_pandas()
    go = df[df["lang"] == "go"]
    assert len(go) > 1
    # replace the region with: one reused key + one brand-new key
    reused = (go.iloc[0]["repo"], go.iloc[0]["path"])
    fresh = ("org-new/repo", "src/brand/new.go")
    wm = lake.read_manifest(eng.cfg.lake_dir, 1)["lsn_watermark"]
    stats = eng.replace_where(_go_pred(), _mkrows([reused, fresh]), 2,
                              columns=["lang"])
    assert stats.epoch == 2
    out = eng.read().to_pandas()
    # every old go-row is gone; exactly the two replacements carry lang=go
    new_go = out[out["lang"] == "go"].sort_values("path")
    assert set(map(tuple, new_go[["repo", "path"]].values)) == \
        {reused, fresh}
    assert (new_go["lsn"] == wm + 2).all()
    assert (new_go["content"].str.startswith("NEW:")).all()
    # non-matching rows untouched
    keep = df[df["lang"] != "go"]
    out_keep = out[~out.set_index(["repo", "path"]).index
                   .isin(new_go.set_index(["repo", "path"]).index)]
    assert len(out_keep) == len(keep)


def test_replacements_must_satisfy_predicate(tmp_path, ray_session):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    before = eng.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    bad = _mkrows([("a/b", "c.py")], lang="py")   # outside the region
    with pytest.raises(Exception, match="do not satisfy the predicate"):
        eng.replace_where(_go_pred(), bad, 1, columns=["lang"])
    # the failed op left the lake untouched (no epoch-1 manifest)
    assert lake.last_committed_epoch(eng.cfg.lake_dir) == 0
    assert eng.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True).equals(before)


def test_crash_atomicity_and_resume(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    before = eng.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    rows = _mkrows([("x/y", "z.go")])
    eng.replace_where(_go_pred(), rows, 2, columns=["lang"])
    after = eng.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    # crash: drop the commit record -> readers see the OLD snapshot whole
    os.remove(os.path.join(eng.cfg.lake_dir, lake.MANIFEST_DIR,
                           "epoch-0002.json"))
    mid = eng.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert mid.equals(before)
    # resume + re-run is idempotent
    eng2 = _engine(tmp_path)
    eng2.replace_where(_go_pred(), rows, eng2.resume_point(), columns=["lang"])
    again = eng2.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert again.equals(after)


def test_feed_sees_delete_plus_insert(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    df = eng.read().to_pandas()
    n_go = int((df["lang"] == "go").sum())
    reused = tuple(df[df["lang"] == "go"].iloc[0][["repo", "path"]])
    eng.replace_where(_go_pred(), _mkrows([reused, ("n/e", "w.go")]), 2,
                      columns=["lang"])
    f = collect_arrow(feed.change_feed(eng.cfg.lake_dir, 2, 2)).to_pandas()
    counts = f["_change_type"].value_counts().to_dict()
    # reused key surfaces as an UPDATE (pre+post), the other old go keys
    # as deletes, the brand-new key as an insert
    assert counts.get("delete", 0) == n_go - 1
    assert counts.get("update_postimage", 0) == 1
    assert counts.get("insert", 0) == 1
