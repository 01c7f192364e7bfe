"""Per-key version history (feed.key_history = the change feed pruned to
a key set): exact parity with the full feed filtered post-hoc, the three
pruning levels (partition routing / carry-forward / key blooms) actually
prune, delete rows carry the tombstone lsn, and LSM delta chains give the
same answer as compacted ones."""

from __future__ import annotations

import json

import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=6, paths_per_repo=30,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2000)


def _mk(tmp_path, epochs=3, name="lake", **cfg):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / name), num_partitions=8,
        merge_concurrency=2, **cfg))
    for ep in range(epochs):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    return eng


def _norm(df):
    cols = sorted(df.columns)
    out = (df[cols]
           .sort_values(["repo", "path", "_commit_epoch", "_change_type",
                         "lsn"])
           .reset_index(drop=True))
    return out.astype(object).where(out.notna(), None)


def _keys_of_repo(lake_dir, repo):
    t = lake.read_lake(lake_dir, include_tombstones=True).to_pandas()
    sub = t[t["repo"] == repo]
    return sorted(set(zip(sub["repo"], sub["path"])))


def test_history_equals_filtered_feed(tmp_path, ray_session):
    eng = _mk(tmp_path)
    ld = eng.cfg.lake_dir
    repo = sorted(lake.read_lake(ld).to_pandas()["repo"].unique())[0]
    keys = _keys_of_repo(ld, repo)

    hist = _norm(feed.key_history(ld, keys).to_pandas())
    full = feed.change_feed(ld).to_pandas()
    keyset = set(keys)
    full = _norm(full[[tuple(k) in keyset
                       for k in zip(full["repo"], full["path"])]])
    assert len(hist) > 0 and hist.equals(full)


def test_single_key_timeline_and_delete_lsn(tmp_path, ray_session):
    eng = _mk(tmp_path, epochs=2)
    ld = eng.cfg.lake_dir
    row = lake.read_lake(ld).take(1)[0]
    key = (row["repo"], row["path"])
    eng.delete_where(
        lambda t: pc.and_(pc.equal(t["repo"], key[0]),
                          pc.equal(t["path"], key[1])), 2,
        columns=["repo", "path"])
    del_lsn = lake.read_manifest(ld, 2)["lsn_watermark"]

    h = (feed.key_history(ld, [key]).to_pandas()
         .sort_values(["_commit_epoch", "_change_type"])
         .reset_index(drop=True))
    assert set(zip(h["repo"], h["path"])) == {key}
    assert h.iloc[0]["_change_type"] == "insert"
    last = h.iloc[-1]
    assert last["_change_type"] == "delete"
    # the delete row carries the TOMBSTONE's lsn (Debezium contract)
    assert last["lsn"] == del_lsn
    # replaying the history reproduces "key absent"
    assert len(lake.point_read(ld, [key]).take_all()) == 0


def test_plan_prunes_partitions_and_untouched_epochs(tmp_path, ray_session):
    eng = _mk(tmp_path, epochs=2)
    ld = eng.cfg.lake_dir
    row = lake.read_lake(ld).take(1)[0]
    key = (row["repo"], row["path"])
    # epoch 2 touches a DIFFERENT key only -> carried forward for ours
    other = lake.read_lake(ld).take(20)
    other_key = next((r["repo"], r["path"]) for r in other
                     if (r["repo"], r["path"]) != key)
    eng.delete_where(
        lambda t: pc.and_(pc.equal(t["repo"], other_key[0]),
                          pc.equal(t["path"], other_key[1])), 2,
        columns=["repo", "path"])

    plan, _ = feed._key_plan(ld, [key], 0, None)
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    import pyarrow as pa
    pid = hash_partition_ids(
        pa.table({"repo": [key[0]], "path": [key[1]]}),
        ["repo", "path"], 8)[0]
    # partition routing: only the key's partition appears
    assert {it["partition"] for it in plan} == {int(pid)}
    # the delete epoch either carried our partition forward (pruned by the
    # planner) or rewrote it without our key (pruned by the bloom/equality
    # level) — unless the two keys share the partition
    other_pid = hash_partition_ids(
        pa.table({"repo": [other_key[0]], "path": [other_key[1]]}),
        ["repo", "path"], 8)[0]
    if int(other_pid) != int(pid):
        assert {it["epoch"] for it in plan} <= {0, 1}
    # and the history itself is identical to the 2-epoch one
    h = feed.key_history(ld, [key]).to_pandas()
    assert set(h["_commit_epoch"]) <= {0, 1}


def test_bloom_prunes_delta_chain_files(tmp_path, ray_session):
    # base-less LSM chain: every epoch writes deltas; a key touched only
    # in epoch 0 must not re-read later delta files (blooms prove absence)
    eng = _mk(tmp_path, epochs=3, compact_interval=4)
    ld = eng.cfg.lake_dir
    repo = sorted(lake.read_lake(ld).to_pandas()["repo"].unique())[0]
    keys = _keys_of_repo(ld, repo)
    plan, _ = feed._key_plan(ld, keys, 0, None)
    m = lake.read_manifest(ld, 2)
    chain_max = max(len(feed._part_files(r))
                    for r in m["partitions"].values())
    assert chain_max >= 3            # the unpruned chains really are deep
    for it in plan:
        for side in ("cur_files", "prev_files"):
            files = json.loads(it[side])
            # pruned chains never exceed the unpruned chain; at least one
            # item must have actually dropped a file
            assert len(files) <= chain_max
    assert any(len(json.loads(it["cur_files"])) < chain_max
               for it in plan)
    # and correctness is unaffected: parity vs the filtered full feed
    hist = _norm(feed.key_history(ld, keys).to_pandas())
    full = feed.change_feed(ld).to_pandas()
    keyset = set(keys)
    full = _norm(full[[tuple(k) in keyset
                       for k in zip(full["repo"], full["path"])]])
    assert hist.equals(full)


def test_lsm_equals_compact_history(tmp_path, ray_session):
    lsm = _mk(tmp_path, epochs=3, name="lsm", compact_interval=2)
    compact = _mk(tmp_path, epochs=3, name="compact")
    repo = sorted(lake.read_lake(compact.cfg.lake_dir)
                  .to_pandas()["repo"].unique())[0]
    keys = _keys_of_repo(compact.cfg.lake_dir, repo)
    a = _norm(feed.key_history(lsm.cfg.lake_dir, keys).to_pandas())
    b = _norm(feed.key_history(compact.cfg.lake_dir, keys).to_pandas())
    assert len(a) and a.equals(b)
