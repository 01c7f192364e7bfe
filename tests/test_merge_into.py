"""MERGE INTO: conditional clause semantics vs a Python oracle, tombstone
revival, no-op merges, and composition with the change feed."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    engine,
    feed,
    lake,
    merge,
    oracle,
)

SPEC = binlog.BinlogSpec(seed=42, events_per_epoch=1500, n_repos=8,
                         paths_per_repo=40, evolution_epoch=0,
                         content_chars_min=16, content_chars_max=128,
                         dup_lookback=2000)
SRC_SPEC = binlog.BinlogSpec(seed=9, events_per_epoch=800, n_repos=8,
                             paths_per_repo=40, evolution_epoch=0,
                             content_chars_min=16, content_chars_max=128,
                             dup_lookback=1000)
P = 8


def _build_lake(tmp_path) -> str:
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=P,
                                            merge_concurrency=2))
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    return lake_dir


def _source_table() -> pa.Table:
    """Upsert-shaped source: live rows of a second binlog, lsn offset above
    the lake's range."""
    evs = binlog.gen_epoch_table(SRC_SPEC, 0)
    live = oracle.live_rows(oracle.replay(evs))
    rows = [dict(v, repo=k[0], path=k[1], lsn=v["lsn"] + 1_000_000)
            for k, v in live.items()]
    for r in rows:
        r.pop("op")
    return pa.Table.from_pylist(rows)


def _lake_state(lake_dir) -> dict:
    rows = lake.read_lake(lake_dir).take_all()
    return {(r["repo"], r["path"]): (r["lsn"], r["commit"],
                                     r["content_sha256"]) for r in rows}


def _expected_merge(before: dict, src: pa.Table,
                    update_pred, delete_pred, insert: bool) -> dict:
    out = dict(before)
    for r in src.to_pylist():
        k = (r["repo"], r["path"])
        v = (r["lsn"], r["commit"], r["content_sha256"])
        if k in before:
            if delete_pred(r, before[k]):
                out.pop(k, None)
            elif update_pred(r, before[k]):
                out[k] = v
        elif insert:
            out[k] = v
    return out


def test_merge_into_clause_semantics(tmp_path):
    """update-if-sha-changed, delete-if-lang-md, insert-unmatched — engine
    equals the row-by-row Python oracle."""
    lake_dir = _build_lake(tmp_path)
    before = _lake_state(lake_dir)
    src = _source_table()

    def upd(s: pa.Table, t: pa.Table):
        return pc.not_equal(s["content_sha256"], t["content_sha256"])

    def dele(s: pa.Table, t: pa.Table):
        return pc.equal(s["lang"], "md")

    merge.merge_into(lake_dir, ray.data.from_arrow(src),
                     when_matched_update_if=upd,
                     when_matched_delete_if=dele,
                     when_not_matched_insert=True)
    got = _lake_state(lake_dir)
    exp = _expected_merge(
        before, src,
        update_pred=lambda s, t: s["content_sha256"] != t[2],
        delete_pred=lambda s, t: s["lang"] == "md",
        insert=True)
    assert got == exp


def test_merge_into_insert_revives_tombstoned_key(tmp_path):
    lake_dir = _build_lake(tmp_path)
    state = oracle.replay(pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(2)],
        promote_options="permissive"))
    dead = next(k for k, v in state.items() if v["op"] == "D")
    # insert with an lsn BELOW the tombstone's — must still win
    content = "revived"
    row = {"repo": dead[0], "path": dead[1], "lsn": 1, "commit": "c" * 40,
           "lang": "py", "content": content,
           "content_sha256": hashlib.sha256(content.encode()).hexdigest()}
    merge.merge_into(lake_dir, ray.data.from_arrow(pa.Table.from_pylist([row])),
                     when_not_matched_insert=True)
    got = _lake_state(lake_dir)
    assert got[dead] == (1, "c" * 40, row["content_sha256"])


def test_merge_into_noop_conditions_keep_state(tmp_path):
    lake_dir = _build_lake(tmp_path)
    before = _lake_state(lake_dir)

    def never(s, t):
        return pc.equal(s["lsn"], -1)

    manifest = merge.merge_into(
        lake_dir, ray.data.from_arrow(_source_table()),
        when_matched_update_if=never, when_not_matched_insert=False)
    assert manifest["metrics"]["rows_applied"] == 0
    assert _lake_state(lake_dir) == before
    # the merge epoch's change feed is EMPTY — states identical
    assert feed.change_feed(lake_dir, manifest["epoch"],
                            manifest["epoch"]).count() == 0


def test_merge_epoch_composes_with_change_feed(tmp_path):
    lake_dir = _build_lake(tmp_path)
    before = _lake_state(lake_dir)
    src = _source_table()

    def upd(s: pa.Table, t: pa.Table):
        return pc.not_equal(s["content_sha256"], t["content_sha256"])

    manifest = merge.merge_into(lake_dir, ray.data.from_arrow(src),
                                when_matched_update_if=upd,
                                when_not_matched_insert=True)
    changes = feed.change_feed(lake_dir, manifest["epoch"],
                               manifest["epoch"]).take_all()
    got = {(r["_change_type"], r["repo"], r["path"]) for r in changes}
    exp = set()
    for r in src.to_pylist():
        k = (r["repo"], r["path"])
        if k in before:
            if r["content_sha256"] != before[k][2]:
                exp.add(("update_preimage", *k))
                exp.add(("update_postimage", *k))
        else:
            exp.add(("insert", *k))
    assert got == exp


def test_merge_into_requires_existing_lake_and_key(tmp_path):
    with pytest.raises(FileNotFoundError):
        merge.merge_into(str(tmp_path / "nope"),
                         ray.data.from_arrow(_source_table()))
    lake_dir = _build_lake(tmp_path)
    bad = _source_table().drop_columns(["lsn"])
    with pytest.raises(ValueError, match="lsn"):
        merge.merge_into(lake_dir, ray.data.from_arrow(bad))
