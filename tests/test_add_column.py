"""ALTER TABLE ADD COLUMN [DEFAULT] (lake.add_column): metadata-only
commit, default backfill at read AND at ingest, explicit-null preservation,
default survival across later ingests and renames, range_scan matchability
of pre-add files (no dead-file shortcut for defaulted columns)."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import engine, lake, zorder


def _events(n: int = 20, lsn0: int = 0, stars=None) -> pa.Table:
    rows = []
    for i in range(n):
        r = {"lsn": lsn0 + i, "op": "I", "repo": f"org{i % 3}/proj",
             "path": f"src/f{i}.py", "commit": f"c{i:04x}" * 10,
             "content": f"def f{i}(): pass", "content_sha256": None}
        if stars is not None:
            r["stars"] = stars(i)
        rows.append(r)
    return pa.Table.from_pylist(rows)


def _mk() -> engine.CDCEngine:
    lake_dir = tempfile.mkdtemp(prefix="addcol_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=4, merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(_events()).repartition(2), 0)
    return eng


def test_add_column_default_backfills_read_and_ingest():
    eng = _mk()
    files = sorted(glob.glob(os.path.join(eng.cfg.lake_dir, "epoch=*",
                                          "part-*.parquet")))
    inodes = {f: os.stat(f).st_ino for f in files}
    out = lake.add_column(eng.cfg.lake_dir, "stars", pa.int64(), default=7)
    assert out["epoch"] == 1
    # metadata-only: zero files rewritten
    assert {f: os.stat(f).st_ino for f in files} == inodes
    # pre-add files read the DEFAULT (not null)
    df = eng.read().to_pandas()
    assert list(df["stars"].unique()) == [7]
    # time travel BEFORE the add has no such column
    assert "stars" not in eng.read(epoch=0).to_pandas().columns

    # ingest events NOT carrying the column -> default written physically
    eng.ingest_epoch(ray.data.from_arrow(_events(6, lsn0=100)), 2)
    df = eng.read().to_pandas()
    assert set(df["stars"]) == {7}
    # ...and it IS in the bytes now (compact rewrite materialized it)
    import pyarrow.parquet as pq
    m = lake.read_manifest(eng.cfg.lake_dir, 2)
    rewritten = [r["file"] for r in m["partitions"].values()
                 if "epoch=0002" in r["file"]]
    assert rewritten
    t = pq.read_table(rewritten[0])
    assert "stars" in t.column_names and t["stars"].null_count == 0

    # events CARRYING the column keep their values — explicit null stays
    ev = _events(6, lsn0=200,
                 stars=lambda i: None if i % 3 == 0 else i)
    eng.ingest_epoch(ray.data.from_arrow(ev), 3)
    df = eng.read().to_pandas().sort_values(["repo", "path"])
    upd = df[df["lsn"] >= 200]
    assert upd["stars"].isna().sum() == 2
    assert set(upd["stars"].dropna()) == {1, 2, 4, 5}


def test_add_column_guards():
    eng = _mk()
    with pytest.raises(ValueError, match="already exists"):
        lake.add_column(eng.cfg.lake_dir, "content", pa.string())
    with pytest.raises(ValueError, match="not a valid"):
        lake.add_column(eng.cfg.lake_dir, "stars", pa.int64(),
                        default="seven")
    lake.drop_column(eng.cfg.lake_dir, "commit")
    with pytest.raises(ValueError, match="retired"):
        lake.add_column(eng.cfg.lake_dir, "commit", pa.string())
    lake.rename_column(eng.cfg.lake_dir, "content", "body")
    with pytest.raises(ValueError, match="alias"):
        lake.add_column(eng.cfg.lake_dir, "content", pa.string())


def test_default_survives_rename_and_later_ingests():
    eng = _mk()
    lake.add_column(eng.cfg.lake_dir, "stars", pa.int64(), default=7)
    # a later ingest carrying the column must not strip the default
    # metadata from the schema chain (pa.unify_schemas keeps field meta)
    eng.ingest_epoch(ray.data.from_arrow(
        _events(4, lsn0=100, stars=lambda i: 50 + i)), 2)
    sch = lake.schema_from_b64(lake.read_manifest(
        eng.cfg.lake_dir, 2)["schema"])
    assert lake.field_default(sch.field("stars")) == (True, 7)
    # rename keeps the default under the new name
    lake.rename_column(eng.cfg.lake_dir, "stars", "rating")
    sch = lake.schema_from_b64(lake.read_manifest(
        eng.cfg.lake_dir, 3)["schema"])
    assert lake.field_default(sch.field("rating")) == (True, 7)
    df = eng.read().to_pandas()
    # epoch-2 winners carry 50+i; every untouched row reads the default
    assert set(df["rating"]) == {7, 50, 51, 52, 53}


def test_range_scan_matches_defaulted_column_in_old_files():
    eng = _mk()
    lake.add_column(eng.cfg.lake_dir, "stars", pa.int64(), default=7)
    # pre-add files lack the column physically — the scan must NOT take
    # the dead-file shortcut, and the default must match the predicate
    got = zorder.range_scan(eng.cfg.lake_dir, {"stars": (7, 7)}).to_pandas()
    assert len(got) == 20 and set(got["stars"]) == {7}
    assert zorder.range_scan(eng.cfg.lake_dir,
                             {"stars": (8, 9)}).count() == 0
