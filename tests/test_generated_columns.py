"""GENERATED ALWAYS AS columns (CDCConfig.generated): computed at every
write from the normalized batch, stored physically, recomputed on update,
forbidden on the wire, present in bootstrap snapshots and LSM deltas,
usable for stats pruning."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1000, n_repos=8, paths_per_repo=30,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1200)


def _gen():
    def gen_len(t):
        import pyarrow.compute as _pc
        return _pc.utf8_length(t["content"])
    return (("content_len", pa.int64(), gen_len),)


def _engine(tmp_path, name="lake", **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / name), num_partitions=8,
                           merge_concurrency=2, generated=_gen(), **kw)
    return engine.CDCEngine(cfg)


def test_computed_stored_and_recomputed_on_update(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    df = eng.read().to_pandas()
    assert "content_len" in df.columns
    assert (df["content_len"] == df["content"].str.len()).all()
    # physically stored: the parquet files carry the column
    import pyarrow.parquet as pq
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    f = next(r["file"] for r in m["partitions"].values() if r.get("file"))
    assert "content_len" in pq.read_schema(f).names
    # updates recompute: epoch-1 winners' lengths reflect epoch-1 content
    # (already covered by the vectorized equality over the merged state)


def test_events_must_not_carry_the_name(tmp_path, ray_session):
    eng = _engine(tmp_path)
    ev = binlog.gen_epoch(SPEC, 0).to_pandas()
    ev["content_len"] = 7
    ds = ray.data.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)
                             .replace_schema_metadata(None))
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        eng.ingest_epoch(ds, 0)
    assert lake.last_committed_epoch(eng.cfg.lake_dir) is None


def test_bootstrap_computes_then_catchup(tmp_path, ray_session):
    eng = _engine(tmp_path)
    snap = pa.table({
        "repo": pa.array(["a/r", "b/r"], pa.string()),
        "path": pa.array(["x.py", "y.py"], pa.string()),
        "content": pa.array(["hello", "worlds!"], pa.string()),
    })
    eng.bootstrap(ray.data.from_arrow(snap), lsn0=10)
    df = eng.read().to_pandas().sort_values("path").reset_index(drop=True)
    assert df["content_len"].tolist() == [5, 7]
    # snapshot carrying the name is refused
    bad = snap.append_column("content_len", pa.array([1, 2], pa.int64()))
    eng2 = _engine(tmp_path, "lake2")
    with pytest.raises(ValueError, match="generated column"):
        eng2.bootstrap(ray.data.from_arrow(bad), lsn0=10)
    # catch-up ingest recomputes for new rows
    ev = pa.table({
        "lsn": pa.array([11], pa.int64()),
        "op": pa.array(["U"], pa.string()),
        "repo": pa.array(["a/r"], pa.string()),
        "path": pa.array(["x.py"], pa.string()),
        "content": pa.array(["hi"], pa.string()),
    })
    eng.ingest_epoch(ray.data.from_arrow(ev), 1)
    df = eng.read().to_pandas().sort_values("path").reset_index(drop=True)
    assert df["content_len"].tolist() == [2, 7]


def test_lsm_delta_parity_and_tombstone_null(tmp_path, ray_session):
    lsm = _engine(tmp_path, "lsm", compact_interval=3)
    compact = _engine(tmp_path, "compact")
    for ep in range(2):
        lsm.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        compact.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    a = lsm.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    b = compact.read().to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    assert a.equals(b[a.columns.tolist()])
    # a predicate delete's tombstone computes over its null payload -> null
    k = (a.iloc[0]["repo"], a.iloc[0]["path"])

    def pred(t):
        import pyarrow.compute as _pc
        return _pc.and_(_pc.equal(t["repo"], k[0]),
                        _pc.equal(t["path"], k[1]))

    compact.delete_where(pred, compact.resume_point())
    tombs = compact.read(include_tombstones=True).to_pandas()
    trow = tombs[(tombs["repo"] == k[0]) & (tombs["path"] == k[1])
                 & tombs["_deleted"]]
    assert len(trow) == 1 and trow["content_len"].isna().all()
