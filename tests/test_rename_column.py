"""Metadata-only RENAME COLUMN (cdc/lake.rename_column): instant
translation at read via schema field-metadata aliases, old-name mapping at
ingest, rename chains, composition with drop/restore/feed/stats-pruning,
and the guards."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, feed, lake
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow

SPEC = binlog.BinlogSpec(events_per_epoch=1200, n_repos=8, paths_per_repo=40,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=96, dup_lookback=1500)


def _engine(tmp_path, name="lake", **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / name), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _state(ds, lang_col=None) -> dict:
    df = ds.to_pandas()
    return {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256)
            + ((getattr(r, lang_col),) if lang_col else ())
            for r in df.itertuples()}


def test_rename_translates_instantly_zero_rewrite(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    before = _state(eng.read(), lang_col="lang")
    res = lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    assert res == {"renamed": ["lang", "language"], "epoch": 2}
    t = eng.read()
    assert "language" in t.schema().names and "lang" not in t.schema().names
    assert _state(t, lang_col="language") == before    # values intact
    # zero data rewritten: same partition records, same watermark
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    m2 = lake.read_manifest(eng.cfg.lake_dir, 2)
    assert m2["partitions"] == m1["partitions"]
    assert m2["lsn_watermark"] == m1["lsn_watermark"]
    # time travel to a pre-rename epoch shows the OLD name
    assert "lang" in eng.read(epoch=1).schema().names
    # point_read projects through the alias too
    k = sorted(before)[0]
    pr = lake.point_read(eng.cfg.lake_dir, [k]).to_pandas()
    assert "language" in pr.columns and len(pr) == 1
    assert pr["language"][0] == before[k][3]
    # the row-grain feed sees no change at the rename boundary
    assert collect_arrow(feed.change_feed(eng.cfg.lake_dir, 2, 2)).num_rows \
        == 0


@pytest.mark.parametrize("backend", ["map_groups", "actor_pool"])
def test_ingest_after_rename_maps_old_name(tmp_path, ray_session, backend):
    eng = _engine(tmp_path, backend=backend)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    # epoch 3 events still carry `lang` — mapped into `language`
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), eng.resume_point())
    t = eng.read()
    assert "language" in t.schema().names
    assert "lang" not in t.schema().names
    # parity: same three epochs into a fresh lake, then rename there
    ref = _engine(tmp_path, "ref")
    for ep in range(3):
        ref.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _state(t, lang_col="language") == _state(ref.read(),
                                                    lang_col="lang")
    # compact rewrites physically renamed the bytes in touched partitions
    m = lake.read_manifest(eng.cfg.lake_dir, 3)
    touched = [r["file"] for r in m["partitions"].values()
               if r.get("file") and "epoch=0003" in r["file"]]
    assert touched
    for f in touched:
        names = pq.read_schema(f).names
        assert "language" in names and "lang" not in names


def test_rename_chain_and_newest_alias_wins(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    before = _state(eng.read(), lang_col="lang")
    lake.rename_column(eng.cfg.lake_dir, "lang", "tongue")
    # files written BETWEEN the renames carry the mid-chain name
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), eng.resume_point())
    mid = _state(eng.read(), lang_col="tongue")
    lake.rename_column(eng.cfg.lake_dir, "tongue", "language")
    head = lake.read_manifest(eng.cfg.lake_dir,
                              lake.last_committed_epoch(eng.cfg.lake_dir))
    fld = lake.schema_from_b64(head["schema"]).field("language")
    assert lake.field_aliases(fld) == ("lang", "tongue")   # oldest-first
    assert _state(eng.read(), lang_col="language") == mid
    # re-delivery under the ORIGINAL name still maps to the head name
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), eng.resume_point())
    t = eng.read()
    assert _state(t, lang_col="language") == mid
    del before


def test_feed_across_rename_boundary(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), eng.resume_point())
    # the whole-range feed crosses the boundary: epoch-1 diffs load
    # pre-rename files on both sides through the alias — identical values
    # must NOT surface as updates, and the output speaks the NEW name
    f = collect_arrow(feed.change_feed(eng.cfg.lake_dir, 1, 3))
    assert "language" in f.column_names and "lang" not in f.column_names
    eps = f[feed.EPOCH_COL].to_pylist()
    assert 2 not in eps                      # rename epoch: zero rows
    assert eps.count(3) > 0                  # real ingest: real changes
    # apply_feed roundtrip across the boundary reconstructs the head. The
    # pre-rename base snapshot speaks `lang`; the consumer projects it to
    # the head's data schema first — the same alias-resolving projection
    # every reader uses
    head_schema = lake.schema_from_b64(
        lake.read_manifest(eng.cfg.lake_dir, 3)["schema"])
    data_schema = pa.schema([fl for fl in head_schema
                             if fl.name != "_deleted"])
    base = lake._unify_to(
        collect_arrow(lake.read_lake(eng.cfg.lake_dir, epoch=1)),
        data_schema)
    replayed = feed.apply_feed(base, f).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    head = eng.read().to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert replayed.equals(head[replayed.columns.tolist()])


def test_drop_after_rename_retires_aliases(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    res = lake.drop_column(eng.cfg.lake_dir, "language")
    assert res["dropped_columns"] == ["language", "lang"]
    # re-delivery under the OLD name: stripped, never resurrected
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), eng.resume_point())
    names = eng.read().schema().names
    assert "lang" not in names and "language" not in names
    # renaming another column ONTO a retired name is refused
    with pytest.raises(ValueError, match="retired by drop_column"):
        lake.rename_column(eng.cfg.lake_dir, "commit", "lang")


def test_restore_reverts_rename(tmp_path, ray_session):
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    before = _state(eng.read(), lang_col="lang")
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    lake.restore(eng.cfg.lake_dir, 1)
    t = eng.read()
    assert "lang" in t.schema().names and "language" not in t.schema().names
    assert _state(t, lang_col="lang") == before


def test_stats_pruning_survives_rename(tmp_path, ray_session):
    from e_commerce_batch_etl_pipeline_ray.cdc import zorder
    eng = _engine(tmp_path)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    zorder.optimize_zorder(eng.cfg.lake_dir, by=["lang"])
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    # stats were recorded under `lang`; the planner probes aliases, so
    # pruning stays effective under the NEW predicate name (a range above
    # every recorded max must prune EVERY file)
    plan = zorder.plan_range_scan(eng.cfg.lake_dir,
                                  {"language": ("zz", "zzzz")})
    assert plan["files_pruned"] == plan["files_total"] > 0
    got = zorder.range_scan(eng.cfg.lake_dir, {"language": ("go", "go")}) \
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = eng.read().to_pandas()
    want = want[want["language"] == "go"] \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])
    # metadata-only table stats fold old-name bounds into the new name
    st = lake.table_stats(eng.cfg.lake_dir, cols=("lsn", "language"))
    assert st["min"]["language"] <= "go" <= st["max"]["language"]


def test_both_names_in_one_batch_current_wins(tmp_path, ray_session):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    ev = binlog.gen_epoch(SPEC, 1).to_pandas()
    ev["language"] = "zz"                 # current name, should win
    ev = ev.rename(columns={})            # keeps `lang` too
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(ev, preserve_index=False)
        .replace_schema_metadata(None))
    eng.ingest_epoch(ds, eng.resume_point())
    df = eng.read().to_pandas()
    new_rows = df[df["lsn"] > SPEC.events_per_epoch]  # epoch-1 winners
    assert len(new_rows) and (new_rows["language"] == "zz").all()
    assert "lang" not in df.columns


def test_guards(tmp_path, ray_session):
    eng = _engine(tmp_path)
    with pytest.raises(FileNotFoundError, match="empty lake"):
        lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    for col in ("repo", "path", "lsn", "_deleted"):
        with pytest.raises(ValueError, match="key/protocol"):
            lake.rename_column(eng.cfg.lake_dir, col, "x")
        with pytest.raises(ValueError, match="key/protocol"):
            lake.rename_column(eng.cfg.lake_dir, "lang", col)
    with pytest.raises(ValueError, match="no-op"):
        lake.rename_column(eng.cfg.lake_dir, "lang", "lang")
    with pytest.raises(ValueError, match="not in lake schema"):
        lake.rename_column(eng.cfg.lake_dir, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        lake.rename_column(eng.cfg.lake_dir, "lang", "commit")
    lake.rename_column(eng.cfg.lake_dir, "lang", "language")
    # the old name is a live alias now: renaming another column onto it
    # would resurrect pre-rename bytes
    with pytest.raises(ValueError, match="historical alias"):
        lake.rename_column(eng.cfg.lake_dir, "commit", "lang")
