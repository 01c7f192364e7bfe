"""Partial-column (patch) CDC merge — cell-grain LWW (cdc/patch.py).

Covers: brute-force semantic parity, kernel associativity (the CRDT
property the shuffle relies on), epoch-slicing confluence, duplicate
redelivery idempotence, schema evolution at cell grain, delete/revive
interactions, and crash/resume through the shared lake protocol."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, patch
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
    read_parquet_clean,
)

CELLS = ["commit", "lang", "content", "content_sha256"]
SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=32,
                         content_chars_max=96)


def _brute_replay(ev: pa.Table) -> dict:
    """Single-process cell-LWW replay (the semantics oracle)."""
    state: dict = {}
    for r in ev.to_pylist():
        k = (r["repo"], r["path"])
        s = state.setdefault(
            k, {"del": -1, "lsn": -1, **{c: (None, -1) for c in CELLS}})
        if r["op"] == "D":
            s["del"] = max(s["del"], r["lsn"])
            continue
        s["lsn"] = max(s["lsn"], r["lsn"])
        setc = (CELLS if (r["op"] == "I" or r.get("cols") is None)
                else r["cols"].split(","))
        for c in setc:
            if r["lsn"] >= s[c][1]:
                s[c] = (r.get(c), r["lsn"])
    return {k: {**{c: (s[c][0] if s[c][1] > s["del"] else None)
                   for c in CELLS}, "lsn": s["lsn"]}
            for k, s in state.items() if s["lsn"] > s["del"]}


@pytest.fixture(scope="module")
def patch_binlog(tmp_path_factory):
    d = tmp_path_factory.mktemp("patchlog")
    files, tabs = [], []
    for ep in range(2):
        t = patch.gen_patch_epoch_table(SPEC, ep)
        p = str(d / f"epoch-{ep}.parquet")
        pq.write_table(t, p)
        files.append(p)
        tabs.append(t)
    return files, pa.concat_tables(tabs, promote_options="permissive")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)]
            .sort_values(["repo", "path"]).reset_index(drop=True))


def _ingest(files, num_partitions=8, blocks=5, **cfg_kw) -> patch.PatchCDCEngine:
    lake_dir = tempfile.mkdtemp(prefix="patchlake_", dir="/tmp")
    eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=num_partitions,
        merge_concurrency=2, **cfg_kw))
    for ep, p in enumerate(files):
        eng.ingest_epoch(read_parquet_clean(p, override_num_blocks=blocks), ep)
    return eng


def test_engine_matches_brute_replay(patch_binlog):
    files, ev = patch_binlog
    eng = _ingest(files)
    got = {(r["repo"], r["path"]): r for r in eng.read().take_all()}
    want = _brute_replay(ev)
    assert set(got) == set(want)
    for k, w in want.items():
        for c in [*CELLS, "lsn"]:
            assert got[k][c] == w[c], (k, c)


def test_kernel_is_associative(patch_binlog):
    _, ev = patch_binlog
    schema = patch.patch_state_schema(ev.schema, None)
    cells = patch.cell_columns(schema)
    norm = patch._normalize_patch_factory(schema, 1)(ev).drop_columns(["_pid"])
    whole = patch.combine_patch(norm, cells)
    for cut in (1, norm.num_rows // 3, norm.num_rows // 2):
        a = patch.combine_patch(norm.slice(0, cut), cells)
        b = patch.combine_patch(norm.slice(cut), cells)
        again = patch.combine_patch(pa.concat_tables([a, b]), cells)
        assert again.sort_by([("repo", "ascending"), ("path", "ascending")]) \
            .equals(whole.sort_by([("repo", "ascending"),
                                   ("path", "ascending")]))


def test_epoch_slicing_confluence(patch_binlog):
    files, ev = patch_binlog
    two = _norm(_ingest(files).read().to_pandas())
    one_lake = tempfile.mkdtemp(prefix="patchlake1_", dir="/tmp")
    eng1 = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=one_lake, num_partitions=8, merge_concurrency=2))
    eng1.ingest_epoch(ray.data.from_arrow(ev).repartition(7), 0)
    pd.testing.assert_frame_equal(two, _norm(eng1.read().to_pandas()),
                                  check_dtype=False)


def test_redelivery_is_noop(patch_binlog):
    files, _ = patch_binlog
    eng = _ingest(files)
    before = _norm(eng.read().to_pandas())
    eng.ingest_epoch(read_parquet_clean(files[1], override_num_blocks=3), 2)
    pd.testing.assert_frame_equal(before, _norm(eng.read().to_pandas()),
                                  check_dtype=False)


def test_crash_resume_byte_identical(patch_binlog):
    files, _ = patch_binlog
    eng = _ingest(files)
    before = _norm(eng.read().to_pandas())
    # simulate a crash mid-epoch-2: manifest gone, tmp debris left behind
    lake_dir = eng.cfg.lake_dir
    eng.ingest_epoch(read_parquet_clean(files[1], override_num_blocks=3), 2)
    os.remove(os.path.join(lake_dir, "manifests", "epoch-0002.json"))
    os.makedirs(os.path.join(lake_dir, ".tmp-epoch=3"), exist_ok=True)
    assert eng.resume_point() == 2
    eng.ingest_epoch(read_parquet_clean(files[1], override_num_blocks=3), 2)
    pd.testing.assert_frame_equal(before, _norm(eng.read().to_pandas()),
                                  check_dtype=False)


def test_patch_delete_revive_semantics():
    """Handcrafted interactions: patch loses to delete, patch revives the
    key with only its own cells, full image resets a later... earlier
    patch, explicit set-to-NULL wins over older values."""
    ev = pa.table({
        "lsn": pa.array([1, 2, 3, 4, 5, 6, 10, 11], pa.int64()),
        "op": ["I", "U", "D", "U", "U", "U", "I", "U"],
        "repo": ["r"] * 8,
        "path": ["a", "a", "a", "a", "b", "b", "b", "b"],
        "cols": [None, "commit", None, "lang", None, "commit", None, "lang"],
        "commit": ["c1", "c2", None, "zz", "c5", "c6", "c7", "ignored"],
        "lang": ["py", "zz", None, "rs", "go", "zz", None, None],
    })
    lake_dir = tempfile.mkdtemp(prefix="patchmini_", dir="/tmp")
    eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=4, merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(ev).repartition(3), 0)
    rows = {r["path"]: r for r in eng.read().take_all()}
    # key a: I@1, patch commit@2, D@3 (kills both), patch lang@4 revives
    assert rows["a"]["lsn"] == 4
    assert rows["a"]["commit"] is None          # killed by D@3
    assert rows["a"]["lang"] == "rs"            # set after the delete
    # key b: U-full@5, patch commit@6, I@10 resets ALL (lang -> NULL
    # explicitly), patch lang@11 sets NULL explicitly
    assert rows["b"]["lsn"] == 11
    assert rows["b"]["commit"] == "c7"          # from the I@10 full image
    assert rows["b"]["lang"] is None            # NULL set at 11 (and 10)


def test_schema_evolution_cell_grain():
    """Epoch-0 (no lang column) full image; epoch-1 lang patch adds the
    column — older full image keeps its other cells, lang appears."""
    e0 = pa.table({
        "lsn": pa.array([1], pa.int64()), "op": ["I"], "repo": ["r"],
        "path": ["p"], "cols": pa.array([None], pa.string()),
        "commit": ["c1"],
    })
    e1 = pa.table({
        "lsn": pa.array([2], pa.int64()), "op": ["U"], "repo": ["r"],
        "path": ["p"], "cols": ["lang"], "commit": ["ignored"],
        "lang": ["py"],
    })
    lake_dir = tempfile.mkdtemp(prefix="patchevo_", dir="/tmp")
    eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=2, merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(e0), 0)
    eng.ingest_epoch(ray.data.from_arrow(e1), 1)
    (row,) = eng.read().take_all()
    assert row["commit"] == "c1" and row["lang"] == "py" and row["lsn"] == 2


def test_unset_values_in_patch_rows_are_ignored(patch_binlog):
    """The fixture's patch rows carry generator values in UNSET columns;
    flipping those junk values must not change the final state."""
    files, ev = patch_binlog
    want = _brute_replay(ev)
    mangled = ev.to_pandas()
    is_patch = mangled["cols"].notna() & (mangled["op"] == "U")
    sets_commit = is_patch & mangled["cols"].str.contains("commit")
    mangled.loc[is_patch & ~sets_commit, "commit"] = "JUNK"
    lake_dir = tempfile.mkdtemp(prefix="patchjunk_", dir="/tmp")
    eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
        lake_dir=lake_dir, num_partitions=8, merge_concurrency=2))
    eng.ingest_epoch(ray.data.from_arrow(
        pa.Table.from_pandas(mangled, preserve_index=False)).repartition(5), 0)
    got = {(r["repo"], r["path"]): r for r in eng.read().take_all()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["commit"] == w["commit"], k


def test_point_read_matches_replay_and_prunes(patch_binlog, monkeypatch):
    """Pruned exact-key lookup on the patch lake: live keys return the
    cell-LWW state, dead + missing keys are absent, files written before
    the schema evolution unify cleanly, and ONLY the keys' hash partitions
    are opened (the pruning contract)."""
    files, ev = patch_binlog
    eng = _ingest(files)
    want = _brute_replay(ev)
    live = sorted(want)
    all_keys = set(zip(ev["repo"].to_pylist(), ev["path"].to_pylist()))
    dead = sorted(all_keys - set(live))
    assert dead, "fixture must contain dead keys"
    keys = live[::9][:15] + dead[:2] + [("no/such", "nope.py")]

    opened: list[str] = []
    real_read = pq.read_table

    def _spy(f, **kw):
        opened.append(f)
        return real_read(f, **kw)

    monkeypatch.setattr(patch.pq, "read_table", _spy)
    got = {(r["repo"], r["path"]): r
           for r in eng.point_read(keys).to_pylist()}
    # semantics: exactly the live requested keys, cell-exact
    assert set(got) == set(keys) & set(live)
    for k in set(got):
        for c in [*CELLS, "lsn"]:
            assert got[k][c] == want[k][c], (k, c)
    # pruning: a 2-key lookup opens only those keys' partitions, not all 8
    few = live[:2]
    opened.clear()
    few_got = {(r["repo"], r["path"]) for r in eng.point_read(few).to_pylist()}
    assert few_got == set(few)
    key_t = pa.table({"repo": [k[0] for k in few],
                      "path": [k[1] for k in few]})
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    pids = set(hash_partition_ids(key_t, ["repo", "path"], 8).tolist())
    assert len(set(opened)) <= len(pids) < 8


def test_point_read_missing_only_returns_empty_typed_table(patch_binlog):
    files, _ = patch_binlog
    eng = _ingest(files)
    out = eng.point_read([("no/such", "never.py")])
    assert out.num_rows == 0 and "commit" in out.column_names


# --- hypothesis property: the cell-LWW kernel vs a row-by-row oracle ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PROP_CELLS = ["commit", "lang"]

_events_st = st.lists(
    st.tuples(st.integers(0, 3),                       # key id
              st.sampled_from(["I", "U", "U", "D"]),   # op (U twice: bias)
              st.sampled_from([None, "commit", "lang", "commit,lang"]),
              st.integers(0, 9), st.integers(0, 9)),   # cell payloads
    min_size=1, max_size=40)


def _prop_table(evs):
    """Unique lsns (the binlog contract), shuffled delivery order via the
    hypothesis draw order itself; op I/D rows get cols=NULL."""
    n = len(evs)
    return pa.table({
        "lsn": pa.array(list(range(1, n + 1)), pa.int64()),
        "op": [e[1] for e in evs],
        "repo": ["r"] * n,
        "path": [f"k{e[0]}" for e in evs],
        "cols": pa.array([e[2] if e[1] == "U" else None for e in evs],
                         pa.string()),
        "commit": [f"c{e[3]}" for e in evs],
        "lang": [f"l{e[4]}" for e in evs],
    })


def _prop_replay(t: pa.Table) -> dict:
    state: dict = {}
    for r in t.to_pylist():
        k = r["path"]
        s = state.setdefault(
            k, {"del": -1, "lsn": -1,
                **{c: (None, -1) for c in _PROP_CELLS}})
        if r["op"] == "D":
            s["del"] = max(s["del"], r["lsn"])
            continue
        s["lsn"] = max(s["lsn"], r["lsn"])
        setc = (_PROP_CELLS if (r["op"] == "I" or r["cols"] is None)
                else r["cols"].split(","))
        for c in setc:
            if r["lsn"] >= s[c][1]:
                s[c] = (r[c], r["lsn"])
    return {k: {**{c: (s[c][0] if s[c][1] > s["del"] else None)
                   for c in _PROP_CELLS}, "lsn": s["lsn"]}
            for k, s in state.items() if s["lsn"] > s["del"]}


@settings(deadline=None, max_examples=80)
@given(_events_st, st.integers(1, 4), st.integers(0, 4))
def test_patch_kernel_property(evs, n_slices, dup_every):
    """For ANY event sequence, ANY slicing and exact duplicate redelivery:
    slicing the normalized rows, combining each slice and re-combining
    equals the one-shot combine (associativity + idempotence), and the
    tombstone-applied live rows equal the row-by-row oracle."""
    t = _prop_table(evs)
    if dup_every:
        dups = t.take(list(range(0, t.num_rows, dup_every + 1)))
        t = pa.concat_tables([t, dups])          # byte-identical redelivery
    schema = patch.patch_state_schema(t.schema, None)
    cells = patch.cell_columns(schema)
    norm = patch._normalize_patch_factory(schema, 1)(t).drop_columns(["_pid"])
    whole = patch.combine_patch(norm, cells).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    cut = max(1, norm.num_rows // n_slices)
    parts = [patch.combine_patch(norm.slice(i, cut), cells)
             for i in range(0, norm.num_rows, cut)]
    again = patch.combine_patch(pa.concat_tables(parts), cells).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert again.equals(whole)
    final = patch.apply_tombstones(whole, cells)
    final = final.filter(pc.invert(final["_deleted"]))
    got = {r["path"]: r for r in final.to_pylist()}
    want = _prop_replay(t)
    assert set(got) == set(want)
    for k, w in want.items():
        for c in [*_PROP_CELLS, "lsn"]:
            assert got[k][c] == w[c], (k, c)


# --- LSM delta mode (compact_interval > 1) -------------------------------

@pytest.mark.parametrize("interval", [2, 3])
def test_lsm_delta_mode_matches_compact(patch_binlog, interval):
    """compact_interval=2: epoch-0 delta, epoch-1 compacts base+delta;
    =3: BOTH epochs are deltas (read merges a base-less partition).
    read(), time travel and point_read must all equal the always-compact
    lake — the CRDT makes delta order irrelevant."""
    files, ev = patch_binlog
    compact_eng = _ingest(files)
    lsm_eng = _ingest(files, compact_interval=interval)
    pd.testing.assert_frame_equal(
        _norm(compact_eng.read().to_pandas()),
        _norm(lsm_eng.read().to_pandas()), check_dtype=False)
    # time travel to the (always-delta) epoch 0
    pd.testing.assert_frame_equal(
        _norm(compact_eng.read(epoch=0).to_pandas()),
        _norm(lsm_eng.read(epoch=0).to_pandas()), check_dtype=False)
    # manifest shape matches the mode schedule
    from e_commerce_batch_etl_pipeline_ray.cdc import lake as _lake
    m1 = _lake.read_manifest(lsm_eng.cfg.lake_dir, 1)
    has_deltas = any(r.get("deltas") for r in m1["partitions"].values())
    assert has_deltas == (interval == 3)
    # point_read parity over the LSM lake (tombstones in deltas must kill
    # base rows at the merge)
    want = _brute_replay(ev)
    keys = sorted(want)[::13][:10] + [("no/such", "x.py")]
    got = {(r["repo"], r["path"]): r
           for r in lsm_eng.point_read(keys).to_pylist()}
    assert set(got) == set(keys) & set(want)
    for k in got:
        for c in [*CELLS, "lsn"]:
            assert got[k][c] == want[k][c], (k, c)


def test_lsm_crash_resume_on_delta_epoch(patch_binlog):
    files, _ = patch_binlog
    eng = _ingest(files, compact_interval=3)     # every epoch a delta
    before = _norm(eng.read().to_pandas())
    lake_dir = eng.cfg.lake_dir
    eng.ingest_epoch(read_parquet_clean(files[1], override_num_blocks=3), 2)
    os.remove(os.path.join(lake_dir, "manifests", "epoch-0002.json"))
    os.makedirs(os.path.join(lake_dir, ".tmp-epoch=3"), exist_ok=True)
    assert eng.resume_point() == 2
    eng.ingest_epoch(read_parquet_clean(files[1], override_num_blocks=3), 2)
    pd.testing.assert_frame_equal(before, _norm(eng.read().to_pandas()),
                                  check_dtype=False)
