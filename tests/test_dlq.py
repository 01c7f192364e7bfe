"""Dead-letter queue suite (cdc/dlq.py + CDCConfig.dlq): reason
precedence, quarantine completeness (clean state == pre-cleaned replay),
cross-epoch accumulation, crash/resume exactly-once, vacuum + foreign
commit paths keep the DLQ lineage, and the repair/replay loop."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, dlq, engine, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2000)


def _dirty(ep: int) -> pa.Table:
    """Every 31st row rotates a corruption family (like the q140 fixture)."""
    t = binlog.gen_epoch_table(SPEC, ep)
    n = t.num_rows
    idx = np.arange(n)
    fam = np.where(idx % 31 == 0, idx // 31 % 4, -1)
    return pa.table({
        "lsn": pc.if_else(pa.array(fam == 1), pa.scalar(-7, pa.int64()),
                          t["lsn"].combine_chunks()),
        "op": pc.if_else(pa.array(fam == 2), pa.scalar("X"),
                         t["op"].combine_chunks()),
        "repo": t["repo"],
        "path": pc.if_else(pa.array(fam == 0), pa.nulls(n, pa.string()),
                           t["path"].combine_chunks()),
        "commit": t["commit"],
        "content": t["content"],
        "content_sha256": pc.if_else(
            pa.array(fam == 3),
            pc.binary_join_element_wise(
                pa.array(["zz"] * n),
                pc.utf8_slice_codeunits(
                    pc.fill_null(t["content_sha256"].combine_chunks(),
                                 "0" * 64), 2, 64), ""),
            t["content_sha256"].combine_chunks()),
    })


def _clean(t: pa.Table) -> pa.Table:
    return t.filter(pc.is_null(dlq.classify(t, check_sha=True)))


def _engine(tmp_path, name, **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / name), num_partitions=4,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _state(lake_dir):
    return lake.read_lake(lake_dir).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)


# -- classify ------------------------------------------------------------

def test_reason_precedence_and_edges():
    good_sha = hashlib.sha256(b"ok").hexdigest()
    t = pa.table({
        "lsn": pa.array([1, None, -1, 2, 3, 4, 5, 6], pa.int64()),
        "op": ["I", "I", "X", None, "Z", "I", "D", "U"],
        "repo": ["r", None, None, "r", "r", "r", "r", "r"],
        "path": ["p", "p", "p", "p", "p", "p", "p", "p"],
        "content": ["ok", "ok", "ok", "ok", "ok", "ok", None, "ok"],
        "content_sha256": [good_sha, good_sha, good_sha, good_sha,
                           good_sha, "f" * 64, None, None],
    })
    got = dlq.classify(t).to_pylist()
    assert got == [None,            # fully valid
                   "null_key",      # null repo wins over null lsn
                   "null_key",      # null repo wins over bad lsn + bad op
                   "bad_op",        # NULL op (SQL three-valued mirror)
                   "bad_op",
                   "sha_mismatch",
                   None,            # D with null content: sha not checked
                   "sha_mismatch"]  # content present, sha NULL
    # sha checking off: only structural reasons remain
    got2 = dlq.classify(t, check_sha=False).to_pylist()
    assert got2[5] is None and got2[7] is None


# -- end-to-end ----------------------------------------------------------

@pytest.mark.parametrize("backend", ["map_groups", "actor_pool"])
def test_quarantine_completeness(tmp_path, backend, ray_session):
    """dlq=True over the dirty binlog == plain ingest over the pre-cleaned
    binlog; the DLQ holds exactly the classify-flagged rows."""
    import ray.data as rd
    dirty0, dirty1 = _dirty(0), _dirty(1)
    eng = _engine(tmp_path, "dlq", backend=backend, dlq=True,
                  verify_sha=True)
    eng.ingest_epoch(rd.from_arrow(dirty0).repartition(6), 0)
    eng.ingest_epoch(rd.from_arrow(dirty1).repartition(6), 1)
    if eng._pool is not None:
        eng._pool.shutdown()
    ref = _engine(tmp_path, "ref", backend=backend)
    ref.ingest_epoch(rd.from_arrow(_clean(dirty0)).repartition(6), 0)
    ref.ingest_epoch(rd.from_arrow(_clean(dirty1)).repartition(6), 1)
    if ref._pool is not None:
        ref._pool.shutdown()
    assert _state(eng.cfg.lake_dir).equals(_state(ref.cfg.lake_dir))

    q = dlq.read_dlq(eng.cfg.lake_dir).to_pandas()
    exp = 0
    for ep, t in ((0, dirty0), (1, dirty1)):
        flagged = t.filter(pc.is_valid(dlq.classify(t)))
        exp += flagged.num_rows
        sub = q[q["_dlq_epoch"] == ep]
        assert len(sub) == flagged.num_rows
    assert len(q) == exp
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert m["dlq_rows"] == exp and len(m["dlq_files"]) >= 2
    # per-epoch filter
    assert len(dlq.read_dlq(eng.cfg.lake_dir, epoch=0).to_pandas()) < exp


def test_crash_resume_no_duplicate_dlq(tmp_path, ray_session):
    import ray.data as rd
    dirty0, dirty1 = _dirty(0), _dirty(1)
    eng = _engine(tmp_path, "lake", dlq=True, verify_sha=True)
    eng.ingest_epoch(rd.from_arrow(dirty0).repartition(6), 0)
    eng.ingest_epoch(rd.from_arrow(dirty1).repartition(6), 1)
    def _sorted(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    before = _sorted(dlq.read_dlq(eng.cfg.lake_dir).to_pandas())
    # crash after epoch-1 commit -> wipe its manifest, resume re-ingests
    os.remove(os.path.join(eng.cfg.lake_dir, "manifests",
                           "epoch-0001.json"))
    eng2 = _engine(tmp_path, "lake", dlq=True, verify_sha=True)
    assert eng2.resume_point() == 1
    eng2.ingest_epoch(rd.from_arrow(dirty1).repartition(6), 1)
    after = _sorted(dlq.read_dlq(eng2.cfg.lake_dir).to_pandas())
    assert before.equals(after)


def test_dlq_lineage_survives_other_commits_and_vacuum(tmp_path,
                                                       ray_session):
    import ray.data as rd
    eng = _engine(tmp_path, "lake", dlq=True, verify_sha=True)
    eng.ingest_epoch(rd.from_arrow(_dirty(0)).repartition(6), 0)
    files0 = lake.read_manifest(eng.cfg.lake_dir, 0)["dlq_files"]
    assert files0
    # a foreign commit path (DELETE WHERE) must carry the lineage forward
    eng.delete_where(lambda t: pc.equal(t["repo"], "org000/proj"), 1,
                     columns=["repo"])
    m = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert m["dlq_files"] == files0
    # vacuum keeps only the newest manifest — DLQ files stay referenced
    lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    for f in files0:
        assert os.path.exists(f)
    assert len(dlq.read_dlq(eng.cfg.lake_dir).to_pandas()) == \
        lake.read_manifest(eng.cfg.lake_dir, 1)["dlq_rows"]


def test_repair_and_replay(tmp_path, ray_session):
    """The DLQ loop closes: recompute the sha for quarantined
    sha_mismatch rows and re-ingest them as the next epoch — the final
    state equals a replay where those rows were never corrupted."""
    import ray.data as rd
    dirty = _dirty(0)
    eng = _engine(tmp_path, "lake", dlq=True, verify_sha=True)
    eng.ingest_epoch(rd.from_arrow(dirty).repartition(6), 0)
    q = dlq.read_dlq(eng.cfg.lake_dir).to_pandas()
    bad_sha = q[q["_dlq_reason"] == "sha_mismatch"]
    assert len(bad_sha) > 0
    repaired = bad_sha.drop(columns=["_dlq_reason", "_dlq_epoch"]).copy()
    repaired["content_sha256"] = [
        hashlib.sha256(c.encode()).hexdigest() for c in repaired["content"]]
    eng.ingest_epoch(rd.from_arrow(pa.Table.from_pandas(
        repaired, preserve_index=False)).repartition(2), 1)

    # reference: same binlog but with the sha family never corrupted
    t = dirty
    mask = pc.is_valid(dlq.classify(t, check_sha=True))
    structural = pc.is_valid(dlq.classify(t, check_sha=False))
    fixable = pc.and_(mask, pc.invert(structural))
    fixed_sha = pa.array([
        hashlib.sha256(c.encode()).hexdigest() if f and c is not None else s
        for c, s, f in zip(t["content"].to_pylist(),
                           t["content_sha256"].to_pylist(),
                           fixable.to_pylist())], pa.string())
    ref_events = t.set_column(
        t.column_names.index("content_sha256"), "content_sha256", fixed_sha)
    ref = _engine(tmp_path, "ref", dlq=True, verify_sha=True)
    ref.ingest_epoch(rd.from_arrow(ref_events).repartition(6), 0)
    assert _state(eng.cfg.lake_dir).equals(_state(ref.cfg.lake_dir))


# -- hypothesis property ---------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_sha_ok = hashlib.sha256(b"x").hexdigest()
_event = st.fixed_dictionaries({
    "lsn": st.one_of(st.none(), st.integers(-5, 5)),
    "op": st.one_of(st.none(), st.sampled_from(["I", "U", "D", "R", "X", ""])),
    "repo": st.one_of(st.none(), st.sampled_from(["r1", "r2"])),
    "path": st.one_of(st.none(), st.sampled_from(["p1", "p2"])),
    "content": st.one_of(st.none(), st.sampled_from(["x", "y"])),
    "content_sha256": st.one_of(st.none(),
                                st.sampled_from([_sha_ok, "f" * 64])),
})


def _reason_rowwise(r: dict) -> str | None:
    """Independent row-by-row replay of the documented contract."""
    if r["repo"] is None or r["path"] is None:
        return "null_key"
    if r["lsn"] is None or r["lsn"] < 0:
        return "bad_lsn"
    if r["op"] is None or r["op"] not in ("I", "U", "D", "R"):
        return "bad_op"
    if r["op"] != "D" and r["content"] is not None:
        want = hashlib.sha256(r["content"].encode()).hexdigest()
        if r["content_sha256"] is None or r["content_sha256"] != want:
            return "sha_mismatch"
    return None


@settings(max_examples=60, deadline=None)
@given(st.lists(_event, min_size=0, max_size=40))
def test_classify_matches_rowwise_oracle(rows):
    schema = pa.schema([("lsn", pa.int64()), ("op", pa.string()),
                        ("repo", pa.string()), ("path", pa.string()),
                        ("content", pa.string()),
                        ("content_sha256", pa.string())])
    t = pa.Table.from_pylist(rows, schema=schema)
    got = dlq.classify(t).to_pylist()
    assert got == [_reason_rowwise(r) for r in rows]
