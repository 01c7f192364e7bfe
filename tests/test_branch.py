"""Branches + write-audit-publish (cdc/branch.py): branch isolation, the
fast-forward publish (parent == a direct ingest of the same epochs, incl.
across the schema-evolution boundary), crash-mid-publish resume, conflict
detection, the audit gate, drop safety (published = hardlinked), and
parent-vacuum safety for open branches."""

from __future__ import annotations

import json
import os

import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, branch, engine, lake
from e_commerce_batch_etl_pipeline_ray.quality.checks import DQConfig

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=6, paths_per_repo=30,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2000)


def _table(lake_dir):
    df = lake.read_lake(lake_dir).to_pandas()
    cols = sorted(df.columns)
    return (df[cols].sort_values(["repo", "path"]).reset_index(drop=True)
            .astype(object).where(df[cols].notna().values, None))


def _mk_parent(tmp_path, epochs=1, name="lake"):
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / name), num_partitions=4,
        merge_concurrency=2))
    for ep in range(epochs):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    return eng


def _branch_ingest(lake_dir, name, epochs):
    beng = engine.CDCEngine(branch.branch_config(lake_dir, name,
                                                 merge_concurrency=2))
    for ep in epochs:
        beng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    return beng


def test_wap_roundtrip_equals_direct_ingest(tmp_path, ray_session):
    eng = _mk_parent(tmp_path, epochs=1)
    ld = eng.cfg.lake_dir
    before = _table(ld)

    info = branch.create_branch(ld, "staging")
    assert info["fork_epoch"] == 0
    _branch_ingest(ld, "staging", [1, 2])  # epoch 1 crosses the evolution

    # isolation: parent unchanged while the branch is 2 epochs ahead
    assert lake.last_committed_epoch(ld) == 0
    assert _table(ld).equals(before)
    assert lake.last_committed_epoch(branch.branch_dir(ld, "staging")) == 2

    res = branch.publish_branch(ld, "staging")
    assert res["epochs_published"] == 2 and res["parent_epoch"] == 2

    direct = _mk_parent(tmp_path, epochs=3, name="direct")
    assert _table(ld).equals(_table(direct.cfg.lake_dir))
    # time travel through the published boundary
    assert _table(ld).pipe(len) and lake.read_lake(ld, epoch=0).count() == \
        lake.read_lake(direct.cfg.lake_dir, epoch=0).count()
    # point reads (bloom sidecars were linked too)
    row = lake.read_lake(ld).take(1)[0]
    got = lake.point_read(ld, [(row["repo"], row["path"])]).take_all()
    assert len(got) == 1 and got[0]["lsn"] == row["lsn"]

    # drop after publish: hardlinked files keep the parent alive
    branch.drop_branch(ld, "staging")
    assert _table(ld).equals(_table(direct.cfg.lake_dir))


def test_publish_is_crash_resumable(tmp_path, ray_session, monkeypatch):
    eng = _mk_parent(tmp_path, epochs=1)
    ld = eng.cfg.lake_dir
    branch.create_branch(ld, "wip")
    _branch_ingest(ld, "wip", [1, 2])

    calls = {"n": 0}
    real_replace = os.replace

    def _crashy(src, dst):
        if dst.endswith(".json") and "manifests" in dst and \
                os.path.dirname(os.path.dirname(dst)) == ld:
            calls["n"] += 1
            if calls["n"] == 2:          # die before epoch 2's commit
                raise RuntimeError("crash mid-publish")
        return real_replace(src, dst)

    monkeypatch.setattr(branch.os, "replace", _crashy)
    with pytest.raises(RuntimeError, match="crash mid-publish"):
        branch.publish_branch(ld, "wip")
    monkeypatch.setattr(branch.os, "replace", real_replace)

    # prefix is a valid lake state
    assert lake.last_committed_epoch(ld) == 1
    lake.read_lake(ld).count()
    # resume completes and equals a direct ingest
    res = branch.publish_branch(ld, "wip")
    assert res["epochs_published"] == 1
    direct = _mk_parent(tmp_path, epochs=3, name="direct")
    assert _table(ld).equals(_table(direct.cfg.lake_dir))


def test_divergence_conflicts(tmp_path, ray_session):
    eng = _mk_parent(tmp_path, epochs=1)
    ld = eng.cfg.lake_dir
    branch.create_branch(ld, "stale")
    _branch_ingest(ld, "stale", [1])
    # the parent moves on with a DIFFERENT epoch 1
    other = binlog.BinlogSpec(events_per_epoch=900, n_repos=6,
                              paths_per_repo=30, evolution_epoch=1,
                              content_chars_min=16, content_chars_max=64)
    eng.ingest_epoch(binlog.gen_epoch(other, 1), 1)
    with pytest.raises(branch.BranchConflictError):
        branch.publish_branch(ld, "stale")
    # parent past the branch head conflicts too
    eng.ingest_epoch(binlog.gen_epoch(other, 2), 2)
    with pytest.raises(branch.BranchConflictError):
        branch.publish_branch(ld, "stale")
    # the branch itself is untouched and still readable
    assert lake.read_lake(branch.branch_dir(ld, "stale")).count() > 0


def test_audit_gate(tmp_path, ray_session):
    eng = _mk_parent(tmp_path, epochs=1)
    ld = eng.cfg.lake_dir
    branch.create_branch(ld, "audited")
    _branch_ingest(ld, "audited", [1])

    with pytest.raises(RuntimeError, match="no audit"):
        branch.publish_branch(ld, "audited", require_audit=True)

    # a failing audit (impossible lsn range) blocks publish
    _, status = branch.audit_branch(ld, "audited",
                                    DQConfig(range_checks={"lsn": (-2, -1)}))
    assert status == "FAIL"
    with pytest.raises(RuntimeError, match="failed its audit"):
        branch.publish_branch(ld, "audited", require_audit=True)

    # a passing audit of the HEAD unblocks it
    report, status = branch.audit_branch(
        ld, "audited", DQConfig(min_rows=1, max_null_pct={"repo": 0.0}))
    assert status in ("PASS", "WARN")
    assert any(r["check_name"] == "row_count" for r in report)
    res = branch.publish_branch(ld, "audited", require_audit=True)
    assert res["parent_epoch"] == 1

    # a stale audit (head moved after the audit) is refused
    branch.create_branch(ld, "stale-audit")
    _branch_ingest(ld, "stale-audit", [2])
    branch.audit_branch(ld, "stale-audit", DQConfig())
    _branch_ingest(ld, "stale-audit", [3])
    with pytest.raises(RuntimeError, match="re-audit"):
        branch.publish_branch(ld, "stale-audit", require_audit=True)


def test_drop_unpublished_and_vacuum_safety(tmp_path, ray_session):
    eng = _mk_parent(tmp_path, epochs=1)
    ld = eng.cfg.lake_dir
    before = _table(ld)

    branch.create_branch(ld, "scratch")
    _branch_ingest(ld, "scratch", [1])
    assert [b["name"] for b in branch.list_branches(ld)] == ["scratch"]
    branch.drop_branch(ld, "scratch")
    assert branch.list_branches(ld) == []
    assert _table(ld).equals(before)

    # open branch survives a parent that diverged AND vacuumed: the
    # branch's fork references into parent epoch dirs are kept
    branch.create_branch(ld, "open")
    bdir = branch.branch_dir(ld, "open")
    fork_state = _table(bdir)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 2)
    lake.vacuum(ld, keep_last=1)
    assert _table(bdir).equals(fork_state)

    # num_partitions guard: the branch config carries the fork modulus
    cfg = branch.branch_config(ld, "open")
    assert cfg.num_partitions == 4


def test_create_branch_guards(tmp_path, ray_session):
    eng = _mk_parent(tmp_path, epochs=2)
    ld = eng.cfg.lake_dir
    with pytest.raises(ValueError, match="unsafe"):
        branch.create_branch(ld, "../evil")
    branch.create_branch(ld, "b1", at_epoch=0)   # time-travel fork
    info = json.load(open(os.path.join(branch.branch_dir(ld, "b1"),
                                       "branch.json")))
    assert info["fork_epoch"] == 0
    with pytest.raises(FileExistsError):
        branch.create_branch(ld, "b1")
    # a time-travel fork reads the OLD state
    assert lake.read_lake(branch.branch_dir(ld, "b1")).count() == \
        lake.read_lake(ld, epoch=0).count()
