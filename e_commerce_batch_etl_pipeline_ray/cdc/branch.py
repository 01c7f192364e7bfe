"""Branches + Write-Audit-Publish (WAP) on the CDC lake.

The Iceberg/Nessie-style staging workflow over the existing epoch/manifest
protocol (reference lineage: the notebook orchestrator's audit-then-load
gate, notebooks/07_pipeline_orchestrator.py:250-252, generalized to an
isolated staging namespace instead of an abort):

  create_branch(lake, "staging")   -> a CHILD LAKE at <lake>/branches/staging
     whose manifest chain is seeded with a verbatim copy of the parent's
     manifest at the fork epoch. ZERO data copy: the seed manifest (and
     carry-forward in later branch epochs) references the parent's files
     by path; the branch's own epochs write under its own directory. Every
     lake operation — ingest, read, time travel, point reads (blooms and
     all), feeds, views, optimize, DQ, DLQ — works on a branch unchanged,
     because a branch IS a lake.

  audit_branch(lake, "staging", dq) -> the one-pass DQ framework over the
     branch's LIVE state (the full post-merge table, not just an incoming
     epoch — this is what per-epoch gates can't see: cross-epoch nulls,
     whitelist drift, range violations introduced by LWW winners).
     Persists audit-NNNN.json next to the branch manifests.

  publish_branch(lake, "staging")  -> FAST-FORWARD: the parent adopts the
     branch's epochs beyond the fork. Per epoch ascending: hardlink the
     branch's new data files (+ bloom sidecars) into the parent's epoch
     dirs, then commit the branch manifest — file paths rewritten
     branch->parent — atomically (tmp + os.replace, the standard commit).
     A crash mid-publish leaves the parent at a committed PREFIX of the
     branch (a valid lake state at every point), and a re-run resumes
     idempotently: existing files are kept, already-committed parent
     manifests are verified equal instead of rewritten. Divergence (the
     parent committed its own epoch past the fork) raises
     BranchConflictError — publish is fast-forward-only by design: the
     WAP contract is that audited epochs land EXACTLY as audited, and a
     rebase would merge state the audit never saw.

  drop_branch(lake, "staging")     -> rmtree. Always safe: an unpublished
     branch owns only its own files; a published branch's files were
     HARDLINKED into the parent, so the parent's directory entries keep
     the inodes alive after the branch copy is removed.

Scale note: create/publish move MANIFESTS (KB of JSON) and create links —
no data bytes are read or copied at any point, so branching a 100 TB lake
costs the same as branching a 100 MB one. The only O(data) steps are the
ones the user explicitly runs ON the branch (ingest, audit's one-pass
scan).
"""

from __future__ import annotations

import json
import os
import shutil

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.keybloom import BLOOM_SUFFIX

BRANCHES_DIR = "branches"
_INFO = "branch.json"


class BranchConflictError(RuntimeError):
    """The parent advanced past the fork with different epochs — the
    branch can no longer fast-forward onto it."""


def branch_dir(lake_dir: str, name: str) -> str:
    return os.path.join(lake_dir, BRANCHES_DIR, name)


def _info_path(bdir: str) -> str:
    return os.path.join(bdir, _INFO)


def _read_info(bdir: str) -> dict:
    with open(_info_path(bdir)) as f:
        return json.load(f)


def _write_info(bdir: str, info: dict) -> None:
    tmp = _info_path(bdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, _info_path(bdir))


def create_branch(lake_dir: str, name: str,
                  at_epoch: int | None = None) -> dict:
    """Fork a branch off the parent's committed state at ``at_epoch``
    (default: latest). Metadata-only — copies ONE manifest file."""
    if not name.replace("_", "").replace("-", "").isalnum():
        raise ValueError(f"unsafe branch name {name!r}")
    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    fork = last if at_epoch is None else at_epoch
    src = os.path.join(lake_dir, lake.MANIFEST_DIR,
                       f"epoch-{fork:04d}.json")
    if not os.path.exists(src):
        raise FileNotFoundError(f"no manifest for epoch {fork} (vacuumed?)")
    bdir = branch_dir(lake_dir, name)
    if os.path.exists(bdir):
        raise FileExistsError(f"branch {name!r} already exists")
    os.makedirs(os.path.join(bdir, lake.MANIFEST_DIR))
    # materialize the LOGICAL manifest (a delta-log fork manifest would
    # dangle — the branch dir has no ancestor manifests to fold back to)
    dst = os.path.join(bdir, lake.MANIFEST_DIR, f"epoch-{fork:04d}.json")
    fork_manifest = lake.read_manifest(lake_dir, fork)
    with open(dst + ".tmp", "w") as f:
        json.dump(fork_manifest, f)
    os.replace(dst + ".tmp", dst)
    info = {"name": name, "fork_epoch": fork, "published": False}
    _write_info(bdir, info)
    return info


def list_branches(lake_dir: str) -> list[dict]:
    root = os.path.join(lake_dir, BRANCHES_DIR)
    out = []
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            bdir = os.path.join(root, name)
            if os.path.exists(_info_path(bdir)):
                info = _read_info(bdir)
                info["last_epoch"] = lake.last_committed_epoch(bdir)
                out.append(info)
    return out


def branch_config(lake_dir: str, name: str, **overrides):
    """A CDCConfig for ingesting INTO the branch — num_partitions (the
    immutable key->partition modulus) comes from the fork manifest, so a
    branch engine can never be constructed with the wrong routing."""
    from e_commerce_batch_etl_pipeline_ray.cdc.engine import CDCConfig
    bdir = branch_dir(lake_dir, name)
    fork = _read_info(bdir)["fork_epoch"]
    m = lake.read_manifest(bdir, fork)
    return CDCConfig(lake_dir=bdir,
                     num_partitions=m.get("num_partitions", 32),
                     **overrides)


def audit_branch(lake_dir: str, name: str, dq) -> tuple[list[dict], str]:
    """Run the DQ framework (quality.checks.DQConfig) over the branch's
    live state; persist the report as manifests/audit-NNNN.json in the
    branch. Returns (report_rows, status). Does not gate — publish does,
    when asked (require_audit=True)."""
    from e_commerce_batch_etl_pipeline_ray.quality.checks import run_checks
    bdir = branch_dir(lake_dir, name)
    epoch = lake.last_committed_epoch(bdir)
    report, status = run_checks(lake.read_lake(bdir), dq, gate=False)
    path = os.path.join(bdir, lake.MANIFEST_DIR, f"audit-{epoch:04d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "status": status,
                   "report": report.to_pylist()}, f)
    os.replace(tmp, path)
    return report.to_pylist(), status


def _last_audit_status(bdir: str) -> tuple[int, str] | None:
    mdir = os.path.join(bdir, lake.MANIFEST_DIR)
    audits = sorted(f for f in os.listdir(mdir)
                    if f.startswith("audit-") and f.endswith(".json"))
    if not audits:
        return None
    with open(os.path.join(mdir, audits[-1])) as f:
        a = json.load(f)
    return a["epoch"], a["status"]


def _rewrite_paths(manifest: dict, bdir: str,
                   lake_dir: str) -> tuple[dict, list[tuple[str, str]]]:
    """Map every file path under the branch dir to its parent-side home.
    Returns (rewritten manifest, [(src, dst) link plan]). Paths already in
    the parent (carry-forward references to pre-fork files) pass through
    untouched — they need no link and no rewrite."""
    prefix = os.path.normpath(bdir) + os.sep
    links: list[tuple[str, str]] = []

    def _map(p: str) -> str:
        q = os.path.normpath(p)
        if not q.startswith(prefix):
            return p
        dst = os.path.join(lake_dir, q[len(prefix):])
        links.append((q, dst))
        return dst

    out = dict(manifest)
    out["partitions"] = {}
    for pid, rec in manifest["partitions"].items():
        rec = dict(rec)
        if rec.get("file"):
            rec["file"] = _map(rec["file"])
        if rec.get("novel_file"):
            rec["novel_file"] = _map(rec["novel_file"])
        if rec.get("deltas"):
            rec["deltas"] = [_map(d) for d in rec["deltas"]]
        if rec.get("dv"):
            # deletion-vector sidecars publish like data files; covers are
            # rewritten the same way so apply_dv matches the published paths
            rec["dv"] = [{**e, "file": _map(e["file"]),
                          "covers": [_map(c) for c in e["covers"]]}
                         for e in rec["dv"]]
        out["partitions"][pid] = rec
    for key in ("removal_log", "dlq_files"):
        if manifest.get(key):
            out[key] = [_map(p) for p in manifest[key]]
    return out, links


def _link(src: str, dst: str) -> int:
    """Hardlink (zero-copy, same filesystem) with copy fallback; idempotent
    — an existing destination is a completed earlier attempt (publish
    writes each file exactly once, under a deterministic name)."""
    if os.path.exists(dst):
        return 0
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)
    return 1


def publish_branch(lake_dir: str, name: str,
                   require_audit: bool = False) -> dict:
    """Fast-forward the parent onto the branch head. See module doc for
    the crash/resume and conflict contracts."""
    bdir = branch_dir(lake_dir, name)
    info = _read_info(bdir)
    fork = info["fork_epoch"]
    blast = lake.last_committed_epoch(bdir)
    plast = lake.last_committed_epoch(lake_dir)

    if require_audit:
        a = _last_audit_status(bdir)
        if a is None:
            raise RuntimeError(f"branch {name!r} has no audit; run "
                               "audit_branch before publish")
        if a[0] != blast:
            raise RuntimeError(
                f"branch {name!r} last audit is for epoch {a[0]} but the "
                f"head is {blast}; re-audit the head")
        if a[1] == "FAIL":
            raise RuntimeError(f"branch {name!r} failed its audit; "
                               "publish refused")

    if plast is not None and plast > blast:
        raise BranchConflictError(
            f"parent is at epoch {plast}, past the branch head {blast}")

    epochs_published = files_linked = 0
    for e in range(fork + 1, blast + 1):
        rewritten, links = _rewrite_paths(lake.read_manifest(bdir, e),
                                          bdir, lake_dir)
        ppath = os.path.join(lake_dir, lake.MANIFEST_DIR,
                             f"epoch-{e:04d}.json")
        if os.path.exists(ppath):
            # resume / divergence check: an already-committed parent epoch
            # must be byte-equal in content to what we'd publish
            if lake.read_manifest(lake_dir, e) != rewritten:
                raise BranchConflictError(
                    f"parent epoch {e} diverges from branch {name!r}; "
                    "fast-forward impossible (re-branch and re-apply)")
            continue
        for src, dst in links:
            files_linked += _link(src, dst)
            if os.path.exists(src + BLOOM_SUFFIX):
                files_linked += _link(src + BLOOM_SUFFIX, dst + BLOOM_SUFFIX)
        # manifest commit LAST — readers/resume never see an epoch whose
        # files aren't all in place (same ordering as ingest's promote)
        tmp = ppath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rewritten, f)
        os.replace(tmp, ppath)
        epochs_published += 1

    info["published"] = True
    _write_info(bdir, info)
    return {"epochs_published": epochs_published,
            "files_linked": files_linked,
            "parent_epoch": lake.last_committed_epoch(lake_dir)}


def drop_branch(lake_dir: str, name: str) -> None:
    """Remove the branch directory. Safe published or not (see module
    doc: published files are hardlinked, the parent keeps the inodes)."""
    bdir = branch_dir(lake_dir, name)
    if not os.path.isdir(bdir):
        raise FileNotFoundError(f"no branch {name!r}")
    shutil.rmtree(bdir)


def branch_referenced_files(lake_dir: str) -> set[str]:
    """realpaths of every file referenced by any branch's manifests —
    lake.vacuum keeps these so vacuuming the parent can never break an
    open (unpublished) branch's fork-point references."""
    out: set[str] = set()
    root = os.path.join(lake_dir, BRANCHES_DIR)
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        mdir = os.path.join(root, name, lake.MANIFEST_DIR)
        if not os.path.isdir(mdir):
            continue
        for f in os.listdir(mdir):
            if not (f.startswith("epoch-") and f.endswith(".json")):
                continue
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            for rec in m.get("partitions", {}).values():
                for p in ([rec.get("file"), rec.get("novel_file")]
                          + list(rec.get("deltas", []))
                          + [e["file"] for e in rec.get("dv", [])]):
                    if p:
                        out.add(os.path.realpath(p))
            for key in ("removal_log", "dlq_files"):
                for p in m.get(key, []):
                    out.add(os.path.realpath(p))
    return out
