"""Incremental paragraph dedup (cdc/paradedup_state.py): streaming
semantics vs the one-shot operator, epoch-slicing invariance, LSM
delta/compact equivalence, crash/replay byte-identity."""

from __future__ import annotations

import glob
import hashlib
import os
import tempfile

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc.paradedup_state import (
    IncParaDedupConfig,
    IncrementalParaDedup,
)

SEP = "\n\n"

CORPUS = [
    (0, "boiler\n\nalpha"),
    (1, "beta\n\nboiler"),             # cross-doc dup within epoch
    (2, None),
    (3, "boiler\n\ngamma\n\ngamma"),   # cross-epoch dup + within-doc dup
    (4, "alpha"),                      # whole doc already seen
    (5, "delta\n\n\n\ndelta"),         # empty segment kept, dup removed
]


def _mk(rows):
    return ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": [r[1] for r in rows]}))


def _expected(rows):
    seen: set[str] = set()
    exp = {}
    for did, tx in rows:
        if tx is None:
            exp[did] = (None, None, None)
            continue
        paras = tx.split(SEP)
        kept, removed = [], 0
        for p in paras:
            if len(p) == 0:
                kept.append(p)
                continue
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        exp[did] = (SEP.join(kept), len(paras), removed)
    return exp


def _new(tmp=None, **kw):
    d = tmp or tempfile.mkdtemp(prefix="ipd_t_", dir="/tmp")
    cfg = dict(state_dir=d, num_partitions=4, compact_interval=2)
    cfg.update(kw)
    return IncrementalParaDedup(IncParaDedupConfig(**cfg))


def _docs_map(ipd, epochs):
    out = {}
    for e in epochs:
        for r in ipd.docs(e).take_all():
            out[r["doc_id"]] = (r["text"], r["n_paras"], r["n_removed"])
    return out


def test_streaming_equals_oneshot_any_slicing():
    exp = _expected(CORPUS)
    for slices in ([(0, 6)], [(0, 3), (3, 6)], [(0, 2), (2, 4), (4, 6)]):
        ipd = _new()
        for e, (lo, hi) in enumerate(slices):
            ipd.ingest(_mk(CORPUS[lo:hi]), e)
        got = _docs_map(ipd, range(len(slices)))
        assert got == exp, (slices, got)


def test_delta_vs_compact_equivalence():
    exp = _expected(CORPUS)
    for ci in (1, 3):
        ipd = _new(compact_interval=ci)
        ipd.ingest(_mk(CORPUS[:3]), 0)
        ipd.ingest(_mk(CORPUS[3:]), 1)
        assert _docs_map(ipd, (0, 1)) == exp
        assert ipd.seen_paras() == 5  # boiler alpha beta gamma delta


def test_crash_replay_byte_identical():
    ipd = _new()
    ipd.ingest(_mk(CORPUS[:3]), 0)
    ipd.ingest(_mk(CORPUS[3:]), 1)

    def _digest():
        out = {}
        for f in sorted(glob.glob(os.path.join(
                ipd.cfg.state_dir, "epoch=0001", "*.parquet"))):
            out[os.path.basename(f)] = hashlib.sha256(
                open(f, "rb").read()).hexdigest()
        return out

    before = _digest()
    os.remove(os.path.join(ipd.cfg.state_dir, "manifests",
                           "epoch-0001.json"))
    ipd2 = _new(tmp=ipd.cfg.state_dir)
    assert ipd2.resume_point() == 1
    ipd2.ingest(_mk(CORPUS[3:]), 1)
    assert _digest() == before
    assert _docs_map(ipd2, (0, 1)) == _expected(CORPUS)


def test_out_of_order_epoch_rejected():
    ipd = _new()
    ipd.ingest(_mk(CORPUS[:3]), 0)
    try:
        ipd.ingest(_mk(CORPUS[3:]), 2)
        raise AssertionError("expected out-of-order rejection")
    except ValueError as e:
        assert "out of order" in str(e)


def test_state_carries_text_free():
    # the scale contract: state files hold shas only, never paragraph text
    import pyarrow.parquet as pq
    ipd = _new(compact_interval=1)
    ipd.ingest(_mk(CORPUS[:3]), 0)
    for f in glob.glob(os.path.join(ipd.cfg.state_dir,
                                    "epoch=0000", "part-*.parquet")):
        assert pq.read_schema(f).names == ["sha"]


def test_phase1_executes_once(tmp_path):
    """ADVICE r4: the side-effecting phase-1 map_groups (_ParaApply —
    state writes + lineage sidecars) must execute exactly ONCE per epoch.
    The detach() after the groupby materializes it; count() and the
    doc_lineage join then read block refs, never the lineage. Pinned by
    counting _ParaApply mentions across the executed streaming plans."""
    import logging

    msgs: list[str] = []
    h = logging.Handler()
    h.emit = lambda r: msgs.append(r.getMessage())
    lg = logging.getLogger("ray.data")
    old_level = lg.level
    lg.addHandler(h)
    lg.setLevel(logging.INFO)
    try:
        eng = IncrementalParaDedup(IncParaDedupConfig(
            state_dir=str(tmp_path / "s"), num_partitions=4))
        eng.ingest(_mk(CORPUS[:4]), 0)
    finally:
        lg.removeHandler(h)
        lg.setLevel(old_level)
    plans = [m for m in msgs
             if "Execution plan" in m and "_ParaApply" in m]
    assert len(plans) == 1, plans
