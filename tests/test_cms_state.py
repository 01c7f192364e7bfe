"""Incremental Count-Min state (cdc/cms_state.py): multi-epoch LSM state
== one-shot counters (slicing confluence), crash/resume does NOT double
count (protocol, not algebra — sum-merge is not idempotent), epoch-order
guard rejects replays of committed epochs, estimates stay overestimates
of true frequencies."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import cms_state, lake
from e_commerce_batch_etl_pipeline_ray.stages import sketch

D, W = 4, 256


def _data(n: int = 6000, seed: int = 9) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = rng.zipf(1.3, size=n) % 500     # skewed: CMS's home turf
    g = ["abc"[i % 3] for i in range(n)]
    return pa.table({"g": pa.array(g),
                     "user_id": pa.array(ids, pa.int64())})


def _cfg(tmp: str, compact_interval: int = 2) -> cms_state.IncCMSConfig:
    return cms_state.IncCMSConfig(
        state_dir=tmp, col="user_id", by=["g"], d=D, w=W,
        num_partitions=4, compact_interval=compact_interval)


def _ingest_epochs(eng, t: pa.Table, cuts, start: int = 0) -> None:
    for ep, (lo, hi) in enumerate(cuts, start=start):
        eng.ingest(ray.data.from_arrow(t.slice(lo, hi - lo)).repartition(3),
                   ep)


def _one_shot(t: pa.Table):
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    c = sketch.cms_counters(ray.data.from_arrow(t), "user_id", by=["g"],
                            d=D, w=W)
    return (collect_arrow(c).to_pandas()
            .sort_values(["g", "row", "idx"]).reset_index(drop=True))


def test_multi_epoch_equals_one_shot():
    t = _data()
    eng = cms_state.IncrementalCMS(_cfg(tempfile.mkdtemp(prefix="cms_t1_")))
    _ingest_epochs(eng, t, [(0, 2000), (2000, 4500), (4500, 6000)])
    state = eng.counters().to_pandas().reset_index(drop=True)
    solo = _one_shot(t)
    assert state.equals(solo[state.columns])


def test_crash_resume_does_not_double_count():
    t = _data()
    sd = tempfile.mkdtemp(prefix="cms_t2_")
    eng = cms_state.IncrementalCMS(_cfg(sd))
    _ingest_epochs(eng, t, [(0, 3000)])
    # crash mid-epoch-1: manifest wiped, promoted debris left behind —
    # with a NON-idempotent merge, a buggy resume would double count
    eng.ingest(ray.data.from_arrow(t.slice(3000, 3000)).repartition(3), 1)
    os.remove(os.path.join(sd, "manifests", "epoch-0001.json"))
    assert eng.resume_point() == 1
    eng.ingest(ray.data.from_arrow(t.slice(3000, 3000)).repartition(3), 1)
    state = eng.counters().to_pandas().reset_index(drop=True)
    assert state.equals(_one_shot(t)[state.columns])
    # total mass conserved exactly: sum over one row of the matrix == n
    one_row = state[state["row"] == 0]
    assert int(one_row["cnt"].sum()) == 6000


def test_committed_epoch_refuses_replay():
    t = _data(2000)
    eng = cms_state.IncrementalCMS(_cfg(tempfile.mkdtemp(prefix="cms_t3_")))
    _ingest_epochs(eng, t, [(0, 2000)])
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest(ray.data.from_arrow(t), 0)


def test_estimates_are_overestimates():
    t = _data()
    eng = cms_state.IncrementalCMS(_cfg(tempfile.mkdtemp(prefix="cms_t4_")))
    _ingest_epochs(eng, t, [(0, 3000), (3000, 6000)])
    df = t.to_pandas()
    for g in "abc":
        sub = df[df["g"] == g]
        truth = sub["user_id"].value_counts()
        keys = truth.index.to_numpy()[:50]
        est = eng.estimate(keys, group=(g,))
        assert (est >= truth.loc[keys].to_numpy()).all()
        # eps-delta style sanity: overestimate bounded by (e/w) * N
        assert (est - truth.loc[keys].to_numpy()
                <= np.e / W * len(sub) + 1).all()


def test_delta_state_bounded_and_compaction_folds():
    t = _data()
    sd = tempfile.mkdtemp(prefix="cms_t5_")
    eng = cms_state.IncrementalCMS(_cfg(sd, compact_interval=3))
    _ingest_epochs(eng, t, [(0, 2000), (2000, 4000), (4000, 6000)])
    m = lake.read_manifest(sd, 2)
    # epoch 2 compacted: no deltas remain, row bound groups x d x w
    for rec in m["partitions"].values():
        assert not rec.get("deltas")
    total = sum(r["rows_total"] for r in m["partitions"].values())
    assert total <= 3 * D * W
