"""Stream-stream interval join (cdc/stream_join.py): exactly-once pair
emission across epochs, window inclusivity, per-side watermark late drops,
buffer GC by the other side's watermark, crash/replay determinism."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.stream_join import (
    StreamJoin,
    StreamJoinConfig,
)


def _ev(rows) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.Table.from_pylist([
        {"lsn": lsn, "repo": k[0], "path": k[1], "commit": c}
        for k, lsn, c in rows]))


K1 = ("org/a", "src/x.py")
K2 = ("org/b", "src/y.py")


def _mk(window=5, lateness=0, **kw) -> StreamJoin:
    return StreamJoin(StreamJoinConfig(
        state_dir=tempfile.mkdtemp(prefix="sj_", dir="/tmp"),
        window=window, lateness=lateness, num_partitions=4, **kw))


def test_interval_join_exactly_once_and_inclusive_window():
    sj = _mk(window=5)
    # epoch 0: left rows buffered, one in-epoch pair (K1 10 x 14)
    m0 = sj.ingest(_ev([(K1, 10, "l1"), (K2, 100, "l2")]),
                   _ev([(K1, 14, "r1")]), 0)
    assert m0["matches"] == 1
    # epoch 1: right arrivals complete buffered lefts — |10-15| == 5 is
    # INSIDE the window (inclusive); K2 at distance 6 is not
    m1 = sj.ingest(_ev([]), _ev([(K1, 15, "r2"), (K2, 106, "r3")]), 1)
    assert m1["matches"] == 1
    got = sj.matches().to_pandas().sort_values(
        ["repo", "l_lsn", "r_lsn"]).reset_index(drop=True)
    assert list(zip(got["repo"], got["l_lsn"], got["r_lsn"])) == [
        ("org/a", 10, 14), ("org/a", 10, 15)]
    assert list(got["l_commit"]) == ["l1", "l1"]
    assert list(got["r_commit"]) == ["r1", "r2"]


def test_late_drop_and_buffer_gc():
    sj = _mk(window=3, lateness=0)
    sj.ingest(_ev([(K1, 100, "l1")]), _ev([(K2, 100, "r0")]), 0)
    # both watermarks are now 100: the left arrival at lsn 50 AND the
    # right at 51 are LATE -> dropped, nothing pairs
    m1 = sj.ingest(_ev([(K1, 50, "late")]), _ev([(K1, 51, "r1")]), 1)
    assert m1["late_dropped"] == 2 and m1["matches"] == 0
    # buffer GC: left 100 survives only while 100+3 >= wm_right; push
    # wm_right to 200 -> pruned; a right arrival at 101 then finds nothing
    m2 = sj.ingest(_ev([]), _ev([(K2, 200, "r2")]), 2)
    buf = sj.buffered().to_pandas()
    assert not ((buf["_side"] == "L") & (buf["lsn"] == 100)).any()
    m3 = sj.ingest(_ev([]), _ev([(K1, 101, "r3")]), 3)
    assert m3["matches"] == 0
    assert m2["matches"] == 0


def test_crash_replay_rewrites_identical_and_resume():
    sj = _mk(window=5)
    sj.ingest(_ev([(K1, 10, "l1")]), _ev([(K1, 12, "r1")]), 0)
    sj.ingest(_ev([(K1, 20, "l2")]), _ev([(K1, 22, "r2")]), 1)
    want = sj.matches().to_pandas().sort_values(
        ["l_lsn", "r_lsn"]).reset_index(drop=True)
    # crash after data promote, before manifest: drop the head manifest
    os.remove(os.path.join(sj.cfg.state_dir, "manifests",
                           "epoch-0001.json"))
    assert sj.resume_point() == 1
    sj.ingest(_ev([(K1, 20, "l2")]), _ev([(K1, 22, "r2")]), 1)
    got = sj.matches().to_pandas().sort_values(
        ["l_lsn", "r_lsn"]).reset_index(drop=True)
    assert got.equals(want)
    # each pair exactly once
    assert len(got) == len(got.drop_duplicates())
    assert len(got) == 2
    # vacuum keeps both state and matches files
    lake.vacuum(sj.cfg.state_dir, keep_last=1)
    assert sj.matches().count() == 2


def test_empty_epochs_advance_nothing_but_commit():
    sj = _mk(window=5)
    sj.ingest(_ev([(K1, 10, "l1")]), _ev([]), 0)
    m = sj.ingest(_ev([]), _ev([]), 1)
    assert m["matches"] == 0
    # buffered left row still waiting
    assert sj.buffered().count() == 1
    m2 = sj.ingest(_ev([]), _ev([(K1, 13, "r1")]), 2)
    assert m2["matches"] == 1
