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


# -- OUTER emission (Flink SQL outer interval join) --------------------------


def test_left_outer_timeout_at_eviction_not_finalize():
    sj = _mk(window=3, outer="left")
    # epoch 0: two left rows; K1 pairs in-epoch, K2 does not
    m0 = sj.ingest(_ev([(K1, 10, "l1"), (K2, 20, "l2")]),
                   _ev([(K1, 11, "r1")]), 0)
    assert m0["matches"] == 1 and m0["timeouts"] == 0
    # epoch 1: wm_right jumps to 100 -> both lefts evicted; only the
    # never-matched K2 row emits a timeout
    m1 = sj.ingest(_ev([]), _ev([(K2, 100, "r2")]), 1)
    assert m1["timeouts"] == 1 and m1["matches"] == 0
    got = sj.matches().to_pandas()
    to = got[got["r_lsn"].isna()]
    assert list(to["repo"]) == ["org/b"] and list(to["l_lsn"]) == [20]
    assert list(to["l_commit"]) == ["l2"]
    assert to["r_commit"].isna().all()
    # finalize: the right rows flush too, but outer='left' never emits them
    m2 = sj.ingest(_ev([]), _ev([]), 2, finalize=True)
    assert m2["timeouts"] == 0
    assert len(sj.matches().to_pandas()) == 2  # 1 pair + 1 timeout


def test_matched_flag_survives_epochs():
    sj = _mk(window=10, outer="left")
    sj.ingest(_ev([(K1, 10, "l1")]), _ev([(K1, 12, "r1")]), 0)  # matched
    # several empty epochs later the row is evicted — it must NOT time out
    sj.ingest(_ev([]), _ev([(K1, 500, "r2")]), 1)
    m2 = sj.ingest(_ev([]), _ev([]), 2, finalize=True)
    got = sj.matches().to_pandas()
    assert m2["timeouts"] == 0
    assert got["r_lsn"].notna().all() and len(got) == 1


def test_finalize_flushes_tail():
    sj = _mk(window=3, outer="full")
    sj.ingest(_ev([(K1, 10, "l1")]), _ev([(K2, 10, "r1")]), 0)
    m1 = sj.ingest(_ev([]), _ev([]), 1, finalize=True)
    assert m1["timeouts"] == 2          # both sides flushed, both unmatched
    got = sj.matches().to_pandas().sort_values("repo").reset_index(drop=True)
    assert len(got) == 2
    lrow = got[got["repo"] == "org/a"].iloc[0]
    rrow = got[got["repo"] == "org/b"].iloc[0]
    import pandas as pd
    assert lrow["l_lsn"] == 10 and pd.isna(lrow["r_lsn"])
    assert rrow["r_lsn"] == 10 and pd.isna(rrow["l_lsn"])
    assert rrow["r_commit"] == "r1" and lrow["l_commit"] == "l1"


def test_outer_crash_replay_byte_identical():
    import glob
    import hashlib

    sj = _mk(window=3, outer="left")
    sj.ingest(_ev([(K1, 10, "l1"), (K2, 20, "l2")]),
              _ev([(K1, 11, "r1")]), 0)
    sj.ingest(_ev([]), _ev([(K2, 100, "r2")]), 1)

    def _digest(d):
        out = {}
        for f in sorted(glob.glob(os.path.join(d, "epoch=0001", "*.parquet"))):
            out[os.path.basename(f)] = hashlib.sha256(
                open(f, "rb").read()).hexdigest()
        return out

    before = _digest(sj.cfg.state_dir)
    # crash: drop epoch 1's commit record, replay it
    os.remove(os.path.join(sj.cfg.state_dir, "manifests", "epoch-0001.json"))
    sj2 = StreamJoin(sj.cfg)
    assert sj2.resume_point() == 1
    sj2.ingest(_ev([]), _ev([(K2, 100, "r2")]), 1)
    assert _digest(sj.cfg.state_dir) == before
    got = sj2.matches().to_pandas()
    assert len(got) == 2 and got["r_lsn"].isna().sum() == 1


def test_outer_mode_is_chain_constant(tmp_path):
    """ADVICE r4: the outer mode is persisted in the manifest and cannot
    change mid-chain (flipping it on over pre-existing buffers would
    re-emit already-matched rows as timeouts)."""
    import pytest

    sd = str(tmp_path / "sj")
    left = _ev([(K1, 1, "l1")])
    right = _ev([(K1, 2, "r1")])
    sj = StreamJoin(StreamJoinConfig(state_dir=sd, window=5, lateness=0,
                                     num_partitions=4, outer="none"))
    sj.ingest(left, right, 0)
    flipped = StreamJoin(StreamJoinConfig(state_dir=sd, window=5,
                                          lateness=0, num_partitions=4,
                                          outer="left"))
    with pytest.raises(ValueError, match="chain-constant"):
        flipped.ingest(_ev([(K1, 10, "l2")]), _ev([]), 1)
    # same mode continues fine
    sj.ingest(_ev([(K1, 10, "l2")]), _ev([(K1, 11, "r2")]), 1)
