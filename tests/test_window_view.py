"""Watermarked tumbling-window aggregate: brute-force replay parity
(accept/drop/finalize rules), exactly-once finalized emission, late-drop
counting, crash/resume, watermark monotonicity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake, window_view

W_MIN = 60.0          # 1h windows
L_MIN = 120.0         # 2h allowed lateness
US = 60 * 1_000_000
T0 = 1_700_000_000 * 1_000_000        # fixed base timestamp (us)


def _epochs(seed=5, n_epochs=4, per_epoch=400):
    """Mostly time-ordered arrival with deterministic stragglers shifted
    one epoch late (some recoverable within lateness, some droppable)."""
    rng = np.random.default_rng(seed)
    span = 6 * 60 * US                # each epoch covers ~6h of event time
    rows = []
    for ep in range(n_epochs):
        for i in range(per_epoch):
            ts = T0 + ep * span + int(rng.integers(0, span))
            key = f"k{int(rng.integers(0, 3))}"
            val = float(rng.integers(0, 100))
            arrival = ep
            if i % 23 == 0 and ep + 1 < n_epochs:
                arrival = ep + 1      # late by up to ~6h (> 2h lateness)
            rows.append((arrival, ts, key, val))
    eps = []
    for ep in range(n_epochs):
        sub = [(ts, k, v) for a, ts, k, v in rows if a == ep]
        eps.append(pa.table({
            "ts": pa.array([r[0] for r in sub],
                           pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in sub]),
            "value": pa.array([r[2] for r in sub], pa.float64()),
        }))
    return eps


def _brute(eps):
    w_us, l_us = int(W_MIN * US / 60) * 60, int(L_MIN * US / 60) * 60
    w_us = int(W_MIN * 60 * 1_000_000)
    l_us = int(L_MIN * 60 * 1_000_000)
    state: dict = {}
    finalized: dict = {}
    wm = None
    dropped = 0
    for t in eps:
        for ts, k, v in zip(t["ts"].to_pylist(), t["event_type"].to_pylist(),
                            t["value"].to_pylist()):
            us = int(ts.timestamp() * 1_000_000)
            win = (us // w_us) * w_us
            if wm is not None and win + w_us <= wm:
                dropped += 1
                continue
            cur = state.setdefault((win, k), [0, 0.0])
            cur[0] += 1
            cur[1] += v
        mx = max(int(x.timestamp() * 1_000_000)
                 for x in t["ts"].to_pylist())
        wm = mx - l_us if wm is None else max(wm, mx - l_us)
        for (win, k) in [kk for kk in state if kk[0] + w_us <= wm]:
            finalized[(win, k)] = tuple(state.pop((win, k)))
    return finalized, state, dropped, wm


def _agg(tmp_path):
    return window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=str(tmp_path / "win"), window_minutes=W_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="event_type",
        value_col="value", num_partitions=4))


def test_windowed_aggregate_matches_bruteforce(tmp_path):
    eps = _epochs()
    agg = _agg(tmp_path)
    total_dropped = 0
    for ep, t in enumerate(eps):
        m = agg.ingest(ray.data.from_arrow(t).repartition(3), ep)
        total_dropped += m["late_dropped"]
    exp_fin, exp_open, exp_drop, exp_wm = _brute(eps)
    assert exp_drop > 0 and exp_fin, "fixture must drop and finalize"
    got_fin = {(r["window_us"], r["event_type"]): (r["n_rows"],
                                                   round(r["sum_val"], 6))
               for r in agg.finalized().take_all()}
    assert got_fin == {k: (n, round(s, 6)) for k, (n, s) in exp_fin.items()}
    got_open = {(r["window_us"], r["event_type"]): (r["n_rows"],
                                                    round(r["sum_val"], 6))
                for r in agg.open_windows().take_all()}
    assert got_open == {k: (n, round(s, 6)) for k, (n, s) in exp_open.items()}
    assert total_dropped == exp_drop
    assert agg.watermark() == exp_wm


def test_each_window_finalizes_exactly_once(tmp_path):
    eps = _epochs(seed=11)
    agg = _agg(tmp_path)
    for ep, t in enumerate(eps):
        agg.ingest(ray.data.from_arrow(t), ep)
    rows = agg.finalized().take_all()
    keys = [(r["window_us"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_crash_resume_rewrites_identically(tmp_path):
    import os
    eps = _epochs(seed=3, n_epochs=3)
    agg = _agg(tmp_path)
    for ep, t in enumerate(eps):
        agg.ingest(ray.data.from_arrow(t), ep)
    before = sorted((r["window_us"], r["event_type"], r["n_rows"])
                    for r in agg.finalized().take_all())
    os.remove(lake._manifest_path(str(tmp_path / "win"), 2))
    assert agg.resume_point() == 2
    agg.ingest(ray.data.from_arrow(eps[2]), 2)
    after = sorted((r["window_us"], r["event_type"], r["n_rows"])
                   for r in agg.finalized().take_all())
    assert after == before


def test_watermark_monotone_and_epoch_guard(tmp_path):
    import pytest
    eps = _epochs(seed=7, n_epochs=2)
    agg = _agg(tmp_path)
    agg.ingest(ray.data.from_arrow(eps[0]), 0)
    wm0 = agg.watermark()
    agg.ingest(ray.data.from_arrow(eps[1]), 1)
    assert agg.watermark() >= wm0
    with pytest.raises(ValueError, match="out of order"):
        agg.ingest(ray.data.from_arrow(eps[1]), 5)


def test_hopping_windows_match_bruteforce(tmp_path):
    """Sliding (hopping) windows: every row joins w/s overlapping windows;
    the same watermark accept/finalize rules apply per (row, window)."""
    SLIDE = 20.0          # 60-min windows hopping every 20 min
    eps = _epochs(seed=13, n_epochs=3, per_epoch=250)
    agg = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=str(tmp_path / "hop"), window_minutes=W_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="event_type",
        value_col="value", num_partitions=4, slide_minutes=SLIDE))
    for ep, t in enumerate(eps):
        agg.ingest(ray.data.from_arrow(t).repartition(2), ep)

    w_us = int(W_MIN * 60 * 1_000_000)
    s_us = int(SLIDE * 60 * 1_000_000)
    l_us = int(L_MIN * 60 * 1_000_000)
    state, finalized, wm = {}, {}, None
    for t in eps:
        for ts, k, v in zip(t["ts"].to_pylist(), t["event_type"].to_pylist(),
                            t["value"].to_pylist()):
            us = int(ts.timestamp() * 1_000_000)
            for i in range(w_us // s_us):
                win = (us // s_us) * s_us - i * s_us
                if wm is not None and win + w_us <= wm:
                    continue
                cur = state.setdefault((win, k), [0, 0.0])
                cur[0] += 1
                cur[1] += v
        mx = max(int(x.timestamp() * 1_000_000) for x in t["ts"].to_pylist())
        wm = mx - l_us if wm is None else max(wm, mx - l_us)
        for key in [kk for kk in state if kk[0] + w_us <= wm]:
            finalized[key] = tuple(state.pop(key))
    got = {(r["window_us"], r["event_type"]): (r["n_rows"],
                                               round(r["sum_val"], 6))
           for r in agg.finalized().take_all()}
    assert got == {k: (n, round(s, 6)) for k, (n, s) in finalized.items()}


def test_slide_must_divide_window(tmp_path):
    import pytest
    with pytest.raises(ValueError, match="multiple of slide"):
        window_view.WindowedAggregate(window_view.WindowConfig(
            state_dir=str(tmp_path / "bad"), window_minutes=60,
            lateness_minutes=10, slide_minutes=25))


# -- session windows --------------------------------------------------------

GAP_MIN = 5.0          # sparse fixture: most inter-event gaps exceed this


def _sess_brute(eps, gap_min=GAP_MIN, l_min=L_MIN):
    gap_us = int(gap_min * 60 * 1_000_000)
    l_us = int(l_min * 60 * 1_000_000)
    open_s: dict = {}          # key -> list of [start, last, n, sum]
    finalized = []
    wm = None
    dropped = 0
    for t in eps:
        for ts, k, v in zip(t["ts"].to_pylist(), t["event_type"].to_pylist(),
                            t["value"].to_pylist()):
            us = int(ts.timestamp() * 1_000_000)
            if wm is not None and us + gap_us <= wm:
                dropped += 1
                continue
            sess = open_s.setdefault(k, [])
            sess.append([us, us, 1, v])
            sess.sort()
            merged = [sess[0]]
            for s in sess[1:]:
                if s[0] <= merged[-1][1] + gap_us:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                    merged[-1][3] += s[3]
                else:
                    merged.append(s)
            open_s[k] = merged
        mx = max(int(x.timestamp() * 1_000_000) for x in t["ts"].to_pylist())
        wm = mx - l_us if wm is None else max(wm, mx - l_us)
        for k in list(open_s):
            keep = []
            for s in open_s[k]:
                if s[1] + gap_us <= wm:
                    finalized.append((k, s[0], s[1], s[2], round(s[3], 6)))
                else:
                    keep.append(s)
            open_s[k] = keep
    return sorted(finalized), dropped


def test_session_windows_match_bruteforce(tmp_path):
    eps = _epochs(seed=21, n_epochs=4, per_epoch=60)
    agg = window_view.SessionAggregate(window_view.SessionConfig(
        state_dir=str(tmp_path / "sess"), gap_minutes=GAP_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="event_type",
        value_col="value", num_partitions=4))
    dropped = 0
    for ep, t in enumerate(eps):
        m = agg.ingest(ray.data.from_arrow(t).repartition(3), ep)
        dropped += m["late_dropped"]
    exp, exp_drop = _sess_brute(eps)
    assert exp and exp_drop > 0, "fixture must finalize and drop"
    got = sorted((r["event_type"], r["start_us"], r["last_us"], r["n_rows"],
                  round(r["sum_val"], 6))
                 for r in agg.finalized().take_all())
    assert got == exp
    assert dropped == exp_drop


def test_session_merge_across_epochs(tmp_path):
    """An epoch-2 event inside the gap of an epoch-1 open session must
    extend that session, not start a new one."""
    t0 = T0
    gap_us = int(GAP_MIN * 60 * 1_000_000)
    e0 = pa.table({"ts": pa.array([t0, t0 + gap_us // 2],
                                  pa.timestamp("us")),
                   "event_type": pa.array(["a", "a"]),
                   "value": pa.array([1.0, 2.0], pa.float64())})
    # epoch 1: one event continuing the session + a far-future event that
    # pushes the watermark past the merged session's end
    far = t0 + 100 * gap_us
    e1 = pa.table({"ts": pa.array([t0 + gap_us, far], pa.timestamp("us")),
                   "event_type": pa.array(["a", "b"]),
                   "value": pa.array([4.0, 8.0], pa.float64())})
    agg = window_view.SessionAggregate(window_view.SessionConfig(
        state_dir=str(tmp_path / "sess"), gap_minutes=GAP_MIN,
        lateness_minutes=1.0, ts_col="ts", key_col="event_type",
        value_col="value", num_partitions=2))
    agg.ingest(ray.data.from_arrow(e0), 0)
    agg.ingest(ray.data.from_arrow(e1), 1)
    fin = {r["event_type"]: (r["start_us"], r["last_us"], r["n_rows"],
                             r["sum_val"])
           for r in agg.finalized().take_all()}
    assert fin["a"] == (t0, t0 + gap_us, 3, 7.0)     # ONE merged session


# -- hypothesis: the tumbling accept/drop/finalize recurrence ---------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ev_strategy = st.lists(
    st.tuples(st.integers(0, 2),                 # arrival epoch
              st.integers(0, 72) ,               # event-time offset (x10min)
              st.sampled_from(["a", "b"])),
    min_size=1, max_size=25)


@settings(max_examples=6, deadline=None)
@given(_ev_strategy)
def test_windowed_recurrence_property(tmp_path_factory, rows):
    """Arbitrary (arrival epoch, event time, key) streams: engine ==
    brute-force replay for finalized windows, open state, and drops."""
    eps = []
    for ep in range(3):
        sub = [r for r in rows if r[0] == ep]
        eps.append(pa.table({
            "ts": pa.array([T0 + off * 10 * US for _, off, _ in sub],
                           pa.timestamp("us")),
            "event_type": pa.array([k for _, _, k in sub]),
            "value": pa.array([1.0] * len(sub), pa.float64()),
        }))
    agg = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=str(tmp_path_factory.mktemp("hyp")), window_minutes=W_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="event_type",
        value_col="value", num_partitions=2))
    dropped = 0
    nonempty = [t for t in eps if t.num_rows]
    for ep, t in enumerate(nonempty):
        dropped += agg.ingest(ray.data.from_arrow(t), ep)["late_dropped"]
    exp_fin, exp_open, exp_drop, _ = _brute(nonempty)
    got_fin = {(r["window_us"], r["event_type"]): r["n_rows"]
               for r in agg.finalized().take_all()}
    got_open = {(r["window_us"], r["event_type"]): r["n_rows"]
                for r in agg.open_windows().take_all()}
    assert got_fin == {k: n for k, (n, _) in exp_fin.items()}
    assert got_open == {k: n for k, (n, _) in exp_open.items()}
    assert dropped == exp_drop


def test_int_key_windows_and_modulus_guard(tmp_path):
    """Integer key columns survive the placeholder/union path (review
    fix), and a modulus change is rejected instead of splitting state."""
    import pytest
    t0 = pa.table({"ts": pa.array([T0, T0 + 10 * US], pa.timestamp("us")),
                   "uid": pa.array([7, 8], pa.int64()),
                   "value": pa.array([1.0, 2.0], pa.float64())})
    t1 = pa.table({"ts": pa.array([T0 + 500 * US], pa.timestamp("us")),
                   "uid": pa.array([7], pa.int64()),
                   "value": pa.array([4.0], pa.float64())})
    agg = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=str(tmp_path / "ik"), window_minutes=W_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="uid",
        value_col="value", num_partitions=4))
    agg.ingest(ray.data.from_arrow(t0), 0)
    agg.ingest(ray.data.from_arrow(t1), 1)      # placeholder path w/ priors
    fin = {(r["window_us"], r["uid"]): r["n_rows"]
           for r in agg.finalized().take_all()}
    assert sum(fin.values()) == 2               # the two T0-hour events
    bad = window_view.WindowedAggregate(window_view.WindowConfig(
        state_dir=str(tmp_path / "ik"), window_minutes=W_MIN,
        lateness_minutes=L_MIN, ts_col="ts", key_col="uid",
        value_col="value", num_partitions=8))
    with pytest.raises(ValueError, match="constant modulus"):
        bad.ingest(ray.data.from_arrow(t1), 2)
