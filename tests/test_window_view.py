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
