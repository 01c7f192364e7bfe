"""Stream-shaped operators over event tables (engine brief / ray_guide
'Streaming-shaped workloads'). Ray Data has no native event-time windows;
these express them as key-partitioned grouped computations:

  * tumbling_window — floor event time to a fixed window + grouped aggregate
  * sessionize — per-key session assignment (gap > timeout starts a new
    session) via groupby(key).map_groups over ts-sorted groups

Ordering assumption: correctness needs each key's events co-located (the
groupby shuffle guarantees it) and sorted within the group (done inside the
group fn) — NOT globally ordered arrival, matching the CDC engine's
order-free LWW philosophy.
"""

from __future__ import annotations

import pandas as pd

from e_commerce_batch_etl_pipeline_ray.core import FnStep


def tumbling_window(ts_col: str, unit: str = "day", out: str = "window_start") -> FnStep:
    """Floor timestamps to the window start (compose with grouped_aggregate
    for windowed aggregates — see queries.q11_window_agg)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _fn(t: pa.Table) -> pa.Table:
        col = pc.floor_temporal(t[ts_col], unit=unit)
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, col)
        return t.append_column(out, col)

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"tumbling[{unit}]", _apply)


def sessionize(key_col: str, ts_col: str, gap_minutes: float = 30.0,
               order_cols: list[str] | None = None) -> FnStep:
    """Per-key sessionization: events for one key, sorted by (ts, order_cols),
    belong to the same session until a gap > ``gap_minutes``; emits one row
    per session with n_events / session_start / session_end.

    Session ids are 0-based per key in ts order — deterministic given the
    tiebreak columns.
    """
    order = [ts_col] + list(order_cols or [])

    def _per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        gap = g[ts_col].diff() > pd.Timedelta(minutes=gap_minutes)
        g["session_id"] = gap.fillna(False).cumsum().astype("int64")
        out = g.groupby("session_id", sort=True).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    def _apply(ds):
        return ds.groupby(key_col).map_groups(_per_key, batch_format="pandas")
    return FnStep(f"sessionize[{key_col}]", _apply)


def asof_join_last_event(key_col: str, ts_col: str, marker_col: str,
                         marker_value: str, out: str,
                         tiebreak_cols: list[str] | None = None) -> FnStep:
    """As-of self-join: for each non-marker row, the timestamp of the most
    recent marker row (e.g. last 'signup' before each event) of the SAME key.

    Ray shape (ray_guide 'As-of / range join'): co-locate by key via the
    groupby shuffle, then pandas merge_asof per ts-sorted group. Matches at
    equal timestamps are allowed (<=).
    """
    order = [ts_col] + list(tiebreak_cols or [])

    def _per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        markers = g[g[marker_col] == marker_value][[ts_col]].rename(
            columns={ts_col: out})
        rest = g[g[marker_col] != marker_value]
        if rest.empty:
            return rest.assign(**{out: pd.Series([], dtype=g[ts_col].dtype)})
        if markers.empty:
            return rest.assign(**{out: pd.NaT})
        joined = pd.merge_asof(rest, markers, left_on=ts_col, right_on=out,
                               direction="backward", allow_exact_matches=True)
        return joined

    def _apply(ds):
        return ds.groupby(key_col).map_groups(_per_key, batch_format="pandas")
    return FnStep(f"asof[{marker_value}]", _apply)
