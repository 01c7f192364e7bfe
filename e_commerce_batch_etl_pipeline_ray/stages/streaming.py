"""Stream-shaped operators over event tables (engine brief / ray_guide
'Streaming-shaped workloads'). Ray Data has no native event-time windows;
these express them as KEY-PARTITIONED grouped computations:

  * tumbling_window — floor event time to a fixed window + grouped aggregate
  * sessionize — per-key session assignment (gap > timeout starts a new one)
  * asof_join_last_event — per-key backward as-of self-join
  * running_aggregate — per-key cumulative sum

Scale shape (same as stages/dedup.py): rows are hash-partitioned on
``hash(key) % num_partitions`` and the per-group function runs ONCE PER
PARTITION over all of that partition's keys with vectorized pandas groupby
kernels (grouped diff/cumsum, merge_asof with by=) — exactly
``num_partitions`` Python dispatches total, never one per key. (Round 1
used groupby(key).map_groups: one pandas call per key — correct, but at
100x the key count that is the dispatch bottleneck; VERDICT r1 #4.)

Ordering assumption: correctness needs each key's events co-located (the
partition shuffle guarantees it) and sorted within the partition (done
inside the partition fn) — NOT globally ordered arrival, matching the CDC
engine's order-free LWW philosophy.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.core import FnStep
from e_commerce_batch_etl_pipeline_ray.stages.dedup import hash_partition_ids

_PID = "__spart_id"


def partitioned_apply(key_col: str, fn: Callable[[pd.DataFrame], pd.DataFrame],
                      name: str, num_partitions: int = 64) -> FnStep:
    """Co-locate keys by hash partition, then run ``fn`` once per partition
    (a partition-level pandas frame holding ALL of its keys' rows, _pid
    already stripped). ``fn`` must handle multiple keys vectorized."""

    def _apply(ds):
        def _assign(t: pa.Table) -> pa.Table:
            pid = hash_partition_ids(t, [key_col], num_partitions)
            return t.append_column(_PID, pa.array(pid, pa.int32()))

        def _run(g: pd.DataFrame) -> pd.DataFrame:
            return fn(g.drop(columns=[_PID]))

        ds = ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
        return ds.groupby(_PID).map_groups(_run, batch_format="pandas")

    return FnStep(name, _apply)


def tumbling_window(ts_col: str, unit: str = "day", out: str = "window_start") -> FnStep:
    """Floor timestamps to the window start (compose with grouped_aggregate
    for windowed aggregates — see queries.q11_window_agg)."""
    import pyarrow.compute as pc

    def _fn(t: pa.Table) -> pa.Table:
        col = pc.floor_temporal(t[ts_col], unit=unit)
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, col)
        return t.append_column(out, col)

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"tumbling[{unit}]", _apply)


def sliding_window(ts_col: str, window_minutes: int, slide_minutes: int,
                   out: str = "window_start") -> FnStep:
    """Sliding event-time windows: every row is replicated into each of the
    ``window_minutes / slide_minutes`` windows covering its timestamp (a
    row-local flat-map — no shuffle; compose with grouped_aggregate for the
    windowed aggregate, exactly like tumbling_window).

    ``window_minutes`` must be a multiple of ``slide_minutes`` (hopping
    windows); the fan-out factor is their ratio.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if window_minutes % slide_minutes != 0:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    n_rep = window_minutes // slide_minutes

    def _fn(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t[ts_col], multiple=slide_minutes,
                                 unit="minute")
        parts = []
        for k in range(n_rep):
            shift = pa.scalar(k * slide_minutes * 60_000_000, pa.duration("us"))
            ws = pc.subtract(base, shift)
            parts.append(t.append_column(out, ws))
        return pa.concat_tables(parts)

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"sliding[{window_minutes}/{slide_minutes}]", _apply)


def sessionize(key_col: str, ts_col: str, gap_minutes: float = 30.0,
               order_cols: list[str] | None = None,
               num_partitions: int = 64) -> FnStep:
    """Per-key sessionization: events for one key, sorted by (ts, order_cols),
    belong to the same session until a gap > ``gap_minutes``; emits one row
    per session with n_events / session_start / session_end.

    Session ids are 0-based per key in ts order — deterministic given the
    tiebreak columns. Partition-level vectorization: ONE sort + grouped
    diff/cumsum per partition covers every key in it.
    """
    order = [ts_col] + list(order_cols or [])

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort")
        # grouped diff: NaT at each key's first row -> gap False -> session 0
        gap = (g.groupby(key_col, sort=False)[ts_col].diff()
               > pd.Timedelta(minutes=gap_minutes))
        g["session_id"] = gap.groupby(g[key_col], sort=False).cumsum().astype("int64")
        out = g.groupby([key_col, "session_id"], sort=True).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index()
        return out

    return partitioned_apply(key_col, _per_partition,
                             f"sessionize[{key_col}]", num_partitions)


def asof_join_last_event(key_col: str, ts_col: str, marker_col: str,
                         marker_value: str, out: str,
                         tiebreak_cols: list[str] | None = None,
                         num_partitions: int = 64) -> FnStep:
    """As-of self-join: for each non-marker row, the timestamp of the most
    recent marker row (e.g. last 'signup' before each event) of the SAME key.
    Matches at equal timestamps are allowed (<=).

    Ray shape (ray_guide 'As-of / range join'): co-locate by key via the
    hash-partition shuffle, then ONE ``pd.merge_asof(..., by=key)`` per
    partition — pandas' by= grouping is vectorized across all keys.
    """
    order = [ts_col] + list(tiebreak_cols or [])

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        markers = (g.loc[g[marker_col] == marker_value, [key_col, ts_col]]
                   .rename(columns={ts_col: out})
                   .sort_values(out, kind="mergesort"))
        rest = (g[g[marker_col] != marker_value]
                .sort_values(order, kind="mergesort"))
        if rest.empty:
            return rest.assign(**{out: pd.Series([], dtype=g[ts_col].dtype)})
        if markers.empty:
            return rest.assign(**{out: pd.NaT})
        return pd.merge_asof(rest, markers, left_on=ts_col, right_on=out,
                             by=key_col, direction="backward",
                             allow_exact_matches=True)

    return partitioned_apply(key_col, _per_partition,
                             f"asof[{marker_value}]", num_partitions)


def window_functions(key_col: str, order_cols: list[str],
                     specs: list[dict],
                     num_partitions: int = 64) -> FnStep:
    """SQL window/ranking functions over ``PARTITION BY key ORDER BY
    order_cols`` (the reference's Spark ``Window.partitionBy(...).orderBy``
    surface — e.g. notebooks/02_transformations ROW_NUMBER dedup idiom —
    generalized).

    ``specs`` is a list of dicts, each producing one output column:

      {"kind": "row_number", "out": "rn"}
      {"kind": "rank" | "dense_rank", "out": "rk", "order": [cols]}  # optional
           per-spec ORDER BY override (ties allowed; rank/dense_rank are
           deterministic even with ties)
      {"kind": "lag" | "lead", "col": "value", "offset": 1, "out": "prev"}
      {"kind": "ntile", "n": 4, "out": "quartile"}   # SQL NTILE: first
           (cnt % n) buckets get the extra row
      {"kind": "sum"|"avg"|"min"|"max"|"count", "col": "value",
       "rows_preceding": 3, "out": "mov"}   # frame aggregate over
           ROWS BETWEEN rows_preceding PRECEDING AND CURRENT ROW;
           rows_preceding=None (default) = UNBOUNDED PRECEDING (running
           aggregate). Forward frames are not supported — mirror is the
           SQL trailing frame exactly (truncated at the partition head).
      {"kind": "sum"|..., "col": "value", "range_preceding": "1h",
       "range_on": "ts", "out": "mov"}      # RANGE BETWEEN INTERVAL x
           PRECEDING AND CURRENT ROW over the (timestamp) order key —
           closed both ends, duplicate-key peers included (SQL RANGE
           semantics). range_preceding: pd.Timedelta / "1h" / seconds.

    Scale shape: ONE hash-partition shuffle on ``key_col``, then one
    vectorized pandas pass per partition covering all of its keys (grouped
    cumcount/shift/ffill — no per-key dispatch). Specs with an ``order``
    override re-sort within the partition (cheap, partition-local).

    Determinism: specs WITHOUT an override require ``order_cols`` to be a
    total order within each key (e.g. include a unique id); rank/dense_rank
    with ties are deterministic by construction.
    """
    return FnStep(f"window[{key_col}]", lambda ds: partitioned_apply(
        key_col, window_pass(key_col, order_cols, specs),
        f"window[{key_col}]", num_partitions
    ).apply(ds))


def window_pass(key_col: str, order_cols: list[str], specs: list[dict]):
    """The validated single-partition pandas kernel behind
    ``window_functions``, exposed for direct kernel/property tests —
    input must contain WHOLE key groups (the shuffle's invariant)."""
    import numpy as np

    kinds = {"row_number", "rank", "dense_rank", "lag", "lead", "ntile",
             "percent_rank", "cume_dist", "first_value", "last_value",
             "nth_value", "sum", "avg", "min", "max", "count"}
    frame_kinds = {"sum", "avg", "min", "max", "count"}
    for s in specs:
        if s.get("kind") not in kinds:
            raise ValueError(f"unknown window kind: {s.get('kind')!r}")
        if s["kind"] in ("lag", "lead", "first_value", "last_value",
                         "nth_value") or s["kind"] in frame_kinds:
            if "col" not in s:
                raise ValueError(f"{s['kind']} spec needs 'col'")
        if s["kind"] in frame_kinds:
            if "rows_preceding" in s and "range_preceding" in s:
                raise ValueError("give rows_preceding OR range_preceding")
            p = s.get("rows_preceding")
            if p is not None and int(p) < 0:
                raise ValueError("rows_preceding must be >= 0 or None")
        if s["kind"] in ("ntile", "nth_value") and int(s.get("n", 0)) < 1:
            raise ValueError(f"{s['kind']} spec needs n >= 1")
        if "out" not in s:
            raise ValueError("every window spec needs 'out'")

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        # one sorted view per distinct ordering; index survives sort_values,
        # so series computed on a view assign back position-correct.
        views: dict[tuple, pd.DataFrame] = {(): g}

        def _view(order_override):
            key = tuple(order_override or ())
            if key not in views:
                views[key] = g.sort_values([key_col] + list(key),
                                           kind="mergesort")
            return views[key]

        for s in specs:
            kind, out = s["kind"], s["out"]
            h = _view(s.get("order"))
            hgb = h.groupby(key_col, sort=False)
            if kind == "row_number":
                g[out] = hgb.cumcount() + 1
            elif kind in ("rank", "dense_rank"):
                ocols = list(s.get("order") or order_cols)
                firsts = ~h.duplicated([key_col] + ocols)
                if kind == "rank":
                    rn = hgb.cumcount() + 1
                    g[out] = (rn.where(firsts)
                              .groupby(h[key_col], sort=False).ffill()
                              .astype("int64"))
                else:
                    g[out] = firsts.groupby(h[key_col], sort=False).cumsum() \
                                   .astype("int64")
            elif kind in ("lag", "lead"):
                off = int(s.get("offset", 1))
                g[out] = hgb[s["col"]].shift(off if kind == "lag" else -off)
            elif kind in ("percent_rank", "cume_dist"):
                # rank semantics over the spec's ORDER (ties allowed):
                # percent_rank = (rank-1)/(cnt-1) (0 for singleton);
                # cume_dist = rows-with-order<=current / cnt
                ocols = list(s.get("order") or order_cols)
                rn = hgb.cumcount() + 1
                cnt = hgb[key_col].transform("size")
                if kind == "percent_rank":
                    firsts = ~h.duplicated([key_col] + ocols)
                    rank = (rn.where(firsts)
                            .groupby(h[key_col], sort=False).ffill())
                    g[out] = ((rank - 1) / (cnt - 1).clip(lower=1)) \
                        .where(cnt > 1, 0.0)
                else:
                    lasts = ~h.duplicated([key_col] + ocols, keep="last")
                    hi = (rn.where(lasts)
                          .groupby(h[key_col], sort=False).bfill())
                    g[out] = hi / cnt
            elif kind in ("first_value", "last_value"):
                # over the FULL partition frame (the useful variant; SQL
                # mirror needs ROWS BETWEEN UNBOUNDED PRECEDING AND
                # UNBOUNDED FOLLOWING for last_value)
                how = "first" if kind == "first_value" else "last"
                g[out] = hgb[s["col"]].transform(how)
            elif kind in frame_kinds:
                fn = "mean" if kind == "avg" else kind
                if "range_preceding" in s:
                    # time/value RANGE frame: rows whose order key falls in
                    # [cur - range, cur] (closed both ends, SQL RANGE x
                    # PRECEDING .. CURRENT ROW). pandas time-rolling is
                    # row-position-bound, so peers (duplicate order keys)
                    # AFTER the current row would be missed — the value at
                    # the LAST peer covers the full peer set; broadcast it
                    # back over the tie group (SQL peers-of-CURRENT-ROW
                    # semantics).
                    ts_col = s.get("range_on") or order_cols[0]
                    w = s["range_preceding"]
                    if isinstance(w, (int, float)):
                        w = pd.Timedelta(seconds=w)
                    elif isinstance(w, str):
                        w = pd.Timedelta(w)
                    r = h.groupby(key_col, sort=False) \
                         .rolling(w, on=ts_col, min_periods=1,
                                  closed="both")
                    # rolling(on=ts) indexes its result by (key, ts), but
                    # rows come back in h's row order (sort=False groupby
                    # over a key-sorted frame) — realign positionally
                    vals = pd.Series(getattr(r[s["col"]], fn)().to_numpy(),
                                     index=h.index)
                    vals = vals.groupby(
                        [h[key_col], h[ts_col]], sort=False).transform("last")
                else:
                    # trailing ROWS frame: rows_preceding PRECEDING ..
                    # CURRENT ROW (None = UNBOUNDED PRECEDING).
                    # min_periods=1 matches SQL's truncated frame at the
                    # partition head.
                    p = s.get("rows_preceding")
                    grouped = hgb[s["col"]]
                    r = (grouped.expanding(min_periods=1) if p is None
                         else grouped.rolling(window=int(p) + 1,
                                              min_periods=1))
                    vals = getattr(r, fn)().droplevel(0)
                if kind == "count":
                    vals = vals.fillna(0).astype("int64")
                g[out] = vals
            elif kind == "nth_value":
                n = int(s["n"])
                rn = hgb.cumcount() + 1
                nth = h.loc[rn == n, [key_col, s["col"]]]
                g[out] = g[key_col].map(
                    nth.set_index(key_col)[s["col"]])
            else:  # ntile
                n = int(s["n"])
                rn = (hgb.cumcount() + 1).to_numpy()
                cnt = hgb[key_col].transform("size").to_numpy()
                size, rem = cnt // n, cnt % n
                boundary = rem * (size + 1)
                g[out] = np.where(
                    rn <= boundary,
                    (rn - 1) // (size + 1) + 1,
                    rem + (rn - 1 - boundary) // np.maximum(size, 1) + 1,
                ).astype("int64")
        return g

    return _per_partition


def running_aggregate(key_col: str, ts_col: str, value_col: str,
                      out: str = "running_value",
                      order_cols: list[str] | None = None,
                      ndigits: int | None = 2,
                      num_partitions: int = 64) -> FnStep:
    """Per-key cumulative sum in (ts, order_cols) order — one grouped
    pandas cumsum per partition."""
    order = [ts_col] + list(order_cols or [])

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort")
        run = g.groupby(key_col, sort=False)[value_col].cumsum()
        g[out] = run.round(ndigits) if ndigits is not None else run
        return g

    return partitioned_apply(key_col, _per_partition,
                             f"running_sum[{value_col}]", num_partitions)
