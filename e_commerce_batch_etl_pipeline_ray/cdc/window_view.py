"""WATERMARKED TUMBLING-WINDOW AGGREGATE over an event stream ingested in
epochs — the Flink-style streaming-window contract (event time, bounded
out-of-orderness, allowed lateness) on the engine's micro-batch spine:

  * watermark after epoch e = max(event time seen through e) - lateness;
  * a row arriving in epoch e joins its window iff the window has not
    FINALIZED yet (window_end > watermark after epoch e-1) — otherwise it
    is counted in ``late_dropped`` and discarded;
  * at the end of each epoch every open window whose end <= the new
    watermark finalizes: its aggregate row is emitted exactly once into
    the epoch's finalized output and its state is freed.

State (open-window partials, mergeable count/sum per (window, key)) and
finalized outputs are committed through the lake epoch/manifest protocol
— crash debris cleaned on resume, re-running an epoch rewrites the same
bytes. Partials are hash-partitioned on (window_start, key): epoch cost
is O(epoch rows + open-window state), never O(history), and finalization
is a row-local filter inside each partition.

Batch counterparts: stages/streaming.py tumbling_window (one-shot, no
lateness semantics); the late-event observability metric in the CDC
ingest (engine.py) counts but never drops. This operator is the one that
DROPS by contract and emits exactly-once finalized windows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    hash_partition_ids,
)

_PID = "_wpid"
_US_PER_MIN = 60 * 1_000_000


@dataclass
class WindowConfig:
    state_dir: str
    window_minutes: float
    lateness_minutes: float
    ts_col: str = "ts"
    key_col: str | None = None       # None -> one global series
    value_col: str | None = None     # None -> count only
    num_partitions: int = 8
    # HOPPING (sliding) windows: window_minutes must be a multiple of
    # slide_minutes; every row joins window_minutes/slide_minutes
    # overlapping windows. None (default) = tumbling (slide == window).
    slide_minutes: float | None = None


class WindowedAggregate:
    def __init__(self, config: WindowConfig):
        self.cfg = config
        if config.slide_minutes is not None:
            k = config.window_minutes / config.slide_minutes
            if abs(k - round(k)) > 1e-9 or k < 1:
                raise ValueError("window_minutes must be a positive "
                                 "multiple of slide_minutes")
        os.makedirs(config.state_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def watermark(self) -> int | None:
        """Current watermark (microseconds since epoch), None before any
        ingest."""
        last = self.last_committed_epoch()
        if last is None:
            return None
        return lake.read_manifest(self.cfg.state_dir,
                                  last)["metrics"]["watermark_us"]

    # -- ingest --------------------------------------------------------------

    def _partials(self, events: ray.data.Dataset,
                  prev_wm: int | None) -> ray.data.Dataset:
        cfg = self.cfg
        w_us = int(cfg.window_minutes * _US_PER_MIN)
        s_us = (int(cfg.slide_minutes * _US_PER_MIN)
                if cfg.slide_minutes is not None else w_us)
        n_copies = w_us // s_us

        def _fn(t: pa.Table) -> pa.Table:
            if n_copies > 1:
                # hopping: one copy of the batch per overlapping window
                t = pa.concat_tables([t] * n_copies)
            ts = pc.cast(t[cfg.ts_col], pa.timestamp("us"))
            ts_us = ts.cast(pa.int64())
            base = pc.multiply(
                pc.floor(pc.divide(pc.cast(ts_us, pa.float64()), s_us)),
                pa.scalar(float(s_us)))
            win = pc.cast(base, pa.int64())
            if n_copies > 1:
                rows_per = t.num_rows // n_copies
                shift = np.repeat(np.arange(n_copies, dtype=np.int64),
                                  rows_per) * s_us
                win = pc.subtract(win, pa.array(shift, pa.int64()))
            keys = {"window_us": win}
            if cfg.key_col is not None:
                keys[cfg.key_col] = t[cfg.key_col].combine_chunks() \
                    if isinstance(t[cfg.key_col], pa.ChunkedArray) \
                    else t[cfg.key_col]
            vals = {"n_rows": pa.array(np.ones(t.num_rows, np.int64))}
            if cfg.value_col is not None:
                vals["sum_val"] = pc.cast(
                    pc.fill_null(t[cfg.value_col], 0.0), pa.float64())
            rows = pa.table({**keys, **vals,
                             "_late": pa.nulls(t.num_rows, pa.bool_())})
            if prev_wm is not None:
                win_end = pc.add(rows["window_us"], pa.scalar(w_us,
                                                              pa.int64()))
                late = pc.less_equal(win_end, pa.scalar(prev_wm, pa.int64()))
                rows = rows.set_column(rows.column_names.index("_late"),
                                       "_late", late)
            else:
                rows = rows.set_column(
                    rows.column_names.index("_late"), "_late",
                    pa.array(np.zeros(t.num_rows, bool)))
            # combiner: one partial row per (window, key) per block
            group_cols = list(keys) + ["_late"]
            aggs = [("n_rows", "sum")]
            if cfg.value_col is not None:
                aggs.append(("sum_val", "sum"))
            g = rows.group_by(group_cols).aggregate(aggs)
            out = pa.table({
                **{c: g[c] for c in group_cols},
                "n_rows": g["n_rows_sum"],
                **({"sum_val": g["sum_val_sum"]}
                   if cfg.value_col is not None else {}),
            })
            pid = hash_partition_ids(out, list(keys), cfg.num_partitions)
            return out.append_column(_PID, pa.array(pid, pa.int32()))

        return events.map_batches(_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def ingest(self, events: ray.data.Dataset, epoch: int) -> dict:
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.state_dir, last)
                         if last is not None else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError(
                f"state was written with num_partitions="
                f"{prev_manifest['num_partitions']}; config says "
                f"{cfg.num_partitions} — the (window, key)->partition "
                "routing requires a constant modulus")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        prev_wm = (prev_manifest["metrics"]["watermark_us"]
                   if prev_manifest else None)
        w_us = int(cfg.window_minutes * _US_PER_MIN)
        late_us = int(cfg.lateness_minutes * _US_PER_MIN)

        # epoch max event time (tiny aggregate) -> new watermark
        mx = events.map_batches(
            lambda t: pa.table({"mx": pa.array(
                [pc.max(pc.cast(t[cfg.ts_col],
                                pa.timestamp("us")).cast(pa.int64())).as_py()],
                pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        epoch_max = max((r["mx"] for r in mx if r["mx"] is not None),
                        default=None)
        new_wm = prev_wm if prev_wm is not None else -(1 << 62)
        if epoch_max is not None:
            new_wm = max(new_wm, epoch_max - late_us)

        partials = self._partials(events, prev_wm).materialize()
        late_dropped = sum(
            r["n"] for r in partials.map_batches(
                lambda t: pa.table({"n": pa.array(
                    [pc.sum(pc.if_else(t["_late"], t["n_rows"],
                                       pa.scalar(0, pa.int64()))).as_py()
                     or 0], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True).take_all())

        key_cols = (["window_us"]
                    + ([cfg.key_col] if cfg.key_col is not None else []))
        has_val = cfg.value_col is not None
        tmp_dir = lake.epoch_dir(cfg.state_dir, epoch, tmp=True)
        os.makedirs(tmp_dir, exist_ok=True)
        state_dir = cfg.state_dir

        class _Apply:
            """Per-partition: fold accepted partials into prior open
            state, finalize windows past the new watermark."""

            def __init__(self, prev_parts, epoch, new_wm):
                self.prev = prev_parts
                self.epoch = epoch
                self.new_wm = new_wm

            def __call__(self, group: pa.Table) -> pa.Table:
                pid = group[_PID][0].as_py()
                t = group.filter(pc.invert(pc.fill_null(group["_late"],
                                                        False)))
                t = t.drop_columns([_PID, "_late"])
                rec = self.prev.get(str(pid))
                if rec and rec.get("file"):
                    prior = pq.read_table(rec["file"])
                    t = pa.concat_tables([prior, t],
                                         promote_options="permissive")
                aggs = [("n_rows", "sum")] + ([("sum_val", "sum")]
                                              if has_val else [])
                g = t.group_by(key_cols).aggregate(aggs)
                merged = pa.table({
                    **{c: g[c] for c in key_cols},
                    "n_rows": g["n_rows_sum"],
                    **({"sum_val": g["sum_val_sum"]} if has_val else {}),
                })
                win_end = pc.add(merged["window_us"],
                                 pa.scalar(w_us, pa.int64()))
                fin_mask = pc.less_equal(win_end,
                                         pa.scalar(self.new_wm, pa.int64()))
                finalized = merged.filter(fin_mask).sort_by(
                    [(c, "ascending") for c in key_cols])
                open_t = merged.filter(pc.invert(fin_mask)).sort_by(
                    [(c, "ascending") for c in key_cols])
                sfname = f"part-{pid:05d}.parquet"
                ffname = f"final-{pid:05d}.parquet"
                for tab, fname in ((open_t, sfname), (finalized, ffname)):
                    tmp_path = os.path.join(tmp_dir, fname)
                    wip = f"{tmp_path}.wip.{os.getpid()}"
                    pq.write_table(tab, wip)
                    os.replace(wip, tmp_path)
                final_dir = lake.epoch_dir(state_dir, self.epoch)
                return pa.table({
                    "partition": pa.array([pid], pa.int32()),
                    "file": pa.array([os.path.join(final_dir, sfname)],
                                     pa.string()),
                    "final_file": pa.array([os.path.join(final_dir, ffname)],
                                           pa.string()),
                    "rows_total": pa.array([open_t.num_rows], pa.int64()),
                    "finalized_windows": pa.array([finalized.num_rows],
                                                  pa.int64()),
                    "bytes_written": pa.array(
                        [sum(os.path.getsize(os.path.join(tmp_dir, f))
                             for f in (sfname, ffname))], pa.int64()),
                })

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        # every partition with prior state must run (finalization applies
        # even with no new rows) — union new partials with prior-partition
        # placeholder rows so groupby covers them
        placeholders = []
        for pid, rec in prev_parts.items():
            if rec.get("file"):
                placeholders.append(int(pid))
        if placeholders:
            # column order AND key type must match the partials schema
            p_schema = partials.schema().base_schema
            ph = pa.table({
                "window_us": pa.array([0] * len(placeholders), pa.int64()),
                **({cfg.key_col: pa.nulls(
                    len(placeholders), p_schema.field(cfg.key_col).type)}
                   if cfg.key_col is not None else {}),
                "_late": pa.array([True] * len(placeholders)),
                "n_rows": pa.array([0] * len(placeholders), pa.int64()),
                **({"sum_val": pa.array([0.0] * len(placeholders),
                                        pa.float64())} if has_val else {}),
                _PID: pa.array(placeholders, pa.int32()),
            })
            partials = partials.union(ray.data.from_arrow(ph))

        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson); writes stay wip+rename
        # atomic and byte-deterministic -> retry-safe
        _apply_inst = _Apply(prev_parts, epoch, new_wm)

        def __ApplyTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __ApplyTask, batch_format="pyarrow"))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            partitions[rec["partition"]] = {
                "file": rec["file"], "deltas": [],
                "novel_file": rec["final_file"],   # vacuum keeps it
                "lsn_watermark": epoch,
                "rows_applied": rec["finalized_windows"],
                "rows_total": rec["rows_total"],
                "bytes_written": rec["bytes_written"],
            }
        schema = pa.schema(
            [("window_us", pa.int64())]
            + ([(cfg.key_col,
                 partials.schema().base_schema.field(cfg.key_col).type)]
               if cfg.key_col else [])
            + [("n_rows", pa.int64())]
            + ([("sum_val", pa.float64())] if has_val else []))
        metrics = {"op": "windowed_aggregate",
                   "watermark_us": int(new_wm),
                   "late_dropped": int(late_dropped),
                   "finalized_windows": sum(r["rows_applied"]
                                            for r in partitions.values())}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    # -- reads ---------------------------------------------------------------

    def finalized(self, through_epoch: int | None = None) -> ray.data.Dataset:
        """All finalized window rows emitted in epochs <= through_epoch
        (default: latest). Each window appears EXACTLY once across all
        epochs' outputs."""
        last = self.last_committed_epoch()
        if last is None:
            raise FileNotFoundError(
                f"no committed epochs in {self.cfg.state_dir}")
        through = last if through_epoch is None else through_epoch
        files = []
        for ep in range(through + 1):
            try:
                m = lake.read_manifest(self.cfg.state_dir, ep)
            except FileNotFoundError:
                continue          # vacuumed
            marker = f"epoch={ep:04d}{os.sep}"
            for rec in m["partitions"].values():
                f = rec.get("novel_file")
                if f and marker in f and os.path.exists(f):
                    files.append(f)
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(sorted(set(files)))

    def open_windows(self) -> ray.data.Dataset:
        """Current open (unfinalized) window partials."""
        last = self.last_committed_epoch()
        if last is None:
            raise FileNotFoundError(
                f"no committed epochs in {self.cfg.state_dir}")
        m = lake.read_manifest(self.cfg.state_dir, last)
        files = [rec["file"] for rec in m["partitions"].values()
                 if rec.get("file") and os.path.exists(rec["file"])]
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files)


@dataclass
class SessionConfig:
    state_dir: str
    gap_minutes: float
    lateness_minutes: float
    ts_col: str = "ts"
    key_col: str = "user_id"
    value_col: str | None = None
    num_partitions: int = 8


class SessionAggregate:
    """WATERMARKED SESSION WINDOWS: gap-based sessions maintained
    incrementally across epochs — the stateful form of
    stages/streaming.sessionize. Per epoch and key:

      * an event is LATE-DROPPED iff even its own would-be session is
        already finalized (event_ts + gap <= watermark before the epoch);
      * accepted events merge with any open session within ``gap`` —
        interval union via one sorted sweep per partition (cummax chain +
        reduceat partials, no per-session Python);
      * sessions whose last event + gap <= the new watermark finalize
        exactly once into the epoch's output.

    Streaming sessionization is PATH-DEPENDENT (a dropped straggler can
    no longer bridge two sessions), so the SQL oracle (q116) pins the
    drop-free operating point where incremental == one-shot
    sessionization; the drop path is pinned by the brute-force pytest.
    State/output commits ride the lake epoch/manifest protocol.
    """

    def __init__(self, config: SessionConfig):
        self.cfg = config
        os.makedirs(config.state_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def watermark(self) -> int | None:
        last = self.last_committed_epoch()
        if last is None:
            return None
        return lake.read_manifest(self.cfg.state_dir,
                                  last)["metrics"]["watermark_us"]

    def ingest(self, events: ray.data.Dataset, epoch: int) -> dict:
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.state_dir, last)
                         if last is not None else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError(
                f"state was written with num_partitions="
                f"{prev_manifest['num_partitions']}; config says "
                f"{cfg.num_partitions} — the (window, key)->partition "
                "routing requires a constant modulus")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        prev_wm = (prev_manifest["metrics"]["watermark_us"]
                   if prev_manifest else None)
        gap_us = int(cfg.gap_minutes * _US_PER_MIN)
        late_us = int(cfg.lateness_minutes * _US_PER_MIN)
        has_val = cfg.value_col is not None

        mx = events.map_batches(
            lambda t: pa.table({"mx": pa.array(
                [pc.max(pc.cast(t[cfg.ts_col],
                                pa.timestamp("us")).cast(pa.int64())).as_py()],
                pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        epoch_max = max((r["mx"] for r in mx if r["mx"] is not None),
                        default=None)
        new_wm = prev_wm if prev_wm is not None else -(1 << 62)
        if epoch_max is not None:
            new_wm = max(new_wm, epoch_max - late_us)

        # event rows as degenerate sessions (start=end=ts), late-marked
        def _rows(t: pa.Table) -> pa.Table:
            ts_us = pc.cast(t[cfg.ts_col], pa.timestamp("us")).cast(pa.int64())
            out = pa.table({
                cfg.key_col: t[cfg.key_col],
                "start_us": ts_us,
                "last_us": ts_us,
                "n_rows": pa.array(np.ones(t.num_rows, np.int64)),
                **({"sum_val": pc.cast(pc.fill_null(t[cfg.value_col], 0.0),
                                       pa.float64())} if has_val else {}),
            })
            if prev_wm is not None:
                late = pc.less_equal(pc.add(out["last_us"],
                                            pa.scalar(gap_us, pa.int64())),
                                     pa.scalar(prev_wm, pa.int64()))
            else:
                late = pa.array(np.zeros(t.num_rows, bool))
            out = out.append_column("_late", late)
            pid = hash_partition_ids(out, [cfg.key_col], cfg.num_partitions)
            return out.append_column(_PID, pa.array(pid, pa.int32()))

        partials = events.map_batches(_rows, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
        late_dropped = sum(
            r["n"] for r in partials.map_batches(
                lambda t: pa.table({"n": pa.array(
                    [int(pc.sum(pc.cast(t["_late"], pa.int64())).as_py()
                         or 0)], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True).take_all())

        key_col = cfg.key_col
        tmp_dir = lake.epoch_dir(cfg.state_dir, epoch, tmp=True)
        os.makedirs(tmp_dir, exist_ok=True)
        state_dir = cfg.state_dir

        class _Apply:
            def __init__(self, prev_parts, epoch, new_wm):
                self.prev = prev_parts
                self.epoch = epoch
                self.new_wm = new_wm

            def __call__(self, group: pa.Table) -> pa.Table:
                pid = group[_PID][0].as_py()
                t = group.filter(pc.invert(pc.fill_null(group["_late"],
                                                        False)))
                t = t.drop_columns([_PID, "_late"])
                rec = self.prev.get(str(pid))
                if rec and rec.get("file"):
                    prior = pq.read_table(rec["file"])
                    t = pa.concat_tables([prior, t],
                                         promote_options="permissive")
                # one sorted sweep merges events + open sessions per key:
                # chain-break where a session's start exceeds the running
                # max end (+gap) of its predecessors within the key
                t = t.sort_by([(key_col, "ascending"),
                               ("start_us", "ascending"),
                               ("last_us", "ascending")])
                n = t.num_rows
                if n == 0:
                    merged = t
                else:
                    keys = t[key_col].to_numpy(zero_copy_only=False)
                    start = t["start_us"].to_numpy()
                    lastv = t["last_us"].to_numpy()
                    new_key = np.empty(n, dtype=bool)
                    new_key[0] = True
                    new_key[1:] = keys[1:] != keys[:-1]
                    # running max of (last + gap) within key, shifted by 1
                    reach = lastv + gap_us
                    run = np.empty(n, dtype=np.int64)
                    cur = np.int64(-(1 << 62))
                    # vectorized segmented cummax via np.maximum.accumulate
                    # with resets: do it per contiguous key run using
                    # boundaries (few runs per partition group)
                    bounds = np.flatnonzero(new_key)
                    ends = np.append(bounds[1:], n)
                    brk = np.zeros(n, dtype=bool)
                    for b, e in zip(bounds, ends):
                        seg = np.maximum.accumulate(reach[b:e])
                        brk[b] = True
                        if e - b > 1:
                            brk[b + 1:e] = start[b + 1:e] > seg[:-1]
                    sess_id = np.cumsum(brk) - 1
                    starts_idx = np.flatnonzero(brk)
                    agg_start = start[starts_idx]
                    agg_last = np.maximum.reduceat(lastv, starts_idx)
                    agg_n = np.add.reduceat(
                        t["n_rows"].to_numpy(), starts_idx)
                    cols = {
                        key_col: t[key_col].take(
                            pa.array(starts_idx)),
                        "start_us": pa.array(agg_start, pa.int64()),
                        "last_us": pa.array(agg_last, pa.int64()),
                        "n_rows": pa.array(agg_n, pa.int64()),
                    }
                    if has_val:
                        cols["sum_val"] = pa.array(
                            np.add.reduceat(t["sum_val"].to_numpy(),
                                            starts_idx), pa.float64())
                    merged = pa.table(cols)
                    del sess_id, cur, run
                fin_mask = pc.less_equal(
                    pc.add(merged["last_us"], pa.scalar(gap_us, pa.int64())),
                    pa.scalar(self.new_wm, pa.int64())) if merged.num_rows \
                    else pa.array([], pa.bool_())
                finalized = merged.filter(fin_mask)
                open_t = merged.filter(pc.invert(fin_mask)) \
                    if merged.num_rows else merged
                sfname = f"part-{pid:05d}.parquet"
                ffname = f"final-{pid:05d}.parquet"
                for tab, fname in ((open_t, sfname), (finalized, ffname)):
                    tmp_path = os.path.join(tmp_dir, fname)
                    wip = f"{tmp_path}.wip.{os.getpid()}"
                    pq.write_table(tab, wip)
                    os.replace(wip, tmp_path)
                final_dir = lake.epoch_dir(state_dir, self.epoch)
                return pa.table({
                    "partition": pa.array([pid], pa.int32()),
                    "file": pa.array([os.path.join(final_dir, sfname)],
                                     pa.string()),
                    "final_file": pa.array(
                        [os.path.join(final_dir, ffname)], pa.string()),
                    "rows_total": pa.array([open_t.num_rows], pa.int64()),
                    "finalized_windows": pa.array([finalized.num_rows],
                                                  pa.int64()),
                    "bytes_written": pa.array(
                        [sum(os.path.getsize(os.path.join(tmp_dir, f))
                             for f in (sfname, ffname))], pa.int64()),
                })

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        placeholders = [int(p) for p, rec in prev_parts.items()
                        if rec.get("file")]
        if placeholders:
            ph = pa.table({
                key_col: pa.array([None] * len(placeholders),
                                  partials.schema().base_schema.field(
                                      key_col).type),
                "start_us": pa.array([0] * len(placeholders), pa.int64()),
                "last_us": pa.array([0] * len(placeholders), pa.int64()),
                "n_rows": pa.array([0] * len(placeholders), pa.int64()),
                **({"sum_val": pa.array([0.0] * len(placeholders),
                                        pa.float64())} if has_val else {}),
                "_late": pa.array([True] * len(placeholders)),
                _PID: pa.array(placeholders, pa.int32()),
            })
            partials = partials.union(ray.data.from_arrow(ph))

        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson); writes stay wip+rename
        # atomic and byte-deterministic -> retry-safe
        _apply_inst = _Apply(prev_parts, epoch, new_wm)

        def __ApplyTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __ApplyTask, batch_format="pyarrow"))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            partitions[rec["partition"]] = {
                "file": rec["file"], "deltas": [],
                "novel_file": rec["final_file"],
                "lsn_watermark": epoch,
                "rows_applied": rec["finalized_windows"],
                "rows_total": rec["rows_total"],
                "bytes_written": rec["bytes_written"],
            }
        key_type = partials.schema().base_schema.field(cfg.key_col).type
        schema = pa.schema(
            [(cfg.key_col, key_type), ("start_us", pa.int64()),
             ("last_us", pa.int64()), ("n_rows", pa.int64())]
            + ([("sum_val", pa.float64())] if has_val else []))
        metrics = {"op": "session_aggregate",
                   "watermark_us": int(new_wm),
                   "late_dropped": int(late_dropped),
                   "finalized_sessions": sum(r["rows_applied"]
                                             for r in partitions.values())}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    finalized = WindowedAggregate.finalized
    open_windows = WindowedAggregate.open_windows
