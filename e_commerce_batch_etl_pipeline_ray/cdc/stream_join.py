"""STREAM-STREAM INTERVAL JOIN of two keyed event streams ingested in
epochs — the Flink interval-join contract (event time = lsn, bounded
out-of-orderness, allowed lateness) on the engine's micro-batch spine:

  * a pair (l, r) matches iff l and r share the key (repo, path) and
    ``|l.lsn - r.lsn| <= window``;
  * every matching pair is emitted EXACTLY ONCE, in the epoch whose
    arrivals completed it: matches = newL x newR + newL x bufR +
    bufL x newR — the three categories are disjoint by construction;
  * per-side watermark after epoch e = max(lsn seen on that side) -
    lateness; an arrival below its side's watermark is DROPPED and
    counted (``late_dropped``), the deterministic Flink rule;
  * buffers are GC'd by the OTHER side's watermark: a buffered left row
    survives iff ``l.lsn + window >= wm_right`` (no future accepted right
    row could still match it), and symmetrically — state is O(in-flight
    window), never O(stream).

Both sides' buffers live in ONE per-partition state file (a ``_side``
column) plus the epoch's matches file, committed through the lake
epoch/manifest protocol — crash debris cleaned on resume, re-running an
epoch rewrites the same bytes, vacuum keeps state + matches via the
standard file/novel_file record keys.

Scale: one hash shuffle of the EPOCH'S ARRIVALS per refresh (buffers are
read partition-locally); the join itself is a native Arrow hash join per
partition. This is the two-stream counterpart of the one-shot interval
join (stages/joins.py) and the watermarked windows (cdc/window_view.py).

Reference lineage: the reference repo is batch-only; this operator covers
the stream-stream enrichment its orders/returns notebooks imply
(notebooks/04_transform_orders.py joins happen one-shot there).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    hash_partition_ids,
)

KEY = ["repo", "path"]
_PID = "_sjpid"
_NEG_INF = -(1 << 62)
_POS_INF = 1 << 62


@dataclass
class StreamJoinConfig:
    state_dir: str
    window: int                       # |l.lsn - r.lsn| <= window
    lateness: int = 0                 # out-of-orderness bound per side
    left_cols: tuple = ("commit",)    # payload columns carried as l_<c>
    right_cols: tuple = ("commit",)   # payload columns carried as r_<c>
    num_partitions: int = 8
    # OUTER emission (the Flink SQL outer interval-join contract): a row
    # GC'd from its buffer WITHOUT ever having matched emits exactly once
    # as (l, NULL) / (NULL, r) — in the epoch whose watermark advance
    # evicted it, the first moment no accepted future arrival could still
    # match it. "none" | "left" | "right" | "full".
    outer: str = "none"


class StreamJoin:
    def __init__(self, config: StreamJoinConfig):
        self.cfg = config
        os.makedirs(config.state_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def watermarks(self) -> tuple[int, int]:
        last = self.last_committed_epoch()
        if last is None:
            return (_NEG_INF, _NEG_INF)
        m = lake.read_manifest(self.cfg.state_dir, last)["metrics"]
        return (m["wm_left"], m["wm_right"])

    def _skinny(self, events: ray.data.Dataset, side: str) -> ray.data.Dataset:
        """Project one side's arrivals to the CANONICAL join layout (both
        sides' payload columns, the other side's nulled) — one schema for
        union / shuffle / buffer files."""
        cfg = self.cfg

        def _fn(t: pa.Table) -> pa.Table:
            out = {k: t[k] for k in KEY}
            out["lsn"] = t["lsn"].cast(pa.int64())
            for c in cfg.left_cols:
                out[f"l_{c}"] = t[c] if side == "L" else \
                    pa.nulls(t.num_rows, t.schema.field(c).type
                             if c in t.column_names else pa.string())
            for c in cfg.right_cols:
                out[f"r_{c}"] = t[c] if side == "R" else \
                    pa.nulls(t.num_rows, t.schema.field(c).type
                             if c in t.column_names else pa.string())
            out["_side"] = pa.array([side] * t.num_rows, pa.string())
            o = pa.table(out)
            pid = hash_partition_ids(o, KEY, cfg.num_partitions)
            return o.append_column(_PID, pa.array(pid, pa.int32()))
        return events.map_batches(_fn, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def ingest(self, left: ray.data.Dataset, right: ray.data.Dataset,
               epoch: int, finalize: bool = False) -> dict:
        """Ingest one epoch of arrivals on each side. ``finalize=True`` is
        the end-of-stream +INF watermark (Flink's final watermark): every
        buffered row is evicted — unmatched ones emit their outer rows if
        ``cfg.outer`` asks for them — and the chain can accept no further
        epochs with arrivals (their rows would all be late)."""
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.state_dir, last)
                         if last is not None else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError("num_partitions must be chain-constant")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        pm = prev_manifest["metrics"] if prev_manifest else {}
        # ADVICE r4: the outer mode is chain-constant and PERSISTED —
        # flipping it on over pre-existing buffer state would backfill
        # _matched=False onto rows that already matched in earlier epochs
        # and re-emit them as timeouts (duplicate emission vs the
        # outer-join contract); older chains without the key stay usable
        # only at their original outer="none"
        prev_outer = pm.get("outer", "none" if prev_manifest else None)
        if prev_outer is not None and prev_outer != cfg.outer:
            raise ValueError(
                f"outer mode is chain-constant: state was written with "
                f"outer={prev_outer!r}, config says {cfg.outer!r} — "
                "start a fresh state_dir to change it")
        prev_wm_l = pm.get("wm_left", _NEG_INF)
        prev_wm_r = pm.get("wm_right", _NEG_INF)

        def _max_lsn(ds) -> int | None:
            mx = ds.map_batches(
                lambda t: pa.table({"mx": pa.array(
                    [pc.max(t["lsn"]).as_py()], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True).take_all()
            vals = [r["mx"] for r in mx if r["mx"] is not None]
            return max(vals) if vals else None

        if finalize:
            new_wm_l = new_wm_r = _POS_INF
        else:
            lmax, rmax = _max_lsn(left), _max_lsn(right)
            new_wm_l = max(prev_wm_l, (lmax - cfg.lateness)
                           if lmax is not None else _NEG_INF)
            new_wm_r = max(prev_wm_r, (rmax - cfg.lateness)
                           if rmax is not None else _NEG_INF)

        arrivals = self._skinny(left, "L").union(self._skinny(right, "R"))

        w = cfg.window
        tmp_dir = lake.epoch_dir(cfg.state_dir, epoch, tmp=True)
        os.makedirs(tmp_dir, exist_ok=True)
        state_dir = cfg.state_dir
        lcols = [f"l_{c}" for c in cfg.left_cols]
        rcols = [f"r_{c}" for c in cfg.right_cols]
        out_names = [*KEY, "l_lsn", "r_lsn", *lcols, *rcols]

        def _split(t: pa.Table, side: str) -> pa.Table:
            keep = [*KEY, "lsn"] + (lcols if side == "L" else rcols)
            sub = t.filter(pc.equal(t["_side"], side))
            sub = sub.select([c for c in keep if c in sub.column_names])
            return sub.rename_columns(
                [*KEY, f"{side.lower()}_lsn"]
                + (lcols if side == "L" else rcols))

        try:
            outer_sides = {"none": (), "left": ("L",), "right": ("R",),
                           "full": ("L", "R")}[cfg.outer]
        except KeyError:
            raise ValueError(f"unknown outer mode {cfg.outer!r}") from None

        def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
            if lt.num_rows == 0 or rt.num_rows == 0:
                return None
            j = lt.join(rt, keys=KEY, join_type="inner")
            if j.num_rows == 0:
                return None
            d = pc.abs(pc.subtract(j["l_lsn"], j["r_lsn"]))
            j = j.filter(pc.less_equal(d, pa.scalar(w, pa.int64())))
            return j if j.num_rows else None

        class _Apply:
            def __init__(self, prev_parts, epoch):
                self.prev = prev_parts
                self.epoch = epoch

            def __call__(self, group: pa.Table) -> pa.Table:
                pid = group[_PID][0].as_py()
                t = group.drop_columns([_PID])
                # drop placeholder rows (null lsn) and LATE arrivals
                t = t.filter(pc.is_valid(t["lsn"]))
                wm_own = pc.if_else(pc.equal(t["_side"], "L"),
                                    pa.scalar(prev_wm_l, pa.int64()),
                                    pa.scalar(prev_wm_r, pa.int64()))
                late = pc.less(t["lsn"], wm_own)
                n_late = int(pc.sum(pc.cast(late, pa.int64())).as_py() or 0)
                t = t.filter(pc.invert(late))
                if "_matched" in t.column_names:   # defensive: never fed
                    t = t.drop_columns(["_matched"])
                t = t.append_column(
                    "_matched", pa.array([False] * t.num_rows, pa.bool_()))
                new_l, new_r = _split(t, "L"), _split(t, "R")
                rec = self.prev.get(str(pid))
                if rec and rec.get("file"):
                    buf = pq.read_table(rec["file"])
                    if "_matched" not in buf.column_names:  # legacy state
                        buf = buf.append_column(
                            "_matched",
                            pa.array([False] * buf.num_rows, pa.bool_()))
                    buf_l, buf_r = _split(buf, "L"), _split(buf, "R")
                else:
                    buf = None
                    buf_l = new_l.slice(0, 0)
                    buf_r = new_r.slice(0, 0)
                pieces = [p for p in (
                    _join(new_l, new_r),          # completed this epoch
                    _join(new_l, buf_r),          # left arrival completed
                    _join(buf_l, new_r),          # right arrival completed
                ) if p is not None]
                matches = (pa.concat_tables(pieces) if pieces
                           else None)
                if matches is not None:
                    matches = matches.select(out_names).sort_by(
                        [(c, "ascending") for c in
                         [*KEY, "l_lsn", "r_lsn"]])
                else:
                    matches = pa.schema(
                        [pa.field(c, pa.int64() if c in ("l_lsn", "r_lsn")
                                  else (pa.string() if c in KEY
                                        else t.schema.field(c).type))
                         for c in out_names]).empty_table()
                # new buffer = (old buffer + accepted arrivals), flags
                # folded with this epoch's match participants, GC'd by
                # the OTHER side's new watermark
                nb = pa.concat_tables(
                    ([buf] if buf is not None else []) + [t],
                    promote_options="permissive")

                def _fuse(tab: pa.Table, lsn_col: str):
                    return pc.binary_join_element_wise(
                        tab[KEY[0]], tab[KEY[1]],
                        pc.cast(tab[lsn_col], pa.string()), "\x00")

                if nb.num_rows and matches.num_rows:
                    own = _fuse(nb, "lsn")
                    in_l = pc.is_in(own, value_set=pc.unique(
                        _fuse(matches, "l_lsn")))
                    in_r = pc.is_in(own, value_set=pc.unique(
                        _fuse(matches, "r_lsn")))
                    is_l = pc.equal(nb["_side"], "L")
                    now = pc.if_else(is_l, in_l, in_r)
                    flag = pc.or_(nb["_matched"], now)
                    nb = nb.set_column(
                        nb.schema.get_field_index("_matched"),
                        "_matched", flag)
                other_wm = pc.if_else(
                    pc.equal(nb["_side"], "L"),
                    pa.scalar(new_wm_r, pa.int64()),
                    pa.scalar(new_wm_l, pa.int64()))
                keep = pc.greater_equal(
                    pc.add(nb["lsn"], pa.scalar(w, pa.int64())), other_wm)
                evicted = nb.filter(pc.invert(keep))
                nb = nb.filter(keep).sort_by(
                    [("repo", "ascending"), ("path", "ascending"),
                     ("_side", "ascending"), ("lsn", "ascending")])
                # OUTER emission: an evicted never-matched row leaves as
                # (l, NULL) / (NULL, r) — exactly once, in this epoch,
                # because eviction is the first moment no accepted future
                # arrival could complete it
                timeout_tabs = []
                if outer_sides and evicted.num_rows:
                    un = evicted.filter(pc.invert(evicted["_matched"]))
                    for side in outer_sides:
                        sub = un.filter(pc.equal(un["_side"], side))
                        if sub.num_rows == 0:
                            continue
                        cols = {k: sub[k] for k in KEY}
                        cols["l_lsn"] = (sub["lsn"] if side == "L"
                                         else pa.nulls(sub.num_rows,
                                                       pa.int64()))
                        cols["r_lsn"] = (sub["lsn"] if side == "R"
                                         else pa.nulls(sub.num_rows,
                                                       pa.int64()))
                        for c in lcols:
                            cols[c] = sub[c] if side == "L" else pa.nulls(
                                sub.num_rows, sub.schema.field(c).type)
                        for c in rcols:
                            cols[c] = sub[c] if side == "R" else pa.nulls(
                                sub.num_rows, sub.schema.field(c).type)
                        timeout_tabs.append(
                            pa.table(cols).select(out_names))
                n_timeouts = sum(tt.num_rows for tt in timeout_tabs)
                if timeout_tabs:
                    matches = pa.concat_tables(
                        [matches, *timeout_tabs],
                        promote_options="permissive").sort_by(
                        [(c, "ascending") for c in
                         [*KEY, "l_lsn", "r_lsn"]])
                sfname = f"part-{pid:05d}.parquet"
                mfname = f"matches-{pid:05d}.parquet"
                for tab, fname in ((nb, sfname), (matches, mfname)):
                    tmp_path = os.path.join(tmp_dir, fname)
                    wip = f"{tmp_path}.wip.{os.getpid()}"
                    pq.write_table(tab, wip)
                    os.replace(wip, tmp_path)
                final_dir = lake.epoch_dir(state_dir, self.epoch)
                return pa.table({
                    "partition": pa.array([pid], pa.int32()),
                    "file": pa.array([os.path.join(final_dir, sfname)],
                                     pa.string()),
                    "final_file": pa.array([os.path.join(final_dir, mfname)],
                                           pa.string()),
                    "rows_total": pa.array([nb.num_rows], pa.int64()),
                    "matches": pa.array([matches.num_rows - n_timeouts],
                                        pa.int64()),
                    "timeouts": pa.array([n_timeouts], pa.int64()),
                    "late": pa.array([n_late], pa.int64()),
                    "bytes_written": pa.array(
                        [sum(os.path.getsize(os.path.join(tmp_dir, f))
                             for f in (sfname, mfname))], pa.int64()),
                })

        # partitions with prior state but no arrivals still run (buffer GC
        # advances with the watermarks) — placeholder rows, like
        # window_view's finalization-without-arrivals
        placeholders = [int(pid) for pid, rec in prev_parts.items()
                        if rec.get("file")]
        if placeholders:
            sch = arrivals.schema()
            sch = sch.base_schema if sch is not None else None
            n_ph = len(placeholders)
            ph = pa.table({
                **{k: pa.array(["\x00ph"] * n_ph, pa.string())
                   for k in KEY},
                "lsn": pa.nulls(n_ph, pa.int64()),
                # payload nulls: real types when arrivals carry a schema,
                # null-typed otherwise (an all-empty epoch) — permissive
                # promote resolves them against the buffer at concat
                **({f.name: pa.nulls(n_ph, f.type) for f in sch
                    if f.name not in (*KEY, "lsn", "_side", _PID)}
                   if sch is not None else
                   {c: pa.nulls(n_ph, pa.null())
                    for c in (*lcols, *rcols)}),
                "_side": pa.array(["L"] * n_ph, pa.string()),
                _PID: pa.array(placeholders, pa.int32()),
            })
            if sch is not None:
                ph = ph.select(sch.names)
                arrivals = arrivals.union(ray.data.from_arrow(ph))
            else:
                arrivals = ray.data.from_arrow(ph)

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson); writes stay wip+rename
        # atomic and byte-deterministic -> retry-safe
        _apply_inst = _Apply(prev_parts, epoch)

        def __ApplyTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(arrivals.groupby(_PID).map_groups(
            __ApplyTask, batch_format="pyarrow"))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            # the emitted LOG (matches + outer timeouts share one file)
            # accumulates in ``deltas`` (vacuum keeps every referenced
            # delta, so emitted rows survive any retention) — the buffer
            # is the rewritten-every-epoch ``file``
            emitted = rec["matches"] + rec["timeouts"]
            prev_log = list(prev_parts.get(str(rec["partition"]), {})
                            .get("deltas", []))
            partitions[rec["partition"]] = {
                "file": rec["file"],
                "deltas": prev_log + ([rec["final_file"]]
                                      if emitted else []),
                "lsn_watermark": epoch,
                "rows_applied": emitted,
                "rows_total": rec["rows_total"],
                "bytes_written": rec["bytes_written"],
            }
        schema = pa.schema([(k, pa.string()) for k in KEY]
                           + [("lsn", pa.int64()), ("_side", pa.string())])
        lrecs = lineage.to_pylist()
        metrics = {"op": "stream_join", "outer": cfg.outer,
                   "wm_left": int(new_wm_l),
                   "wm_right": int(new_wm_r),
                   "matches": int(sum(r["matches"] for r in lrecs)),
                   "timeouts": int(sum(r["timeouts"] for r in lrecs)),
                   "late_dropped": int(sum(r["late"] for r in lrecs))}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    # -- reads ---------------------------------------------------------------

    def matches(self, through_epoch: int | None = None) -> ray.data.Dataset:
        """Every emitted pair through ``through_epoch`` (default latest) —
        each matching pair appears exactly once across all epochs. One
        manifest read: the match log rides each partition's ``deltas``."""
        cfg = self.cfg
        last = self.last_committed_epoch()
        if last is None:
            raise FileNotFoundError(
                f"no committed epochs in {cfg.state_dir}")
        hi = last if through_epoch is None else through_epoch
        m = lake.read_manifest(cfg.state_dir, hi)
        files = sorted({f for rec in m["partitions"].values()
                        for f in rec.get("deltas", [])})
        out_names = [*KEY, "l_lsn", "r_lsn",
                     *[f"l_{c}" for c in cfg.left_cols],
                     *[f"r_{c}" for c in cfg.right_cols]]
        if not files:
            return ray.data.from_arrow(pa.schema(
                [(k, pa.string()) for k in KEY]
                + [("l_lsn", pa.int64()),
                   ("r_lsn", pa.int64())]).empty_table())
        # columns= kills Ray's hive-partition inference (the epoch=NNNN
        # dirs would otherwise surface as a spurious 'epoch' column)
        return ray.data.read_parquet(files, columns=out_names)

    def buffered(self) -> ray.data.Dataset:
        """Current in-flight (unmatched-window) buffer rows, both sides."""
        last = self.last_committed_epoch()
        m = lake.read_manifest(self.cfg.state_dir, last)
        files = [rec["file"] for rec in m["partitions"].values()
                 if rec.get("file")]
        cols = [*KEY, "lsn",
                *[f"l_{c}" for c in self.cfg.left_cols],
                *[f"r_{c}" for c in self.cfg.right_cols], "_side"]
        return ray.data.read_parquet(files, columns=cols)
