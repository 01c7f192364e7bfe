"""INCREMENTAL FREQUENCY state — Count-Min counters persisted through the
lake epoch/manifest protocol. Completes the incremental-sketch family:

    cdc/ndv_state.py   HLL registers   max-merge    "distinct so far"
    cdc/kmv_state.py   KMV synopses    union+trunc  "overlap so far"
    cdc/cms_state.py   CMS counters    SUM-merge    "how often so far"
    cdc/hist_state.py  histogram bins  SUM-merge    "spread so far"

Continuous heavy-hitter / frequency queries ("how many times has each
user_id been seen, per event_type, across the whole stream so far") fold
each micro-batch into a fixed d x w counter matrix per group: state is
bounded by groups x d x w 24-byte rows, never by the key set, and point
queries never rescan the corpus.

THE ALGEBRAIC DIFFERENCE from HLL/KMV, and what it costs: counter
sum-merge is associative + commutative but NOT idempotent. Confluence
under epoch SLICING still holds (every event is counted exactly once in
any slicing — the q133 oracle exploits this), but crash/redelivery
safety cannot come from the merge itself; it comes from the manifest
protocol alone:

- an epoch whose manifest never committed leaves only debris that
  resume_point() cleans — its counts are NOT in the state, and the
  re-ingest recomputes them exactly once;
- a committed epoch refuses re-ingest (strict epoch ordering), so the
  same micro-batch can never be summed twice;
- LSM deltas still need no removal log (counts only grow), and
  compaction is one groupby-SUM.

Duplicate delivery WITHIN the stream (the same logical event in two
different epochs) double-counts by definition of frequency counting —
dedupe upstream (cdc/dedup_state.py) when the stream is at-least-once.

Partitioning: hash of (by..., row, idx) — a hot group's counters spread
over all partitions (no per-group locality requirement; estimates fold
across partitions)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    hash_partition_ids,
)
from e_commerce_batch_etl_pipeline_ray.stages.sketch import (
    cms_estimate,
    cms_partial,
)

_PID = "_pid"


@dataclass
class IncCMSConfig:
    state_dir: str
    col: str
    by: list[str] = field(default_factory=list)
    d: int = 4
    w: int = 1024
    num_partitions: int = 8
    compact_interval: int = 8


def _files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return (([rec["file"]] if rec.get("file") else [])
            + list(rec.get("deltas", [])))


def _sum_merge(t: pa.Table, by: list[str]) -> pa.Table:
    keys = [*by, "row", "idx"]
    out = t.group_by(keys).aggregate([("cnt", "sum")])
    return out.rename_columns([*keys, "cnt"])


class _CMSWrite:
    """Per-partition worker: delta mode appends this epoch's (already
    partition-locally summed) counter rows; compact mode folds
    base+deltas+epoch with one groupby-sum into a fresh base."""

    def __init__(self, state_dir: str, epoch: int,
                 prev_partitions: dict[str, dict], by: list[str],
                 mode: str):
        self.state_dir = state_dir
        self.epoch = epoch
        self.prev = prev_partitions
        self.by = by
        self.mode = mode
        self.tmp_dir = lake.epoch_dir(state_dir, epoch, tmp=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        os.makedirs(self.tmp_dir, exist_ok=True)  # task may run off-driver
        pid = group[_PID][0].as_py()
        rows = _sum_merge(group.drop_columns([_PID]), self.by)
        files = _files(self.prev.get(str(pid)))
        if self.mode == "delta" or not files:
            state = rows
        else:
            prior = pa.concat_tables([pq.read_table(f) for f in files])
            state = _sum_merge(pa.concat_tables([prior, rows]), self.by)
        state = state.sort_by([(c, "ascending")
                               for c in (*self.by, "row", "idx")])
        suffix = "delta.parquet" if self.mode == "delta" else "parquet"
        sfname = f"part-{pid:05d}.{suffix}"
        tmp_path = os.path.join(self.tmp_dir, sfname)
        wip = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(state, wip)
        os.replace(wip, tmp_path)
        final_dir = lake.epoch_dir(self.state_dir, self.epoch)
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([os.path.join(final_dir, sfname)],
                             pa.string()),
            "is_delta": pa.array([self.mode == "delta"], pa.bool_()),
            "rows_total": pa.array([state.num_rows], pa.int64()),
            "bytes_written": pa.array([os.path.getsize(tmp_path)],
                                      pa.int64()),
        })


class IncrementalCMS:
    def __init__(self, config: IncCMSConfig):
        self.cfg = config
        os.makedirs(config.state_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def ingest(self, ds: ray.data.Dataset, epoch: int) -> dict:
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(
                f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.state_dir, last)
                         if last is not None else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError(
                "state was written with num_partitions="
                f"{prev_manifest['num_partitions']}")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        def _partial(t: pa.Table) -> pa.Table:
            out = cms_partial(t, cfg.col, cfg.by or None, cfg.d, cfg.w)
            pid = hash_partition_ids(out, [*cfg.by, "row", "idx"],
                                     cfg.num_partitions)
            return out.append_column(_PID, pa.array(pid, pa.int32()))

        partials = ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson); writes stay wip+rename
        # atomic and byte-deterministic -> retry-safe
        _apply_inst = _CMSWrite(cfg.state_dir, epoch, prev_parts, cfg.by, mode)

        def __CMSWriteTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __CMSWriteTask, batch_format="pyarrow"))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            if rec["is_delta"]:
                prev = prev_parts.get(str(rec["partition"]), {})
                partitions[rec["partition"]] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])) + [rec["file"]],
                    "lsn_watermark": epoch,
                    "rows_total": -1,
                    "bytes_written": rec["bytes_written"],
                }
            else:
                partitions[rec["partition"]] = {
                    "file": rec["file"], "deltas": [],
                    "lsn_watermark": epoch,
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        for pid_s, rec in prev_parts.items():
            partitions.setdefault(
                int(pid_s) if pid_s.lstrip("-").isdigit() else pid_s, rec)
        state_schema = pa.schema(
            [(c, pa.string()) for c in cfg.by]
            + [("row", pa.int64()), ("idx", pa.int64()),
               ("cnt", pa.int64())])
        metrics = {"op": "inc_cms", "mode": mode, "d": cfg.d, "w": cfg.w}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def counters(self, epoch: int | None = None) -> pa.Table:
        """Merged (by..., row, idx, cnt) state as of ``epoch`` —
        base+deltas folded with one groupby-sum. Driver-light: bounded by
        groups x d x w rows, never by input size."""
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError(
                f"no committed epochs in {self.cfg.state_dir}")
        manifest = lake.read_manifest(self.cfg.state_dir, epoch)
        files: list[str] = []
        for rec in manifest["partitions"].values():
            files.extend(_files(rec))
        t = pa.concat_tables([pq.read_table(f) for f in sorted(set(files))])
        return _sum_merge(t, self.cfg.by).sort_by(
            [(c, "ascending") for c in (*self.cfg.by, "row", "idx")])

    def estimate(self, keys: np.ndarray, group: tuple | None = None,
                 epoch: int | None = None) -> np.ndarray:
        """Point-frequency estimates (overestimate-only, CMS bound) for
        ``keys`` within ``group`` from the state."""
        c = self.counters(epoch)
        if self.cfg.by:
            if group is None:
                raise ValueError("group required for a grouped state")
            import pyarrow.compute as pc
            for col, val in zip(self.cfg.by, group):
                c = c.filter(pc.equal(c[col], val))
        return cms_estimate(c, keys, self.cfg.d, self.cfg.w)
