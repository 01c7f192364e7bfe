"""INCREMENTAL DISTRIBUTION state — fixed-range histogram bin counts
persisted through the lake epoch/manifest protocol. Completes the
incremental mergeable-summary family:

    cdc/ndv_state.py    HLL registers   max-merge    "distinct so far"
    cdc/kmv_state.py    KMV synopses    union+trunc  "overlap so far"
    cdc/cms_state.py    CMS counters    SUM-merge    "how often so far"
    cdc/hist_state.py   histogram bins  SUM-merge    "spread so far"

Continuous distribution monitoring ("what does per-event value look
like per event_type across the whole stream so far" — latency SLOs,
drift alarms, approximate quantiles) folds each micro-batch into
(by..., bin, cnt) rows: state is bounded by groups x (nbins + 2) rows,
and cumulative bins answer quantiles with error <= one bin width
(stages/sketch.hist_quantile).

Same algebra as the CMS state, same consequence: bin-count SUM-merge is
confluent under epoch slicing but NOT idempotent, so crash/redelivery
safety is the manifest protocol's (debris cleaned at resume, committed
epochs refuse replay); LSM deltas need no removal log (counts only
grow) and compaction is one groupby-sum. Binning is pure integer
arithmetic ((x - lo) // step with explicit under/overflow bins) so the
q142 oracle replays it bit-exactly in SQL — no float floor edges."""

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
    hist_check,
    hist_partial,
    hist_quantile,
)

_PID = "_pid"


@dataclass
class IncHistConfig:
    state_dir: str
    col: str
    by: list[str] = field(default_factory=list)
    lo: int = 0
    hi: int = 1024
    nbins: int = 64
    num_partitions: int = 8
    compact_interval: int = 8

    def __post_init__(self):
        hist_check(self.lo, self.hi, self.nbins)


def _files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return (([rec["file"]] if rec.get("file") else [])
            + list(rec.get("deltas", [])))


def _sum_merge(t: pa.Table, by: list[str]) -> pa.Table:
    keys = [*by, "bin"]
    out = t.group_by(keys).aggregate([("cnt", "sum")])
    return out.rename_columns([*keys, "cnt"])


class _HistWrite:
    """Per-partition worker, same contract as cdc/cms_state._CMSWrite:
    delta mode appends this epoch's summed bin rows, compact mode folds
    base+deltas+epoch with one groupby-sum into a fresh sorted base."""

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
                               for c in (*self.by, "bin")])
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


class IncrementalHist:
    def __init__(self, config: IncHistConfig):
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
            out = hist_partial(t, cfg.col, cfg.by or None,
                               cfg.lo, cfg.hi, cfg.nbins)
            pid = hash_partition_ids(out, [*cfg.by, "bin"],
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
        _apply_inst = _HistWrite(cfg.state_dir, epoch, prev_parts, cfg.by, mode)

        def __HistWriteTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __HistWriteTask, batch_format="pyarrow"))

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
            + [("bin", pa.int64()), ("cnt", pa.int64())])
        metrics = {"op": "inc_hist", "mode": mode, "lo": cfg.lo,
                   "hi": cfg.hi, "nbins": cfg.nbins}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def bins(self, epoch: int | None = None) -> pa.Table:
        """Merged (by..., bin, cnt) state as of ``epoch`` — base+deltas
        folded with one groupby-sum. Bounded by groups x (nbins+2) rows."""
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
            [(c, "ascending") for c in (*self.cfg.by, "bin")])

    def quantiles(self, qs, group: tuple | None = None,
                  epoch: int | None = None) -> np.ndarray:
        """Approximate quantiles (error <= one bin width) for ``group``
        from the state so far."""
        b = self.bins(epoch)
        if self.cfg.by:
            if group is None:
                raise ValueError("group required for a grouped state")
            import pyarrow.compute as pc
            for col, val in zip(self.cfg.by, group):
                b = b.filter(pc.equal(b[col], val))
        return hist_quantile(b.select(["bin", "cnt"]), qs,
                             self.cfg.lo, self.cfg.hi, self.cfg.nbins)
