"""INCREMENTAL DISTINCT-COUNT state — HyperLogLog registers persisted
through the lake epoch/manifest protocol: each micro-batch folds into
the per-group register state with a pure max-merge, so "distinct users
seen so far" never rescans the corpus and never stores keys. The state
is the smallest of the incremental family: <= groups x 2^p rows of
(by..., idx, reg) — 16 KiB/group at p=14 — versus the key set itself.

Register max-merge is associative/commutative/idempotent
(stages/sketch.py, confluence property test), which buys three things
for free:

- ANY epoch slicing of the input yields bit-identical final registers
  (the q118 oracle replays the WHOLE table in SQL and matches the
  multi-epoch state exactly);
- crash/redelivery of an epoch is a no-op merge (idempotent);
- LSM deltas need no removal log — compaction is just groupby-max.

Layout (lake protocol, exactly-once commits, crash debris cleaned on
resume):

    state_dir/epoch=000N/part-PPPPP.[delta.]parquet  (by..., idx, reg)
    state_dir/manifests/epoch-000N.json

Partitioning: hash of (by..., idx) — a single group's registers spread
over all partitions, so one hot group cannot skew a partition (there is
no per-group locality requirement; estimates fold across partitions)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    hash_partition_ids,
)
from e_commerce_batch_etl_pipeline_ray.stages.sketch import (
    hll_estimate,
    hll_partial,
)

_PID = "_pid"


@dataclass
class IncNDVConfig:
    state_dir: str
    col: str
    by: list[str] = field(default_factory=list)
    p: int = 14
    num_partitions: int = 8
    compact_interval: int = 8


def _files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return (([rec["file"]] if rec.get("file") else [])
            + list(rec.get("deltas", [])))


def _max_merge(t: pa.Table, by: list[str]) -> pa.Table:
    keys = [*by, "idx"]
    out = t.group_by(keys).aggregate([("reg", "max")])
    return out.rename_columns([*keys, "reg"])


class _NDVWrite:
    """Per-partition worker: delta mode appends this epoch's (already
    partition-locally merged) register rows; compact mode folds
    base+deltas+epoch with one groupby-max into a fresh base."""

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
        rows = _max_merge(group.drop_columns([_PID]), self.by)
        files = _files(self.prev.get(str(pid)))
        if self.mode == "delta" or not files:
            state = rows
        else:
            prior = pa.concat_tables([pq.read_table(f) for f in files])
            state = _max_merge(pa.concat_tables([prior, rows]), self.by)
        state = state.sort_by([(c, "ascending")
                               for c in (*self.by, "idx")])
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


class IncrementalNDV:
    def __init__(self, config: IncNDVConfig):
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
            out = hll_partial(t, cfg.col, cfg.by or None, cfg.p)
            pid = hash_partition_ids(out, [*cfg.by, "idx"],
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
        _apply_inst = _NDVWrite(cfg.state_dir, epoch, prev_parts, cfg.by, mode)

        def __NDVWriteTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __NDVWriteTask, batch_format="pyarrow"))

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
        # untouched partitions carry forward (an epoch may not hit all)
        for pid_s, rec in prev_parts.items():
            partitions.setdefault(
                int(pid_s) if pid_s.lstrip("-").isdigit() else pid_s, rec)
        schema_fields = [("idx", pa.int64()), ("reg", pa.int64())]
        state_schema = pa.schema(
            [(c, pa.string()) for c in cfg.by] + schema_fields)
        metrics = {"op": "inc_ndv", "mode": mode, "p": cfg.p}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def registers(self, epoch: int | None = None) -> pa.Table:
        """Merged (by..., idx, reg) state as of ``epoch`` — base+deltas
        folded with one groupby-max. Driver-light: the state is bounded
        by groups x 2^p rows, never by input size."""
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
        return _max_merge(t, self.cfg.by).sort_by(
            [(c, "ascending") for c in (*self.cfg.by, "idx")])

    def ndv(self, epoch: int | None = None) -> pa.Table:
        """Approximate distinct count per group from the state."""
        regs = self.registers(epoch)
        if not self.cfg.by:
            est = hll_estimate(regs["idx"].to_numpy(),
                               regs["reg"].to_numpy(), self.cfg.p)
            return pa.table({"ndv": pa.array([est], pa.float64())})
        import pandas as pd
        df = regs.to_pandas()
        out = (df.groupby(self.cfg.by, sort=True)
               .apply(lambda g: hll_estimate(g["idx"].to_numpy(),
                                             g["reg"].to_numpy(),
                                             self.cfg.p),
                      include_groups=False)
               .rename("ndv").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)
