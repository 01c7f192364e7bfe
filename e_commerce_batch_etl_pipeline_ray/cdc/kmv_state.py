"""INCREMENTAL KMV SYNOPSIS state — the set-algebra member of the
incremental-state family (dedup: keys; ndv_state: HLL registers; here:
k-minimum-values synopses), persisted through the lake epoch/manifest
protocol. Each micro-batch folds into the per-group synopsis with a
union-then-truncate merge, so "the corpus synopsis so far" never
rescans the corpus — and because two synopses support Jaccard / union /
intersection estimates (stages/sketch.kmv_overlap), the maintained
state answers CROSS-CORPUS CONTAMINATION questions (train vs eval)
continuously, with no join and no key shuffle.

Union-then-truncate is associative/commutative/idempotent — the k
smallest of A ∪ B lie inside (k smallest of A) ∪ (k smallest of B)
(stages/sketch.py confluence property) — which buys the same three
properties ndv_state gets:

- ANY epoch slicing of the input yields the BIT-IDENTICAL final
  synopsis (the q125 oracle replays the whole table in SQL and matches
  the multi-epoch state exactly);
- crash/redelivery of an epoch is a no-op merge (duplicates vanish in
  the distinct);
- LSM deltas need no removal log — compaction is distinct + per-group
  head(k).

Layout (lake protocol, exactly-once commits, crash debris cleaned on
resume):

    state_dir/epoch=000N/part-PPPPP.[delta.]parquet  (by..., h)
    state_dir/manifests/epoch-000N.json

Partitioning: hash of the GROUP columns (constant 0 when by=[]) —
unlike ndv_state, truncation needs all of a group's hashes in one
place. That cannot skew: a group's state is <= k rows by construction,
and each epoch appends <= k rows per touched group between compactions,
so a partition holds O(groups_in_partition x k) tiny fixed-width rows."""

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
    kmv_ndv,
    kmv_partial,
)

_PID = "_pid"


@dataclass
class IncKMVConfig:
    state_dir: str
    col: str
    by: list[str] = field(default_factory=list)
    k: int = 256
    num_partitions: int = 8
    compact_interval: int = 8


def _files(rec: dict | None) -> list[str]:
    if not rec:
        return []
    return (([rec["file"]] if rec.get("file") else [])
            + list(rec.get("deltas", [])))


def _kmv_fold(t: pa.Table, by: list[str], k: int) -> pa.Table:
    """distinct + k smallest hashes per group, sorted (by..., h)."""
    if not by:
        u = np.unique(t["h"].to_numpy())[:k]
        return pa.table({"h": pa.array(u, pa.uint64())})
    import pandas as pd
    df = t.select([*by, "h"]).to_pandas()
    out = (df.drop_duplicates([*by, "h"])
           .sort_values([*by, "h"])
           .groupby(by, sort=True).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


class _KMVWrite:
    """Per-partition worker: delta mode appends this epoch's synopsis
    rows (already folded to k per group — lossless, see module doc);
    compact mode folds base+deltas+epoch into a fresh base."""

    def __init__(self, state_dir: str, epoch: int,
                 prev_partitions: dict[str, dict], by: list[str],
                 k: int, mode: str):
        self.state_dir = state_dir
        self.epoch = epoch
        self.prev = prev_partitions
        self.by = by
        self.k = k
        self.mode = mode
        self.tmp_dir = lake.epoch_dir(state_dir, epoch, tmp=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        os.makedirs(self.tmp_dir, exist_ok=True)  # task may run off-driver
        pid = group[_PID][0].as_py()
        rows = _kmv_fold(group.drop_columns([_PID]), self.by, self.k)
        files = _files(self.prev.get(str(pid)))
        if self.mode == "delta" or not files:
            state = rows
        else:
            prior = pa.concat_tables(
                [pq.read_table(f) for f in files] + [rows])
            state = _kmv_fold(prior, self.by, self.k)
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


class IncrementalKMV:
    def __init__(self, config: IncKMVConfig):
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
        if prev_manifest and prev_manifest.get("metrics", {}).get(
                "k") not in (None, cfg.k):
            raise ValueError(
                f"state was written with k={prev_manifest['metrics']['k']}")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        def _partial(t: pa.Table) -> pa.Table:
            out = kmv_partial(t, cfg.col, cfg.by or None, cfg.k)
            if cfg.by:
                pid = hash_partition_ids(out, cfg.by, cfg.num_partitions)
            else:
                pid = np.zeros(out.num_rows, np.int32)
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
        _apply_inst = _KMVWrite(cfg.state_dir, epoch, prev_parts, cfg.by, cfg.k, mode)

        def __KMVWriteTask(g):
            return _apply_inst(g)

        lineage = collect_arrow(partials.groupby(_PID).map_groups(
            __KMVWriteTask, batch_format="pyarrow"))

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
            [(c, pa.string()) for c in cfg.by] + [("h", pa.uint64())])
        metrics = {"op": "inc_kmv", "mode": mode, "k": cfg.k}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def synopsis(self, epoch: int | None = None) -> pa.Table:
        """Merged (by..., h) synopsis as of ``epoch`` — base+deltas
        folded with one distinct + per-group head(k). Driver-light: the
        fold is bounded by partitions x epoch-deltas x k rows per group,
        never by input size."""
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
        return _kmv_fold(t, self.cfg.by, self.cfg.k)

    def ndv(self, epoch: int | None = None) -> pa.Table:
        """Approximate distinct count per group from the synopsis."""
        syn = self.synopsis(epoch)
        if not self.cfg.by:
            est = kmv_ndv(syn["h"].to_numpy(), self.cfg.k)
            return pa.table({"ndv": pa.array([est], pa.float64())})
        import pandas as pd
        df = syn.to_pandas()
        out = (df.groupby(self.cfg.by, sort=True)["h"]
               .apply(lambda h: kmv_ndv(h.to_numpy(), self.cfg.k))
               .rename("ndv").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)
