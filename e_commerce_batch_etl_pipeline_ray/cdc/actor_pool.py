"""Persistent merge-worker backend: long-lived raw Ray actors that own fixed
partition ranges and hold per-partition state IN MEMORY across epochs — the
'merge-apply actors holding per-partition RocksDB-style state' architecture
(BASELINE.json north_star), as an alternative to the per-epoch
groupby+map_groups backend (cdc/engine.MergeApply).

This is the one place the engine drops below the Dataset API (ray_guide:
raw actors only for a shared mutable index): Ray Data's actor pools are
per-execution, so cross-epoch in-memory state needs driver-managed actors.

Routing: worker w owns partitions {pid : pid % n_workers == w}. Each epoch,
the normalized Dataset's blocks are handed to every worker as OBJECT REFS
(zero-copy plasma reads); each worker filters out its own partitions
vectorized. W-fold filter passes cost ~O(W x rows) boolean masks — cheap
next to the merge itself — and in exchange the shuffle needs no sort at all.

Fault tolerance: all durable state stays in the lake (manifests + files);
an actor restart just empties its cache, and the next compaction reloads
from the last committed epoch's files. Cache entries are invalidated by
epoch lineage, so a rerun of an epoch after crash cannot see future state.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_block_refs
from e_commerce_batch_etl_pipeline_ray.stages.dedup import combine_keep_extreme

KEY = ["repo", "path"]
_PID = "_pid"


@ray.remote
class MergeWorker:
    def __init__(self, worker_id: int, n_workers: int, lake_dir: str):
        self.worker_id = worker_id
        self.n_workers = n_workers
        self.lake_dir = lake_dir
        self.cache: dict[int, tuple[int, pa.Table]] = {}   # pid -> (epoch, table)
        self.deltas: dict[int, list[pa.Table]] = {}
        self.epoch: int | None = None

    def begin_epoch(self, epoch: int, schema_b64: str,
                    prev_partitions: dict[str, dict], mode: str,
                    gc_horizon_lsn: int | None = None,
                    stats_cols: tuple = (),
                    key_bloom_fpp: float | None = None,
                    bloom_cols: tuple = (),
                    identity_spec: tuple | None = None) -> None:
        self.identity_spec = identity_spec
        self.epoch = epoch
        self.gc_horizon_lsn = gc_horizon_lsn
        self.stats_cols = tuple(stats_cols)
        self.key_bloom_fpp = key_bloom_fpp
        self.bloom_cols = tuple(bloom_cols)
        self.schema = lake.schema_from_b64(schema_b64)
        self.prev_partitions = prev_partitions
        self.mode = mode
        self.deltas = {}
        self.tmp_dir = lake.epoch_dir(self.lake_dir, epoch, tmp=True)
        os.makedirs(self.tmp_dir, exist_ok=True)

    def _unify(self, t: pa.Table) -> pa.Table:
        # lake._unify_to also resolves rename aliases — prior files written
        # before a lake.rename_column carry the old physical name
        return lake._unify_to(t, self.schema)

    def ingest_block(self, block: pa.Table) -> int:
        """Broadcast fan-out: take this worker's rows from a (shared,
        zero-copy) block."""
        pid = block[_PID].to_numpy()
        mask = (pid % self.n_workers) == self.worker_id
        if not mask.any():
            return 0
        return self.ingest_parts(block.filter(pa.array(mask)))

    def ingest_parts(self, mine: pa.Table) -> int:
        """Split fan-out: rows already routed to this worker; bucket by pid."""
        if mine.num_rows == 0:
            return 0
        pid = mine[_PID].to_numpy()
        for p in np.unique(pid):
            sub = mine.filter(pc.equal(mine[_PID], int(p)))
            self.deltas.setdefault(int(p), []).append(sub.drop_columns([_PID]))
        return mine.num_rows

    def _load_prior(self, pid: int) -> pa.Table | None:
        cached = self.cache.get(pid)
        if cached is not None and cached[0] == self.epoch - 1:
            # re-unify: the cached table carries the PREVIOUS epoch's schema,
            # which differs across an evolution boundary (additive columns)
            return self._unify(cached[1])
        rec = self.prev_partitions.get(str(pid))
        if rec is None:
            return None
        files = ([rec["file"]] if rec.get("file") else []) + list(rec.get("deltas", []))
        if not files:
            return None
        # deletion-vector mask at the prior read (lake.delete_where_dv);
        # the cross-epoch cache above is safe: a DV commit claims an epoch
        # number, so the next ingest's ``epoch - 1`` check misses and state
        # is re-read from files through this masked path
        tables = [self._unify(lake.apply_dv(pq.read_table(f), f, rec))
                  for f in files]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    def finish_epoch(self) -> pa.Table:
        """Merge + write every owned partition; return lineage rows."""
        out_rows = []
        for pid in sorted(self.deltas):
            # permissive promote: Ray block schemas can differ benignly
            # (e.g. string vs large_string after block ops); _unify below
            # casts to the canonical epoch schema anyway
            delta = pa.concat_tables(self.deltas[pid],
                                     promote_options="permissive") \
                if len(self.deltas[pid]) > 1 else self.deltas[pid][0]
            delta = self._unify(combine_keep_extreme(delta, KEY, ["lsn"],
                                                     descending=True))
            rows_applied = delta.num_rows
            prev_wm = max([r.get("lsn_watermark", -1)
                           for r in self.prev_partitions.values()] + [-1])
            late_events = int(pc.sum(pc.cast(
                pc.less_equal(delta["lsn"], prev_wm),
                pa.int64())).as_py() or 0) if delta.num_rows else 0
            if self.mode == "delta":
                merged = delta
                if self.identity_spec:
                    from e_commerce_batch_etl_pipeline_ray.cdc.engine import (
                        _apply_identity,
                        _identity_prior,
                    )
                    merged = _apply_identity(
                        merged,
                        _identity_prior(self.prev_partitions.get(str(pid)),
                                        self.schema, self.identity_spec[0]),
                        self.epoch, pid, self.identity_spec)
            else:
                prior = self._load_prior(pid)
                merged = delta if prior is None else pa.concat_tables([prior, delta])
                merged = combine_keep_extreme(merged, KEY, ["lsn"], descending=True)
                if self.gc_horizon_lsn is not None:
                    dead = pc.and_(merged["_deleted"],
                                   pc.less(merged["lsn"], self.gc_horizon_lsn))
                    merged = merged.filter(pc.invert(dead))
                if self.identity_spec:
                    from e_commerce_batch_etl_pipeline_ray.cdc.engine import (
                        _apply_identity,
                    )
                    merged = _apply_identity(merged, prior, self.epoch, pid,
                                             self.identity_spec)

            suffix = "delta.parquet" if self.mode == "delta" else "parquet"
            fname = f"part-{pid:05d}.{suffix}"
            tmp_path = os.path.join(self.tmp_dir, fname)
            wip = f"{tmp_path}.wip.{os.getpid()}"
            pq.write_table(merged, wip)
            os.replace(wip, tmp_path)
            if self.key_bloom_fpp:
                from e_commerce_batch_etl_pipeline_ray.cdc import keybloom
                keybloom.write_sidecar(tmp_path, merged, self.key_bloom_fpp,
                                       value_cols=self.bloom_cols)
            if self.mode == "compact":
                self.cache[pid] = (self.epoch, merged)
            import json as _json
            out_rows.append({
                "partition": pid,
                "file": os.path.join(lake.epoch_dir(self.lake_dir, self.epoch), fname),
                "lsn_watermark": pc.max(merged["lsn"]).as_py(),
                "rows_applied": rows_applied,
                "rows_total": merged.num_rows,
                "bytes_written": os.path.getsize(tmp_path),
                "late_events": late_events,
                "stats": (_json.dumps({**lake.col_stats(merged,
                                                        self.stats_cols),
                                       **lake.live_meta(merged,
                                                        self.stats_cols)})
                          if self.mode == "compact" and self.stats_cols
                          else ""),
            })
        self.deltas = {}
        return pa.Table.from_pylist(out_rows) if out_rows else pa.table({
            "partition": pa.array([], pa.int64()),
            "file": pa.array([], pa.string()),
            "lsn_watermark": pa.array([], pa.int64()),
            "rows_applied": pa.array([], pa.int64()),
            "rows_total": pa.array([], pa.int64()),
            "bytes_written": pa.array([], pa.int64()),
            "late_events": pa.array([], pa.int64()),
            "stats": pa.array([], pa.string()),
        })


def resolve_fan_out(fan_out: str, n_nodes: int | None = None) -> str:
    """Resolve the "auto" fan-out policy to a concrete strategy.

    broadcast is only optimal when every worker can read every block from
    the SAME plasma store (one host); on a real cluster it is W-fold
    network traffic per epoch. auto therefore picks "split" whenever more
    than one alive node is visible, and "broadcast" on a single host.
    """
    if fan_out in ("broadcast", "split"):
        return fan_out
    if fan_out != "auto":
        raise ValueError(f"unknown fan_out {fan_out!r} "
                         "(expected auto|broadcast|split)")
    if n_nodes is None:
        n_nodes = sum(1 for n in ray.nodes() if n.get("Alive", False))
    return "split" if n_nodes > 1 else "broadcast"


@ray.remote
def _split_block(block: pa.Table, n_workers: int) -> list[pa.Table]:
    """One task per block: pre-split into per-worker sub-tables. On a real
    cluster this is the multi-node-shaped fan-out: each worker receives only
    its own rows (1x network traffic) instead of reading every block
    (W-fold broadcast)."""
    pid = block[_PID].to_numpy()
    return [block.filter(pa.array((pid % n_workers) == w))
            for w in range(n_workers)]


class PersistentMergePool:
    """Driver-side handle: creates the workers once, feeds them each epoch's
    normalized blocks, collects lineage.

    ``fan_out``: "broadcast" hands every block ref to every worker
    (zero-copy plasma reads; optimal on one host), "split" pre-splits each
    block in a task and routes per-worker sub-tables (the multi-node-shaped
    exchange: per-worker traffic is 1x, not W-fold), "auto" (default)
    selects split when the cluster has more than one alive node."""

    def __init__(self, lake_dir: str, n_workers: int,
                 fan_out: str = "auto"):
        self.n_workers = n_workers
        self.fan_out = resolve_fan_out(fan_out)
        # SPREAD the pool over the cluster: default actor scheduling packs
        # 0-CPU actors onto one node, which on a real cluster concentrates
        # every partition's merge CPU + lake I/O on a single host. On one
        # node SPREAD is a no-op.
        self.workers = [
            MergeWorker.options(scheduling_strategy="SPREAD").remote(
                w, n_workers, lake_dir)
            for w in range(n_workers)]

    def run_epoch(self, normalized, epoch: int, schema_b64: str,
                  prev_partitions: dict, mode: str,
                  gc_horizon_lsn: int | None = None,
                  stats_cols: tuple = (),
                  key_bloom_fpp: float | None = None,
                  bloom_cols: tuple = (),
                  identity_spec: tuple | None = None) -> pa.Table:
        ray.get([w.begin_epoch.remote(epoch, schema_b64, prev_partitions,
                                      mode, gc_horizon_lsn, stats_cols,
                                      key_bloom_fpp, bloom_cols,
                                      identity_spec)
                 for w in self.workers])
        futures = []
        if self.fan_out == "split":
            for ref in collect_block_refs(normalized):
                parts = _split_block.options(
                    num_returns=self.n_workers).remote(ref, self.n_workers)
                if self.n_workers == 1:
                    parts = [parts]
                for w, part_ref in zip(self.workers, parts):
                    futures.append(w.ingest_parts.remote(part_ref))
        else:
            for ref in collect_block_refs(normalized):
                for w in self.workers:
                    futures.append(w.ingest_block.remote(ref))
        ray.get(futures)
        lineage_tables = ray.get([w.finish_epoch.remote() for w in self.workers])
        return pa.concat_tables([t for t in lineage_tables if t.num_rows],
                                promote_options="default") \
            if any(t.num_rows for t in lineage_tables) else lineage_tables[0]

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)
        self.workers = []
