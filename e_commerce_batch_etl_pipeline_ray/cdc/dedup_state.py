"""INCREMENTAL EXACT DEDUP with persistent state — the streaming-corpus
form of ``stages/neardup.exact_dedup``: each new micro-batch of documents
is checked against the hash-partitioned SEEN-CONTENT state on disk and
only never-seen content survives, without ever rescanning the corpus.
This is the dedup shape a 100-TB continuously-ingesting training-data
pipeline needs: per-epoch cost is O(epoch + touched state partitions),
not O(corpus).

Protocol reuses the CDC lake's epoch/manifest machinery verbatim
(tmp-dir write -> atomic dir promote -> atomic manifest commit; crash
debris cleaned on resume), so ingest is exactly-once and replayable:

    state_dir/epoch=000N/part-PPPPP.parquet   seen-hash state (sha, id)
    state_dir/epoch=000N/novel-PPPPP.parquet  THIS epoch's surviving docs
    state_dir/manifests/epoch-000N.json

Within an epoch the winner for duplicated content is the lowest id
(deterministic, retry-safe); across epochs the earlier epoch always wins
(its sha is already in the state). Novel outputs are part of the commit:
re-running a crashed epoch rewrites byte-identical novel files, and a
downstream consumer reads them only through the committed manifest.
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
    combine_keep_extreme,
    hash_partition_ids,
)
from e_commerce_batch_etl_pipeline_ray.stages.neardup import content_hash

_PID = "_pid"
_SHA = "_sha"


@dataclass
class IncDedupConfig:
    state_dir: str
    num_partitions: int = 32
    id_col: str = "doc_id"
    text_col: str = "text"
    # LSM write-amplification control (the lake's compact_interval
    # contract): K-1 of every K epochs append only a DELTA of this
    # epoch's novel (sha, id) rows — no state read-back, no rewrite;
    # every K-th epoch compacts base+deltas into a fresh sha-sorted base.
    # Probes always read base+deltas PRUNED to the incoming shas (the
    # files are sha-sorted, so parquet row-group stats skip untouched
    # ranges) — probe cost is O(epoch), never O(state).
    compact_interval: int = 8


class _DedupApply:
    """Per-partition worker: novel = shas absent from the prior state;
    writes the updated state file AND the novel-docs file for its
    partition into the epoch tmp dir, returns lineage."""

    def __init__(self, state_dir: str, epoch: int,
                 prev_partitions: dict[str, dict], id_col: str,
                 mode: str = "compact"):
        self.state_dir = state_dir
        self.epoch = epoch
        self.prev = prev_partitions
        self.id_col = id_col
        self.mode = mode                      # "compact" | "delta"
        self.tmp_dir = lake.epoch_dir(state_dir, epoch, tmp=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        os.makedirs(self.tmp_dir, exist_ok=True)  # task may run off-driver
        pid = group[_PID][0].as_py()
        batch = group.drop_columns([_PID])
        # within-epoch winner: lowest id per sha (blocks pre-combined)
        batch = combine_keep_extreme(batch, [_SHA], [self.id_col],
                                     descending=False)
        rec = self.prev.get(str(pid))
        files = (([rec["file"]] if rec.get("file") else [])
                 + list(rec.get("deltas", []))) if rec else []
        empty = pa.table({_SHA: pa.array([], pa.string()),
                          self.id_col: pa.array(
                              [], batch[self.id_col].type)})
        # PROBE: read base+deltas pruned to the incoming shas (files are
        # sha-sorted -> row-group stats skip untouched ranges): O(epoch)
        probe = sorted(set(batch[_SHA].to_pylist()))
        seen = pa.concat_tables(
            [pq.read_table(f, columns=[_SHA],
                           filters=[[(_SHA, "in", probe)]])
             for f in files]) if files else empty.select([_SHA])
        novel_mask = pc.invert(pc.is_in(
            batch[_SHA].combine_chunks(),
            value_set=seen[_SHA].combine_chunks()))
        novel = batch.filter(novel_mask)
        novel_state = novel.select([_SHA, self.id_col]).sort_by(
            [(_SHA, "ascending")])

        if self.mode == "delta":
            state, suffix = novel_state, "delta.parquet"
        else:
            # compaction: fold base+deltas (FULL read) + this epoch's
            # novels into a fresh sha-sorted base
            full = pa.concat_tables(
                [pq.read_table(f) for f in files]) if files else empty
            state = pa.concat_tables([full, novel_state]).sort_by(
                [(_SHA, "ascending")])
            suffix = "parquet"
        novel_out = novel.drop_columns([_SHA]).sort_by(
            [(self.id_col, "ascending")])

        sfname = f"part-{pid:05d}.{suffix}"
        nfname = f"novel-{pid:05d}.parquet"
        for t, fname in ((state, sfname), (novel_out, nfname)):
            tmp_path = os.path.join(self.tmp_dir, fname)
            wip = f"{tmp_path}.wip.{os.getpid()}"
            pq.write_table(t, wip)
            os.replace(wip, tmp_path)
        final_dir = lake.epoch_dir(self.state_dir, self.epoch)
        return pa.table({
            "partition": pa.array([pid], pa.int32()),
            "file": pa.array([os.path.join(final_dir, sfname)], pa.string()),
            "novel_file": pa.array([os.path.join(final_dir, nfname)],
                                   pa.string()),
            "is_delta": pa.array([self.mode == "delta"], pa.bool_()),
            "rows_total": pa.array([state.num_rows], pa.int64()),
            "novel_rows": pa.array([novel_out.num_rows], pa.int64()),
            "bytes_written": pa.array(
                [sum(os.path.getsize(os.path.join(self.tmp_dir, f))
                     for f in (sfname, nfname))], pa.int64()),
        })


class IncrementalDedup:
    """Driver-side orchestrator: epoch loop + commit + novel reads."""

    def __init__(self, config: IncDedupConfig):
        self.cfg = config
        os.makedirs(config.state_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def ingest(self, docs: ray.data.Dataset, epoch: int) -> dict:
        cfg = self.cfg
        last = self.last_committed_epoch()
        expected = 0 if last is None else last + 1
        if epoch != expected:
            raise ValueError(f"epoch {epoch} out of order; expected {expected}")
        prev_manifest = (lake.read_manifest(cfg.state_dir, last)
                         if last is not None else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, cfg.num_partitions):
            raise ValueError("state was written with num_partitions="
                             f"{prev_manifest['num_partitions']}")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        # materialize once: count() on a lazy dataset would execute the
        # whole read a second time, and upstream filters often leave ONE
        # block — resplit so the sha pass parallelizes (epoch-bounded)
        docs = docs.materialize()
        rows_in = docs.count()          # metadata-only when materialized
        nblocks = max(2, min(cfg.num_partitions, rows_in // 200 or 1))
        if docs.num_blocks() < nblocks:
            docs = docs.repartition(nblocks).materialize()
        hashed = content_hash(cfg.text_col, out=_SHA).apply(docs)

        def _combine(t: pa.Table) -> pa.Table:
            # block-local winner caps per-sha shuffle traffic at one
            # row per block (the ingest combiner pattern)
            t = combine_keep_extreme(t, [_SHA], [cfg.id_col],
                                     descending=False)
            pid = hash_partition_ids(t, [_SHA], cfg.num_partitions)
            return t.append_column(_PID, pa.array(pid, pa.int32()))

        assigned = hashed.map_batches(_combine, batch_format="pyarrow",
                                      zero_copy_batch=True)
        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson). Writes are wip+rename
        # atomic and byte-deterministic per partition -> retry-safe.
        _apply_inst = _DedupApply(cfg.state_dir, epoch, prev_parts,
                                  cfg.id_col, mode)

        def _DedupApplyTask(g: pa.Table) -> pa.Table:
            return _apply_inst(g)

        lineage = collect_arrow(assigned.groupby(_PID).map_groups(
            _DedupApplyTask, batch_format="pyarrow"))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            if rec["is_delta"]:
                prev = prev_parts.get(str(rec["partition"]), {})
                partitions[rec["partition"]] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])) + [rec["file"]],
                    "novel_file": rec["novel_file"],
                    "lsn_watermark": epoch,
                    "rows_applied": rec["novel_rows"],
                    "rows_total": -1,        # unknown without a base read
                    "bytes_written": rec["bytes_written"],
                }
            else:
                partitions[rec["partition"]] = {
                    "file": rec["file"], "deltas": [],
                    "novel_file": rec["novel_file"],
                    "lsn_watermark": epoch,
                    "rows_applied": rec["novel_rows"],
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        state_schema = pa.schema([
            (_SHA, pa.string()),
            (cfg.id_col, docs.schema().base_schema.field(cfg.id_col).type)])
        novel_total = sum(r["rows_applied"] for r in partitions.values())
        prev_seen = (prev_manifest["metrics"].get("seen_total", 0)
                     if prev_manifest else 0)
        metrics = {
            "op": "inc_dedup",
            "mode": mode,
            "rows_in": rows_in,
            "novel_rows": novel_total,
            # vs INPUT rows (the block-local combiner already folds
            # within-block duplicates before the shuffle)
            "dup_rows": rows_in - novel_total,
            # cumulative distinct contents: novels are globally distinct,
            # so the running sum is exact in both compact and delta epochs
            "seen_total": prev_seen + novel_total,
        }
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def novel(self, epoch: int | None = None) -> ray.data.Dataset:
        """THIS epoch's surviving (never-seen-before) documents, read via
        the committed manifest. Partitions untouched in ``epoch`` carry
        forward their STATE file but their novel file belongs to the epoch
        it was written in — only novel files actually written at ``epoch``
        are read (an epoch with no new content yields an empty Dataset)."""
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no committed epochs in "
                                    f"{self.cfg.state_dir}")
        manifest = lake.read_manifest(self.cfg.state_dir, epoch)
        marker = f"epoch={epoch:04d}{os.sep}"
        files = sorted({rec["novel_file"]
                        for rec in manifest["partitions"].values()
                        if rec.get("novel_file")
                        and marker in rec["novel_file"]})
        files = [f for f in files if os.path.exists(f)]
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files)

    def seen_count(self) -> int:
        last = self.last_committed_epoch()
        if last is None:
            return 0
        m = lake.read_manifest(self.cfg.state_dir, last)
        return m["metrics"]["seen_total"]
