"""INCREMENTAL MinHash-LSH NEAR-DUP dedup with persistent bucket state —
the fuzzy counterpart of cdc/dedup_state.py: each new micro-batch of
documents is checked for near-duplicates against the on-disk LSH bucket
index (and against lower-id docs of its own epoch) WITHOUT rescanning or
re-signing the corpus. Per-epoch cost is O(epoch signatures + the probed
bucket partitions); corpus growth only grows the state files, never the
per-epoch compute shape.

Decision rule (deterministic, streaming-greedy): a new doc is a DUPLICATE
iff its exact k-shingle Jaccard with ANY colliding-bucket doc that is
(a) already in the state, or (b) a lower-id doc of the same epoch, is
>= threshold. Verification is exact (carry-texts in the bucket rows — the
corpus-safe verify mode from stages/neardup.py), so LSH only controls
RECALL (band/row choice), never precision. Greedy drop (B dup-of A, C
dup-of B => both dropped) is the standard streaming contract; it equals
min-of-component on chains that thread through kept docs.

State layout reuses the lake epoch/manifest protocol (exactly-once,
crash debris cleaned on resume):

    state_dir/epoch=000N/part-PPPPP.parquet   bucket rows of NOVEL docs
                                              (band, band_hash, id, text)
    state_dir/epoch=000N/novel-PPPPP.parquet  this epoch's surviving docs
    state_dir/manifests/epoch-000N.json
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
from e_commerce_batch_etl_pipeline_ray.stages.neardup import (
    _minhash_sig_batch,
    _shingle_hashes,
)

_PID = "_pid"


@dataclass
class IncNearDupConfig:
    state_dir: str
    k: int = 5                   # shingle length
    num_hashes: int = 64
    bands: int = 16              # more bands -> higher recall
    threshold: float = 0.8       # exact-Jaccard duplicate bar
    num_partitions: int = 32
    id_col: str = "doc_id"
    text_col: str = "text"
    seed: int = 7
    # LSM write-amplification control: K-1 of every K epochs append only
    # the novel docs' bucket rows as a DELTA (no state rewrite — the
    # carried texts make rewrites expensive); every K-th epoch compacts.
    # Probes read base+deltas PRUNED to the epoch's colliding band_hashes
    # (files sorted by (band, band_hash) -> row-group stats skip the
    # rest): probe cost tracks the epoch, not the corpus.
    compact_interval: int = 8


def _jacc(cache: dict, k: int, did, text):
    sh = cache.get(did)
    if sh is None:
        sh = _shingle_hashes(text, k)
        cache[did] = sh
    return sh


class _Probe:
    """Phase-1 worker: per bucket, verify each new doc against seen docs
    and lower-id new docs of the same bucket; emit (id, dup_of) verdicts."""

    def __init__(self, prev_partitions: dict[str, dict], id_col: str,
                 k: int, threshold: float):
        self.prev = prev_partitions
        self.id_col = id_col
        self.k = k
        self.threshold = threshold

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group[_PID][0].as_py()
        rec = self.prev.get(str(pid))
        files = (([rec["file"]] if rec.get("file") else [])
                 + list(rec.get("deltas", []))) if rec else []
        seen: dict[tuple, list] = {}
        if files:
            # pruned probe: only state rows whose band_hash collides with
            # this epoch's buckets leave disk
            probe = sorted(set(group["band_hash"].to_pylist()))
            st = pa.concat_tables(
                [pq.read_table(f, filters=[[("band_hash", "in", probe)]])
                 for f in files])
            for b, h, did, txt in zip(st["band"].to_pylist(),
                                      st["band_hash"].to_pylist(),
                                      st[self.id_col].to_pylist(),
                                      st["_text"].to_pylist()):
                seen.setdefault((b, h), []).append((did, txt))
        new: dict[tuple, list] = {}
        for b, h, did, txt in zip(group["band"].to_pylist(),
                                  group["band_hash"].to_pylist(),
                                  group[self.id_col].to_pylist(),
                                  group["_text"].to_pylist()):
            new.setdefault((b, h), []).append((did, txt))
        shingles: dict = {}
        out_id, out_dup = [], []
        for key, rows in new.items():
            rows.sort()
            others = seen.get(key, [])
            for i, (did, txt) in enumerate(rows):
                sh = _jacc(shingles, self.k, did, txt)
                cands = others + rows[:i]
                for odid, otxt in cands:
                    osh = _jacc(shingles, self.k, odid, otxt)
                    inter = np.intersect1d(sh, osh,
                                           assume_unique=True).size
                    union = sh.size + osh.size - inter
                    j = inter / union if union else 1.0
                    if j >= self.threshold:
                        out_id.append(did)
                        out_dup.append(odid)
                        break          # one witness suffices
        return pa.table({self.id_col: pa.array(out_id, pa.int64()),
                         "dup_of": pa.array(out_dup, pa.int64())})


class _StateWrite:
    """Phase-2 worker: append NOVEL docs' bucket rows to the partition's
    state file, write the partition's novel-docs file; returns lineage."""

    def __init__(self, state_dir: str, epoch: int,
                 prev_partitions: dict[str, dict], id_col: str,
                 mode: str = "compact"):
        self.state_dir = state_dir
        self.epoch = epoch
        self.prev = prev_partitions
        self.id_col = id_col
        self.mode = mode
        self.tmp_dir = lake.epoch_dir(state_dir, epoch, tmp=True)
        os.makedirs(self.tmp_dir, exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group[_PID][0].as_py()
        rows = group.drop_columns([_PID])
        rec = self.prev.get(str(pid))
        files = (([rec["file"]] if rec.get("file") else [])
                 + list(rec.get("deltas", []))) if rec else []
        if self.mode == "delta":
            state = rows
        elif files:
            prior = pa.concat_tables([pq.read_table(f) for f in files])
            state = pa.concat_tables([prior, rows])
        else:
            state = rows
        state = state.sort_by([("band", "ascending"),
                               ("band_hash", "ascending"),
                               (self.id_col, "ascending")])
        # novel docs of this partition: distinct (id, text) — band 0 of
        # each doc lands in exactly one partition, so take band==0 rows
        nov = rows.filter(pc.equal(rows["band"], 0))
        nov = pa.table({self.id_col: nov[self.id_col],
                        "text": nov["_text"]}).sort_by(
            [(self.id_col, "ascending")])
        suffix = "delta.parquet" if self.mode == "delta" else "parquet"
        sfname = f"part-{pid:05d}.{suffix}"
        nfname = f"novel-{pid:05d}.parquet"
        for t, fname in ((state, sfname), (nov, nfname)):
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
            "novel_rows": pa.array([nov.num_rows], pa.int64()),
            "bytes_written": pa.array(
                [sum(os.path.getsize(os.path.join(self.tmp_dir, f))
                     for f in (sfname, nfname))], pa.int64()),
        })


class IncrementalMinHashDedup:
    def __init__(self, config: IncNearDupConfig):
        self.cfg = config
        if config.num_hashes % config.bands:
            raise ValueError("num_hashes must be divisible by bands")
        os.makedirs(config.state_dir, exist_ok=True)

    def last_committed_epoch(self) -> int | None:
        return lake.last_committed_epoch(self.cfg.state_dir)

    def resume_point(self) -> int:
        lake.clean_uncommitted(self.cfg.state_dir)
        last = self.last_committed_epoch()
        return 0 if last is None else last + 1

    def _signatures(self, docs: ray.data.Dataset) -> ray.data.Dataset:
        cfg = self.cfg

        def _sig(t: pa.Table) -> pa.Table:
            out = _minhash_sig_batch(
                t, text_col=cfg.text_col, id_col=cfg.id_col, k=cfg.k,
                num_hashes=cfg.num_hashes, bands=cfg.bands, seed=cfg.seed,
                carry_text=True)
            pid = hash_partition_ids(out, ["band", "band_hash"],
                                     cfg.num_partitions)
            return out.append_column(_PID, pa.array(pid, pa.int32()))

        return docs.map_batches(_sig, batch_format="pyarrow",
                                zero_copy_batch=True)

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
            raise ValueError(
                f"state was written with num_partitions="
                f"{prev_manifest['num_partitions']}; config says "
                f"{cfg.num_partitions} — bucket->partition routing "
                "requires a constant modulus")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )

        rows_in = docs.count()
        sigs = self._signatures(docs).materialize()

        # phase 1: probe buckets, reduce verdicts (dup ids are
        # epoch-bounded — a driver set + closure broadcast, the same
        # budget as one epoch batch)
        verdicts = collect_arrow(sigs.groupby(_PID).map_groups(
            _Probe, batch_format="pyarrow",
            fn_constructor_args=(prev_parts, cfg.id_col, cfg.k,
                                 cfg.threshold),
            concurrency=2, num_cpus=1))
        dup_ids = set(verdicts[cfg.id_col].to_pylist())

        # phase 2: append only NOVEL docs' bucket rows to the state
        def _filter_novel(t: pa.Table) -> pa.Table:
            if not dup_ids:
                return t
            mask = pc.invert(pc.is_in(
                t[cfg.id_col].combine_chunks(),
                value_set=pa.array(sorted(dup_ids), pa.int64())))
            return t.filter(mask)

        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        novel_sigs = sigs.map_batches(_filter_novel, batch_format="pyarrow",
                                      zero_copy_batch=True)
        lineage = collect_arrow(novel_sigs.groupby(_PID).map_groups(
            _StateWrite, batch_format="pyarrow",
            fn_constructor_args=(cfg.state_dir, epoch, prev_parts,
                                 cfg.id_col, mode),
            concurrency=2, num_cpus=1))

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
                    "rows_total": -1,
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
            (cfg.id_col, pa.int64()), ("band", pa.int32()),
            ("band_hash", pa.int64()), ("_text", pa.string())])
        novel_total = sum(r["rows_applied"] for r in partitions.values())
        metrics = {"op": "inc_neardup", "mode": mode, "rows_in": rows_in,
                   "novel_rows": novel_total,
                   "dup_rows": len(dup_ids)}
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def novel(self, epoch: int | None = None) -> ray.data.Dataset:
        """This epoch's surviving (doc_id, text) rows via the manifest."""
        if epoch is None:
            epoch = self.last_committed_epoch()
        if epoch is None:
            raise FileNotFoundError(
                f"no committed epochs in {self.cfg.state_dir}")
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
