"""INCREMENTAL PARAGRAPH DEDUP with persistent state — the streaming form
of ``stages/paradedup.paragraph_dedup``: each micro-batch of documents is
rewritten against the hash-partitioned SEEN-PARAGRAPH state on disk, so a
boilerplate paragraph that appeared in ANY earlier epoch (or earlier in
this one) is stripped in place, without ever rescanning the corpus. This
is the shape a continuously-ingesting training-data pipeline needs: the
per-epoch cost is O(epoch paragraphs + probed state row groups), never
O(state).

Protocol reuses the CDC lake's epoch/manifest machinery verbatim
(tmp-dir write -> atomic dir promote -> atomic manifest commit; crash
debris cleaned on resume), giving exactly-once, replayable rewrites:

    state_dir/epoch=000N/part-PPPPP.parquet         seen-sha state
    state_dir/epoch=000N/part-PPPPP.delta.parquet   (LSM delta epochs)
    state_dir/epoch=000N/docs-PPPPP.parquet         THIS epoch's rewritten docs
    state_dir/manifests/epoch-000N.json

State rows are (sha,) only — ~32 bytes per DISTINCT paragraph ever seen
(the q111 lesson applied at design time: state never carries text).
Probes read base+deltas pruned to the incoming shas (sha-sorted files ->
parquet row-group stats skip untouched ranges); every K-th epoch compacts
the LSM chain (``compact_interval``). Within an epoch the winner is the
lowest (doc_id, idx) — deterministic at any parallelism — and across
epochs the earlier epoch always wins (its sha is in the state), so a
2-epoch run equals the one-shot operator on the concatenated corpus when
epoch order follows doc order (the q172 oracle).

Two distributed phases per epoch, both committed atomically: (1) skinny
paragraph rows shuffle once by sha — per partition, probe state + pick
within-epoch winners, write the state file, RETURN the loser (doc_id,
idx) pairs as the stage's output stream (no driver collect); (2) the
per-doc removal lists join back to the epoch's docs and the shared
vectorized rewrite (stages/paradedup.apply_removals) writes the
rewritten docs, hash-partitioned by doc id.
"""

from __future__ import annotations

import json
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
from e_commerce_batch_etl_pipeline_ray.stages.paradedup import (
    _MAX_IDX,
    apply_removals,
    explode_paragraphs_hex,
)

_PID = "_ppid"


@dataclass
class IncParaDedupConfig:
    state_dir: str
    num_partitions: int = 32
    id_col: str = "doc_id"
    text_col: str = "text"
    sep: str = "\n\n"
    compact_interval: int = 8


class _ParaApply:
    """Per-(sha-)partition worker: classify this epoch's paragraph rows
    against the persistent seen set, write the updated state file plus a
    tiny lineage sidecar, and stream back the LOSER (doc_id, idx) pairs."""

    def __init__(self, state_dir: str, epoch: int,
                 prev_partitions: dict[str, dict], mode: str):
        self.state_dir = state_dir
        self.epoch = epoch
        self.prev = prev_partitions
        self.mode = mode                      # "compact" | "delta"
        self.tmp_dir = lake.epoch_dir(state_dir, epoch, tmp=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        os.makedirs(self.tmp_dir, exist_ok=True)  # task may run off-driver
        pid = group[_PID][0].as_py()
        batch = group.drop_columns([_PID])
        rec = self.prev.get(str(pid))
        files = (([rec["file"]] if rec.get("file") else [])
                 + list(rec.get("deltas", []))) if rec else []
        empty = pa.table({"sha": pa.array([], pa.string())})
        probe = sorted(set(batch["sha"].to_pylist()))
        seen = pa.concat_tables(
            [pq.read_table(f, columns=["sha"],
                           filters=[[("sha", "in", probe)]])
             for f in files]) if files else empty
        seen_mask = pc.is_in(batch["sha"].combine_chunks(),
                             value_set=seen["sha"].combine_chunks())
        fresh = batch.filter(pc.invert(seen_mask))
        # within-epoch winner per never-seen sha: lowest fused (doc, idx)
        win = fresh.group_by(["sha"]).aggregate([("fused", "min")]) \
            .rename_columns(["sha", "win"])
        fresh = fresh.join(win, keys=["sha"], join_type="inner")
        intra_losers = fresh.filter(pc.not_equal(fresh["fused"],
                                                 fresh["win"]))
        losers = pa.concat_tables([
            batch.filter(seen_mask).select(["did", "fused"]),
            intra_losers.select(["did", "fused"]),
        ])
        idx = pc.bit_wise_and(losers["fused"], _MAX_IDX - 1) \
            .cast(pa.int64())
        removed = pa.table({"did": losers["did"], "idx": idx})

        novel_state = win.select(["sha"]).sort_by([("sha", "ascending")])
        if self.mode == "delta":
            state, suffix = novel_state, "delta.parquet"
        else:
            full = pa.concat_tables(
                [pq.read_table(f) for f in files]) if files else empty
            state = pa.concat_tables([full, novel_state]).sort_by(
                [("sha", "ascending")])
            suffix = "parquet"
        sfname = f"part-{pid:05d}.{suffix}"
        tmp_path = os.path.join(self.tmp_dir, sfname)
        wip = f"{tmp_path}.wip.{os.getpid()}"
        pq.write_table(state, wip)
        os.replace(wip, tmp_path)
        final_dir = lake.epoch_dir(self.state_dir, self.epoch)
        side = {
            "partition": int(pid),
            "file": os.path.join(final_dir, sfname),
            "is_delta": self.mode == "delta",
            "rows_total": state.num_rows,
            "novel_paras": novel_state.num_rows,
            "removed_paras": removed.num_rows,
            "bytes_written": os.path.getsize(tmp_path),
        }
        spath = os.path.join(self.tmp_dir, f"lineage-{pid:05d}.json")
        swip = f"{spath}.wip.{os.getpid()}"
        with open(swip, "w") as f:
            json.dump(side, f)
        os.replace(swip, spath)
        return removed


class IncrementalParaDedup:
    """Driver-side orchestrator: epoch loop + two phases + commit."""

    def __init__(self, config: IncParaDedupConfig):
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

        docs = docs.materialize()
        rows_in = docs.count()
        nblocks = max(2, min(cfg.num_partitions, rows_in // 200 or 1))
        if docs.num_blocks() < nblocks:
            docs = docs.repartition(nblocks).materialize()

        def _explode(t: pa.Table) -> pa.Table:
            o = explode_paragraphs_hex(t, cfg.id_col, cfg.text_col, cfg.sep)
            pid = hash_partition_ids(o, ["sha"], cfg.num_partitions)
            return o.append_column(_PID, pa.array(pid, pa.int32()))

        skinny = docs.select_columns([cfg.id_col, cfg.text_col]) \
            .map_batches(_explode, batch_format="pyarrow",
                         zero_copy_batch=True)
        mode = ("compact" if cfg.compact_interval <= 1
                or (epoch + 1) % cfg.compact_interval == 0 else "delta")
        # phase 1: every state partition must run (state carry-forward is
        # by REFERENCE below; only touched partitions rewrite) — no
        # placeholders needed: untouched partitions keep their records
        # callable INSTANCE -> task-based map_groups (no actor-pool
        # startup; the q111 round-5 lesson). Writes are wip+rename
        # atomic and byte-deterministic per partition -> retry-safe.
        _apply_inst = _ParaApply(cfg.state_dir, epoch, prev_parts, mode)

        def _ParaApplyTask(g: pa.Table) -> pa.Table:
            return _apply_inst(g)

        removed = skinny.groupby(_PID).map_groups(
            _ParaApplyTask, batch_format="pyarrow")

        from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
            grouped_collect,
        )
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            detach,
            ensure_schema,
        )
        rem_pairs_schema = pa.schema([("did", pa.int64()),
                                      ("idx", pa.int64())])
        # detach() MATERIALIZES here — the side-effecting phase-1
        # map_groups (_ParaApply: state writes + lineage sidecars) runs
        # exactly once; count() below and the later doc_lineage join read
        # the materialized block refs, never the lineage (pinned by
        # tests/test_inc_paradedup.py::test_phase1_executes_once)
        removed = detach(removed.map_batches(
            ensure_schema(rem_pairs_schema), batch_format="pyarrow"),
            rem_pairs_schema)
        rem_schema = pa.schema([("did", pa.int64()),
                                ("removed_idxs", pa.string())])
        if removed.count():
            rem = grouped_collect(["did"], "idx", "removed_idxs",
                                  num_partitions=cfg.num_partitions) \
                .apply(removed)
            rem = detach(rem.map_batches(ensure_schema(rem_schema),
                                         batch_format="pyarrow"),
                         rem_schema)
            joined = docs.join(rem, join_type="left_outer",
                               on=(cfg.id_col,), right_on=("did",),
                               num_partitions=cfg.num_partitions)
        else:
            joined = docs.map_batches(
                lambda t: t.append_column(
                    "removed_idxs", pa.nulls(t.num_rows, pa.string())),
                batch_format="pyarrow", zero_copy_batch=True)

        tmp_dir = lake.epoch_dir(cfg.state_dir, epoch, tmp=True)
        state_dir, id_col, text_col, sep = (cfg.state_dir, cfg.id_col,
                                            cfg.text_col, cfg.sep)
        nparts = cfg.num_partitions

        def _assign_doc(t: pa.Table) -> pa.Table:
            drop = [c for c in ("did",) if c in t.column_names]
            if drop:
                t = t.drop_columns(drop)
            pid = hash_partition_ids(t, [id_col], nparts)
            return t.append_column(_PID, pa.array(pid, pa.int32()))

        def _write_docs(group: pa.Table) -> pa.Table:
            pid = group[_PID][0].as_py()
            out = apply_removals(group.drop_columns([_PID]),
                                 text_col, sep)
            out = out.sort_by([(id_col, "ascending")])
            fname = f"docs-{pid:05d}.parquet"
            tmp_path = os.path.join(tmp_dir, fname)
            wip = f"{tmp_path}.wip.{os.getpid()}"
            pq.write_table(out, wip)
            os.replace(wip, tmp_path)
            final_dir = lake.epoch_dir(state_dir, epoch)
            return pa.table({
                "partition": pa.array([pid], pa.int32()),
                "docs_file": pa.array([os.path.join(final_dir, fname)],
                                      pa.string()),
                "docs_rows": pa.array([out.num_rows], pa.int64()),
                "removed_paras": pa.array(
                    [int(pc.sum(out["n_removed"]).as_py() or 0)],
                    pa.int64()),
            })

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        doc_lineage = collect_arrow(
            joined.map_batches(_assign_doc, batch_format="pyarrow")
            .groupby(_PID).map_groups(_write_docs, batch_format="pyarrow"))

        # fold phase-1 sidecars (written before promote, read before it)
        sides = {}
        for fn in os.listdir(tmp_dir):
            if fn.startswith("lineage-") and fn.endswith(".json"):
                with open(os.path.join(tmp_dir, fn)) as f:
                    rec = json.load(f)
                sides[rec["partition"]] = rec
                os.remove(os.path.join(tmp_dir, fn))

        lake.promote_epoch_dir(cfg.state_dir, epoch)
        # untouched partitions carry forward by reference inside
        # commit_manifest (their state files AND their older docs
        # novel_file refs stay vacuum-protected)
        partitions = {}
        for pid, rec in sides.items():
            if rec["is_delta"]:
                prev = prev_parts.get(str(pid), {})
                partitions[pid] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])) + [rec["file"]],
                    "lsn_watermark": epoch,
                    "rows_applied": rec["novel_paras"],
                    "rows_total": -1,
                    "bytes_written": rec["bytes_written"],
                }
            else:
                partitions[pid] = {
                    "file": rec["file"], "deltas": [],
                    "lsn_watermark": epoch,
                    "rows_applied": rec["novel_paras"],
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        # rewritten-docs files ride novel_file records (vacuum walks them);
        # doc-hash pid space is disjoint from sha-pid space — records are
        # per-pid bookkeeping only, reads go through the epoch marker. A
        # docs-only record for a pid whose STATE went untouched this epoch
        # must keep the carried state refs (commit_manifest overrides per
        # pid, so clobbering them here would orphan state for vacuum).
        for rec in doc_lineage.to_pylist():
            pid = rec["partition"]
            if pid not in partitions:
                prev = dict(prev_parts.get(str(pid), {}))
                partitions[pid] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])),
                    "lsn_watermark": prev.get("lsn_watermark", epoch),
                    "rows_applied": 0,
                    "rows_total": prev.get("rows_total", -1),
                    "bytes_written": 0,
                }
            partitions[pid]["novel_file"] = rec["docs_file"]
        state_schema = pa.schema([("sha", pa.string())])
        drecs = doc_lineage.to_pylist()
        novel_total = sum(r["novel_paras"] for r in sides.values())
        prev_seen = (prev_manifest["metrics"].get("seen_paras", 0)
                     if prev_manifest else 0)
        metrics = {
            "op": "inc_paradedup", "mode": mode, "rows_in": rows_in,
            "docs_out": int(sum(r["docs_rows"] for r in drecs)),
            "removed_paras": int(sum(r["removed_paras"] for r in drecs)),
            "novel_paras": int(novel_total),
            "seen_paras": int(prev_seen + novel_total),
        }
        lake.commit_manifest(cfg.state_dir, epoch, partitions, state_schema,
                             prev_manifest, metrics=metrics,
                             num_partitions=cfg.num_partitions)
        return metrics

    def docs(self, epoch: int | None = None) -> ray.data.Dataset:
        """The rewritten documents of ``epoch`` (default latest), read via
        the committed manifest."""
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
                        and marker in rec["novel_file"]
                        and os.path.basename(
                            rec["novel_file"]).startswith("docs-")})
        if not files:
            return ray.data.from_items([])
        # explicit columns= kills Ray's hive-partition inference (the
        # epoch=NNNN dirs would surface as a spurious 'epoch' column —
        # the stream_join lesson)
        cols = pq.read_schema(files[0]).names
        return ray.data.read_parquet(files, columns=cols)

    def seen_paras(self) -> int:
        last = self.last_committed_epoch()
        if last is None:
            return 0
        m = lake.read_manifest(self.cfg.state_dir, last)
        return m["metrics"]["seen_paras"]
