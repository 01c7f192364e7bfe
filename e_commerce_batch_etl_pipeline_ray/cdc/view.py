"""Incrementally-maintained materialized JOIN view over two CDC tables.

``JoinView`` keeps ``V = live(A) JOIN live(B) ON (repo, path)`` as a
partitioned parquet table that refreshes INCREMENTALLY: both input lakes
hash-partition on the same key with the same modulus (enforced), so
partition P of A joins ONLY partition P of B — the view is co-partitioned
and the join needs no shuffle, ever. A refresh compares input file lists
per partition against what the last refresh recorded in the view manifest
and recomputes ONLY partitions whose inputs changed; an epoch that touched
3 of 10k partitions re-joins 3. Unchanged partitions carry their view file
forward, exactly like the lake's own manifest carry-forward.

This is classic incremental view maintenance collapsed onto the lake's
physical layout: because states (not deltas) are partition-local and
cheap to re-join, the delta algebra (dA><B + A><dB + dA><dB) reduces to
"re-join the touched partitions" — simpler, no anti-join correction
terms, and the refresh cost is proportional to changed data, which is the
property that matters at 10^10 events.

Commit protocol: view files are written under ``.tmp-epoch=K`` and
promoted + manifested atomically (reusing cdc/lake.py's machinery), so a
crashed refresh leaves the previous view intact and readable; re-running
the refresh is idempotent.

Column collisions: non-key columns keep their name when unique, else get
``_l`` / ``_r`` suffixes (callers can also pre-select with left_cols /
right_cols).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.feed import _load_state, _part_files
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow

KEY = ["repo", "path"]


def _fused(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        t[KEY[0]].combine_chunks(), t[KEY[1]].combine_chunks(), "\x00")


def _live(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t["_deleted"], False))
    return t.drop_columns(["_deleted"])


def _plan_columns(left_schema: pa.Schema, right_schema: pa.Schema,
                  left_cols: list[str] | None,
                  right_cols: list[str] | None) -> tuple[list, list, pa.Schema]:
    """(left (src, out) pairs, right pairs, output schema) with _l/_r
    suffixes only where names collide."""
    lnames = left_cols if left_cols is not None else \
        [n for n in left_schema.names if n not in ("_deleted",)]
    rnames = right_cols if right_cols is not None else \
        [n for n in right_schema.names if n not in ("_deleted", *KEY)]
    lnames = [n for n in lnames if n != "_deleted"]
    rnames = [n for n in rnames if n not in ("_deleted", *KEY)]
    collide = (set(lnames) - set(KEY)) & set(rnames)
    lpairs = [(n, n if n in KEY or n not in collide else f"{n}_l")
              for n in lnames]
    rpairs = [(n, n if n not in collide else f"{n}_r") for n in rnames]
    fields = [pa.field(out, left_schema.field(src).type)
              for src, out in lpairs]
    fields += [pa.field(out, right_schema.field(src).type)
               for src, out in rpairs]
    return lpairs, rpairs, pa.schema(fields)


def _join_partition(left: pa.Table, right: pa.Table, how: str,
                    lpairs: list, rpairs: list,
                    out_schema: pa.Schema) -> pa.Table:
    """Vectorized co-partitioned key join of two live states (one row per
    key each): one index_in + take; a left join exploits Arrow's
    null-index-take for the unmatched side."""
    lv, rv = _live(left), _live(right)
    if lv.num_rows == 0:
        return out_schema.empty_table()
    idx = pc.index_in(_fused(lv), value_set=_fused(rv)) if rv.num_rows \
        else pa.nulls(lv.num_rows, pa.int32())
    if how == "inner":
        mask = pc.is_valid(idx)
        lv = lv.filter(mask)
        idx = idx.filter(mask)
    elif how != "left":
        raise ValueError(f"unsupported join type: {how}")
    rtaken = rv.take(idx) if rv.num_rows else \
        pa.Table.from_arrays(
            [pa.nulls(lv.num_rows, rv.schema.field(src).type)
             for src, _ in rpairs],
            names=[src for src, _ in rpairs])
    cols = [lv[src] for src, _ in lpairs] + [rtaken[src] for src, _ in rpairs]
    return pa.Table.from_arrays(cols, schema=out_schema)


@dataclass
class JoinView:
    view_dir: str
    left_lake: str
    right_lake: str
    how: str = "inner"
    left_cols: list[str] | None = None
    right_cols: list[str] | None = None
    num_partitions: int = field(default=0, init=False)

    def __post_init__(self):
        os.makedirs(self.view_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------

    def last_refresh(self) -> int | None:
        return lake.last_committed_epoch(self.view_dir)

    def _prev_inputs(self) -> dict:
        last = self.last_refresh()
        if last is None:
            return {}
        return lake.read_manifest(self.view_dir, last).get(
            "metrics", {}).get("inputs", {})

    # -- refresh ---------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the view up to BOTH lakes' latest committed epochs,
        recomputing only partitions whose input file lists changed since
        the last refresh. Returns {refresh_epoch, partitions_recomputed,
        partitions_carried}."""
        lman = lake.read_manifest(self.left_lake,
                                  lake.last_committed_epoch(self.left_lake))
        rman = lake.read_manifest(self.right_lake,
                                  lake.last_committed_epoch(self.right_lake))
        ln, rn = lman.get("num_partitions"), rman.get("num_partitions")
        if ln is None or rn is None or ln != rn:
            raise ValueError(
                f"JoinView requires co-partitioned lakes: left "
                f"num_partitions={ln}, right={rn}")
        self.num_partitions = ln
        lschema = lake.schema_from_b64(lman["schema"])
        rschema = lake.schema_from_b64(rman["schema"])
        lpairs, rpairs, out_schema = _plan_columns(
            lschema, rschema, self.left_cols, self.right_cols)

        prev_inputs = self._prev_inputs()
        prev_manifest = (lake.read_manifest(self.view_dir, self.last_refresh())
                         if self.last_refresh() is not None else None)
        refresh_epoch = 0 if self.last_refresh() is None \
            else self.last_refresh() + 1

        pids = sorted({*lman["partitions"], *rman["partitions"]}, key=int)
        items, inputs, carried = [], {}, 0
        for pid in pids:
            lrec = lman["partitions"].get(pid)
            rrec = rman["partitions"].get(pid)
            lfiles, rfiles = _part_files(lrec), _part_files(rrec)
            ldv, rdv = lake.dv_json(lrec), lake.dv_json(rrec)
            # deletion vectors are part of the input identity: a DV commit
            # changes a source partition's state without touching its files
            inputs[pid] = {"left": lfiles, "right": rfiles,
                           "left_dv": ldv, "right_dv": rdv}
            prev = prev_inputs.get(pid)
            if prev and prev["left"] == lfiles and prev["right"] == rfiles \
                    and prev.get("left_dv", "[]") == ldv \
                    and prev.get("right_dv", "[]") == rdv:
                carried += 1
                continue                     # inputs unchanged: carry forward
            items.append({"partition": int(pid),
                          "left_files": json.dumps(lfiles),
                          "right_files": json.dumps(rfiles),
                          "left_dv": ldv, "right_dv": rdv})

        tmp_dir = lake.epoch_dir(self.view_dir, refresh_epoch, tmp=True)
        os.makedirs(tmp_dir, exist_ok=True)
        view_dir, how = self.view_dir, self.how
        ls_b64, rs_b64 = lman["schema"], rman["schema"]
        out_b64 = lake.schema_to_b64(out_schema)

        def _recompute(batch: pa.Table) -> pa.Table:
            ls = lake.schema_from_b64(ls_b64)
            rs = lake.schema_from_b64(rs_b64)
            os_ = lake.schema_from_b64(out_b64)
            recs = []
            for row in batch.to_pylist():
                pid = row["partition"]
                left = _load_state(json.loads(row["left_files"]), ls,
                                   lake.rec_from_dv_json(row["left_dv"]))
                right = _load_state(json.loads(row["right_files"]), rs,
                                    lake.rec_from_dv_json(row["right_dv"]))
                joined = _join_partition(left, right, how, lpairs, rpairs, os_)
                fname = f"part-{pid:05d}.parquet"
                tmp_path = os.path.join(tmp_dir, fname)
                wip = f"{tmp_path}.wip.{os.getpid()}"
                pq.write_table(joined, wip)
                os.replace(wip, tmp_path)
                recs.append({
                    "partition": pid,
                    "file": os.path.join(
                        lake.epoch_dir(view_dir, refresh_epoch), fname),
                    "rows_total": joined.num_rows,
                    "bytes_written": os.path.getsize(tmp_path),
                })
            return pa.Table.from_pylist(recs)

        partitions: dict[int, dict] = {}
        if items:
            lineage = collect_arrow(
                ray.data.from_items(items).map_batches(
                    _recompute, batch_format="pyarrow", batch_size=1))
            for rec in lineage.to_pylist():
                partitions[rec["partition"]] = {
                    "file": rec["file"], "deltas": [],
                    "lsn_watermark": -1,
                    "rows_applied": rec["rows_total"],
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        lake.promote_epoch_dir(self.view_dir, refresh_epoch)
        # metrics carries the exact inputs each partition was computed from
        # — the NEXT refresh prunes against them; file reclamation is
        # vacuum's job (time travel over refreshes stays possible until then)
        metrics = {"partitions_recomputed": len(items),
                   "partitions_carried": carried,
                   "left_epoch": lman["epoch"],
                   "right_epoch": rman["epoch"],
                   "inputs": inputs}
        lake.commit_manifest(
            self.view_dir, refresh_epoch, partitions, out_schema,
            prev_manifest, metrics=metrics,
            num_partitions=self.num_partitions)
        return {"refresh_epoch": refresh_epoch,
                "partitions_recomputed": len(items),
                "partitions_carried": carried,
                "left_epoch": lman["epoch"], "right_epoch": rman["epoch"]}

    # -- read ------------------------------------------------------------------

    def read(self, refresh_epoch: int | None = None) -> ray.data.Dataset:
        if refresh_epoch is None:
            refresh_epoch = self.last_refresh()
        if refresh_epoch is None:
            raise FileNotFoundError(f"view never refreshed: {self.view_dir}")
        manifest = lake.read_manifest(self.view_dir, refresh_epoch)
        schema_b64 = manifest["schema"]
        files = lake.manifest_files(manifest)
        if not files:
            return ray.data.from_arrow(
                lake.schema_from_b64(schema_b64).empty_table())
        ds = ray.data.read_parquet(files)

        def _unify(t: pa.Table) -> pa.Table:
            return lake._unify_to(t, lake.schema_from_b64(schema_b64))
        return ds.map_batches(_unify, batch_format="pyarrow",
                              zero_copy_batch=True)
