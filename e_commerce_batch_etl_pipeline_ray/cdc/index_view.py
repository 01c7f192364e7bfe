"""INCREMENTALLY-MAINTAINED INVERTED INDEX over a CDC lake's live table,
refreshed from the CHANGE FEED — the retrieval counterpart of
cdc/aggview.py: per refresh, only CHANGED documents are tokenized and
only their term partitions rewritten; the index never rescans the corpus.

Maintenance algebra per refresh window (feed epochs (offset, latest]):
  * resolve each changed key to its FINAL non-preimage change (the
    sync_feed_to_db rule — delete@e then reinsert@e+1 nets to the insert);
  * REMOVE all postings of every changed key (the removed-key set is
    window-bounded; it broadcasts to the partition rewrite tasks);
  * ADD postings tokenized from the final upsert contents only;
  * corpus stats (n_docs, total token count) maintained by +/- deltas
    from the first preimage (state before the window) and final image.

State reuses the lake epoch/manifest protocol in ``view_dir`` (atomic
commits, crash debris cleaned on the next refresh via clean_uncommitted):

    view_dir/epoch=000N/part-PPPPP.parquet   (term, key, tf, dl) sorted
    view_dir/manifests/epoch-000N.json       metrics: lake_epoch, n_docs,
                                             total_len

``search`` answers BM25 top-k reading only the query terms' partitions —
the persisted-index query path (stages/retrieval.bm25_topk_indexed) over
a continuously-ingesting table.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.feed import (
    CHANGE_COL,
    EPOCH_COL,
    change_feed,
)
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    hash_partition_ids,
)
from e_commerce_batch_etl_pipeline_ray.stages.retrieval import _tokens_of

_PID = "_ipid"
KEY = ["repo", "path"]


def _fused(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        pc.cast(t[KEY[0]].combine_chunks(), pa.string()),
        pc.cast(t[KEY[1]].combine_chunks(), pa.string()), "\x00")


class IndexView:
    def __init__(self, lake_dir: str, view_dir: str,
                 num_partitions: int = 16, text_col: str = "content",
                 compact_interval: int = 8):
        self.lake_dir = lake_dir
        self.view_dir = view_dir
        self.num_partitions = num_partitions
        self.text_col = text_col
        # LSM refresh: K-1 of every K view epochs append only the changed
        # docs' postings as generation-tagged DELTAS plus a tiny removal
        # log (key, gen); every K-th epoch compacts — physically dropping
        # removed generations and clearing the log. Refresh I/O therefore
        # tracks the CHANGES, never the index size.
        self.compact_interval = compact_interval
        os.makedirs(view_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------

    def _last(self) -> int | None:
        return lake.last_committed_epoch(self.view_dir)

    def _meta(self) -> dict:
        last = self._last()
        if last is None:
            return {"lake_epoch": -1, "n_docs": 0, "total_len": 0}
        return lake.read_manifest(self.view_dir, last)["metrics"]

    # -- maintenance ---------------------------------------------------------

    def refresh(self) -> dict:
        lake.clean_uncommitted(self.view_dir)
        last_lake = lake.last_committed_epoch(self.lake_dir)
        meta = self._meta()
        off = meta["lake_epoch"]
        if last_lake is None or off >= last_lake:
            return {"refreshed": False, **meta}
        fd = change_feed(self.lake_dir, off + 1, last_lake).materialize()

        text_col = self.text_col

        # skinny per-change rows to the driver: (key, change, epoch, dl)
        def _skinny(t: pa.Table) -> pa.Table:
            _, _, lens = _tokens_of(t, text_col)
            return pa.table({
                "key": _fused(t),
                "change": t[CHANGE_COL],
                "epoch": t[EPOCH_COL],
                "dl": pa.array(lens, pa.int64()),
            })

        sk = pa.Table.from_pylist([r for b in fd.map_batches(
            _skinny, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()])

        # per-key window resolution (driver; window-bounded)
        first_pre: dict[str, int] = {}      # key -> dl before the window
        final: dict[str, tuple[int, str, int]] = {}  # key -> (epoch, kind, dl)
        by_key: dict[str, list] = {}
        for r in sk.to_pylist():
            by_key.setdefault(r["key"], []).append(r)
        removed = set(by_key)
        n_docs, total_len = meta["n_docs"], meta["total_len"]
        for key, rows in by_key.items():
            rows.sort(key=lambda r: (r["epoch"],
                                     r["change"] == "update_postimage"))
            existed_before = rows[0]["change"] in ("update_preimage",
                                                   "delete")
            if existed_before:
                first_pre[key] = rows[0]["dl"]
            fin = [r for r in rows if r["change"] != "update_preimage"][-1]
            final[key] = (fin["epoch"], fin["change"], fin["dl"])
            if fin["change"] == "delete":
                if existed_before:
                    n_docs -= 1
                    total_len -= first_pre[key]
            else:
                n_docs += 0 if existed_before else 1
                total_len += fin["dl"] - (first_pre.get(key, 0))

        # distributed: postings for the FINAL upsert contents only
        upsert_epoch = {k: v[0] for k, v in final.items()
                        if v[1] != "delete"}

        def _postings(t: pa.Table) -> pa.Table:
            keys = _fused(t)
            want_ep = pa.array(
                [upsert_epoch.get(k, -1) for k in keys.to_pylist()],
                pa.int64())
            mask = pc.and_(
                pc.not_equal(t[CHANGE_COL], "update_preimage"),
                pc.equal(t[EPOCH_COL], want_ep))
            t2 = t.filter(mask)
            if t2.num_rows == 0:
                out = pa.table({"term": pa.array([], pa.string()),
                                "key": pa.array([], pa.string()),
                                "tf": pa.array([], pa.int64()),
                                "dl": pa.array([], pa.int64())})
            else:
                flat, roff, lens = _tokens_of(t2, text_col)
                doc_of = np.repeat(np.arange(t2.num_rows, dtype=np.int64),
                                   (roff[1:] - roff[:-1]))
                pairs = pa.table({"term": flat,
                                  "_docidx": pa.array(doc_of, pa.int64())})
                agg = pairs.group_by(["term", "_docidx"]).aggregate(
                    [([], "count_all")])
                idxs = agg["_docidx"].combine_chunks()
                out = pa.table({
                    "term": agg["term"],
                    "key": _fused(t2).take(idxs),
                    "tf": pc.cast(agg["count_all"], pa.int64()),
                    "dl": pa.array(lens, pa.int64()).take(idxs),
                })
            pid = hash_partition_ids(out, ["term"], self.num_partitions)
            return out.append_column(_PID, pa.array(pid, pa.int32()))

        new_posts = fd.map_batches(_postings, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

        # commit: delta epochs append generation-tagged postings for the
        # TOUCHED term partitions only plus a (key, gen) removal-log file;
        # compaction epochs fold base+deltas, physically apply the log,
        # and clear it. Refresh I/O = O(changed docs) on delta epochs.
        view_epoch = (self._last() + 1) if self._last() is not None else 0
        mode = ("compact" if self.compact_interval <= 1
                or (view_epoch + 1) % self.compact_interval == 0
                else "delta")
        prev_manifest = (lake.read_manifest(self.view_dir, view_epoch - 1)
                         if view_epoch > 0 else None)
        if prev_manifest and prev_manifest.get("num_partitions") not in (
                None, self.num_partitions):
            raise ValueError(
                f"index was built with num_partitions="
                f"{prev_manifest['num_partitions']}; this view says "
                f"{self.num_partitions} — term->partition routing "
                "requires a constant modulus")
        prev_parts = prev_manifest["partitions"] if prev_manifest else {}
        prev_log = list(prev_manifest.get("removal_log", [])) \
            if prev_manifest else []
        tmp_dir = lake.epoch_dir(self.view_dir, view_epoch, tmp=True)
        os.makedirs(tmp_dir, exist_ok=True)
        view_dir = self.view_dir
        final_dir = lake.epoch_dir(view_dir, view_epoch)

        # generation tag on every new posting row
        def _tag_gen(t: pa.Table) -> pa.Table:
            return t.append_column("_gen", pa.array(
                [view_epoch] * t.num_rows, pa.int64()))
        new_posts = new_posts.map_batches(_tag_gen, batch_format="pyarrow",
                                          zero_copy_batch=True).materialize()

        posts_by_pid: dict[int, list[pa.Table]] = {}
        for bt in new_posts.iter_batches(batch_format="pyarrow"):
            for p in pc.unique(bt[_PID].combine_chunks()).to_pylist():
                posts_by_pid.setdefault(int(p), []).append(
                    bt.filter(pc.equal(bt[_PID], p)).drop_columns([_PID]))
        posts_refs = {pid: pa.concat_tables(tabs)
                      for pid, tabs in posts_by_pid.items()}
        posts_put = ray.put(posts_refs)

        # removal map folded from the uncompacted log + this refresh
        def _removal_map(files: list[str], this_removed, this_gen) -> dict:
            rem: dict[str, int] = {}
            for f in files:
                rt = pq.read_table(f)
                for kk, g in zip(rt["key"].to_pylist(),
                                 rt["gen"].to_pylist()):
                    rem[kk] = max(rem.get(kk, -1), g)
            for kk in this_removed:
                rem[kk] = max(rem.get(kk, -1), this_gen)
            return rem

        _empty = pa.table({"term": pa.array([], pa.string()),
                           "key": pa.array([], pa.string()),
                           "tf": pa.array([], pa.int64()),
                           "dl": pa.array([], pa.int64()),
                           "_gen": pa.array([], pa.int64())})

        if mode == "delta":
            items = [{"partition": pid} for pid in sorted(posts_refs)]

            def _write_delta(batch: pa.Table) -> pa.Table:
                posts_map = ray.get(posts_put)
                recs = []
                for row in batch.to_pylist():
                    pid = row["partition"]
                    t = posts_map[pid].sort_by(
                        [("term", "ascending"), ("key", "ascending")])
                    fname = f"part-{pid:05d}.delta.parquet"
                    tmp_path = os.path.join(tmp_dir, fname)
                    wip = f"{tmp_path}.wip.{os.getpid()}"
                    pq.write_table(t, wip, row_group_size=4096)
                    os.replace(wip, tmp_path)
                    recs.append({"partition": pid,
                                 "file": os.path.join(final_dir, fname),
                                 "rows_total": t.num_rows,
                                 "bytes_written":
                                     os.path.getsize(tmp_path)})
                return pa.Table.from_pylist(recs)

            writer, is_delta = _write_delta, True
        else:
            rem_map = _removal_map(prev_log, removed, view_epoch)
            rem_put = ray.put(rem_map)
            touched = set(posts_refs)
            all_pids = sorted(touched | {int(p) for p in prev_parts
                                         if prev_parts[p].get("file")
                                         or prev_parts[p].get("deltas")})
            items = []
            for pid in all_pids:
                rec = prev_parts.get(str(pid))
                files = (([rec["file"]] if rec and rec.get("file") else [])
                         + (list(rec.get("deltas", [])) if rec else []))
                items.append({"partition": pid,
                              "files": json.dumps(files)})

            def _write_compact(batch: pa.Table) -> pa.Table:
                posts_map = ray.get(posts_put)
                rem = ray.get(rem_put)
                recs = []
                for row in batch.to_pylist():
                    pid = row["partition"]
                    parts = [pq.read_table(f)
                             for f in json.loads(row["files"])]
                    if pid in posts_map:
                        parts.append(posts_map[pid])
                    t = pa.concat_tables(parts) if parts else _empty
                    if rem and t.num_rows:
                        keys = t["key"].to_pylist()
                        gens = t["_gen"].to_numpy(zero_copy_only=False)
                        keep = np.array(
                            [g >= rem.get(kk, -1)
                             for kk, g in zip(keys, gens)], dtype=bool)
                        t = t.filter(pa.array(keep))
                    t = t.sort_by([("term", "ascending"),
                                   ("key", "ascending")])
                    fname = f"part-{pid:05d}.parquet"
                    tmp_path = os.path.join(tmp_dir, fname)
                    wip = f"{tmp_path}.wip.{os.getpid()}"
                    pq.write_table(t, wip, row_group_size=4096)
                    os.replace(wip, tmp_path)
                    recs.append({"partition": pid,
                                 "file": os.path.join(final_dir, fname),
                                 "rows_total": t.num_rows,
                                 "bytes_written":
                                     os.path.getsize(tmp_path)})
                return pa.Table.from_pylist(recs)

            writer, is_delta = _write_compact, False

        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            collect_arrow,
        )
        lineage = collect_arrow(
            ray.data.from_items(items).map_batches(
                writer, batch_format="pyarrow", batch_size=1)) \
            if items else pa.table({"partition": pa.array([], pa.int32()),
                                    "file": pa.array([], pa.string()),
                                    "rows_total": pa.array([], pa.int64()),
                                    "bytes_written": pa.array([],
                                                              pa.int64())})
        # removal log for delta epochs (written BEFORE the dir promote so
        # it rides the same atomic commit)
        removal_log = []
        if is_delta:
            if removed:
                rl = pa.table({"key": pa.array(sorted(removed), pa.string()),
                               "gen": pa.array([view_epoch] * len(removed),
                                               pa.int64())})
                rl_name = "removals.parquet"
                rl_tmp = os.path.join(tmp_dir, rl_name)
                pq.write_table(rl, rl_tmp + ".wip")
                os.replace(rl_tmp + ".wip", rl_tmp)
                removal_log = prev_log + [os.path.join(final_dir, rl_name)]
            else:
                removal_log = prev_log

        lake.promote_epoch_dir(self.view_dir, view_epoch)
        partitions = {}
        for rec in lineage.to_pylist():
            if is_delta:
                prev = prev_parts.get(str(rec["partition"]), {})
                partitions[rec["partition"]] = {
                    "file": prev.get("file"),
                    "deltas": list(prev.get("deltas", [])) + [rec["file"]],
                    "lsn_watermark": last_lake,
                    "rows_applied": rec["rows_total"],
                    "rows_total": -1,
                    "bytes_written": rec["bytes_written"],
                }
            else:
                partitions[rec["partition"]] = {
                    "file": rec["file"], "deltas": [],
                    "lsn_watermark": last_lake,
                    "rows_applied": 0,
                    "rows_total": rec["rows_total"],
                    "bytes_written": rec["bytes_written"],
                }
        schema = pa.schema([("term", pa.string()), ("key", pa.string()),
                            ("tf", pa.int64()), ("dl", pa.int64()),
                            ("_gen", pa.int64())])
        metrics = {"op": "index_view", "mode": mode,
                   "lake_epoch": last_lake,
                   "n_docs": n_docs, "total_len": total_len,
                   "changed_keys": len(removed)}
        # removal_log is a top-level manifest key (vacuum tracks it);
        # it MUST land in the same atomic manifest write — a second
        # rewrite would leave a committed epoch with the log missing on
        # crash, silently resurrecting removed postings
        lake.commit_manifest(
            self.view_dir, view_epoch, partitions, schema,
            prev_manifest, metrics=metrics,
            num_partitions=self.num_partitions,
            extra={"removal_log": removal_log})
        return {"refreshed": True, "view_epoch": view_epoch, **metrics}

    # -- query ---------------------------------------------------------------

    def search(self, terms: list[str], k: int = 10, k1: float = 1.2,
               b: float = 0.75, round_to: int | None = None,
               epoch: int | None = None) -> pa.Table:
        """BM25 top-k over the live table, reading ONLY the query terms'
        partitions of the chosen view epoch (default latest — pass
        ``epoch`` for a time-travel search against a historical index
        state). Returns (repo, path, score) sorted score desc, key asc."""
        last = self._last() if epoch is None else epoch
        if last is None:
            raise FileNotFoundError(f"index view {self.view_dir} is empty")
        manifest = lake.read_manifest(self.view_dir, last)
        if manifest.get("num_partitions") not in (None,
                                                  self.num_partitions):
            raise ValueError(
                f"index was built with num_partitions="
                f"{manifest['num_partitions']}; this view says "
                f"{self.num_partitions}")
        meta = manifest["metrics"]
        n_docs, total_len = meta["n_docs"], meta["total_len"]
        if n_docs == 0:
            return pa.table({"repo": pa.array([], pa.string()),
                             "path": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        avglen = total_len / n_docs
        term_t = pa.table({"term": pa.array(list(terms), pa.string())})
        pids = sorted({int(p) for p in hash_partition_ids(
            term_t, ["term"], self.num_partitions)})
        tabs = []
        for pid in pids:
            rec = manifest["partitions"].get(str(pid))
            files = (([rec["file"]] if rec and rec.get("file") else [])
                     + (list(rec.get("deltas", [])) if rec else []))
            for f in files:
                tabs.append(pq.read_table(
                    f, filters=[[("term", "in", list(terms))]]))
        if not tabs:
            return pa.table({"repo": pa.array([], pa.string()),
                             "path": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        post = pa.concat_tables(tabs, promote_options="permissive")
        # apply the uncompacted removal log: a posting survives iff its
        # generation is >= the key's latest removal generation
        rem: dict[str, int] = {}
        for f in manifest.get("removal_log", []):
            rt = pq.read_table(f)
            for kk, g in zip(rt["key"].to_pylist(), rt["gen"].to_pylist()):
                rem[kk] = max(rem.get(kk, -1), g)
        if rem and post.num_rows:
            gens = post["_gen"].to_numpy(zero_copy_only=False) \
                if "_gen" in post.column_names else \
                np.full(post.num_rows, 1 << 60)
            keep = np.array([g >= rem.get(kk, -1) for kk, g in
                             zip(post["key"].to_pylist(), gens)], dtype=bool)
            post = post.filter(pa.array(keep))
        df: dict[str, int] = {}
        for trm in post["term"].to_pylist():
            df[trm] = df.get(trm, 0) + 1
        idf = {trm: math.log((n_docs - df.get(trm, 0) + 0.5)
                             / (df.get(trm, 0) + 0.5) + 1.0)
               for trm in terms}
        tf = post["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = post["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idf[x] for x in post["term"].to_pylist()])
        contrib = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avglen))
        scored = pa.table({"key": post["key"],
                           "contrib": pa.array(contrib, pa.float64())})
        agg = scored.group_by("key").aggregate([("contrib", "sum")])
        score = agg["contrib_sum"]
        if round_to is not None:
            from e_commerce_batch_etl_pipeline_ray.functions.scalar import (
                round2,
            )
            score = round2(score.combine_chunks(), round_to)
        out = pa.table({"key": agg["key"], "score": score})
        idx = pc.sort_indices(out, sort_keys=[("score", "descending"),
                                              ("key", "ascending")])
        out = out.take(idx.slice(0, k))
        split = pc.split_pattern(out["key"].combine_chunks(), "\x00")
        return pa.table({
            "repo": pc.list_element(split, 0),
            "path": pc.list_element(split, 1),
            "score": out["score"],
        })
