"""Duplicated-substring detection — the exact-substring layer of training
-data dedup (Lee et al., "Deduplicating Training Data Makes Language
Models Better": repeated n-grams across a corpus mark boilerplate /
near-copies that document-level dedup misses).

For every document: how many of its byte n-grams occur MORE THAN ONCE in
the whole corpus, and what fraction of the doc that is.

Scale shape (exact, no sketches):
  1. gram extraction is ONE strided view over the batch's Arrow buffer
     (``sliding_window_view``) + a cross-doc validity mask — the only copy
     is the surviving gram bytes, materialized as a FixedSizeBinary array
     straight from the numpy buffer (no per-row Python);
  2. grams hash-partition by content, so each partition holds every
     occurrence of its grams: corpus-global counts are a partition-local
     group_by (first shuffle, the unavoidable one — same traffic class as
     the minhash bucket shuffle);
  3. per-(partition, doc) partial tallies (grams seen, grams duplicated)
     are the ONLY thing leaving that shuffle — bytes shrink from
     O(corpus bytes) to O(docs x partitions touched);
  4. a tiny doc_id groupby merges partials (second shuffle, partial-sized).

ASCII corpora: byte n-gram == char n-gram, so the result is SQL-mirrorable
(oracle q96). Non-ASCII is well-defined on UTF-8 bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.dedup import hash_partition_ids
from e_commerce_batch_etl_pipeline_ray.stages.lm import _buffer_view

_PID = "_pid"


def _extract_grams(t: pa.Table, id_col: str, text_col: str,
                   n: int) -> pa.Table:
    """(gram, doc_id) pairs for every within-doc byte n-gram — strided
    view + mask, one copy of surviving gram bytes."""
    seg, roff = _buffer_view(t[text_col])
    ids = t[id_col].combine_chunks()
    if len(seg) < n:
        return pa.table({"gram": pa.array([], pa.binary(n)),
                         "doc_id": pa.array([], ids.type)})
    windows = np.lib.stride_tricks.sliding_window_view(seg, n)
    starts = np.arange(len(windows), dtype=np.int64)
    # doc of each start position; valid when the gram ends inside that doc
    doc = np.searchsorted(roff, starts, side="right") - 1
    valid = starts + n <= roff[doc + 1]
    grams = np.ascontiguousarray(windows[valid])
    doc_idx = doc[valid]
    gram_arr = pa.Array.from_buffers(
        pa.binary(n), len(grams), [None, pa.py_buffer(grams.tobytes())])
    return pa.table({"gram": gram_arr,
                     "doc_id": ids.take(pa.array(doc_idx))})


def duplicated_ngrams(ds: ray.data.Dataset, *, n: int = 20,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_partitions: int = 64) -> ray.data.Dataset:
    """Per-document duplicated-n-gram stats: ``(id_col, n_grams, n_dup,
    dup_frac)``. Docs shorter than ``n`` bytes emit nothing. Exact — a
    gram counts as duplicated iff its CORPUS occurrence count > 1
    (including >1 occurrence inside one doc)."""

    def _pairs(t: pa.Table) -> pa.Table:
        pairs = _extract_grams(t, id_col, text_col, n)
        if pairs.num_rows == 0:
            return pairs.append_column(_PID, pa.array([], pa.int32()))
        # hash the gram BYTES for partitioning (cast to string only for
        # the pandas hasher); grouping inside the partition stays binary
        key = pairs.set_column(0, "gram", pc.cast(pairs["gram"], pa.binary()))
        pid = hash_partition_ids(key, ["gram"], num_partitions)
        return pairs.append_column(_PID, pa.array(pid, pa.int32()))

    def _tally(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_PID])
        counts = g.group_by(["gram"]).aggregate([("gram", "count")])
        per_gram = pc.index_in(g["gram"].combine_chunks(),
                               value_set=counts["gram"].combine_chunks())
        occ = counts["gram_count"].take(per_gram)
        dup = pc.greater(occ, 1)
        tall = pa.table({
            "doc_id": g["doc_id"],
            "one": pa.array(np.ones(g.num_rows, np.int64)),
            "dup": pc.cast(dup, pa.int64()),
        })
        out = tall.group_by(["doc_id"]).aggregate(
            [("one", "sum"), ("dup", "sum")])
        return out.rename_columns(["doc_id", "n_grams_p", "n_dup_p"])

    pairs = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = pairs.groupby(_PID).map_groups(_tally, batch_format="pyarrow")

    def _assign_doc_pid(t: pa.Table) -> pa.Table:
        # pre-merge within the block first: shuffle carries one row per
        # (doc, block) at most
        t = t.group_by(["doc_id"]).aggregate(
            [("n_grams_p", "sum"), ("n_dup_p", "sum")]).rename_columns(
            ["doc_id", "n_grams_p", "n_dup_p"])
        pid = hash_partition_ids(t, ["doc_id"], num_partitions)
        return t.append_column(_PID, pa.array(pid, pa.int32()))

    def _merge_doc(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_PID])
        return g.group_by(["doc_id"]).aggregate(
            [("n_grams_p", "sum"), ("n_dup_p", "sum")]).rename_columns(
            ["doc_id", "n_grams", "n_dup"])

    # doc-keyed merge via the repo's standard hash-partition + map_groups
    # shape (scale-correct: state never leaves the cluster; measured ~4x
    # faster than Ray's Aggregate operator on partial-sized inputs)
    merged = partials.map_batches(_assign_doc_pid, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby(_PID).map_groups(_merge_doc, batch_format="pyarrow")

    def _frac(t: pa.Table) -> pa.Table:
        from e_commerce_batch_etl_pipeline_ray.functions.scalar import round2
        # HALF_UP rounding: exact int ratios land on .xxxx5 (e.g. 1/32),
        # where Arrow's default half_to_even diverges from SQL ROUND
        frac = round2(pc.divide(pc.cast(t["n_dup"], pa.float64()),
                                pc.cast(t["n_grams"], pa.float64())), 4)
        return t.append_column("dup_frac", frac)

    return merged.map_batches(_frac, batch_format="pyarrow",
                              zero_copy_batch=True)


def exact_substring_removal(ds: ray.data.Dataset, *, n: int = 50,
                            id_col: str = "doc_id", text_col: str = "text",
                            num_partitions: int = 64) -> ray.data.Dataset:
    """EXACT-SUBSTRING DEDUP WITH REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr dedup that actually EXCISES the duplicated spans; q96
    only scores them). Returns ``(id_col, text_col, n_removed)`` where
    the text has every duplicated span cut out and ``n_removed`` counts
    the excised bytes.

    Rule (mirrored verbatim by the q173 SQL oracle): 0-based byte ``p``
    of doc ``d`` is removed iff some gram start ``i`` with
    ``i <= p < i + n`` has corpus-wide
    ``count(substr(d, i, n)) >= 2`` — ALL occurrences of a duplicated
    gram are removed, the behavior of the paper's released
    deduplicate-text-datasets code. Overlapping spans merge via a
    delta-array cumsum. Byte-grain: exact on ASCII corpora; a UTF-8
    multibyte char straddling a span edge can split (the reference
    implementation shares this caveat). Docs shorter than ``n`` bytes
    are never touched; null text passes through null.

    Scale shape: gram extraction is q96's strided view (one copy of the
    surviving gram bytes, no per-row Python); grams shuffle ONCE by
    content hash so the corpus-global count>1 test is a partition-local
    group_by; only the duplicated-occurrence ``(doc, pos)`` marks leave
    that shuffle — O(duplicated occurrences), not O(corpus grams); the
    marks reduce to one sorted position list per touched doc (second,
    mark-sized shuffle via grouped_collect), left-join back to the docs
    (untouched docs ride through with a null list), and ONE vectorized
    pass per batch rewrites: a flattened delta/cumsum cover mask over
    the batch's contiguous Arrow string buffer, surviving bytes
    re-sliced by kept-count prefix sums."""
    from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
        grouped_collect,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        detach,
        ensure_schema,
    )

    def _gram_pos(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        empty = pa.table({
            "gram": pa.array([], pa.binary(n)),
            id_col: pa.array([], ids.type if len(ids) else pa.int64()),
            "pos": pa.array([], pa.int64()),
            _PID: pa.array([], pa.int32())})
        seg, roff = _buffer_view(t[text_col])
        if len(seg) < n or t.num_rows == 0:
            return empty
        windows = np.lib.stride_tricks.sliding_window_view(seg, n)
        starts = np.arange(len(windows), dtype=np.int64)
        doc = np.searchsorted(roff, starts, side="right") - 1
        valid = starts + n <= roff[doc + 1]
        if not valid.any():
            return empty
        grams = np.ascontiguousarray(windows[valid])
        doc_idx = doc[valid]
        pos = starts[valid] - roff[doc_idx]
        gram_arr = pa.Array.from_buffers(
            pa.binary(n), len(grams), [None, pa.py_buffer(grams.tobytes())])
        key = pa.table({"gram": pc.cast(gram_arr, pa.binary())})
        pid = hash_partition_ids(key, ["gram"], num_partitions)
        return pa.table({
            "gram": gram_arr,
            id_col: ids.take(pa.array(doc_idx)),
            "pos": pa.array(pos, pa.int64()),
            _PID: pa.array(pid, pa.int32())})

    def _marks(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_PID])
        counts = g.group_by(["gram"]).aggregate([("gram", "count")])
        per_gram = pc.index_in(g["gram"].combine_chunks(),
                               value_set=counts["gram"].combine_chunks())
        occ = counts["gram_count"].take(per_gram)
        dup = pc.greater(occ, 1)
        return pa.table({"_rid": g[id_col], "pos": g["pos"]}).filter(dup)

    base = ds.schema().base_schema
    pairs = ds.map_batches(_gram_pos, batch_format="pyarrow",
                           zero_copy_batch=True)
    marks = pairs.groupby(_PID).map_groups(_marks, batch_format="pyarrow")
    # pin + materialize: a mark-free corpus leaves only zero-column empty
    # blocks whose dataset schema is None (hypothesis-found edge) —
    # grouped_collect needs a real schema, and the count() gate below
    # must not re-execute the shuffle
    marks_schema = pa.schema([("_rid", base.field(id_col).type),
                              ("pos", pa.int64())])
    marks = detach(marks.map_batches(ensure_schema(marks_schema),
                                     batch_format="pyarrow"), marks_schema)
    rem_schema = pa.schema([("_rid", base.field(id_col).type),
                            ("rem_pos", pa.string())])
    if marks.count():
        rem = grouped_collect(["_rid"], "pos", "rem_pos",
                              num_partitions=num_partitions).apply(marks)
        rem = detach(rem.map_batches(ensure_schema(rem_schema),
                                     batch_format="pyarrow"), rem_schema)
        joined = ds.join(rem, join_type="left_outer", on=(id_col,),
                         right_on=("_rid",),
                         num_partitions=max(2, num_partitions // 4))
    else:
        joined = ds.map_batches(
            lambda t: t.append_column(
                "rem_pos", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow", zero_copy_batch=True)

    def _rewrite(t: pa.Table) -> pa.Table:
        drop = [c for c in ("_rid",) if c in t.column_names]
        if drop:
            t = t.drop_columns(drop)
        col = t[text_col].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
        seg, roff = _buffer_view(t[text_col])
        delta = np.zeros(len(seg) + 1, np.int64)
        for i, s in enumerate(t["rem_pos"].to_pylist()):
            if s is None:
                continue
            p = np.array(s.split(","), dtype=np.int64) + roff[i]
            np.add.at(delta, p, 1)
            np.add.at(delta, p + n, -1)
        keep = np.cumsum(delta[:len(seg)]) <= 0
        kept = np.ascontiguousarray(seg[keep])
        kcum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        big = pa.types.is_large_string(col.type)
        off_dtype = np.int64 if big else np.int32
        new_off = kcum[roff].astype(off_dtype)
        new_text = pa.Array.from_buffers(
            col.type, t.num_rows,
            [None, pa.py_buffer(new_off.tobytes()),
             pa.py_buffer(kept.tobytes())])
        valid = pc.is_valid(col)
        new_text = pc.if_else(valid, new_text, pa.scalar(None, col.type))
        removed = (roff[1:] - roff[:-1]) - (new_off[1:].astype(np.int64)
                                            - new_off[:-1])
        vmask = valid.to_numpy(zero_copy_only=False)
        n_removed = pa.array(removed, pa.int64(), mask=~vmask)
        out = pa.table({id_col: t[id_col], text_col: new_text,
                        "n_removed": n_removed})
        return out

    return joined.map_batches(_rewrite, batch_format="pyarrow")


def top_ngrams(ds: ray.data.Dataset, *, n: int = 8, k: int = 20,
               id_col: str = "doc_id", text_col: str = "text",
               num_partitions: int = 64) -> ray.data.Dataset:
    """Corpus-wide TOP-K most frequent byte n-grams — the boilerplate /
    template-mining probe (which exact snippets dominate the corpus):
    ``(gram, cnt)`` ranked by (count DESC, gram ASC), counts include
    overlapping occurrences within a document. ASCII corpora: byte order
    == lexicographic string order, so the q177 SQL mirror ranks
    identically.

    Scale shape: q96's strided-view gram extraction, ONE content-hash
    shuffle co-locates every occurrence of a gram, per-partition
    group_by counts + a LOCAL top-k (safe — a gram's corpus-global
    count lives entirely in its one partition), and the k*P survivors
    merge on the driver (metadata grain)."""

    def _pairs(t: pa.Table) -> pa.Table:
        pairs = _extract_grams(t, id_col, text_col, n)
        if pairs.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.binary(n)),
                             _PID: pa.array([], pa.int32())})
        key = pa.table({"gram": pc.cast(pairs["gram"], pa.binary())})
        pid = hash_partition_ids(key, ["gram"], num_partitions)
        return pa.table({"gram": pairs["gram"],
                         _PID: pa.array(pid, pa.int32())})

    def _local_topk(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_PID])
        counts = g.group_by(["gram"]).aggregate([("gram", "count")])
        out = pa.table({
            "gram": pc.cast(counts["gram"], pa.string()),
            "cnt": pc.cast(counts["gram_count"], pa.int64())})
        idx = pc.sort_indices(out, sort_keys=[("cnt", "descending"),
                                              ("gram", "ascending")])
        return out.take(idx.slice(0, k))

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    local = ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(_PID).map_groups(_local_topk, batch_format="pyarrow")
    merged = collect_arrow(local)
    if merged.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "gram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64())}))
    idx = pc.sort_indices(merged, sort_keys=[("cnt", "descending"),
                                             ("gram", "ascending")])
    return ray.data.from_arrow(merged.take(idx.slice(0, k)))
