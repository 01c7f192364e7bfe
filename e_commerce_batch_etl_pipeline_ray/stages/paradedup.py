"""Corpus-wide PARAGRAPH-level exact dedup with in-place document rewrite
(the CCNet / BigScience-ROOTS preprocessing step: strip boilerplate
paragraphs — site headers, license blurbs, navigation chrome — that repeat
across documents, keeping exactly the FIRST occurrence corpus-wide).

Distinct from document-level exact dedup (stages/neardup.exact_dedup keeps
or drops whole docs) and from the duplicated-substring SIGNAL
(stages/substr.py scores but never rewrites): this operator edits each
document, removing every non-empty paragraph whose exact text already
appeared at a smaller (doc_id, paragraph_index) position anywhere in the
corpus, then re-joins the survivors with the separator.

Scale shape (the part that matters at 100 TB):

* The winner shuffle is SKINNY — paragraph text never leaves its block.
  One zero-copy Arrow pass explodes docs to (did, fused, sha_hi, sha_lo)
  rows: a 16-byte sha256 prefix of each paragraph (bytes straight off the
  Arrow string buffer, the stages/neardup.content_hash trick) packed into
  two int64 join keys, so the all-to-all exchange carries ~32
  bytes/paragraph regardless of paragraph size.
* Winners are a hash-partitioned min-reduce per sha with a per-batch
  combiner (bytes into the shuffle ~= distinct paragraphs per block, not
  occurrences); losers come back as (doc_id, idx) pairs via one skinny
  hash join.
* Only documents that actually LOSE a paragraph are touched again: the
  per-doc removal lists ride a left-outer hash join back to the doc
  table; docs with no removals pass through the rewrite untouched (null
  fast path — ``new_text is col``).
* The rewrite is one map_batches: vectorized re-split, numpy mask over
  the flattened paragraph array, ListArray reassembly, pc.binary_join.

Determinism: the winner for a duplicated paragraph is the minimum fused
key ``doc_id * 2^21 + idx`` — exact integer math, identical at any
parallelism, mirrored in SQL as ``MIN(...) OVER (PARTITION BY para)``
(pipelines/queries.py q168). Empty paragraphs (zero-length segments,
i.e. consecutive separators) are structural and always kept. Collisions:
a 2^-64 sha-prefix birthday bound stands in for string equality — the
same contract as the engine's exact-dedup key (content_hash docstring).

Assumptions (guarded): idx < 2^21 paragraphs per document and
doc_id < 2^42 so the fused key fits int64; ids must be integers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from e_commerce_batch_etl_pipeline_ray.core import FnStep

_IDX_BITS = 21
_MAX_IDX = 1 << _IDX_BITS
_SHA_KEYS = ["sha_hi", "sha_lo"]


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def _split_flat(col: pa.Array, sep: str):
    """Split each doc into paragraphs; return (counts, flat, parent)."""
    lists = pc.split_pattern(col, sep)
    counts = pc.list_value_length(lists).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = _as_array(pc.list_flatten(lists))
    parent = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    return counts, flat, parent


def _sha_hi_lo(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """sha256[:16] per flattened paragraph as two int64 columns, bytes
    straight off the Arrow buffer (no Python str round-trip)."""
    m = len(flat)
    raw = bytearray(m * 16)
    if m:
        off_buf, data_buf = flat.buffers()[1], flat.buffers()[2]
        width = np.int64 if pa.types.is_large_string(flat.type) else np.int32
        offsets = np.frombuffer(off_buf, dtype=width, count=m + 1,
                                offset=flat.offset * np.dtype(width).itemsize)
        data = memoryview(data_buf) if data_buf is not None else \
            memoryview(b"")
        sha256 = hashlib.sha256
        for i in range(m):
            raw[i * 16:(i + 1) * 16] = \
                sha256(data[offsets[i]:offsets[i + 1]]).digest()[:16]
    pairs = np.frombuffer(bytes(raw), dtype="<i8").reshape(m, 2)
    return pairs[:, 0].copy(), pairs[:, 1].copy()


def sha_hex_block(flat: pa.Array, nchars: int = 32) -> list[str]:
    """sha256 hex prefix per flattened paragraph, bytes straight off the
    Arrow buffer — the string-keyed twin of :func:`_sha_hi_lo` (the
    incremental state path keys on hex so parquet ``in``-filters prune
    state row groups, matching cdc/dedup_state.py's convention)."""
    m = len(flat)
    out: list[str] = [""] * m
    if m:
        off_buf, data_buf = flat.buffers()[1], flat.buffers()[2]
        width = np.int64 if pa.types.is_large_string(flat.type) else np.int32
        offsets = np.frombuffer(off_buf, dtype=width, count=m + 1,
                                offset=flat.offset * np.dtype(width).itemsize)
        data = memoryview(data_buf) if data_buf is not None else \
            memoryview(b"")
        sha256 = hashlib.sha256
        for i in range(m):
            out[i] = sha256(
                data[offsets[i]:offsets[i + 1]]).hexdigest()[:nchars]
    return out


def explode_paragraphs_hex(t: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text",
                           sep: str = "\n\n") -> pa.Table:
    """Explode docs to skinny (did, fused, sha-hex) paragraph rows — the
    incremental-state twin of the closure in :func:`paragraph_dedup`.
    Empty segments are structural and never emitted; guards as there."""
    ids = _as_array(t[id_col]).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    if ids.size and int(ids.max()) >= (1 << (63 - _IDX_BITS)):
        raise ValueError(
            f"paragraph dedup: {id_col} must be < 2^{63 - _IDX_BITS}")
    col = _as_array(t[text_col])
    counts, flat, parent = _split_flat(col, sep)
    if counts.size and int(counts.max()) > _MAX_IDX:
        raise ValueError(
            f"paragraph dedup: a document has >{_MAX_IDX} paragraphs")
    if parent.size:
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.arange(parent.size, dtype=np.int64) - starts
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = ln > 0
        did = ids[parent[keep]]
        pidx = idx[keep]
        sha = sha_hex_block(flat.filter(pa.array(keep)))
    else:
        did = pidx = np.array([], np.int64)
        sha = []
    return pa.table({
        "did": pa.array(did, pa.int64()),
        "fused": pa.array(did * _MAX_IDX + pidx, pa.int64()),
        "sha": pa.array(sha, pa.string()),
    })


def apply_removals(t: pa.Table, text_col: str = "text",
                   sep: str = "\n\n") -> pa.Table:
    """Rewrite pass: drop the paragraphs named by each row's
    ``removed_idxs`` (comma-joined sorted indices; null = untouched),
    rejoin with ``sep``, append ``n_paras``/``n_removed``. Vectorized
    re-split + numpy mask + ListArray reassembly; null text passes
    through with null counts. Shared by the one-shot operator and the
    incremental state (cdc/paradedup_state.py)."""
    rem_col = _as_array(t["removed_idxs"])
    base = t.drop_columns(["removed_idxs"])
    has = pc.is_valid(rem_col).to_numpy(zero_copy_only=False)
    col = _as_array(base[text_col])
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    counts, flat, parent = _split_flat(col, sep)
    n = base.num_rows
    n_paras = np.where(valid, counts, 0)
    n_removed = np.zeros(n, dtype=np.int64)
    if has.any():
        keep = np.ones(parent.size, dtype=bool)
        starts = np.cumsum(counts) - counts
        rem_str = rem_col.to_pylist()
        for r in np.flatnonzero(has):
            ridx = np.fromiter((int(x) for x in rem_str[r].split(",")),
                               dtype=np.int64) if rem_str[r] else \
                np.array([], np.int64)
            keep[starts[r] + ridx] = False
            n_removed[r] = ridx.size
        kept_counts = np.bincount(parent[keep], minlength=n) \
            if parent.size else counts
        new_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_offsets[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, pa.int64()),
            flat.filter(pa.array(keep)).cast(pa.large_string()))
        joined = pc.binary_join(
            lists, pa.scalar(sep, pa.large_string())).cast(pa.string())
        new_text = pc.if_else(pa.array(valid), joined,
                              pa.nulls(n, pa.string()))
    else:
        new_text = col
    out = base.set_column(base.schema.get_field_index(text_col),
                          text_col, new_text)
    vmask = pa.array(valid)
    nulls = pa.nulls(n, pa.int64())
    out = out.append_column(
        "n_paras", pc.if_else(vmask, pa.array(n_paras, pa.int64()), nulls))
    out = out.append_column(
        "n_removed",
        pc.if_else(vmask, pa.array(n_removed, pa.int64()), nulls))
    return out


def paragraph_dedup(text_col: str = "text", id_col: str = "doc_id",
                    sep: str = "\n\n", num_partitions: int = 64) -> FnStep:
    """Remove corpus-wide duplicate paragraphs in place.

    Output: the input columns with ``text_col`` rewritten, plus
    ``n_paras`` (paragraph count before dedup) and ``n_removed``.
    Null-text rows pass through with null text and null counts.
    """
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.joins import hash_join

    def _explode(t: pa.Table) -> pa.Table:
        ids = _as_array(t[id_col]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if ids.size and int(ids.max()) >= (1 << (63 - _IDX_BITS)):
            raise ValueError(
                f"paragraph_dedup: {id_col} must be < 2^{63 - _IDX_BITS} "
                "(fused winner key would overflow int64)")
        col = _as_array(t[text_col])
        counts, flat, parent = _split_flat(col, sep)
        if counts.size and int(counts.max()) > _MAX_IDX:
            raise ValueError(
                f"paragraph_dedup: a document has >{_MAX_IDX} paragraphs")
        if parent.size:
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            idx = np.arange(parent.size, dtype=np.int64) - starts
            ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            keep = ln > 0  # empty segments are structural, never dedup
            did = ids[parent[keep]]
            pidx = idx[keep]
            hi, lo = _sha_hi_lo(flat.filter(pa.array(keep)))
        else:
            did = pidx = np.array([], np.int64)
            hi = lo = np.array([], np.int64)
        return pa.table({
            "did": pa.array(did, pa.int64()),
            "fused": pa.array(did * _MAX_IDX + pidx, pa.int64()),
            "sha_hi": pa.array(hi, pa.int64()),
            "sha_lo": pa.array(lo, pa.int64()),
        })

    def _combine_min(t: pa.Table) -> pa.Table:
        g = t.select(_SHA_KEYS + ["fused"]).group_by(_SHA_KEYS) \
            .aggregate([("fused", "min")])
        g = g.rename_columns(_SHA_KEYS + ["win"])
        pid = hash_partition_ids(g, _SHA_KEYS, num_partitions)
        return g.append_column("_pdp", pa.array(pid, pa.int32()))

    def _part_min(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["_pdp"]).group_by(_SHA_KEYS) \
            .aggregate([("win", "min")])
        return g.rename_columns(_SHA_KEYS + ["win"])

    def _filter_losers(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["fused"], t["win"]))
        idx = pc.bit_wise_and(t["fused"], _MAX_IDX - 1).cast(pa.int64())
        return pa.table({"did": t["did"], "idx": idx})

    def _rewrite(t: pa.Table) -> pa.Table:
        return apply_removals(t, text_col, sep)

    def _fastpath(ds):
        """No duplicate anywhere: one rewrite pass, no join (also dodges
        Ray 2.49's join-with-empty-side break, cf. stages/graph.py)."""
        def _null_rem(t: pa.Table) -> pa.Table:
            return t.append_column("removed_idxs",
                                   pa.nulls(t.num_rows, pa.string()))
        return ds.map_batches(_null_rem, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .map_batches(_rewrite, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _apply(ds):
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
            detach,
            ensure_schema,
        )
        skinny = ds.select_columns([id_col, text_col]).map_batches(
            _explode, batch_format="pyarrow", zero_copy_batch=True)
        # consumed twice (winner reduce + loser probe); rows are ~32 bytes
        # per paragraph — the one deliberate materialization
        skinny = skinny.materialize()
        if skinny.count() == 0:
            return _fastpath(ds)
        # detach after every groupby/map_groups: empty partitions emit
        # ZERO-COLUMN blocks that Ray's map operator passes through
        # UNTOUCHED (the UDF never runs on them) and that break
        # Dataset.join's hash-shuffle finalize (FieldRef no-match)
        win_schema = pa.schema([("sha_hi", pa.int64()),
                                ("sha_lo", pa.int64()), ("win", pa.int64())])
        winners = detach(skinny.map_batches(
            _combine_min, batch_format="pyarrow", zero_copy_batch=True,
        ).groupby("_pdp").map_groups(_part_min, batch_format="pyarrow"),
            win_schema)
        losers = hash_join(winners, on=tuple(_SHA_KEYS),
                           num_partitions=num_partitions).apply(skinny)
        losers = losers.map_batches(_filter_losers, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
        if losers.count() == 0:
            return _fastpath(ds)
        from e_commerce_batch_etl_pipeline_ray.stages.aggregates import (
            grouped_collect,
        )
        rem_schema = pa.schema([("did", pa.int64()),
                                ("removed_idxs", pa.string())])
        rem = grouped_collect(["did"], "idx", "removed_idxs",
                              num_partitions=num_partitions).apply(losers)
        rem = detach(rem.map_batches(ensure_schema(rem_schema),
                                     batch_format="pyarrow"), rem_schema)
        joined = hash_join(rem, on=id_col, right_on="did",
                           join_type="left_outer",
                           num_partitions=num_partitions).apply(ds)

        def _tidy(t: pa.Table) -> pa.Table:
            drop = [c for c in ("did",) if c in t.column_names]
            return t.drop_columns(drop) if drop else t

        return joined.map_batches(_tidy, batch_format="pyarrow",
                                  zero_copy_batch=True) \
            .map_batches(_rewrite, batch_format="pyarrow",
                         zero_copy_batch=True)

    return FnStep("paragraph_dedup", _apply)
