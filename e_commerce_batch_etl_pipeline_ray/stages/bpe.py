"""Distributed BPE tokenizer training (byte-level, GPT-2-style).

Each merge round is two streamed passes over the tokenized corpus:

  1. COUNT: every block emits (pair_code, count) partials — one
     ``np.unique`` over fused adjacent-token codes per block, cross-doc
     pairs masked; the driver folds partials into a dict of pair -> count
     (bounded by DISTINCT pairs, not corpus size) and picks the argmax
     with a total tie-break (count desc, pair asc) so training is
     deterministic at any parallelism.
  2. REPLACE: every block rewrites its token arrays, merging the chosen
     pair left-to-right non-overlapping ("aaa" + merge(a,a) -> [aa, a]) —
     the overlap rule is resolved VECTORIZED with a run-parity trick
     (keep every other match inside each run of consecutive matches), no
     per-token Python. The corpus is re-materialized per round so the
     next round's lineage starts from the merged tokens instead of
     replaying every earlier round.

The trained artifact is the ordered merge list [(a, b, new_id), ...];
``bpe_tokenize`` applies it to any corpus as one actor-pool stage
(merges broadcast once per actor, k vectorized passes per batch).

Token layout: ids 0..255 are raw bytes; merge i mints id 256+i.

Cost honesty: k merges = k (count + replace) rounds over the corpus —
inherent to BPE (every production trainer pays it); each round here is
two shuffle-free map_batches passes, so wall time scales linearly in
corpus bytes / cluster width.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.lm import _buffer_view

_SHIFT = np.int64(1) << np.int64(32)


def _doc_ids_of_positions(roff: np.ndarray, n: int) -> np.ndarray:
    """Doc index of each flat token position (roff = per-doc offsets)."""
    starts = np.arange(n, dtype=np.int64)
    return np.searchsorted(roff, starts, side="right") - 1


def _pair_codes(flat: np.ndarray, roff: np.ndarray) -> np.ndarray:
    """Fused (a<<32 | b) codes of within-doc adjacent pairs."""
    if len(flat) < 2:
        return np.zeros(0, np.int64)
    codes = flat[:-1].astype(np.int64) * _SHIFT + flat[1:]
    boundary = roff[1:-1] - 1
    boundary = boundary[(boundary >= 0) & (boundary < len(codes))]
    mask = np.ones(len(codes), dtype=bool)
    mask[boundary] = False
    return codes[mask]


def _merge_flat(flat: np.ndarray, roff: np.ndarray, a: int, b: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Replace left-to-right non-overlapping (a,b) -> new_id across the
    flattened corpus (doc boundaries respected). Returns (new_flat,
    new_roff). Vectorized: run-parity selects every other match inside
    each run of consecutive matches."""
    n = len(flat)
    if n < 2:
        return flat, roff
    match = np.zeros(n - 1, dtype=bool)
    np.equal(flat[:-1], a, out=match)
    match &= flat[1:] == b
    boundary = roff[1:-1] - 1
    boundary = boundary[(boundary >= 0) & (boundary < n - 1)]
    match[boundary] = False
    if not match.any():
        return flat, roff
    if a == b:
        # overlapping self-pairs: keep every other match within each run
        m = match.astype(np.int64)
        run_start = match & np.concatenate([[True], ~match[:-1]])
        # position within run = cumsum(m) - cumsum(m at last run start)
        csum = np.cumsum(m)
        start_val = np.where(run_start, csum - 1, 0)
        np.maximum.accumulate(np.where(match, start_val, -1), out=start_val)
        inrun = np.where(match, csum - 1 - start_val, 0)
        keep = match & (inrun % 2 == 0)
    else:
        # a != b: matches cannot overlap (a,b then b,? can't both match)
        keep = match
    pos = np.flatnonzero(keep)
    # merged positions: token at pos becomes new_id, token at pos+1 dies
    out = flat.copy()
    out[pos] = new_id
    dead = np.zeros(n, dtype=bool)
    dead[pos + 1] = True
    new_flat = out[~dead]
    # new offsets: each doc shrinks by its merge count
    doc_of = _doc_ids_of_positions(roff, n)
    merges_per_doc = np.bincount(doc_of[pos], minlength=len(roff) - 1)
    lens = (roff[1:] - roff[:-1]) - merges_per_doc
    new_roff = np.concatenate([[0], np.cumsum(lens)])
    return new_flat, new_roff


def _tokens_table(flat: np.ndarray, roff: np.ndarray,
                  ids: pa.Array) -> pa.Table:
    offsets = pa.array(roff, pa.int32())
    values = pa.array(flat, pa.int32())
    tok = pa.ListArray.from_arrays(offsets, values)
    return pa.table({"doc_id": ids, "tokens": tok})


def _flat_of(t: pa.Table) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    col = t["tokens"].combine_chunks()
    raw_off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.int32)
    # .values is the UNSLICED child array: cut to this array's span
    flat = values[raw_off[0]:raw_off[-1]]
    roff = raw_off - raw_off[0]
    return flat, roff, t["doc_id"].combine_chunks()


def _bytes_to_tokens(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    seg, roff = _buffer_view(t[text_col])
    return _tokens_table(seg.astype(np.int32), roff, t[id_col].combine_chunks())


def bpe_train(ds: ray.data.Dataset, num_merges: int,
              id_col: str = "doc_id", text_col: str = "text",
              min_count: int = 2) -> list[tuple[int, int, int]]:
    """Train ``num_merges`` BPE merges over the corpus. Returns the ordered
    merge list [(a, b, new_id), ...]; stops early when no pair reaches
    ``min_count``. Deterministic at any block layout."""
    corpus = ds.map_batches(
        lambda t: _bytes_to_tokens(t, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    merges: list[tuple[int, int, int]] = []
    for i in range(num_merges):
        def _count(t: pa.Table) -> pa.Table:
            flat, roff, _ = _flat_of(t)
            codes = _pair_codes(flat, roff)
            uniq, cnt = np.unique(codes, return_counts=True)
            return pa.table({"pair": pa.array(uniq, pa.int64()),
                             "n": pa.array(cnt, pa.int64())})

        partials = corpus.map_batches(_count, batch_format="pyarrow",
                                      zero_copy_batch=True).take_all()
        totals: dict[int, int] = {}
        for r in partials:
            totals[r["pair"]] = totals.get(r["pair"], 0) + r["n"]
        if not totals:
            break
        # total order: count desc, pair asc -> deterministic winner
        best_pair, best_n = min(totals.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_count:
            break
        a, b = int(best_pair >> 32), int(best_pair & 0xFFFFFFFF)
        new_id = 256 + i
        merges.append((a, b, new_id))

        def _replace(t: pa.Table, a=a, b=b, new_id=new_id) -> pa.Table:
            flat, roff, ids = _flat_of(t)
            nf, nr = _merge_flat(flat, roff, a, b, new_id)
            return _tokens_table(nf, nr, ids)

        # re-materialize: next round starts from merged tokens, not a
        # lineage replay of every earlier round
        corpus = corpus.map_batches(_replace, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    return merges


class _BpeTokenize:
    """Actor-pool tokenizer: merges fetched once per actor, each batch is
    k vectorized replace passes."""

    def __init__(self, merges_ref, id_col: str, text_col: str):
        self.merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        tok = _bytes_to_tokens(t, self.id_col, self.text_col)
        flat, roff, ids = _flat_of(tok)
        for a, b, new_id in self.merges:
            flat, roff = _merge_flat(flat, roff, a, b, new_id)
        out = _tokens_table(flat, roff, ids)
        n_tok = pa.array(roff[1:] - roff[:-1], pa.int64())
        return out.append_column("n_tokens", n_tok)


def bpe_tokenize(ds: ray.data.Dataset, merges: list[tuple[int, int, int]],
                 id_col: str = "doc_id", text_col: str = "text",
                 concurrency: int = 4) -> ray.data.Dataset:
    """Tokenize a corpus with a trained merge list -> (doc_id, tokens
    list<int32>, n_tokens)."""
    ref = ray.put(list(merges))
    try:
        avail = int(ray.cluster_resources().get("CPU", concurrency + 2))
        concurrency = max(1, min(concurrency, avail - 2))
    except Exception:  # noqa: BLE001
        pass
    return ds.map_batches(_BpeTokenize, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_constructor_args=(ref, id_col, text_col),
                          concurrency=concurrency)
