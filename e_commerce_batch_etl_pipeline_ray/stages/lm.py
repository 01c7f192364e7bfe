"""Char-bigram language-model quality signal (CCNet/KenLM-style corpus
perplexity, reduced to the bigram order that stays exactly mergeable).

Training is one streaming pass: each batch contributes a dense 256x256
byte-pair count matrix computed STRAIGHT OFF the Arrow string buffer (one
``np.bincount`` over fused pair codes — no per-row Python, no decode), and
partials sum into the model driver-side (a 512 KB array per block; at any
corpus size the shuffle is num_blocks x 512 KB, independent of data
volume). Scoring broadcasts the 256x256 log-prob matrix once (``ray.put``)
and evaluates every document vectorized: one fancy-index over the
concatenated buffer + a cumsum subtraction per doc — cross-document pairs
are masked, empty/one-byte docs score NULL.

Model: Laplace-smoothed  p(c2 | c1) = (count(c1c2) + 1) / (count(c1.) + 256)
Score: perplexity(d) = exp(-mean_i ln p(d[i+1] | d[i]))  — lower = more
like the training corpus. Train on a trusted corpus, score candidates; the
classic data-quality filter for LLM pipelines (cf. PAPERS.md CCNet).

Byte-level == char-level on ASCII corpora; non-ASCII text is scored on its
UTF-8 bytes (documented, deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

V = 256


def _buffer_view(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte data, per-row offsets rebased to 0) for a String/LargeString
    array, zero-copy."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    width = np.int64 if pa.types.is_large_string(col.type) else np.int32
    off_buf, data_buf = col.buffers()[1], col.buffers()[2]
    if off_buf is None:
        return np.zeros(0, np.uint8), np.zeros(len(col) + 1, np.int64)
    offsets = np.frombuffer(off_buf, dtype=width, count=len(col) + 1,
                            offset=col.offset * np.dtype(width).itemsize
                            ).astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None \
        else np.zeros(0, np.uint8)
    seg = data[offsets[0]:offsets[-1]]
    return seg, offsets - offsets[0]


def _pair_logps(seg: np.ndarray, roff: np.ndarray,
                logp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(per-doc log-prob sums, per-doc bigram counts) — cross-doc pairs
    masked, cumsum-ranged so empty docs are exact zeros."""
    n_pairs = max(len(seg) - 1, 0)
    lens = roff[1:] - roff[:-1]
    n_bigrams = np.maximum(lens - 1, 0)
    if n_pairs == 0:
        return np.zeros(len(lens)), n_bigrams
    lp = logp[seg[:-1], seg[1:]]
    boundary = roff[1:-1] - 1                       # pair spanning docs
    boundary = boundary[(boundary >= 0) & (boundary < n_pairs)]
    lp[boundary] = 0.0
    csum = np.concatenate([[0.0], np.cumsum(lp)])
    hi = np.minimum(roff[1:], n_pairs)
    lo = np.minimum(roff[:-1], n_pairs)
    return csum[hi] - csum[lo], n_bigrams


def _count_pairs(seg: np.ndarray, roff: np.ndarray) -> np.ndarray:
    """Dense V*V bigram counts for one buffer, cross-doc pairs excluded."""
    counts = np.zeros(V * V, dtype=np.int64)
    if len(seg) < 2:
        return counts
    codes = seg[:-1].astype(np.int32) * V + seg[1:]
    n_pairs = len(codes)
    boundary = roff[1:-1] - 1
    boundary = boundary[(boundary >= 0) & (boundary < n_pairs)]
    mask = np.ones(n_pairs, dtype=bool)
    mask[boundary] = False
    np.add.at(counts, codes[mask], 1)
    return counts


def train_char_bigram(ds: ray.data.Dataset, text_col: str = "text") -> np.ndarray:
    """One streaming pass over the corpus -> 256x256 float64 log-prob
    matrix (Laplace-smoothed)."""
    def _partial(t: pa.Table) -> pa.Table:
        seg, roff = _buffer_view(t[text_col])
        counts = _count_pairs(seg, roff)
        return pa.table({"counts": pa.array([counts], pa.list_(pa.int64()))})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    total = np.zeros(V * V, dtype=np.int64)
    for row in partials:
        total += np.asarray(row["counts"], dtype=np.int64)
    counts = total.reshape(V, V).astype(np.float64)
    row_sums = counts.sum(axis=1, keepdims=True)
    return np.log(counts + 1.0) - np.log(row_sums + float(V))


class _Perplexity:
    """Actor-pool scorer: the broadcast log-prob matrix is fetched ONCE per
    actor (zero-copy from plasma), each batch is one vectorized pass."""

    def __init__(self, logp_ref, text_col: str, out_col: str,
                 round_to: int | None):
        self.logp = ray.get(logp_ref) if not isinstance(logp_ref, np.ndarray) \
            else logp_ref
        self.text_col = text_col
        self.out_col = out_col
        self.round_to = round_to

    def __call__(self, t: pa.Table) -> pa.Table:
        seg, roff = _buffer_view(t[self.text_col])
        sums, n = _pair_logps(seg, roff, self.logp)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(-sums / n)
        if self.round_to is not None:
            ppl = np.round(ppl, self.round_to)
        import pyarrow.compute as pc
        valid = (n > 0) & pc.is_valid(
            t[self.text_col].combine_chunks()).to_numpy(zero_copy_only=False)
        arr = pa.array(np.where(valid, ppl, 0.0), pa.float64(),
                       mask=~valid)
        return t.append_column(self.out_col, arr)


def perplexity(ds: ray.data.Dataset, logp: np.ndarray,
               text_col: str = "text", out_col: str = "perplexity",
               round_to: int | None = None,
               concurrency: int = 4) -> ray.data.Dataset:
    """Score every document's corpus perplexity under a trained model
    (NULL for docs with no bigram: empty/one-byte/null)."""
    ref = ray.put(np.ascontiguousarray(logp))
    # cap the actor pool below the cluster CPU count: a pool reserving
    # EVERY CPU starves the upstream read/map tasks and deadlocks the
    # streaming executor (same guard as cdc.engine)
    try:
        avail = int(ray.cluster_resources().get("CPU", concurrency + 2))
        concurrency = max(1, min(concurrency, avail - 2))
    except Exception:  # noqa: BLE001
        pass
    return ds.map_batches(_Perplexity, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_constructor_args=(ref, text_col, out_col,
                                               round_to),
                          concurrency=concurrency)
