"""BM25 top-k retrieval over a document corpus — the IR scoring loop a
training-data pipeline uses for quality-by-query probes and eval-set
curation.

Two streamed passes, no shuffle of document data:
  1. corpus statistics (one combiner pass): per block, each query term's
     document frequency plus doc count and total token count — a handful
     of numbers per block, folded on the driver;
  2. scoring: idf/avglen broadcast, every block computes tf per term
     VECTORIZED (one equality kernel over the flattened token child array
     + a bincount per term — no per-doc Python), scores with the BM25
     formula, and keeps a local top-k; a tiny reduce merges block top-ks.

Tokenization is exact whitespace split (the corpus is space-separated
words); scores use the classic Robertson idf ln((N - df + .5)/(df + .5)
+ 1) with k1/b defaults 1.2/0.75.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _tokens_of(t: pa.Table, text_col: str):
    """(flattened token array, doc offsets, doc lengths) for a batch."""
    toks = pc.split_pattern(
        pc.coalesce(t[text_col].combine_chunks(), pa.scalar("")), " ")
    raw_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    flat = values.slice(raw_off[0], raw_off[-1] - raw_off[0])
    roff = raw_off - raw_off[0]
    lens = roff[1:] - roff[:-1]
    return flat, roff, lens


def _tf_matrix(flat, roff, n_docs: int, terms: list[str]) -> np.ndarray:
    """(len(terms), n_docs) term-frequency counts, fully vectorized."""
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64),
                       (roff[1:] - roff[:-1]))
    out = np.zeros((len(terms), n_docs), dtype=np.int64)
    for i, term in enumerate(terms):
        hit = pc.equal(flat, term)
        hit = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
        if hit.any():
            out[i] = np.bincount(doc_of[hit], minlength=n_docs)
    return out


def bm25_topk(ds: ray.data.Dataset, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text",
              round_to: int | None = None) -> ray.data.Dataset:
    """Top-``k`` documents by BM25 score for ``query_terms`` —
    ``(id_col, score)`` sorted score desc, id asc (deterministic ties)."""
    terms = list(query_terms)

    def _stats(t: pa.Table) -> pa.Table:
        flat, roff, lens = _tokens_of(t, text_col)
        tf = _tf_matrix(flat, roff, t.num_rows, terms)
        return pa.table({
            "term_df": pa.array([(tf > 0).sum(axis=1)],
                                pa.list_(pa.int64())),
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "total_len": pa.array([int(lens.sum())], pa.int64()),
        })

    parts = ds.map_batches(_stats, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total_len = sum(r["total_len"] for r in parts)
    df = np.zeros(len(terms), dtype=np.int64)
    for r in parts:
        df += np.asarray(r["term_df"], dtype=np.int64)
    if n_docs == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avglen = total_len / n_docs
    idf = np.array([math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
                    for d in df])

    def _score(t: pa.Table) -> pa.Table:
        flat, roff, lens = _tokens_of(t, text_col)
        tf = _tf_matrix(flat, roff, t.num_rows, terms).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * lens / avglen)
        with np.errstate(invalid="ignore", divide="ignore"):
            score = (idf[:, None] * tf * (k1 + 1.0) / denom).sum(axis=0)
        score = np.nan_to_num(score, nan=0.0)
        if round_to is not None:
            # HALF_UP to mirror SQL ROUND
            from e_commerce_batch_etl_pipeline_ray.functions.scalar import (
                round2,
            )
            arr = round2(pa.array(score, pa.float64()), round_to)
        else:
            arr = pa.array(score, pa.float64())
        out = pa.table({id_col: t[id_col], "score": arr})
        # local top-k: block egress is k rows, not the block
        idx = pc.sort_indices(out, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        return out.take(idx.slice(0, k))

    scored = ds.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    all_local = collect_arrow(scored)
    idx = pc.sort_indices(all_local, sort_keys=[("score", "descending"),
                                                (id_col, "ascending")])
    return ray.data.from_arrow(all_local.take(idx.slice(0, k)))
