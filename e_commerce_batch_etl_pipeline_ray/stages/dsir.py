"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): score every corpus document
by how target-like its hashed n-gram feature distribution is —
``score(d) = sum_positions log(p_target[bucket] / q_corpus[bucket])`` —
then sample/threshold upstream on the score.

Engineering contract (what makes this exact at any parallelism AND
SQL-mirrorable for the oracle):

  * features: character ``k``-shingles over the first ``cap`` chars,
    lowercased, WITH multiplicity (every position), exactly the q86
    contamination shingle convention; docs shorter than ``k`` contribute
    no features and score 0;
  * bucket(shingle) = polynomial codepoint hash
    ``sum_j cp[j] * 31^(k-1-j)  (mod 2^32) (mod buckets)`` — every
    intermediate stays below 2^63, so numpy uint64 and the oracle's
    exact HUGEINT arithmetic agree bit-for-bit (the sampling.py trick,
    extended from int ids to strings);
  * the per-bucket log-ratios are quantized to INTEGER micro-nats
    ``R[b] = round(1e6 * ln((ct[b]+1)(Nq+B) / ((cq[b]+1)(Nt+B))))``
    (Laplace-smoothed), so per-doc scores are INTEGER sums — exact under
    any summation order, immune to the float-reduction tie flips that
    plague cross-engine float aggregates.

Plan shape: one pass builds per-(doc, bucket) counts (docs are rows, so
counts complete inside their batch — ZERO shuffle), materialized once as
the compressed feature representation (<= buckets rows per doc, tiny
next to the text); the global target/corpus bucket totals are a
driver-light reduce over it (2 x buckets rows); scores are a second
stateless map over the same counts with the 8*buckets-byte ratio table
in the closure.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_MOD = np.uint64(1) << np.uint64(32)


def _doc_bucket_counts(texts, ids, k: int, cap: int,
                       buckets: int) -> pa.Table:
    """Per-(doc, bucket) shingle counts, multiplicity kept. One encode per
    doc; all digests vectorized (sliding codepoint windows @ 31-powers)."""
    pow_vec = (np.uint64(31) **
               np.arange(k - 1, -1, -1, dtype=np.uint64))
    out_id, out_b, out_n = [], [], []
    for did, txt in zip(ids, texts):
        if txt is None:
            continue
        s = txt[:cap].lower()
        if len(s) < k:
            continue
        cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4") \
            .astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(cp, k)
        dig = (win * pow_vec).sum(axis=1) % _MOD
        b = (dig % np.uint64(buckets)).astype(np.int64)
        bc = np.bincount(b, minlength=buckets)
        nz = np.flatnonzero(bc)
        out_id.extend([did] * len(nz))
        out_b.extend(nz.tolist())
        out_n.extend(bc[nz].tolist())
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "bucket": pa.array(out_b, pa.int64()),
                     "n": pa.array(out_n, pa.int64())})


def dsir_scores(ds, target_filter, text_col: str = "text",
                id_col: str = "doc_id", buckets: int = 64, k: int = 8,
                cap: int = 512):
    """Per-document DSIR importance score in integer micro-nats.

    ``target_filter``: vectorized ``pa.Table -> BooleanArray`` selecting
    the TARGET documents (the distribution to move toward; e.g. an eval
    set or a high-quality slice). Returns a Dataset of
    ``(doc_id, n_shingles, dsir_score)`` for every doc with features.
    """
    import pyarrow.compute as pc

    def _counts(t: pa.Table) -> pa.Table:
        tt = t.select([id_col, text_col])
        tgt = pc.fill_null(target_filter(t), False)
        c = _doc_bucket_counts(tt[text_col].to_pylist(),
                               tt[id_col].to_pylist(), k, cap, buckets)
        # tag target rows so the totals reduce needs no second text pass
        tmap = dict(zip(tt[id_col].to_pylist(), tgt.to_pylist()))
        is_t = pa.array([bool(tmap[d]) for d in
                         c["doc_id"].to_pylist()], pa.bool_())
        return c.append_column("is_target", is_t)

    counts = ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=256).materialize()

    # global bucket totals: 2 x buckets rows cross the wire
    def _totals(t: pa.Table) -> pa.Table:
        g = t.group_by(["bucket", "is_target"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "is_target", "n"])
    parts = counts.map_batches(_totals, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    ct = np.zeros(buckets, dtype=np.int64)      # target
    cq = np.zeros(buckets, dtype=np.int64)      # corpus (ALL docs)
    for r in parts:
        cq[r["bucket"]] += r["n"]
        if r["is_target"]:
            ct[r["bucket"]] += r["n"]
    nt, nq = int(ct.sum()), int(cq.sum())
    ratio = [int(round(1e6 * math.log(
        ((ct[b] + 1.0) * (nq + buckets)) /
        ((cq[b] + 1.0) * (nt + buckets))))) for b in range(buckets)]
    rtab = np.asarray(ratio, dtype=np.int64)

    def _score(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        part = pa.table({
            "doc_id": t["doc_id"],
            "n_shingles": t["n"],
            "dsir_score": pa.array(n * rtab[b], pa.int64()),
        })
        g = part.group_by("doc_id").aggregate(
            [("n_shingles", "sum"), ("dsir_score", "sum")])
        return g.rename_columns(["doc_id", "n_shingles", "dsir_score"])

    # docs are single rows: their counts share a batch, so this per-batch
    # groupby is already the FINAL per-doc reduction (no shuffle)
    return counts.map_batches(_score, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
