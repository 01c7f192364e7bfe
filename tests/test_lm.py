"""Char-bigram LM: numpy/brute-force parity, block-count invariance,
edge docs (empty, single byte, null, non-ASCII scored on UTF-8 bytes)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import lm

CORPUS = ["the cat sat on the mat", "the dog sat on the log",
          "a cat and a dog", "sphinx of black quartz judge my vow",
          "", "x", None, "héllo wörld", "the the the the"]


def _brute_model(corpus):
    counts = {}
    for s in corpus:
        if not s:
            continue
        b = s.encode("utf-8")
        for i in range(len(b) - 1):
            counts[(b[i], b[i + 1])] = counts.get((b[i], b[i + 1]), 0) + 1
    row = {}
    for (c1, _), n in counts.items():
        row[c1] = row.get(c1, 0) + n

    def logp(c1, c2):
        return math.log((counts.get((c1, c2), 0) + 1) / (row.get(c1, 0) + 256))
    return logp


def _brute_ppl(s, logp):
    if not s:
        return None
    b = s.encode("utf-8")
    if len(b) < 2:
        return None
    tot = sum(logp(b[i], b[i + 1]) for i in range(len(b) - 1))
    return math.exp(-tot / (len(b) - 1))


def _ds(blocks):
    t = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                  "text": pa.array(CORPUS, pa.string())})
    return ray.data.from_arrow(t).repartition(blocks)


def test_bigram_lm_matches_brute_force():
    model = lm.train_char_bigram(_ds(3))
    rows = lm.perplexity(_ds(3), model).take_all()
    logp = _brute_model(CORPUS)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        exp = _brute_ppl(CORPUS[r["doc_id"]], logp)
        if exp is None:
            assert r["perplexity"] is None
        else:
            assert abs(r["perplexity"] - exp) < 1e-9, r


def test_bigram_lm_block_count_invariant():
    m1 = lm.train_char_bigram(_ds(1))
    m5 = lm.train_char_bigram(_ds(5))
    assert np.array_equal(m1, m5)


def test_bigram_lm_repeated_text_scores_lower():
    """A doc made of the corpus's most common transitions must score lower
    perplexity than line noise under the same model."""
    model = lm.train_char_bigram(_ds(2))
    probe = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the cat sat on the mat", "zq@#%Q9~^&kkj"],
                         pa.string())}))
    rows = {r["doc_id"]: r["perplexity"]
            for r in lm.perplexity(probe, model).take_all()}
    assert rows[0] < rows[1]
