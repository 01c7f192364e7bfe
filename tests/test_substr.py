"""Duplicated-substring detection vs a brute-force oracle: planted
cross-doc and within-doc repeats, short/null docs, block invariance."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import substr

BOILER = "subscribe to our newsletter today"
DOCS = [
    "the quick brown fox jumps over the lazy dog " + BOILER,
    "pack my box with five dozen liquor jugs " + BOILER,
    "completely unique text with no repeats anywhere at all",
    "spam spam spam spam spam spam spam spam spam",      # within-doc repeats
    "short",                                              # < n bytes
    None,
    "",
]
N = 10


def _brute(docs, n):
    counts = Counter()
    for d in docs:
        if d:
            b = d.encode()
            for i in range(len(b) - n + 1):
                counts[b[i:i + n]] += 1
    out = {}
    for doc_id, d in enumerate(docs):
        if not d:
            continue
        b = d.encode()
        grams = [b[i:i + n] for i in range(len(b) - n + 1)]
        if not grams:
            continue
        dup = sum(1 for g in grams if counts[g] > 1)
        out[doc_id] = (len(grams), dup, round(dup / len(grams), 4))
    return out


def _run(blocks):
    t = pa.table({"doc_id": pa.array(range(len(DOCS)), pa.int64()),
                  "text": pa.array(DOCS, pa.string())})
    ds = ray.data.from_arrow(t).repartition(blocks)
    rows = substr.duplicated_ngrams(ds, n=N, num_partitions=8).take_all()
    return {r["doc_id"]: (r["n_grams"], r["n_dup"], r["dup_frac"])
            for r in rows}


def test_duplicated_ngrams_matches_brute_force():
    exp = _brute(DOCS, N)
    got = _run(3)
    assert got == exp
    assert got[2][1] == 0                      # unique doc: zero dups
    assert got[3][2] > 0.8                     # self-repeating doc
    assert 4 not in got and 5 not in got and 6 not in got


def test_duplicated_ngrams_block_invariant():
    assert _run(1) == _run(5)
