"""exact_substring_removal (stages/substr.py, q173): brute-force parity,
span-merge, all-occurrence removal, null/empty/short-doc contracts,
parallelism invariance."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.substr import (
    exact_substring_removal,
)


def _brute(rows, n):
    cnt = Counter()
    for _, tx in rows:
        if tx is None:
            continue
        for i in range(len(tx) - n + 1):
            cnt[tx[i:i + n]] += 1
    out = []
    for did, tx in rows:
        if tx is None:
            out.append((did, None, None))
            continue
        cov = [False] * len(tx)
        for i in range(len(tx) - n + 1):
            if cnt[tx[i:i + n]] > 1:
                for p in range(i, i + n):
                    cov[p] = True
        out.append((did, "".join(c for c, m in zip(tx, cov) if not m),
                    sum(cov)))
    return sorted(out)


def _run(rows, n, blocks=3, num_partitions=8):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(blocks)
    out = exact_substring_removal(ds, n=n, num_partitions=num_partitions)
    return sorted((r["doc_id"], r["text"], r["n_removed"])
                  for r in out.take_all())


def test_handcrafted_contracts():
    """Cross-doc shared span excised from BOTH docs (all-occurrence
    removal), within-doc repeat excised, overlapping spans merge, docs
    shorter than n / empty / null untouched."""
    rows = [
        (0, "AAAA0123456789BBBB"),     # shares 0123456789 with doc 1
        (1, "CC0123456789DD"),
        (2, "unique text stays"),
        (3, None),
        (4, ""),
        (5, "tiny"),                   # < n
        (6, "xxZZZZZZZZZZyyZZZZZZZZZZ"),  # within-doc repeat (10 Zs)
    ]
    n = 6
    got = _run(rows, n)
    exp = _brute(rows, n)
    assert got == exp
    by = {d: (t, r) for d, t, r in got}
    # every 6-gram inside the shared run is duplicated -> whole run goes
    assert "0123456789" not in by[0][0] and "0123456789" not in by[1][0]
    assert by[2] == ("unique text stays", 0)
    assert by[3] == (None, None)
    assert by[4] == ("", 0)
    assert by[5] == ("tiny", 0)
    assert "ZZZZZZ" not in by[6][0]


def test_bruteforce_parity_random_corpus():
    rng = np.random.default_rng(11)

    def rnd(k):
        return "".join(rng.choice(list("abcdefgh"), size=k))

    shared_a, shared_b = rnd(14), rnd(9)
    rows = [(i, rnd(int(rng.integers(0, 40)))) for i in range(12)]
    rows += [(20, rnd(5) + shared_a + rnd(8)),
             (21, shared_a + rnd(3) + shared_b),
             (22, rnd(11) + shared_b + rnd(2) + shared_a)]
    n = 7
    assert _run(rows, n) == _brute(rows, n)


def test_parallelism_invariance():
    rng = np.random.default_rng(5)

    def rnd(k):
        return "".join(rng.choice(list("abcd"), size=k))

    shared = rnd(12)
    rows = [(i, rnd(20) + (shared if i % 3 == 0 else rnd(12)) + rnd(6))
            for i in range(30)]
    n = 8
    a = _run(rows, n, blocks=1, num_partitions=4)
    b = _run(rows, n, blocks=7, num_partitions=16)
    assert a == b == _brute(rows, n)


def test_top_ngrams_exact_and_layout_invariant():
    """top_ngrams == brute counts with overlap; per-partition local
    top-k loses nothing (gram counts are partition-complete); ranking
    (cnt DESC, gram ASC)."""
    from collections import Counter

    from e_commerce_batch_etl_pipeline_ray.stages.substr import top_ngrams

    rng = np.random.default_rng(4)
    texts = ["ababababab", "zzzzzz", "abcabcabc",
             "".join(rng.choice(list("ab"), 40)), "", None, "ab"]
    n, k = 3, 5

    cnt = Counter()
    for tx in texts:
        if tx is None:
            continue
        for i in range(len(tx) - n + 1):
            cnt[tx[i:i + n]] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    for blocks in (1, 4):
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())})).repartition(blocks)
        out = top_ngrams(ds, n=n, k=k, num_partitions=4)
        got = [(r["gram"], r["cnt"]) for r in out.take_all()]
        assert got == exp, (blocks, got, exp)


# --- hypothesis property ---------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.one_of(st.none(),
                  st.text(alphabet="abc \n", min_size=0, max_size=60)),
        min_size=1, max_size=12),
    n=st.integers(min_value=2, max_value=6),
)
def test_removal_matches_brute_hypothesis(texts, n):
    """Property: exact_substring_removal == the per-corpus brute replay
    for ANY corpus / gram length — small alphabet maximizes collisions,
    newlines and spaces exercise the byte-grain path."""
    rows = list(enumerate(texts))
    assert _run(rows, n, blocks=2, num_partitions=4) == _brute(rows, n)
