"""Paragraph-level corpus dedup (stages/paradedup.py): brute-force parity,
parallelism invariance, null/empty contracts, and the skinny-shuffle
guardrails (fused-key bounds)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.paradedup import (
    paragraph_dedup,
)

SEP = "\n\n"

DOCS = [
    (0, "hello world\n\nboiler plate\n\nunique a"),
    (1, "boiler plate\n\nunique b\n\n\n\nunique b"),  # x-doc dup + in-doc dup + empty seg
    (2, None),
    (3, ""),
    (4, "unique a\n\nhello world"),                    # every para duplicated
    (5, "solo text"),
    (6, "boiler plate"),                               # whole doc = dup para
    (7, "  \n\nboiler plate\n\n  "),                   # whitespace paras kept (non-empty, unique)
]


def _brute(docs):
    seen: set[str] = set()
    exp = {}
    for did, tx in docs:
        if tx is None:
            exp[did] = (None, None, None)
            continue
        paras = tx.split(SEP)
        kept, removed = [], 0
        for p in paras:
            if len(p) == 0:
                kept.append(p)
                continue
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        exp[did] = (SEP.join(kept), len(paras), removed)
    return exp


def _run(docs, num_blocks=1, num_partitions=4):
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs],
                  "extra": [f"x{d[0]}" for d in docs]})
    ds = ray.data.from_arrow(t)
    if num_blocks > 1:
        ds = ds.repartition(num_blocks)
    out = paragraph_dedup(num_partitions=num_partitions).apply(ds)
    return {r["doc_id"]: r for r in out.take_all()}


def test_brute_parity():
    exp = _brute(DOCS)
    got = _run(DOCS)
    assert set(got) == set(exp)
    for did, (tx, n_paras, n_removed) in exp.items():
        r = got[did]
        assert r["text"] == tx, (did, r["text"], tx)
        assert r["n_paras"] == n_paras
        assert r["n_removed"] == n_removed
        assert r["extra"] == f"x{did}"  # non-text columns survive


def test_parallelism_invariance():
    # the winner is MIN(doc_id*2^21+idx), not arrival order — any block
    # layout must produce identical rewrites
    exp = _run(DOCS, num_blocks=1, num_partitions=2)
    for blocks in (3, 7):
        got = _run(DOCS, num_blocks=blocks, num_partitions=5)
        for did in exp:
            assert got[did]["text"] == exp[did]["text"], (blocks, did)
            assert got[did]["n_removed"] == exp[did]["n_removed"]


def test_no_duplicates_fast_path():
    docs = [(0, "alpha\n\nbeta"), (1, "gamma"), (2, None)]
    got = _run(docs)
    assert got[0]["text"] == "alpha\n\nbeta" and got[0]["n_removed"] == 0
    assert got[1]["n_paras"] == 1
    assert got[2]["text"] is None and got[2]["n_paras"] is None


def test_all_null_or_empty_corpus():
    got = _run([(0, None), (1, ""), (2, "\n\n")])
    assert got[0]["text"] is None
    assert got[1]["text"] == "" and got[1]["n_paras"] == 1
    # "\n\n" splits into two empty segments — both structural, kept
    assert got[2]["text"] == "\n\n" and got[2]["n_paras"] == 2
    assert got[2]["n_removed"] == 0


def test_fused_key_guards():
    big_id = 1 << 45
    t = pa.table({"doc_id": pa.array([big_id], pa.int64()),
                  "text": ["a\n\nb"]})
    with pytest.raises(Exception, match="2\\^42"):
        paragraph_dedup().apply(ray.data.from_arrow(t)).take_all()


def test_many_paragraph_doc():
    # 500 paragraphs, every even one a copy of paragraph 0
    paras = ["p%d" % i if i % 2 else "dup" for i in range(500)]
    docs = [(0, SEP.join(paras))]
    exp = _brute(docs)
    got = _run(docs, num_blocks=1, num_partitions=8)
    assert got[0]["text"] == exp[0][0]
    assert got[0]["n_removed"] == 249  # all "dup" copies after idx 0
