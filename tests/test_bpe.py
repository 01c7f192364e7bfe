"""Distributed BPE: merge-sequence parity with a reference pure-Python
trainer, block invariance, overlap semantics, tokenize roundtrip."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import bpe

CORPUS = ["low low low low low", "lower lower newest newest",
          "newest newest newest newest", "widest widest widest",
          "aaaa aaaa aaaa", "", None, "xyz"]


def _ref_train(docs, num_merges, min_count=2):
    """Reference BPE: sequential, greedy left-to-right replacement."""
    seqs = [list(d.encode()) for d in docs if d]
    merges = []
    for i in range(num_merges):
        counts = {}
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        # NOTE: counts here include overlaps ("aaa" counts (a,a) twice) —
        # same convention as the engine's pair pass
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        new_id = 256 + i
        merges.append((a, b, new_id))
        out_seqs = []
        for s in seqs:
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(new_id)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            out_seqs.append(out)
        seqs = out_seqs
    return merges, seqs


def _ds(blocks):
    t = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                  "text": pa.array(CORPUS, pa.string())})
    return ray.data.from_arrow(t).repartition(blocks)


def test_bpe_train_matches_reference():
    merges = bpe.bpe_train(_ds(3), num_merges=12)
    ref_merges, _ = _ref_train(CORPUS, 12)
    assert merges == ref_merges
    assert len(merges) > 5                      # corpus is merge-rich


def test_bpe_train_block_invariant():
    assert bpe.bpe_train(_ds(1), 8) == bpe.bpe_train(_ds(5), 8)


def test_bpe_tokenize_matches_reference_sequences():
    merges = bpe.bpe_train(_ds(2), num_merges=10)
    _, ref_seqs = _ref_train(CORPUS, 10)
    rows = sorted(bpe.bpe_tokenize(_ds(2), merges).take_all(),
                  key=lambda r: r["doc_id"])
    got = [r["tokens"] for r in rows]
    live_ids = [i for i, d in enumerate(CORPUS) if d]
    by_id = {r["doc_id"]: r for r in rows}
    for i, seq in zip(live_ids, ref_seqs):
        assert by_id[i]["tokens"] == seq
        assert by_id[i]["n_tokens"] == len(seq)
    # empty/null docs tokenize to empty
    for i, d in enumerate(CORPUS):
        if not d:
            assert by_id[i]["tokens"] == []


def test_bpe_overlap_semantics():
    """'aaaa' with merge (a,a): greedy left-to-right gives [X, X], and a
    second merge (X,X) gives [Y]."""
    docs = ["aaaa"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(docs, pa.string())}))
    merges = bpe.bpe_train(ds, 2, min_count=1)
    a = ord("a")
    assert merges == [(a, a, 256), (256, 256, 257)]
    toks = bpe.bpe_tokenize(ds, merges).take_all()[0]["tokens"]
    assert toks == [257]
