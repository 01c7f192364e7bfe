"""Persisted inverted index: postings correctness, BM25 parity with the
corpus-scan scorer, boolean lookup vs brute force, and partition pruning."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import retrieval

VOCAB = ["hash", "join", "window", "spark", "ray", "arrow", "batch",
         "shuffle", "actor", "lake"]


def _corpus(n=400, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        ln = int(rng.integers(3, 40))
        words = rng.choice(VOCAB, size=ln)
        texts.append(" ".join(words))
    texts[5] = ""                       # empty doc
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    t = _corpus()
    index_dir = str(tmp_path_factory.mktemp("invidx"))
    ds = ray.data.from_arrow(t).repartition(6)
    meta = retrieval.build_inverted_index(ds, index_dir, num_partitions=8)
    return t, index_dir, meta


def test_postings_exact(built):
    t, index_dir, meta = built
    import pyarrow.parquet as pq
    files = [os.path.join(index_dir, f) for f in sorted(os.listdir(index_dir))
             if f.endswith(".parquet")]
    got = pa.concat_tables([pq.read_table(f) for f in files])
    exp = {}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").split(" ")
        for w in set(toks):
            exp[(w, did)] = (toks.count(w), len(toks))
    got_map = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
               for r in got.to_pylist()}
    assert got_map == exp
    assert meta["n_docs"] == t.num_rows
    assert meta["n_postings"] == len(exp)
    assert meta["total_len"] == sum(len((x or "").split(" "))
                                    for x in t["text"].to_pylist())


def test_bm25_indexed_matches_corpus_scan(built):
    t, index_dir, _ = built
    terms = ["hash", "window", "spark"]
    ds = ray.data.from_arrow(t).repartition(6)
    full = {r["doc_id"]: r["score"]
            for r in retrieval.bm25_topk(ds, terms, k=15,
                                         round_to=6).take_all()}
    idxd = {r["doc_id"]: r["score"]
            for r in retrieval.bm25_topk_indexed(index_dir, terms, k=15,
                                                 round_to=6).take_all()}
    assert idxd == full


def test_bm25_indexed_unknown_term(built):
    _, index_dir, _ = built
    out = retrieval.bm25_topk_indexed(index_dir, ["zzzmissing"], k=5)
    assert out.count() == 0


def test_index_lookup_and_any(built):
    t, index_dir, _ = built
    terms = ["hash", "lake"]
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    exp_all = {d for d, x in texts.items()
               if all(w in (x or "").split(" ") for w in terms)}
    exp_any = {d for d, x in texts.items()
               if any(w in (x or "").split(" ") for w in terms)}
    got_all = {r["doc_id"] for r in
               retrieval.index_lookup(index_dir, terms, "all").take_all()}
    got_any = {r["doc_id"] for r in
               retrieval.index_lookup(index_dir, terms, "any").take_all()}
    assert got_all == exp_all
    assert got_any == exp_any


def test_query_prunes_partitions(built):
    _, index_dir, meta = built
    _, _, touched = retrieval._read_postings(index_dir, ["hash"])
    n_files = len([f for f in os.listdir(index_dir)
                   if f.endswith(".parquet")])
    assert n_files > 1            # index actually spread over partitions
    assert touched < n_files      # single-term query reads fewer files
