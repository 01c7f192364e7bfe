"""hybrid_rrf (stages/retrieval.py, q174): fusion math against a
hand-computed RRF, missing-list contribution, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.retrieval import hybrid_rrf


def _fixture():
    # 6 docs; terms target docs 0-2; embeddings make docs 3-5 the cosine
    # winners, doc 2 shared by both lists
    texts = ["hash hash window", "hash window", "hash spark zzz",
             "aaa bbb", "ccc ddd", "eee fff"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    base = np.eye(4, dtype=np.float64)
    embs = [base[3], base[3] * 0.1 + base[2], base[0] + 0.9 * base[1],
            base[0], base[0] + 0.1 * base[1], base[1]]
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in embs],
                              pa.list_(pa.float32()))}))
    return docs, emb, embs


def test_rrf_fusion_matches_hand_computation():
    docs, emb, embs = _fixture()
    out = hybrid_rrf(docs, emb, ["hash", "spark"], embs[3],
                     k_each=3, k0=60, top=6)
    rows = {r["doc_id"]: r for r in out.take_all()}
    # BM25 list (k=3): docs containing the terms, ranked by score
    bm = {r["doc_id"]: r["bm25_rank"] for r in rows.values()
          if r["bm25_rank"] is not None}
    cos = {r["doc_id"]: r["cos_rank"] for r in rows.values()
           if r["cos_rank"] is not None}
    assert len(bm) <= 3 and len(cos) == 3
    # query embedding == e3 -> cosine rank 1 is vec 3 (exact match)
    assert cos[3] == 1
    for d, r in rows.items():
        exp = (1.0 / (60 + bm[d]) if d in bm else 0.0) \
            + (1.0 / (60 + cos[d]) if d in cos else 0.0)
        assert abs(r["rrf"] - round(exp, 6)) < 1e-12
    # fused order: rrf desc, id asc
    got = [r["doc_id"] for r in out.take_all()]
    key = sorted(rows.values(), key=lambda r: (-r["rrf"], r["doc_id"]))
    assert got == [r["doc_id"] for r in key]


def test_rrf_single_list_docs_rank_below_shared():
    docs, emb, embs = _fixture()
    out = hybrid_rrf(docs, emb, ["hash"], embs[3], k_each=2, k0=60, top=6)
    rows = {r["doc_id"]: r for r in out.take_all()}
    shared = [d for d, r in rows.items()
              if r["bm25_rank"] is not None and r["cos_rank"] is not None]
    single = [d for d, r in rows.items()
              if (r["bm25_rank"] is None) != (r["cos_rank"] is None)]
    if shared and single:
        assert max(rows[d]["rrf"] for d in single) < \
            min(rows[d]["rrf"] for d in shared) + 2 / 60.0
