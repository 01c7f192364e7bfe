"""IVF-PQ quantized ANN (stages/similarity.py pq_*): ADC scoring parity
with explicit reconstruction, exact-mode == brute force, rerank recall on
clustered data, codes roundtrip through the persisted index, and
layout-invariant builds."""

from __future__ import annotations

import glob
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from e_commerce_batch_etl_pipeline_ray.stages import similarity as S


def _clustered(ncl=16, per=64, dim=32, noise=0.25, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ncl, dim))
    vecs = np.concatenate(
        [c + noise * rng.normal(size=(per, dim)) for c in centers])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    return vecs, t


def test_adc_equals_reconstruction_dot():
    vecs, _ = _clustered()
    vn = S._normalize(vecs)
    cent = S.train_centroids(rd.from_arrow(pa.table({
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})), 8)
    cb = S.train_pq(vecs, cent, m=8, ks=16)
    assign, codes = S.pq_encode(vn, cent, cb)
    m, ks, dsub = cb.shape
    recon = cent[assign].copy()
    for j in range(m):
        recon[:, j * dsub:(j + 1) * dsub] += cb[j][codes[:, j]]
    q = S._normalize(vecs[:3])
    lut = np.einsum("qjd,jkd->qjk", q.reshape(3, m, dsub), cb)
    qc = q @ cent.T
    for qi in range(3):
        adc = lut[qi, np.arange(m)[None, :], codes].sum(axis=1) \
            + qc[qi, assign]
        assert np.allclose(adc, q[qi] @ recon.T, atol=1e-12)


def test_exact_mode_equals_brute():
    vecs, t = _clustered()
    ds = rd.from_arrow(t).repartition(4)
    qids = [0, 100, 500]
    qm = vecs[qids]
    brute = S.knn_brute(ds, (qids, qm), k=10).to_pandas()
    idx = tempfile.mkdtemp(prefix="pq_exact_", dir="/tmp")
    S.pq_index_build(ds, idx, n_centroids=16, m=8, ks=16)
    ex = S.pq_index_search(idx, (qids, qm), k=10, nprobe=16,
                           rerank_ds=ds, rerank_factor=None).to_pandas()
    pd.testing.assert_frame_equal(ex.reset_index(drop=True),
                                  brute.reset_index(drop=True),
                                  check_dtype=False)


def test_rerank_recall_and_compression():
    vecs, t = _clustered(noise=0.3)
    ds = rd.from_arrow(t).repartition(4)
    qids = [0, 100, 500]
    qm = vecs[qids]
    brute = S.knn_brute(ds, (qids, qm), k=10).to_pandas()
    idx = tempfile.mkdtemp(prefix="pq_recall_", dir="/tmp")
    S.pq_index_build(ds, idx, n_centroids=16, m=16, ks=256)
    rr = S.pq_index_search(idx, (qids, qm), k=10, nprobe=4,
                           rerank_ds=ds, rerank_factor=4).to_pandas()
    rec = sum(
        len(set(brute[brute.query_id == q]["neighbor_id"])
            & set(rr[rr.query_id == q]["neighbor_id"])) / 10
        for q in qids) / len(qids)
    assert rec >= 0.9
    # compression: the index stores codes, never float vectors
    files = glob.glob(os.path.join(idx, "_list=*", "*.parquet"))
    idx_bytes = sum(os.path.getsize(f) for f in files)
    raw_bytes = vecs.astype(np.float32).nbytes
    assert idx_bytes < raw_bytes / 2
    for f in files:
        assert "embedding" not in pq.read_schema(f).names


def test_build_is_layout_invariant():
    vecs, t = _clustered(ncl=8, per=32)
    idx_a = tempfile.mkdtemp(prefix="pq_lay_a_", dir="/tmp")
    idx_b = tempfile.mkdtemp(prefix="pq_lay_b_", dir="/tmp")
    S.pq_index_build(rd.from_arrow(t).repartition(2), idx_a,
                     n_centroids=8, m=8, ks=16)
    S.pq_index_build(rd.from_arrow(t).repartition(7), idx_b,
                     n_centroids=8, m=8, ks=16)
    assert np.array_equal(np.load(os.path.join(idx_a, "codebooks.npy")),
                          np.load(os.path.join(idx_b, "codebooks.npy")))

    def _codes(idx):
        files = glob.glob(os.path.join(idx, "_list=*", "*.parquet"))
        tt = pa.concat_tables([pq.read_table(f) for f in files])
        cm = S._codes_matrix(tt["code"], 8)
        return {v: (lst, bytes(cm[i]))
                for i, (v, lst) in enumerate(
                    zip(tt["vec_id"].to_pylist(),
                        tt["list_id"].to_pylist()))}
    assert _codes(idx_a) == _codes(idx_b)


def test_adc_only_path_returns_ranked_rows():
    vecs, t = _clustered(ncl=4, per=32, dim=16)
    ds = rd.from_arrow(t).repartition(2)
    idx = tempfile.mkdtemp(prefix="pq_adc_", dir="/tmp")
    S.pq_index_build(ds, idx, n_centroids=4, m=8, ks=16)
    out = S.pq_index_search(idx, ([0], vecs[[0]]), k=5, nprobe=2).to_pandas()
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    assert out["cosine"].is_monotonic_decreasing
