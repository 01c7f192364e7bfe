"""SemDeDup-style semantic dedup (neardup.semantic_dedup_pairs): exact
mode (n_clusters=1) == brute all-pairs, clustered mode recovers planted
near-identical pairs and only ever emits a SUBSET of the all-pairs
relation, layout invariance, and the SRP operator is unchanged by the
shared-kernel refactor."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import neardup

DIM = 16
N = 240
THRESH = 0.95


def _corpus(n=N, planted=12, seed=3):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, DIM)
    ids = list(range(n))
    rows = [{"vec_id": i, "embedding": v[i].tolist()} for i in ids]
    # planted near-identical copies of the first `planted` vectors
    for i in range(planted):
        w = v[i] * (1.0 + 0.001 * np.cos(np.arange(1, DIM + 1)))
        rows.append({"vec_id": 100000 + i, "embedding": w.tolist()})
    return rows


def _brute_pairs(rows):
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sim = mn @ mn.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sim[i, j] >= THRESH:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b))
    return out


def _got(ds):
    return {(r["id_a"], r["id_b"]) for r in ds.take_all()}


def test_exact_mode_equals_brute(tmp_path, ray_session):
    rows = _corpus()
    expected = _brute_pairs(rows)
    assert len(expected) >= 12
    got = _got(neardup.semantic_dedup_pairs(
        ray.data.from_items(rows).repartition(5), n_clusters=1,
        threshold=THRESH))
    assert got == expected


def test_clustered_mode_recovers_planted_and_is_subset(tmp_path,
                                                       ray_session):
    rows = _corpus()
    expected = _brute_pairs(rows)
    got = _got(neardup.semantic_dedup_pairs(
        ray.data.from_items(rows).repartition(5), n_clusters=8,
        threshold=THRESH))
    # never invents a pair (within-cluster cosine is exact)
    assert got <= expected
    # the planted near-identical copies are cosine ~0.9999 — a k-means
    # boundary cannot split them (both map to the same nearest centroid
    # up to float noise), so every planted pair is recovered
    planted = {(i, 100000 + i) for i in range(12)}
    assert planted <= expected and planted <= got


def test_layout_invariance(tmp_path, ray_session):
    rows = _corpus()
    a = _got(neardup.semantic_dedup_pairs(
        ray.data.from_items(rows).repartition(2), n_clusters=6))
    b = _got(neardup.semantic_dedup_pairs(
        ray.data.from_items(rows).repartition(9), n_clusters=6))
    assert a == b


def test_id_type_guard(tmp_path, ray_session):
    bad = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(["a", "b"], pa.string()),
        "embedding": pa.array([[0.0] * DIM, [1.0] * DIM]),
    }))
    with pytest.raises(Exception, match="semantic_dedup_pairs"):
        neardup.semantic_dedup_pairs(bad, n_clusters=1).take_all()


def test_srp_operator_unchanged_by_shared_kernel(tmp_path, ray_session):
    rows = _corpus()
    expected = _brute_pairs(rows)
    got = _got(neardup.embedding_neardup_pairs(
        ray.data.from_items(rows).repartition(5), dim=DIM,
        threshold=THRESH, n_planes=6, n_tables=8))
    # recall-complete operating point: subset + planted recovered
    assert got <= expected
    assert {(i, 100000 + i) for i in range(12)} <= got
