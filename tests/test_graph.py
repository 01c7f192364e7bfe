"""PageRank + degree stats: parity with the single-process recurrence,
dangling-node mass, duplicate (parallel) edges, and block invariance."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import graph


def _edges(n_nodes=60, n_edges=300, seed=3) -> list[tuple[str, str]]:
    rng = np.random.default_rng(seed)
    # skewed targets (authority hubs) + guaranteed dangling nodes: nodes
    # n-3..n-1 never appear as src
    out = []
    for _ in range(n_edges):
        u = int(rng.integers(0, n_nodes - 3))
        v = int(rng.zipf(1.6)) % n_nodes
        if u == v:
            v = (v + 1) % n_nodes
        out.append((f"h{u:03d}", f"h{v:03d}"))
    out.append((f"h{0:03d}", f"h{n_nodes - 1:03d}"))   # reach a dangler
    return out


def _ds(edge_list, blocks=5):
    t = pa.table({"src": pa.array([u for u, _ in edge_list]),
                  "dst": pa.array([v for _, v in edge_list])})
    return ray.data.from_arrow(t).repartition(blocks)


def test_pagerank_matches_reference():
    el = _edges()
    got = {r["node"]: r["pr"]
           for r in graph.pagerank(_ds(el), iterations=5).take_all()}
    exp = graph.pagerank_reference(el, iterations=5)
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, k
    # ranks form a distribution
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_block_invariant():
    el = _edges(seed=11)
    a = {r["node"]: round(r["pr"], 12)
         for r in graph.pagerank(_ds(el, blocks=2), iterations=3).take_all()}
    b = {r["node"]: round(r["pr"], 12)
         for r in graph.pagerank(_ds(el, blocks=9), iterations=3).take_all()}
    assert a == b


def test_pagerank_parallel_edges_count():
    # two parallel edges u->v must contribute twice u's share
    el = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    got = {r["node"]: r["pr"]
           for r in graph.pagerank(_ds(el, blocks=1),
                                   iterations=4).take_all()}
    exp = graph.pagerank_reference(el, iterations=4)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12
    assert got["b"] > got["c"]


def test_degree_stats():
    el = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]
    rows = {r["node"]: (r["out_degree"], r["in_degree"])
            for r in graph.degree_stats(_ds(el, blocks=2)).take_all()}
    assert rows == {"a": (2, 1), "b": (1, 1), "c": (0, 2), "d": (1, 0)}


def test_triangle_counts_matches_bruteforce():
    """Exact per-node triangle counts, degrees and clustering vs a dense
    numpy adjacency brute force, on a random multigraph with self-loops
    and duplicate/reversed edges (all must be ignored/collapsed)."""
    rng = np.random.default_rng(7)
    n, m = 35, 260
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    t = pa.table({"src": pa.array([f"v{u:02d}" for u in src]),
                  "dst": pa.array([f"v{v:02d}" for v in dst])})
    out = (graph.triangle_counts(ray.data.from_arrow(t).repartition(5),
                                 num_partitions=6)
           .to_pandas().set_index("node"))
    adj = np.zeros((n, n), bool)
    for u, v in zip(src, dst):
        if u != v:
            adj[u, v] = adj[v, u] = True
    tri = (adj @ adj.astype(int) * adj).sum(axis=1) // 2
    deg = adj.sum(axis=1)
    for i in range(n):
        name = f"v{i:02d}"
        if deg[i] == 0:
            assert name not in out.index
            continue
        row = out.loc[name]
        assert row.degree == deg[i] and row.triangles == tri[i], name
        exp = (round(2.0 * tri[i] / (deg[i] * (deg[i] - 1.0)), 9)
               if deg[i] >= 2 else 0.0)
        assert row.clustering == pytest.approx(exp, abs=1e-12), name
    assert out.triangles.sum() == (adj @ adj.astype(int) * adj).sum() // 2


def test_triangle_counts_triangle_free_and_clique():
    """Boundary graphs: a star (0 triangles everywhere) and K5 (every
    node in C(4,2)=6 triangles, clustering 1.0)."""
    star = pa.table({"src": pa.array(["hub"] * 6),
                     "dst": pa.array([f"s{i}" for i in range(6)])})
    out = graph.triangle_counts(
        ray.data.from_arrow(star), num_partitions=4).to_pandas()
    assert (out.triangles == 0).all() and (out.clustering == 0.0).all()
    k5 = [(f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)]
    t = pa.table({"src": pa.array([a for a, _ in k5]),
                  "dst": pa.array([b for _, b in k5])})
    out = graph.triangle_counts(
        ray.data.from_arrow(t), num_partitions=4).to_pandas()
    assert (out.degree == 4).all()
    assert (out.triangles == 6).all()
    assert (out.clustering == 1.0).all()
