"""PageRank + degree stats: parity with the single-process recurrence,
dangling-node mass, duplicate (parallel) edges, and block invariance."""

from __future__ import annotations

import numpy as np
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
