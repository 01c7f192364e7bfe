"""budget_select (stages/sampling.py): greedy score-ranked prefix under a
weight budget — brute-force parity, straddle-bucket cut, ties, boundaries,
parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.sampling import budget_select


def _brute(ids, scores, weights, budget):
    order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))
    sel, cum = set(), 0
    for i in order:
        if cum + weights[i] > budget:
            break
        cum += weights[i]
        sel.add(ids[i])
    return sel


def _run(ids, scores, weights, budget, blocks=1, nbuckets=16):
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "quality": pa.array(scores, pa.float64()),
                  "n_tokens": pa.array(weights, pa.int64())})
    ds = ray.data.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = budget_select(ds, budget, weight_col="n_tokens",
                        score_col="quality", id_col="doc_id",
                        nbuckets=nbuckets)
    return {r["doc_id"] for r in out.take_all()}


def test_brute_parity_random():
    rng = np.random.RandomState(7)
    n = 300
    ids = list(range(n))
    scores = np.round(rng.rand(n), 3).tolist()   # coarse -> many ties
    weights = rng.randint(1, 50, n).tolist()
    total = sum(weights)
    for frac in (0.0, 0.1, 0.5, 0.9, 1.0):
        budget = int(total * frac)
        exp = _brute(ids, scores, weights, budget)
        got = _run(ids, scores, weights, budget, blocks=5, nbuckets=8)
        assert got == exp, (frac, len(got), len(exp))


def test_exact_boundary_inclusive():
    # the row that lands the cumsum EXACTLY on the budget is kept
    ids = [0, 1, 2]
    scores = [0.9, 0.5, 0.1]
    weights = [10, 10, 10]
    assert _run(ids, scores, weights, 20) == {0, 1}
    assert _run(ids, scores, weights, 19) == {0}
    assert _run(ids, scores, weights, 9) == set()


def test_tie_broken_by_id():
    ids = [5, 3, 9]
    scores = [0.5, 0.5, 0.5]       # one bucket, pure id order
    weights = [10, 10, 10]
    assert _run(ids, scores, weights, 20) == {3, 5}


def test_parallelism_invariance():
    rng = np.random.RandomState(11)
    n = 200
    ids = list(range(n))
    scores = np.round(rng.rand(n), 2).tolist()
    weights = rng.randint(1, 20, n).tolist()
    budget = sum(weights) // 3
    exp = _run(ids, scores, weights, budget, blocks=1, nbuckets=4)
    for blocks in (3, 8):
        assert _run(ids, scores, weights, budget, blocks=blocks,
                    nbuckets=32) == exp


def test_null_scores_never_selected():
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "quality": pa.array([0.9, None, 0.8], pa.float64()),
                  "n_tokens": pa.array([5, 5, None], pa.int64())})
    out = budget_select(ray.data.from_arrow(t), 100, weight_col="n_tokens",
                        score_col="quality", id_col="doc_id")
    assert {r["doc_id"] for r in out.take_all()} == {0}


def test_range_derivation_and_warning():
    """ADVICE r4: lo=None/hi=None derives the bucket range from a min/max
    pre-pass; an explicit range missing observed scores warns (selection
    stays exact either way)."""
    import warnings

    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "n_tokens": pa.array([10] * 8, pa.int64()),
        "score": pa.array([5.0, 4.0, 3.5, 3.0, 2.5, 2.0, 1.5, 1.0]),
    })
    ds = ray.data.from_arrow(t)
    out = budget_select(ds, 30, weight_col="n_tokens", score_col="score",
                        id_col="doc_id", lo=None, hi=None)
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == [0, 1, 2]            # top-3 scores fill the 30 budget
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out2 = budget_select(ray.data.from_arrow(t), 30,
                             weight_col="n_tokens", score_col="score",
                             id_col="doc_id", lo=0.0, hi=1.0)
        got2 = sorted(r["doc_id"] for r in out2.take_all())
    assert got2 == [0, 1, 2]           # clipping never changes selection
    assert any(issubclass(x.category, RuntimeWarning)
               and "outside the declared range" in str(x.message)
               for x in w)


def test_nonfinite_scores_excluded():
    """Finite-score contract (documented): NaN and +/-inf rows are never
    selected."""
    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "n_tokens": pa.array([10] * 5, pa.int64()),
        "score": pa.array([float("inf"), float("nan"), 0.9, 0.8,
                           float("-inf")]),
    })
    out = budget_select(ray.data.from_arrow(t), 20, weight_col="n_tokens",
                        score_col="score", id_col="doc_id",
                        lo=None, hi=None)
    assert sorted(r["doc_id"] for r in out.take_all()) == [2, 3]


def test_grouped_budget_matches_per_group_brute():
    """budget_select_grouped == per-group brute greedy prefix; groups
    absent from the budget map are dropped; parallelism-invariant."""
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        budget_select_grouped,
    )
    rng = np.random.default_rng(9)
    n = 120
    groups = rng.choice(["a", "b", "c"], size=n)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "g": pa.array(groups, pa.string()),
        "w": pa.array(rng.integers(1, 30, size=n), pa.int64()),
        "score": pa.array(np.round(rng.uniform(0, 1, size=n), 4)),
    })
    budgets = {"a": 150, "b": 40}          # c dropped

    def brute():
        keep = []
        for g, b in budgets.items():
            rows = [(i, s, w) for i, gg, s, w in
                    zip(t["doc_id"].to_pylist(), t["g"].to_pylist(),
                        t["score"].to_pylist(), t["w"].to_pylist())
                    if gg == g]
            rows.sort(key=lambda r: (-r[1], r[0]))
            cum = 0
            for i, s, w in rows:
                cum += w
                if cum > b:
                    break
                keep.append(i)
        return sorted(keep)

    exp = brute()
    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = budget_select_grouped(ds, budgets, group_col="g",
                                    weight_col="w", score_col="score",
                                    id_col="doc_id", nbuckets=16)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == exp, (blocks, got, exp)


# --- hypothesis property ---------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(min_value=1, max_value=20),
                  st.floats(min_value=0.0, max_value=1.0,
                            allow_nan=False, width=32)),
        min_size=1, max_size=40),
    budgets=st.fixed_dictionaries(
        {"a": st.integers(min_value=0, max_value=120),
         "b": st.integers(min_value=0, max_value=120)}),
)
def test_grouped_budget_brute_hypothesis(rows, budgets):
    """Property: budget_select_grouped == the per-group greedy prefix for
    arbitrary (group, weight, score) rows and budgets — group 'c' never
    budgeted, score ties broken by id."""
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        budget_select_grouped,
    )
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "g": pa.array([r[0] for r in rows], pa.string()),
        "w": pa.array([r[1] for r in rows], pa.int64()),
        "score": pa.array([float(r[2]) for r in rows], pa.float64()),
    })

    keep = []
    for g, b in budgets.items():
        sub = [(i, rows[i][2], rows[i][1]) for i in range(len(rows))
               if rows[i][0] == g]
        sub.sort(key=lambda r: (-r[1], r[0]))
        cum = 0
        for i, s, w in sub:
            cum += w
            if cum > b:
                break
            keep.append(i)

    ds = ray.data.from_arrow(t).repartition(3)
    out = budget_select_grouped(ds, budgets, group_col="g",
                                weight_col="w", score_col="score",
                                id_col="doc_id", nbuckets=8)
    assert sorted(r["doc_id"] for r in out.take_all()) == sorted(keep)
