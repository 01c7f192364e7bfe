"""Distributed graph operators over an edge table — PageRank, the
host/domain authority signal web-crawl training pipelines (Common-Crawl
style) use for quality weighting.

The graph is a Dataset of ``(src, dst)`` edges. Iterations are the
standard power method with explicit dangling-node mass:

    pr'(v) = (1-d)/N + d * ( sum_{(u,v) in E} pr(u)/outdeg(u)
                             + dangling_mass / N )

Each iteration = TWO co-partitioned groupbys (the Pregel superstep
shape): a SCATTER on src — state and edge rows meet in the source's hash
partition, contributions pre-summed per destination before leaving — and
a GATHER on dst folding contributions into the rank rows. Edges are
tagged+partitioned once and re-shuffled per superstep; nothing is ever
collected on the driver. ``dangling_mass`` (total rank of nodes with no
out-edges) is a tiny per-iteration aggregate. (A Dataset.join-based
variant measured ~3x slower at small scale — per-join fixed costs — with
identical shuffle bytes at scale.)

Iterative fixpoints are not SQL-expressible in general, but the FIXED
iteration count is: the q108 oracle replays the identical recurrence as a
chain of k CTEs in DuckDB.

Related: transitive dedup's min-label propagation (stages/neardup.py)
uses the same join-update-iterate pattern with a different monoid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import aggregates, joins
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
    collect_arrow,
    detach,
    ensure_schema,
)


def _nodes(edges: ray.data.Dataset, src: str, dst: str,
           num_partitions: int) -> ray.data.Dataset:
    """Distinct node set (src union dst), distributed."""
    s = edges.map_batches(
        lambda t: pa.table({"node": pc.unique(t[src].combine_chunks())}),
        batch_format="pyarrow", zero_copy_batch=True)
    d = edges.map_batches(
        lambda t: pa.table({"node": pc.unique(t[dst].combine_chunks())}),
        batch_format="pyarrow", zero_copy_batch=True)
    both = s.union(d)
    uniq = both.groupby("node").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")
    node_schema = pa.schema([("node", both.schema().base_schema.field(0).type)])
    return detach(uniq, node_schema)


def pagerank(edges: ray.data.Dataset, iterations: int = 5,
             damping: float = 0.85, src: str = "src", dst: str = "dst",
             num_partitions: int = 16,
             round_to: int | None = None) -> ray.data.Dataset:
    """``iterations`` synchronous power-method steps from the uniform
    start; returns (node, pr). Deterministic given the edge multiset
    (duplicate edges count as parallel links, matching the SQL replay)."""
    nodes = _nodes(edges, src, dst, num_partitions).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "pr": pa.array([], pa.float64())}))

    outdeg = aggregates.grouped_aggregate(
        [src], [("count", None, "outdeg")]).apply(edges)
    outdeg = outdeg.map_batches(
        lambda t: pa.table({"node": t[src],
                            "outdeg": pc.cast(t["outdeg"], pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    # rank state: node, pr, outdeg (0.0 for dangling)
    state = joins.hash_join(outdeg, on=["node"], join_type="left_outer",
                            num_partitions=num_partitions).apply(nodes)
    state = state.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "pr": pa.array([1.0 / n] * t.num_rows, pa.float64()),
            "outdeg": pc.fill_null(t["outdeg"], 0.0)}),
        batch_format="pyarrow", zero_copy_batch=True)
    state_schema = pa.schema([
        ("node", nodes.schema().base_schema.field("node").type),
        ("pr", pa.float64()), ("outdeg", pa.float64())])
    state = detach(state.materialize(), state_schema)

    base = (1.0 - damping) / n
    node_type = state_schema.field("node").type
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    # Each iteration is TWO co-partitioned groupbys (scatter on src,
    # gather on dst) over a tagged union of state and edge/contribution
    # rows — the Pregel superstep shape. A Dataset.join-based variant
    # measured ~3x slower at small scale (per-join fixed costs dominate;
    # the q6 note) with identical shuffle bytes at large scale.
    # tagged-union layout: _gpid, _kind, a (node|src|dst), b (edge dst),
    # pr (rank | contribution mass), outdeg
    def _tag(kind: str, a_col: str, b_col: str | None):
        def _fn(t: pa.Table) -> pa.Table:
            out = pa.table({
                "_kind": pa.array([kind] * t.num_rows),
                "a": t[a_col].combine_chunks().cast(node_type),
                "b": (t[b_col].combine_chunks().cast(node_type)
                      if b_col else pa.nulls(t.num_rows, node_type)),
                "pr": (pc.cast(t["pr"], pa.float64())
                       if "pr" in t.column_names
                       else pa.nulls(t.num_rows, pa.float64())),
                "outdeg": (t["outdeg"] if "outdeg" in t.column_names
                           else pa.nulls(t.num_rows, pa.float64())),
            })
            pid = hash_partition_ids(out, ["a"], num_partitions)
            return pa.table({"_gpid": pa.array(pid, pa.int32()),
                             **{c: out[c] for c in out.column_names}})
        return _fn

    edges_tagged = edges.map_batches(
        _tag("e", src, dst), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def _scatter(g: pa.Table) -> pa.Table:
        is_s = pc.equal(g["_kind"], "s")
        st = g.filter(is_s)
        ed = g.filter(pc.invert(is_s))
        if ed.num_rows == 0 or st.num_rows == 0:
            return pa.table({"node": pa.array([], node_type),
                             "pr": pa.array([], pa.float64())})
        pos = pc.index_in(ed["a"].combine_chunks(),
                          value_set=st["a"].combine_chunks())
        w = pc.divide(st["pr"].take(pos), st["outdeg"].take(pos))
        out = pa.table({"node": ed["b"], "w": w})
        # combiner: pre-sum per destination inside the partition; the
        # contribution mass rides the "pr" slot of the tagged union
        agg = out.group_by("node").aggregate([("w", "sum")])
        return pa.table({"node": agg["node"], "pr": agg["w_sum"]})

    def _gather_factory(add: float):
        def _gather(g: pa.Table) -> pa.Table:
            is_s = pc.equal(g["_kind"], "s")
            st = g.filter(is_s)
            co = g.filter(pc.invert(is_s))
            if st.num_rows == 0:
                return pa.table({"node": pa.array([], node_type),
                                 "pr": pa.array([], pa.float64()),
                                 "outdeg": pa.array([], pa.float64())})
            sums = co.select(["a", "pr"]).group_by("a").aggregate(
                [("pr", "sum")]) if co.num_rows else None
            if sums is not None and sums.num_rows:
                pos = pc.index_in(st["a"].combine_chunks(),
                                  value_set=sums["a"].combine_chunks())
                in_sum = pc.fill_null(sums["pr_sum"].combine_chunks()
                                      .take(pos), 0.0)
            else:
                in_sum = pa.array([0.0] * st.num_rows, pa.float64())
            pr = pc.add(pc.multiply(in_sum, pa.scalar(damping)),
                        pa.scalar(add))
            return pa.table({"node": st["a"], "pr": pr,
                             "outdeg": st["outdeg"]})
        return _gather

    for _ in range(iterations):
        # tiny per-iteration scalar: total rank parked on dangling nodes
        dang = state.map_batches(
            lambda t: pa.table({"m": pa.array(
                [pc.sum(pc.if_else(pc.equal(t["outdeg"], 0.0), t["pr"],
                                   pa.scalar(0.0))).as_py() or 0.0],
                pa.float64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        dangling_mass = sum(r["m"] for r in dang.take_all())
        add = base + damping * dangling_mass / n

        state_tagged = state.map_batches(
            _tag("s", "node", None), batch_format="pyarrow",
            zero_copy_batch=True)
        # pin the map_groups outputs (empty sort partitions emit
        # zero-column bundles whose schema flips per bundle — the benign
        # but noisy Ray 2.49 RefBundle warning; a fused ensure_schema
        # map normalizes them, no barrier)
        scatter_schema = pa.schema([("node", node_type),
                                    ("pr", pa.float64())])
        contrib = state_tagged.union(edges_tagged).groupby(
            "_gpid").map_groups(_scatter, batch_format="pyarrow") \
            .map_batches(ensure_schema(scatter_schema),
                         batch_format="pyarrow", zero_copy_batch=True)
        contrib_tagged = contrib.map_batches(
            _tag("c", "node", None), batch_format="pyarrow",
            zero_copy_batch=True)
        state = detach(
            state_tagged.union(contrib_tagged).groupby("_gpid").map_groups(
                _gather_factory(add), batch_format="pyarrow")
            .materialize(), state_schema)

    out = state.select_columns(["node", "pr"])
    if round_to is not None:
        from e_commerce_batch_etl_pipeline_ray.functions.scalar import round2

        def _round(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"],
                             "pr": round2(t["pr"], round_to)})
        out = out.map_batches(_round, batch_format="pyarrow",
                              zero_copy_batch=True)
    return out


def degree_stats(edges: ray.data.Dataset, src: str = "src",
                 dst: str = "dst") -> ray.data.Dataset:
    """Per-node (out_degree, in_degree) in two grouped counts + one outer
    join — the quick structural profile before heavier graph work."""
    out_d = aggregates.grouped_aggregate(
        [src], [("count", None, "out_degree")]).apply(edges)
    out_d = out_d.map_batches(
        lambda t: pa.table({"node": t[src], "out_degree": t["out_degree"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    in_d = aggregates.grouped_aggregate(
        [dst], [("count", None, "in_degree")]).apply(edges)
    in_d = in_d.map_batches(
        lambda t: pa.table({"node": t[dst], "in_degree": t["in_degree"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = out_d.join(in_d, join_type="full_outer", on=("node",),
                        num_partitions=8)
    return joined.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "out_degree": pc.fill_null(t["out_degree"], 0),
            "in_degree": pc.fill_null(t["in_degree"], 0)}),
        batch_format="pyarrow", zero_copy_batch=True)


def pagerank_reference(edge_list: list[tuple], iterations: int = 5,
                       damping: float = 0.85) -> dict:
    """Single-process replay oracle (tests): identical recurrence in plain
    Python floats."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    outdeg: dict = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(p for v, p in pr.items() if outdeg.get(v, 0) == 0)
        nxt = {v: (1.0 - damping) / n + damping * dangling / n
               for v in nodes}
        for u, v in edge_list:
            nxt[v] += damping * pr[u] / outdeg[u]
        pr = nxt
    return pr


def triangle_counts(edges: ray.data.Dataset, src: str = "src",
                    dst: str = "dst", num_partitions: int = 32,
                    round_to: int | None = 9) -> ray.data.Dataset:
    """Per-node TRIANGLE COUNTS + local clustering coefficient over the
    UNDIRECTED simple graph induced by the edge table (direction and
    duplicates dropped; self-loops ignored). Returns
    (node, degree, triangles, clustering) for every node.

    Scale shape — the compact-forward (degree-ordered) node iterator:

    1. canonicalize + distinct (one partial-agg shuffle);
    2. degrees (one grouped count), attached to both endpoints (two
       hash joins on node);
    3. ORIENT each edge from its (degree, node)-smaller endpoint — the
       skew armor: every out-neighborhood is O(sqrt(m)), so a celebrity
       node with 10^6 neighbors generates wedges at its FOLLOWERS'
       small out-degrees, never 10^12 pairs at its own;
    4. wedges per tail partition (vectorized triu pairs per group),
       each pair emitted in (degree, node) order;
    5. close wedges against the oriented edge set in one co-partitioned
       merge on the pair key — each triangle found exactly once, at its
       order-minimum vertex — crediting all three corners with
       partition-local pre-aggregation;
    6. grouped sum + left join back onto the degree table (zero-triangle
       nodes kept), clustering = 2T / (d (d-1)).

    The count is exact; the q126 oracle replays it with the canonical
    a<b<c three-way self-join in SQL."""
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    node_type = edges.schema().base_schema.field(src).type

    def _canon(t: pa.Table) -> pa.Table:
        less = pc.less(t[src], t[dst])
        a = pc.if_else(less, t[src], t[dst])
        b = pc.if_else(less, t[dst], t[src])
        keep = pc.invert(pc.equal(t[src], t[dst]))
        return pa.table({"a": a, "b": b}).filter(pc.fill_null(keep, False))

    e = edges.map_batches(_canon, batch_format="pyarrow",
                          zero_copy_batch=True)
    e = aggregates.grouped_aggregate(
        ["a", "b"], [("count", None, "_n")]).apply(e)
    e = e.map_batches(lambda t: t.select(["a", "b"]),
                      batch_format="pyarrow", zero_copy_batch=True)
    e = detach(e.materialize(),
               pa.schema([("a", node_type), ("b", node_type)]))

    ends = e.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)
    deg = aggregates.grouped_aggregate(
        ["node"], [("count", None, "degree")]).apply(ends)
    deg = detach(deg.materialize(),
                 pa.schema([("node", node_type), ("degree", pa.int64())]))

    # attach endpoint degrees (hash joins on node — the static attach,
    # same shape pagerank uses for outdeg)
    ea = e.map_batches(lambda t: t.rename_columns(["node", "b"]),
                       batch_format="pyarrow", zero_copy_batch=True)
    ea = joins.hash_join(deg, on=["node"], join_type="inner",
                         num_partitions=num_partitions).apply(ea)
    ea = ea.map_batches(
        lambda t: pa.table({"a": t["node"], "b": t["b"],
                            "deg_a": t["degree"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    ea = detach(ea.materialize(), pa.schema(
        [("a", node_type), ("b", node_type), ("deg_a", pa.int64())]))
    eb = ea.map_batches(
        lambda t: pa.table({"node": t["b"], "a": t["a"],
                            "deg_a": t["deg_a"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    eb = joins.hash_join(deg, on=["node"], join_type="inner",
                         num_partitions=num_partitions).apply(eb)

    def _orient(t: pa.Table) -> pa.Table:
        # tail = (degree, node)-smaller endpoint
        a, b = t["a"], t["node"]
        da, db = t["deg_a"], t["degree"]
        fwd = pc.or_(pc.less(da, db),
                     pc.and_(pc.equal(da, db), pc.less(a, b)))
        out = pa.table({
            "tail": pc.if_else(fwd, a, b),
            "head": pc.if_else(fwd, b, a),
            "deg_head": pc.if_else(fwd, db, da),
        })
        pid = hash_partition_ids(out, ["tail"], num_partitions)
        return out.append_column("_pid", pa.array(pid, pa.int32()))

    oriented = eb.map_batches(_orient, batch_format="pyarrow",
                              zero_copy_batch=True)
    oriented = detach(oriented.materialize(), pa.schema(
        [("tail", node_type), ("head", node_type),
         ("deg_head", pa.int64()), ("_pid", pa.int32())]))

    def _wedges(g: pa.Table) -> pa.Table:
        df = (g.select(["tail", "head", "deg_head"]).to_pandas()
              .sort_values(["tail", "deg_head", "head"], kind="mergesort"))
        tails = df["tail"].to_numpy()
        heads = df["head"].to_numpy()
        starts = np.flatnonzero(np.r_[True, tails[1:] != tails[:-1]])
        bounds = np.r_[starts, len(tails)]
        xs, ys, cs = [], [], []
        for s, t_ in zip(bounds[:-1], bounds[1:]):
            m = t_ - s
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            xs.append(heads[s + i])       # rows sorted by (deg, node):
            ys.append(heads[s + j])       # pair already in orient order
            cs.append(np.repeat(tails[s], len(i)))
        if not xs:
            return pa.table({"x": pa.array([], node_type),
                             "y": pa.array([], node_type),
                             "center": pa.array([], node_type)})
        return pa.table({"x": pa.array(np.concatenate(xs)).cast(node_type),
                         "y": pa.array(np.concatenate(ys)).cast(node_type),
                         "center": pa.array(np.concatenate(cs))
                         .cast(node_type)})

    wedges = oriented.groupby("_pid").map_groups(
        _wedges, batch_format="pyarrow")

    def _tag_pairs(kind: str, x: str, y: str, center: str | None):
        def _fn(t: pa.Table) -> pa.Table:
            out = pa.table({
                "_kind": pa.array([kind] * t.num_rows),
                "x": t[x].combine_chunks().cast(node_type),
                "y": t[y].combine_chunks().cast(node_type),
                "center": (t[center].combine_chunks().cast(node_type)
                           if center else pa.nulls(t.num_rows, node_type)),
            })
            pid = hash_partition_ids(out, ["x", "y"], num_partitions)
            return out.append_column("_cpid", pa.array(pid, pa.int32()))
        return _fn

    tagged = wedges.map_batches(
        _tag_pairs("w", "x", "y", "center"), batch_format="pyarrow",
        zero_copy_batch=True).union(oriented.map_batches(
            _tag_pairs("e", "tail", "head", None), batch_format="pyarrow",
            zero_copy_batch=True))

    def _close(g: pa.Table) -> pa.Table:
        is_e = pc.equal(g["_kind"], "e")
        ed = g.filter(is_e).select(["x", "y"]).to_pandas()
        wd = g.filter(pc.invert(is_e)).select(["x", "y",
                                               "center"]).to_pandas()
        if not len(ed) or not len(wd):
            return pa.table({"node": pa.array([], node_type),
                             "cnt": pa.array([], pa.int64())})
        hit = wd.merge(ed.drop_duplicates(), on=["x", "y"], how="inner")
        credits = pd.concat([hit["center"], hit["x"], hit["y"]],
                            ignore_index=True).value_counts()
        return pa.table({
            "node": pa.array(credits.index.to_numpy()).cast(node_type),
            "cnt": pa.array(credits.to_numpy(), pa.int64())})

    credits = tagged.groupby("_cpid").map_groups(
        _close, batch_format="pyarrow")
    tri = aggregates.grouped_aggregate(
        ["node"], [("sum", "cnt", "triangles")]).apply(credits)
    tri = detach(tri.materialize(), pa.schema(
        [("node", node_type), ("triangles", pa.int64())]))

    # Ray 2.49 Dataset.join breaks on an all-empty side (the detach
    # docstring's count()-first contract) — a triangle-free graph is a
    # legitimate input, so fall back to a null column instead of joining
    if tri.count() == 0:
        out = deg.map_batches(
            lambda t: t.append_column(
                "triangles", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        out = joins.hash_join(tri, on=["node"], join_type="left_outer",
                              num_partitions=num_partitions).apply(deg)

    def _final(t: pa.Table) -> pa.Table:
        d = t["degree"].combine_chunks().to_numpy().astype(np.float64)
        tr = pc.fill_null(t["triangles"], 0).combine_chunks().to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            c = 2.0 * tr / (d * (d - 1.0))
        c = np.where(d >= 2, c, 0.0)
        cl = pa.array(c, pa.float64())
        if round_to is not None:
            from e_commerce_batch_etl_pipeline_ray.functions.scalar import (
                round2,
            )
            cl = round2(cl, round_to)
        return pa.table({"node": t["node"], "degree": t["degree"],
                         "triangles": pa.array(tr, pa.int64()),
                         "clustering": cl})

    return out.map_batches(_final, batch_format="pyarrow",
                           zero_copy_batch=True)
