"""BM25 top-k retrieval over a document corpus — the IR scoring loop a
training-data pipeline uses for quality-by-query probes and eval-set
curation.

Two streamed passes, no shuffle of document data:
  1. corpus statistics (one combiner pass): per block, each query term's
     document frequency plus doc count and total token count — a handful
     of numbers per block, folded on the driver;
  2. scoring: idf/avglen broadcast, every block computes tf per term
     VECTORIZED (one equality kernel over the flattened token child array
     + a bincount per term — no per-doc Python), scores with the BM25
     formula, and keeps a local top-k; a tiny reduce merges block top-ks.

Tokenization is exact whitespace split (the corpus is space-separated
words); scores use the classic Robertson idf ln((N - df + .5)/(df + .5)
+ 1) with k1/b defaults 1.2/0.75.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _tokens_of(t: pa.Table, text_col: str):
    """(flattened token array, doc offsets, doc lengths) for a batch."""
    toks = pc.split_pattern(
        pc.coalesce(t[text_col].combine_chunks(), pa.scalar("")), " ")
    raw_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values
    flat = values.slice(raw_off[0], raw_off[-1] - raw_off[0])
    roff = raw_off - raw_off[0]
    lens = roff[1:] - roff[:-1]
    return flat, roff, lens


def _tf_matrix(flat, roff, n_docs: int, terms: list[str]) -> np.ndarray:
    """(len(terms), n_docs) term-frequency counts, fully vectorized."""
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64),
                       (roff[1:] - roff[:-1]))
    out = np.zeros((len(terms), n_docs), dtype=np.int64)
    for i, term in enumerate(terms):
        hit = pc.equal(flat, term)
        hit = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
        if hit.any():
            out[i] = np.bincount(doc_of[hit], minlength=n_docs)
    return out


def bm25_topk(ds: ray.data.Dataset, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text",
              round_to: int | None = None) -> ray.data.Dataset:
    """Top-``k`` documents by BM25 score for ``query_terms`` —
    ``(id_col, score)`` sorted score desc, id asc (deterministic ties)."""
    terms = list(query_terms)

    def _stats(t: pa.Table) -> pa.Table:
        flat, roff, lens = _tokens_of(t, text_col)
        tf = _tf_matrix(flat, roff, t.num_rows, terms)
        return pa.table({
            "term_df": pa.array([(tf > 0).sum(axis=1)],
                                pa.list_(pa.int64())),
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "total_len": pa.array([int(lens.sum())], pa.int64()),
        })

    parts = ds.map_batches(_stats, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total_len = sum(r["total_len"] for r in parts)
    df = np.zeros(len(terms), dtype=np.int64)
    for r in parts:
        df += np.asarray(r["term_df"], dtype=np.int64)
    if n_docs == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avglen = total_len / n_docs
    idf = np.array([math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
                    for d in df])

    def _score(t: pa.Table) -> pa.Table:
        flat, roff, lens = _tokens_of(t, text_col)
        tf = _tf_matrix(flat, roff, t.num_rows, terms).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * lens / avglen)
        with np.errstate(invalid="ignore", divide="ignore"):
            score = (idf[:, None] * tf * (k1 + 1.0) / denom).sum(axis=0)
        score = np.nan_to_num(score, nan=0.0)
        if round_to is not None:
            # HALF_UP to mirror SQL ROUND
            from e_commerce_batch_etl_pipeline_ray.functions.scalar import (
                round2,
            )
            arr = round2(pa.array(score, pa.float64()), round_to)
        else:
            arr = pa.array(score, pa.float64())
        out = pa.table({id_col: t[id_col], "score": arr})
        # local top-k: block egress is k rows, not the block
        idx = pc.sort_indices(out, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
        return out.take(idx.slice(0, k))

    scored = ds.map_batches(_score, batch_format="pyarrow",
                            zero_copy_batch=True)
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    all_local = collect_arrow(scored)
    idx = pc.sort_indices(all_local, sort_keys=[("score", "descending"),
                                                (id_col, "ascending")])
    return ray.data.from_arrow(all_local.take(idx.slice(0, k)))


# ---------------------------------------------------------------------------
# Persisted inverted index: term-partitioned postings on disk, query-time
# reads touch ONLY the query terms' partitions (and, inside each file,
# only the row groups whose term stats overlap — postings are term-sorted).
# The 100-TB shape of bm25_topk: build once (one tokenize pass + one
# posting shuffle), then any query costs O(query-term postings), not a
# corpus scan. Mirrors the IVF persisted index pattern
# (stages/similarity.py) on the text side.
#
# Layout under index_dir:
#   part-PPPPP.parquet   postings (term, doc_id, tf, dl) sorted by term
#   meta.json            {num_partitions, n_docs, total_len}

def build_inverted_index(ds: ray.data.Dataset, index_dir: str,
                         num_partitions: int = 16, id_col: str = "doc_id",
                         text_col: str = "text") -> dict:
    """One streamed pass: tokenize each batch, reduce to unique
    (term, doc, tf) postings VECTORIZED (pyarrow group_by inside the
    batch), hash-partition by term, one sorted parquet file per
    partition. Posting rows carry the doc length so BM25 scoring never
    needs a second table."""
    import json
    import os

    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    os.makedirs(index_dir, exist_ok=True)

    def _postings(t: pa.Table) -> pa.Table:
        flat, roff, lens = _tokens_of(t, text_col)
        n = t.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64),
                           (roff[1:] - roff[:-1]))
        pairs = pa.table({"term": flat,
                          "_docidx": pa.array(doc_of, pa.int64())})
        agg = pairs.group_by(["term", "_docidx"]).aggregate(
            [([], "count_all")])
        idxs = agg["_docidx"].combine_chunks()
        out = pa.table({
            "term": agg["term"],
            id_col: t[id_col].take(idxs),
            "tf": pc.cast(agg["count_all"], pa.int64()),
            "dl": pa.array(lens, pa.int64()).take(idxs),
        })
        pid = hash_partition_ids(out, ["term"], num_partitions)
        return out.append_column("_ipid", pa.array(pid, pa.int32()))

    def _write(group: pa.Table) -> pa.Table:
        pid = group["_ipid"][0].as_py()
        t = group.drop_columns(["_ipid"])
        t = t.sort_by([("term", "ascending"), (id_col, "ascending")])
        path = os.path.join(index_dir, f"part-{pid:05d}.parquet")
        wip = f"{path}.wip.{os.getpid()}"
        pq.write_table(t, wip, row_group_size=4096)
        os.replace(wip, path)
        return pa.table({"partition": pa.array([pid], pa.int32()),
                         "n_postings": pa.array([t.num_rows], pa.int64())})

    # corpus stats in the same tokenize pass would double-count after the
    # shuffle; a separate cheap stats pass keeps the build two clean stages
    def _stats(t: pa.Table) -> pa.Table:
        _, _, lens = _tokens_of(t, text_col)
        return pa.table({"n_docs": pa.array([t.num_rows], pa.int64()),
                         "total_len": pa.array([int(lens.sum())], pa.int64())})

    stats = ds.map_batches(_stats, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n_docs = sum(r["n_docs"] for r in stats)
    total_len = sum(r["total_len"] for r in stats)

    lineage = collect_arrow(
        ds.map_batches(_postings, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_ipid").map_groups(_write, batch_format="pyarrow"))
    meta = {"num_partitions": num_partitions, "n_docs": n_docs,
            "total_len": total_len, "id_col": id_col,
            "n_postings": int(sum(lineage["n_postings"].to_pylist()))}
    tmp = os.path.join(index_dir, "meta.json.wip")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def _read_postings(index_dir: str, terms: list[str]) -> tuple:
    """(postings Dataset pruned to the query terms' partitions + row
    groups, meta dict, files_touched)."""
    import json
    import os

    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    term_t = pa.table({"term": pa.array(terms, pa.string())})
    pids = sorted({int(p) for p in hash_partition_ids(
        term_t, ["term"], meta["num_partitions"])})
    files = [os.path.join(index_dir, f"part-{pid:05d}.parquet")
             for pid in pids]
    files = [f for f in files if os.path.exists(f)]
    terms_json = list(terms)

    def _load(batch: pa.Table) -> pa.Table:
        out = []
        for fpath in batch["file"].to_pylist():
            out.append(pq.read_table(
                fpath, filters=[[("term", "in", terms_json)]]))
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    if not files:
        empty = pa.table({"term": pa.array([], pa.string()),
                          meta["id_col"]: pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64()),
                          "dl": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty), meta, 0
    ds = ray.data.from_items([{"file": f} for f in files]).map_batches(
        _load, batch_format="pyarrow", batch_size=1)
    return ds, meta, len(files)


def bm25_topk_indexed(index_dir: str, query_terms: list[str], k: int = 10,
                      k1: float = 1.2, b: float = 0.75,
                      round_to: int | None = None) -> ray.data.Dataset:
    """BM25 top-k straight off the persisted index: reads only the query
    terms' posting partitions, folds df per term (tiny), scores each
    posting row-locally, sums per doc with the pre-aggregated combiner
    plan, rounds AFTER the sum (bm25_topk parity). Only docs containing
    at least one query term are ranked (an index never surfaces
    zero-score docs)."""
    import math

    from e_commerce_batch_etl_pipeline_ray.stages import aggregates
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )

    terms = list(query_terms)
    postings, meta, _ = _read_postings(index_dir, terms)
    postings = postings.materialize()
    id_col = meta["id_col"]
    if meta["n_docs"] == 0 or postings.count() == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avglen = meta["total_len"] / meta["n_docs"]
    n_docs = meta["n_docs"]

    # df per term: postings are unique (term, doc) -> a grouped count
    df_rows = collect_arrow(postings.map_batches(
        lambda t: t.group_by("term").aggregate([([], "count_all")]),
        batch_format="pyarrow", zero_copy_batch=True))
    df_map = {}
    for trm, cnt in zip(df_rows["term"].to_pylist(),
                        df_rows["count_all"].to_pylist()):
        df_map[trm] = df_map.get(trm, 0) + cnt
    idf = {trm: math.log((n_docs - df_map.get(trm, 0) + 0.5)
                         / (df_map.get(trm, 0) + 0.5) + 1.0)
           for trm in terms}

    def _contrib(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idf[x] for x in t["term"].to_pylist()])
        contrib = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avglen))
        return pa.table({id_col: t[id_col],
                         "contrib": pa.array(contrib, pa.float64())})

    scored = aggregates.grouped_aggregate(
        [id_col], [("sum", "contrib", "score")]).apply(
        postings.map_batches(_contrib, batch_format="pyarrow",
                             zero_copy_batch=True))
    allrows = collect_arrow(scored)
    if round_to is not None:
        from e_commerce_batch_etl_pipeline_ray.functions.scalar import round2
        i = allrows.column_names.index("score")
        allrows = allrows.set_column(i, "score",
                                     round2(allrows["score"], round_to))
    idx = pc.sort_indices(allrows, sort_keys=[("score", "descending"),
                                              (id_col, "ascending")])
    return ray.data.from_arrow(allrows.take(idx.slice(0, k)))


def index_lookup(index_dir: str, terms: list[str],
                 mode: str = "all") -> ray.data.Dataset:
    """Boolean retrieval off the index: doc ids containing ALL (``mode=
    'all'``) or ANY (``'any'``) of ``terms`` — reads only those terms'
    partitions. Returns (id_col, n_matched)."""
    if mode not in ("all", "any"):
        raise ValueError("mode must be 'all' or 'any'")
    from e_commerce_batch_etl_pipeline_ray.stages import aggregates

    terms = list(dict.fromkeys(terms))
    postings, meta, _ = _read_postings(index_dir, terms)
    id_col = meta["id_col"]
    matched = aggregates.grouped_aggregate(
        [id_col], [("count", None, "n_matched")]).apply(postings)
    if mode == "all":
        need = len(terms)
        matched = matched.map_batches(
            lambda t: t.filter(pc.equal(t["n_matched"], need)),
            batch_format="pyarrow", zero_copy_batch=True)
    return matched


def hybrid_rrf(docs: ray.data.Dataset, emb: ray.data.Dataset,
               query_terms: list[str], query_vec, *,
               k_each: int = 20, k0: int = 60, top: int = 10,
               id_col: str = "doc_id", text_col: str = "text",
               emb_id_col: str = "vec_id",
               emb_col: str = "embedding") -> ray.data.Dataset:
    """HYBRID lexical+dense retrieval with Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher 2009 — the standard RAG fusion rule):
    ``rrf(d) = sum over lists 1/(k0 + rank_d)`` across the BM25 top-k
    and the exact-cosine top-k candidate lists; docs absent from a list
    contribute nothing for it. Assumes the two id spaces align
    (``emb[emb_id_col]`` identifies the same document as
    ``docs[id_col]`` — the testdata contract, and the SQL mirror fuses
    on the same ids, so parity never depends on the semantics).

    Deterministic ranking keys, mirrored verbatim by the q174 oracle:
    BM25 list by (ROUND(score, 4) DESC, id ASC) — the rounding level
    q102's oracle already proves float-parity at — cosine list by
    (ROUND(cos, 9) DESC, id ASC) — the cosine key matches
    ``similarity.knn_brute``'s own tiebreak. Output: the fused top
    ``top`` rows ``(id_col, rrf, bm25_rank, cos_rank)`` sorted
    (rrf DESC, id ASC), ranks null where a doc missed that list.

    Scale shape: both candidate lists come from the engine's own
    distributed top-k operators (BM25 partial stats + per-batch score,
    brute-cosine per-batch top-k with a broadcast query matrix); the
    fusion itself touches 2*k_each rows — metadata grain on the driver
    by construction."""
    import numpy as np

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    from e_commerce_batch_etl_pipeline_ray.stages.similarity import (
        knn_brute,
    )

    bt = collect_arrow(bm25_topk(docs, list(query_terms), k=k_each,
                                 id_col=id_col, text_col=text_col))
    bdf = bt.to_pandas()
    bdf["score_r"] = bdf["score"].round(4)
    bdf = bdf.sort_values(["score_r", id_col],
                          ascending=[False, True]).head(k_each)
    bm_rank = {int(i): r + 1 for r, i in enumerate(bdf[id_col])}

    qv = np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
    kt = knn_brute(emb, ([0], qv), k=k_each, emb_col=emb_col,
                   id_col=emb_id_col)
    cos_rank = {int(i): int(r) for i, r in
                zip(kt["neighbor_id"].to_pylist(),
                    kt["rank"].to_pylist())}

    ids = sorted(set(bm_rank) | set(cos_rank))
    rrf = [(1.0 / (k0 + bm_rank[d]) if d in bm_rank else 0.0)
           + (1.0 / (k0 + cos_rank[d]) if d in cos_rank else 0.0)
           for d in ids]
    out = pa.table({
        id_col: pa.array(ids, pa.int64()),
        "rrf": pa.array([round(v, 6) for v in rrf], pa.float64()),
        "bm25_rank": pa.array([bm_rank.get(d) for d in ids], pa.int64()),
        "cos_rank": pa.array([cos_rank.get(d) for d in ids], pa.int64()),
    })
    order = sorted(range(len(ids)), key=lambda i: (-rrf[i], ids[i]))[:top]
    return ray.data.from_arrow(out.take(pa.array(order, pa.int64())))
