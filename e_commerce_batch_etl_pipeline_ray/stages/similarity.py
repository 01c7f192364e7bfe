"""Similarity search over embedding columns (engine brief): brute-force
cosine top-k as the exact baseline, IVF (coarse-quantizer buckets) as the
scale path.

Shape: the query matrix is broadcast ONCE (ray.put); every batch does one
numpy matmul and keeps a local top-k; partials (k rows per query per batch)
are merged in a final tiny reduce. No global sort, no all-to-all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix via the flattened value
    buffer (near-zero-copy; `to_pylist` builds n*dim Python floats)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return values.reshape(n, values.size // n)


class _BruteTopK:
    """Per-batch scorer: cosine of batch vectors against the broadcast query
    matrix, local top-k per query."""

    def __init__(self, queries_ref, emb_col: str, id_col: str, k: int):
        q = ray.get(queries_ref)          # (n_queries, dim) float64 + ids
        self.q_ids, qm = q
        self.qn = _normalize(qm)
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        v = _emb_matrix(t[self.emb_col])
        ids = np.asarray(t[self.id_col].to_pylist())
        vn = _normalize(v)
        sim = self.qn @ vn.T                        # (nq, batch)
        k = min(self.k, sim.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sim.shape[0]):
            # keep the local top-k PLUS everything within rounding distance
            # of the k-th score: the global merge ranks on ROUND(cos, 9)
            # with neighbor_id tiebreak, so a candidate tied at the boundary
            # after rounding must survive the batch-local cut.
            kth = np.partition(sim[qi], sim.shape[1] - k)[sim.shape[1] - k]
            keep = np.flatnonzero(sim[qi] >= kth - 1e-9)
            for j in keep:
                out_q.append(self.q_ids[qi])
                out_id.append(int(ids[j]))
                out_s.append(float(sim[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })


def _brute_topk_batch(t: pa.Table, *, q_ref, emb_col: str, id_col: str,
                      k: int) -> pa.Table:
    """Task-pool form of _BruteTopK (the broadcast queries resolve from the
    worker-local object store; no actor spin-up latency)."""
    return _BruteTopK(q_ref, emb_col, id_col, k)(t)


def knn_brute(ds: ray.data.Dataset, queries: tuple[list[int], np.ndarray],
              k: int = 10, emb_col: str = "embedding", id_col: str = "vec_id",
              concurrency: tuple[int, int] = (1, 8)) -> pa.Table:
    """Exact cosine top-k for each query vector. Returns a driver-side table
    (n_queries * k rows — small by construction) with rank + rounded cosine.

    ``queries``: (query_ids, query_matrix). Deterministic tiebreak:
    (-cosine, neighbor_id).
    """
    q_ref = ray.put((list(queries[0]), np.asarray(queries[1], dtype=np.float64)))
    # task pool + batch_size: the broadcast ref resolves from the local
    # plasma cache per task (cheap), and splitting single-block corpora
    # avoids serializing everything through one worker; no actor spin-up.
    import functools
    partials = ds.map_batches(
        functools.partial(_brute_topk_batch, q_ref=q_ref, emb_col=emb_col,
                          id_col=id_col, k=k),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=2048)
    t = collect_arrow(partials)
    df = t.to_pandas()
    df["cosine_r"] = df["cosine"].round(9)
    df = df.sort_values(["query_id", "cosine_r", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(6)
    return pa.Table.from_pandas(
        df[["query_id", "neighbor_id", "rank", "cosine"]], preserve_index=False)


# ---------------------------------------------------------------------------
# IVF: kmeans-lite coarse quantizer -> per-centroid buckets -> probe subset


def train_centroids(ds: ray.data.Dataset, n_centroids: int = 16,
                    emb_col: str = "embedding", sample: int = 2048,
                    iters: int = 8, seed: int = 11) -> np.ndarray:
    """Tiny k-means on a driver-side sample (the coarse quantizer). The
    sample is bounded; training cost is O(sample * n_centroids * iters)."""
    rows = ds.select_columns([emb_col]).take(sample)
    m = _normalize(np.asarray([r[emb_col] for r in rows], dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(ds: ray.data.Dataset, queries: tuple[list[int], np.ndarray],
            k: int = 10, n_centroids: int = 16, nprobe: int = 4,
            emb_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Approximate top-k: vectors are bucketed by nearest centroid; each
    query scores only vectors whose bucket is among its ``nprobe`` nearest
    centroids. Same output shape as knn_brute."""
    cent = train_centroids(ds, n_centroids, emb_col)
    cent_ref = ray.put(cent)
    q_ids = list(queries[0])
    qm = _normalize(np.asarray(queries[1], dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    q_ref = ray.put((q_ids, qm, probe_sets))

    class _IVFScore:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.q_ids, self.qm, self.probe = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _emb_matrix(t[emb_col])
            ids = np.asarray(t[id_col].to_pylist())
            vn = _normalize(v)
            assign = np.argmax(vn @ self.cent.T, axis=1)
            out_q, out_id, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                mask = np.isin(assign, list(self.probe[qi]))
                if not mask.any():
                    continue
                sims = self.qm[qi] @ vn[mask].T
                sel_ids = ids[mask]
                kk = min(len(sims), k)
                top = np.argpartition(-sims, kth=kk - 1)[:kk]
                for j in top:
                    out_q.append(self.q_ids[qi])
                    out_id.append(int(sel_ids[j]))
                    out_s.append(float(sims[j]))
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_id, pa.int64()),
                             "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(_IVFScore, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))
    t = collect_arrow(partials)
    df = t.to_pandas()
    df["cosine_r"] = df["cosine"].round(9)
    df = df.sort_values(["query_id", "cosine_r", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(6)
    return pa.Table.from_pandas(
        df[["query_id", "neighbor_id", "rank", "cosine"]], preserve_index=False)


# ---------------------------------------------------------------------------
# IVF partitioned index: persist per-centroid parquet partitions so a search
# READS only the probed partitions — pruning at the read is the 100-TB scale
# path (knn_ivf above still scans every block and filters in-task).


def _make_assign(cent_ref, emb_col: str):
    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vn = _normalize(_emb_matrix(t[emb_col]))
        a = np.argmax(vn @ c.T, axis=1).astype(np.int32)
        return t.append_column("_list", pa.array(a))
    return _assign


def _assign_stats(ds: ray.data.Dataset, cent_ref, emb_col: str,
                  n_centroids: int) -> tuple[np.ndarray, int]:
    """(per-centroid assignment counts, n) over ``ds`` — one partials pass.
    The assignment DISTRIBUTION is the drift signal the append check
    compares against: a distribution shift concentrates new vectors in few
    lists (skew -> recall decay), which mean-similarity cannot see in high
    dimensions."""
    def _partial(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vn = _normalize(_emb_matrix(t[emb_col]))
        a = np.argmax(vn @ c.T, axis=1) if len(vn) else np.zeros(0, np.int64)
        counts = np.bincount(a, minlength=n_centroids).astype(np.int64)
        return pa.table({"c": pa.array(counts),
                         "i": pa.array(np.arange(n_centroids, dtype=np.int32))})

    parts = collect_arrow(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True))
    counts = np.zeros(n_centroids, dtype=np.int64)
    np.add.at(counts, parts["i"].to_numpy(), parts["c"].to_numpy())
    return counts, int(counts.sum())


def ivf_index_build(ds: ray.data.Dataset, index_dir: str,
                    n_centroids: int = 16, emb_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 11,
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """Build a persisted IVF index: train the coarse quantizer (or use the
    given ``centroids``), assign every vector to its nearest centroid, and
    write one parquet DIRECTORY per centroid (``index_dir/_list=C/``) plus
    the centroid matrix and fit stats. Search then touches only ``nprobe``
    directories — I/O proportional to the probed fraction of the corpus,
    not the corpus."""
    import json
    import os

    cent = (np.asarray(centroids, dtype=np.float64) if centroids is not None
            else train_centroids(ds, n_centroids, emb_col, seed=seed))
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(_make_assign(cent_ref, emb_col),
                              batch_format="pyarrow", zero_copy_batch=True)
    os.makedirs(index_dir, exist_ok=True)
    # one directory per centroid list — the unit a search prunes on; also
    # the resume unit (a crashed build re-runs whole lists idempotently)
    assigned.write_parquet(index_dir, partition_cols=["_list"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    counts, n = _assign_stats(ds, cent_ref, emb_col, len(cent))
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump({"list_counts": counts.tolist(), "n_vectors": n}, f)
    return cent


def ivf_index_append(ds: ray.data.Dataset, index_dir: str,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     drift_tol: float = 0.25) -> dict:
    """Incrementally append new vectors to an EXISTING index: assign with
    the persisted quantizer and write additional parquet files into the
    same ``_list=C`` directories (Ray's write filenames are unique per
    execution, so appends never clobber) — no full rebuild.

    Centroid-drift check: total-variation distance between the index's
    recorded per-list assignment fractions and the new batch's. A shifted
    data distribution concentrates in few lists (TV -> 1), skewing list
    sizes and decaying recall; iid growth keeps TV at sampling noise.
    ``drift > drift_tol`` sets ``rebuild_recommended``. Stats are merged
    (count-wise) either way.
    """
    import json
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(_make_assign(cent_ref, emb_col),
                              batch_format="pyarrow", zero_copy_batch=True)
    assigned.write_parquet(index_dir, partition_cols=["_list"])

    new_counts, new_n = _assign_stats(ds, cent_ref, emb_col, len(cent))
    stats_path = os.path.join(index_dir, "stats.json")
    old_counts, old_n = np.zeros(len(cent), dtype=np.int64), 0
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            st = json.load(f)
        old_counts = np.asarray(st["list_counts"], dtype=np.int64)
        old_n = st["n_vectors"]
    if old_n and new_n:
        drift = 0.5 * float(np.abs(old_counts / old_n
                                   - new_counts / new_n).sum())
    else:
        drift = 0.0
    merged = old_counts + new_counts
    with open(stats_path, "w") as f:
        json.dump({"list_counts": merged.tolist(),
                   "n_vectors": old_n + new_n}, f)
    return {"appended": new_n, "drift": drift,
            "rebuild_recommended": bool(drift > drift_tol)}


def ivf_index_search(index_dir: str, queries: tuple[list[int], np.ndarray],
                     k: int = 10, nprobe: int = 4,
                     emb_col: str = "embedding",
                     id_col: str = "vec_id") -> pa.Table:
    """Search the persisted index: pick each query's ``nprobe`` nearest
    centroids, then read ONLY those list directories (column-pruned) and
    run the brute scorer over the union. Same output contract as
    knn_brute/knn_ivf."""
    import os

    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q_ids = list(queries[0])
    qm = _normalize(np.asarray(queries[1], dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    import glob
    lists = sorted({int(c) for row in probe for c in row})
    files = []
    for c in lists:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, f"_list={c}", "*.parquet"))))
    dirs = files
    if not dirs:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    sub = rd.read_parquet(dirs, columns=[id_col, emb_col])
    # exactness caveat identical to knn_ivf: recall bounded by the probe set
    return knn_brute(sub, (q_ids, qm), k=k, emb_col=emb_col, id_col=id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized residual codes — the COMPRESSED 100-TB ANN
# path. The IVF index above prunes I/O to the probed lists but still
# stores (and reads) full float vectors; PQ shrinks each vector to m bytes
# (64-dim float32 = 256 B -> 8 B at m=8), so the probed read moves ~30x
# fewer bytes and a scan-heavy recall sweep becomes memory-bandwidth-bound
# instead of I/O-bound. Scoring is ADC (asymmetric distance computation):
# per query, one (m, ks) lookup table of subspace dot products; a
# candidate's score is q . c_list + sum_j LUT[j, code_j] — a pure numpy
# gather, no decode. Exact re-rank of the ADC shortlist against the
# original vectors recovers brute accuracy (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 — public method).


def _pq_lloyd(x: np.ndarray, ks: int, iters: int, seed: int) -> np.ndarray:
    """Driver-side Lloyd k-means for ONE subspace over the (bounded)
    training sample — deterministic given the sample."""
    rng = np.random.RandomState(seed)
    if len(x) == 0:
        return np.zeros((ks, x.shape[1] if x.ndim == 2 else 0))
    cent = x[rng.choice(len(x), size=min(ks, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(cent.shape[0]):
            sel = x[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
    return cent


def train_pq(sample: np.ndarray, centroids: np.ndarray, m: int = 8,
             ks: int = 16, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Codebooks (m, ks, dim/m) over the sample's coarse RESIDUALS
    (v - nearest coarse centroid), one independent k-means per subspace."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if ks > 256:
        raise ValueError("ks must fit uint8 codes (<= 256)")
    sn = _normalize(sample)
    assign = np.argmax(sn @ centroids.T, axis=1)
    resid = sn - centroids[assign]
    dsub = dim // m
    return np.stack([
        _pq_lloyd(resid[:, j * dsub:(j + 1) * dsub], ks, iters, seed + j)
        for j in range(m)])


def pq_encode(vn: np.ndarray, centroids: np.ndarray,
              codebooks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(coarse list id int32, codes uint8 (n, m)) for NORMALIZED rows."""
    m, ks, dsub = codebooks.shape
    assign = np.argmax(vn @ centroids.T, axis=1).astype(np.int32)
    resid = vn - centroids[assign]
    codes = np.empty((len(vn), m), np.uint8)
    for j in range(m):
        sub = resid[:, j * dsub:(j + 1) * dsub]
        # ||r - c||^2 argmin == argmax(r.c - ||c||^2/2)
        cb = codebooks[j]
        codes[:, j] = np.argmax(sub @ cb.T - 0.5 * (cb * cb).sum(axis=1),
                                axis=1).astype(np.uint8)
    return assign, codes


def _codes_matrix(col, m: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = arr.buffers()[1]
    return np.frombuffer(buf, dtype=np.uint8, count=len(arr) * m,
                         offset=arr.offset * m).reshape(len(arr), m)


def pq_index_build(ds: ray.data.Dataset, index_dir: str,
                   n_centroids: int = 16, m: int = 8, ks: int = 16,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   train_fraction: float = 1.0, seed: int = 11) -> dict:
    """Build the persisted IVF-PQ index: coarse quantizer + per-subspace
    codebooks trained on a LAYOUT-INVARIANT hash sample (membership is a
    pure function of the id — stages/sampling.py), then every vector
    encoded to (id, _list, m-byte code) and written one parquet directory
    per coarse list. The index stores NO float vectors — bytes on disk are
    ~(8 + m) per vector + the O(n_centroids * dim + m * ks * dim/m)
    quantizer sidecar."""
    import json
    import os

    # deterministic bounded training sample (same rows at any layout)
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import hash_sample
    train = (hash_sample(id_col, train_fraction, seed=seed).apply(ds)
             if train_fraction < 1.0 else ds)
    rows = train.select_columns([id_col, emb_col]).take_all()
    rows.sort(key=lambda r: r[id_col])
    sm = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
    cent = train_centroids(ds, n_centroids, emb_col, seed=seed)
    cb = train_pq(sm, cent, m=m, ks=ks, seed=seed)
    cent_ref, cb_ref = ray.put(cent), ray.put(cb)

    def _encode(t: pa.Table) -> pa.Table:
        c, b = ray.get(cent_ref), ray.get(cb_ref)
        vn = _normalize(_emb_matrix(t[emb_col]))
        assign, codes = pq_encode(vn, c, b)
        mm = b.shape[0]
        code_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mm), len(vn), [None, pa.py_buffer(codes.tobytes())])
        return pa.table({
            id_col: t[id_col],
            # _list drives the hive directory layout (stripped from the
            # file by write_parquet); list_id stays INSIDE the file so a
            # flat read keeps the coarse assignment for ADC's q.c term
            "_list": pa.array(assign, pa.int32()),
            "list_id": pa.array(assign, pa.int32()),
            "code": code_arr,
        })

    encoded = ds.map_batches(_encode, batch_format="pyarrow",
                             zero_copy_batch=True)
    os.makedirs(index_dir, exist_ok=True)
    encoded.write_parquet(index_dir, partition_cols=["_list"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "codebooks.npy"), cb)
    meta = {"m": int(m), "ks": int(ks), "n_centroids": int(len(cent)),
            "id_col": id_col}
    with open(os.path.join(index_dir, "pq.json"), "w") as f:
        json.dump(meta, f)
    return meta


def pq_index_search(index_dir: str, queries: tuple[list[int], np.ndarray],
                    k: int = 10, nprobe: int = 4,
                    rerank_ds: ray.data.Dataset | None = None,
                    rerank_factor: int | None = 4,
                    emb_col: str = "embedding",
                    id_col: str = "vec_id") -> pa.Table:
    """Search the PQ index: probe each query's ``nprobe`` nearest coarse
    lists, read ONLY those lists' (id, code) bytes, ADC-score via per-query
    lookup tables, keep an ADC shortlist of ``k * rerank_factor``
    (``rerank_factor=None``: keep ALL probed candidates — with
    ``nprobe = n_centroids`` that makes the search EXACT after re-rank),
    then re-rank the shortlist with true cosines against ``rerank_ds``
    (id-filtered pruned read; skipped when None — pure-ADC results)."""
    import glob
    import json
    import os

    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    cb = np.load(os.path.join(index_dir, "codebooks.npy"))
    with open(os.path.join(index_dir, "pq.json")) as f:
        meta = json.load(f)
    m, ks = meta["m"], meta["ks"]
    dsub = cb.shape[2]
    q_ids = list(queries[0])
    qm = _normalize(np.asarray(queries[1], dtype=np.float64))
    nq = len(q_ids)
    # per-query ADC tables: LUT[qi, j, code] = q_sub . codebook[j][code]
    lut = np.einsum("qjd,jkd->qjk",
                    qm.reshape(nq, m, dsub), cb)          # (nq, m, ks)
    qc = qm @ cent.T                                      # (nq, lists)
    probe = np.argsort(-qc, axis=1)[:, :nprobe]
    lists = sorted({int(c) for row in probe for c in row})
    probe_sets = [set(map(int, row)) for row in probe]
    files = []
    for c in lists:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, f"_list={c}", "*.parquet"))))
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not files:
        return empty
    bc = ray.put((q_ids, lut, qc, probe_sets))

    def _adc(t: pa.Table) -> pa.Table:
        qids, lut_, qc_, psets = ray.get(bc)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lst = t["list_id"].to_numpy(zero_copy_only=False)
        codes = _codes_matrix(t["code"], m)
        out_q, out_id, out_s = [], [], []
        take_n = (k * rerank_factor) if rerank_factor else len(ids)
        for qi in range(len(qids)):
            mask = np.isin(lst, list(psets[qi]))
            if not mask.any():
                continue
            sub_codes = codes[mask]
            # gather: sum_j LUT[qi, j, code_j] + q . c_list
            s = lut_[qi, np.arange(m)[None, :], sub_codes].sum(axis=1)
            s = s + qc_[qi, lst[mask]]
            sel_ids = ids[mask]
            kk = min(len(s), take_n)
            top = np.argpartition(-s, kth=kk - 1)[:kk]
            out_q.extend([qids[qi]] * kk)
            out_id.extend(sel_ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    # hive partition col is re-materialized as a real column at build time,
    # so a flat file read keeps the list id
    sub = rd.read_parquet(files, columns=[id_col, "list_id", "code"])
    shortlist = collect_arrow(sub.map_batches(
        _adc, batch_format="pyarrow", zero_copy_batch=True))
    if shortlist.num_rows == 0:
        return empty
    df = shortlist.to_pandas()
    take_n = (k * rerank_factor) if rerank_factor else None
    df = df.sort_values(["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True])
    if take_n:
        df = df.groupby("query_id", sort=True).head(take_n)
    if rerank_ds is None:
        df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        df["cosine"] = df["cosine"].round(6)
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank", "cosine"]],
            preserve_index=False)
    # exact re-rank: pruned read of ONLY the shortlist ids' true vectors
    cand = set(df["neighbor_id"].tolist())
    cand_ref = ray.put(cand)

    def _filter_cand(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t[id_col],
                                 value_set=pa.array(sorted(cs), pa.int64())))

    pruned = rerank_ds.map_batches(_filter_cand, batch_format="pyarrow",
                                   zero_copy_batch=True)
    full = knn_brute(pruned, (q_ids, qm), k=k, emb_col=emb_col,
                     id_col=id_col)
    # brute over the union of shortlists can surface a neighbor outside a
    # query's own shortlist — mask to each query's candidates
    fdf = full.to_pandas()
    own = df.groupby("query_id")["neighbor_id"].agg(set).to_dict()
    keep = [nid in own.get(qid, set())
            for qid, nid in zip(fdf["query_id"], fdf["neighbor_id"])]
    fdf = fdf[keep].copy()
    fdf = fdf.sort_values(["query_id", "rank"])
    fdf["rank"] = fdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(fdf.reset_index(drop=True),
                                preserve_index=False)
