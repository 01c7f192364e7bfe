"""Distributed linear algebra over an embedding column (``list<float>``):
PCA and Lloyd's k-means — the fit/transform pair a training-data pipeline
runs over billions of vectors.

Scale shapes (d = embedding dim, assumed small enough that d x d fits on
the driver — true for every practical embedding, d <= a few thousand):

- ``pca_fit``: ONE combiner pass reduces each block to (n, sum_d, d x d
  Gram partial); the driver merges the tiny partials, forms the exact
  covariance, and eigendecomposes d x d. The DATA never moves — only
  O(blocks x d^2) floats. Deterministic sign convention (largest-|.|
  component positive) so runs/parallelism agree.
- ``pca_transform``: row-local projection with broadcast components.
- ``kmeans_fit``: Lloyd iterations where each block emits per-centroid
  (sum_d, count) partials (one matmul per block); the driver merges and
  recomputes centroids. Per-iteration traffic is O(blocks x k x d), never
  the points. Deterministic seeded init from a bounded driver sample
  (same contract as similarity.train_centroids, reference: IVF builder).
- ``l2_normalize``: row-local.

Non-goal here: out-of-core d (random projection first) — document, don't
guess.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.core import FnStep


def _mat(col: pa.ChunkedArray) -> np.ndarray:
    """(near) zero-copy list<float> -> (n, d) float64 matrix."""
    from e_commerce_batch_etl_pipeline_ray.stages.similarity import (
        _emb_matrix,
    )
    return _emb_matrix(col).astype(np.float64, copy=False)


def l2_normalize(emb_col: str = "embedding", out: str | None = None) -> FnStep:
    """Row-local L2 normalization (zero vectors stay zero)."""
    target = out or emb_col

    def _fn(t: pa.Table) -> pa.Table:
        m = _mat(t[emb_col])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        normed = (m / norms).astype(np.float32)
        arr = pa.array(list(normed), pa.list_(pa.float32()))
        if target in t.column_names:
            return t.set_column(t.column_names.index(target), target, arr)
        return t.append_column(target, arr)

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"l2_normalize[{emb_col}]", _apply)


def pca_fit(ds: ray.data.Dataset, n_components: int,
            emb_col: str = "embedding") -> dict:
    """Exact PCA fit: returns {"mean": (d,), "components": (k, d),
    "explained_variance": (k,)} — identical to a single-machine eigh of
    the sample covariance, computed from mergeable (n, sum, X^T X)
    partials (one matmul per block)."""

    def _partial(t: pa.Table) -> pa.Table:
        m = _mat(t[emb_col])
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0).tobytes()]),
            "g": pa.array([(m.T @ m).tobytes()]),
            "d": pa.array([m.shape[1]], pa.int64()),
        })

    parts = ds.select_columns([emb_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    parts = [p for p in parts if p["n"] > 0]
    if not parts:
        raise ValueError("pca_fit: empty dataset")
    d = parts[0]["d"]
    n = sum(p["n"] for p in parts)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for p in parts:
        s += np.frombuffer(p["s"], dtype=np.float64)
        g += np.frombuffer(p["g"], dtype=np.float64).reshape(d, d)
    mean = s / n
    # exact sample covariance from the Gram partials
    cov = (g - np.outer(s, mean) - np.outer(mean, s)
           + n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    # deterministic sign: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps,
            "explained_variance": evals[order]}


def pca_transform(model: dict, emb_col: str = "embedding",
                  out: str = "pca") -> FnStep:
    """Row-local projection onto the fitted components (broadcast via
    closure — O(k x d) constants, not data)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    def _fn(t: pa.Table) -> pa.Table:
        m = _mat(t[emb_col])
        proj = ((m - mean) @ comps.T).astype(np.float32)
        return t.append_column(out, pa.array(list(proj),
                                             pa.list_(pa.float32())))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"pca_transform[{out}]", _apply)


def kmeans_fit(ds: ray.data.Dataset, k: int, emb_col: str = "embedding",
               max_iters: int = 20, tol: float = 1e-6, seed: int = 7,
               sample_size: int = 4096) -> dict:
    """Distributed Lloyd's k-means. Init: seeded k-means++ over a bounded
    driver sample (never the dataset). Each iteration: one map_batches
    pass emitting per-centroid (sum, count) partials; driver merge;
    empty clusters re-seeded deterministically from the sample. Returns
    {"centroids": (k, d), "inertia": float, "iters": int}."""
    # deterministic k-means++ seeding over a bounded driver sample (the
    # data stays distributed; only `sample_size` vectors come back)
    rows = ds.select_columns([emb_col]).take(sample_size)
    sm = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
    if len(sm) < k:
        raise ValueError(f"kmeans_fit: k={k} > sample of {len(sm)} vectors")
    rng = np.random.RandomState(seed)
    idx = [int(rng.randint(len(sm)))]
    d2s = ((sm - sm[idx[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2s / d2s.sum() if d2s.sum() > 0 else None
        nxt = int(rng.choice(len(sm), p=probs))
        idx.append(nxt)
        d2s = np.minimum(d2s, ((sm - sm[nxt]) ** 2).sum(axis=1))
    cents = sm[idx].copy()

    def _iter_partials(cent_ref):
        def _fn(t: pa.Table) -> pa.Table:
            import ray as _ray
            c = _ray.get(cent_ref)
            m = _mat(t[emb_col])
            # assign: argmin ||x-c||^2 == argmax (x.c - |c|^2/2)
            scores = m @ c.T - 0.5 * (c * c).sum(axis=1)
            a = np.argmax(scores, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            inertia = float(((m - c[a]) ** 2).sum())
            return pa.table({
                "sums": pa.array([sums.tobytes()]),
                "counts": pa.array([counts.tobytes()]),
                "inertia": pa.array([inertia], pa.float64()),
            })
        return _fn

    import ray as _ray
    proj = ds.select_columns([emb_col])
    inertia = float("inf")
    iters = 0
    for it in range(max_iters):
        cent_ref = _ray.put(cents)
        parts = proj.map_batches(_iter_partials(cent_ref),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        new_inertia = 0.0
        for p in parts:
            sums += np.frombuffer(p["sums"], dtype=np.float64) \
                      .reshape(cents.shape)
            counts += np.frombuffer(p["counts"], dtype=np.int64)
            new_inertia += p["inertia"]
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        iters = it + 1
        shift = float(np.abs(new - cents).max())
        cents = new
        if abs(inertia - new_inertia) <= tol * max(new_inertia, 1.0) \
                or shift <= tol:
            inertia = new_inertia
            break
        inertia = new_inertia
    return {"centroids": cents, "inertia": inertia, "iters": iters}


def kmeans_assign(centroids: np.ndarray, emb_col: str = "embedding",
                  out: str = "cluster") -> FnStep:
    """Row-local cluster assignment with broadcast centroids."""
    c = np.asarray(centroids, dtype=np.float64)

    def _fn(t: pa.Table) -> pa.Table:
        m = _mat(t[emb_col])
        scores = m @ c.T - 0.5 * (c * c).sum(axis=1)
        return t.append_column(out, pa.array(np.argmax(scores, axis=1)
                                             .astype(np.int64)))

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)
    return FnStep(f"kmeans_assign[{out}]", _apply)
