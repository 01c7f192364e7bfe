"""HyperLogLog distinct-count sketch — the mergeable approximate-NDV
operator a 100-TB pipeline uses where exact COUNT(DISTINCT) would shuffle
every key: per-block register partials (a few KB each) replace the
all-to-all of raw keys, and register max-merge is exact (associative,
commutative, idempotent), so any block split / retry / epoch merge yields
bit-identical registers.

Reference parity note: the reference computes exact distinct counts
(reference src/transform.py countDistinct); this module is the scale-path
complement (SURVEY.md §2 A2/A5 family), not a replacement — exact
aggregates stay in stages/aggregates.py.

Design (Flajolet et al. 2007, with the standard linear-counting small-
range correction):

- hash: splitmix64 over the int64 key — chosen because its wrap-around
  arithmetic is EXPRESSIBLE IN ANSI SQL over 128-bit intermediates
  (see ``splitmix64_sql``), so the ORACLE can recompute the exact same
  registers in DuckDB and the driver's value-hash check is bit-exact.
  Approximation never hides a correctness bug: the oracle checks the
  full register state, tests check the estimate's error bound.
- per block: idx = h >> (64-p), rank = (64-p) + 1 - bit_length(rest);
  partial rows (group..., idx, reg=max rank) via one vectorized numpy
  pass (np.maximum.at over factorized group codes).
- merge: groupby(group..., idx).max(reg) — the only shuffle, bounded by
  groups x 2^p rows TOTAL (not by input rows).
- estimate: alpha_m * m^2 / sum(2^-reg) with linear counting below
  2.5m; the float sum uses math.fsum so the estimate is deterministic
  under any register ordering.

``p`` must be >= 11 so rest < 2^53 and the float64 bit-length trick
(np.frexp / DuckDB log-free bin()) stays exact; default p=14 gives
sigma ~= 1.04/sqrt(16384) ~= 0.81% with 16 KiB of registers per group.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_M64 = 1 << 64
_M32 = 1 << 32
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (negatives wrap mod
    2^64 — callers hash int64 key columns via .view/astype)."""
    h = np.asarray(x, np.uint64) + np.uint64(_C1)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(_C2)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(_C3)
    return h ^ (h >> np.uint64(31))


def splitmix64_sql(expr: str) -> str:
    """ANSI-SQL (DuckDB) expression computing splitmix64(expr) bit-exactly:
    64x64 wrap-around multiplies are split hi32/lo32 so every intermediate
    fits in a 128-bit HUGEINT — (a*B) % 2^64 =
    (((a>>32)*B % 2^32) << 32 | shifted-add | + (a%2^32)*B) % 2^64."""
    def mulmod(a: str, b: int) -> str:
        return (f"(((({a}) >> 32) * {b} % {_M32}) * {_M32}"
                f" + (({a}) % {_M32}) * {b}) % {_M64}")
    h1 = f"((CAST(({expr}) AS HUGEINT) + {_C1}) % {_M64})"
    h1 = f"CAST({h1} AS UBIGINT)"
    h2 = f"CAST({mulmod(f'CAST(xor({h1}, {h1} >> 30) AS HUGEINT)', _C2)}" \
         f" AS UBIGINT)"
    h3 = f"CAST({mulmod(f'CAST(xor({h2}, {h2} >> 27) AS HUGEINT)', _C3)}" \
         f" AS UBIGINT)"
    return f"xor({h3}, {h3} >> 31)"


def hll_rank_sql(key_expr: str, p: int) -> str:
    """SQL SELECT-list fragment: ``idx`` and ``reg`` for one key. Rank
    uses length(bin(rest)) — integer string ops, no float log2, so the
    oracle is exact at every p."""
    w = 64 - p
    h = splitmix64_sql(key_expr)
    rest = f"(({h}) & {(1 << w) - 1})"
    return (f"CAST(({h}) >> {w} AS BIGINT) AS idx, "
            f"CAST(CASE WHEN {rest} = 0 THEN {w + 1} "
            f"ELSE {w + 1} - length(bin({rest})) END AS BIGINT) AS reg")


def _rank(rest: np.ndarray, p: int) -> np.ndarray:
    # bit_length via float64 exponent: exact while rest < 2^53 (p >= 11)
    _, e = np.frexp(rest.astype(np.float64))
    return (64 - p + 1 - e).astype(np.int64)


def hll_partial(t: pa.Table, col: str, by: list[str] | None = None,
                p: int = 14) -> pa.Table:
    """One block's sparse register partial: rows (by..., idx, reg) with
    reg = max rank observed in this block for that (group, idx)."""
    if p < 11 or p > 18:
        raise ValueError("p must be in [11, 18]")
    x = t[col].combine_chunks().to_numpy(zero_copy_only=False)
    h = splitmix64(x.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rank = _rank(h & np.uint64((1 << (64 - p)) - 1), p)
    if not by:
        regs = np.zeros(1 << p, np.int64)
        np.maximum.at(regs, idx, rank)
        nz = np.nonzero(regs)[0]
        return pa.table({"idx": pa.array(nz, pa.int64()),
                         "reg": pa.array(regs[nz], pa.int64())})
    import pandas as pd
    gdf = t.select(by).to_pandas()
    codes, uniques = pd.factorize(
        pd.MultiIndex.from_frame(gdf) if len(by) > 1 else gdf[by[0]],
        sort=False)
    # dense (group, idx) key -> max rank in one scatter pass
    key = codes.astype(np.int64) * (1 << p) + idx
    order = np.lexsort((rank, key))
    key_s, rank_s = key[order], rank[order]
    last = np.r_[key_s[1:] != key_s[:-1], True]   # max rank = last in order
    key_u, reg_u = key_s[last], rank_s[last]
    g, i = key_u >> p, key_u & ((1 << p) - 1)
    cols: dict = {}
    if len(by) > 1:
        for j, name in enumerate(by):
            cols[name] = pa.array([uniques[k][j] for k in g])
    else:
        cols[by[0]] = pa.array(uniques.take(g))
    cols["idx"] = pa.array(i, pa.int64())
    cols["reg"] = pa.array(reg_u, pa.int64())
    return pa.table(cols)


def hll_registers(ds: ray.data.Dataset, col: str,
                  by: list[str] | None = None,
                  p: int = 14) -> ray.data.Dataset:
    """Merged sparse registers: (by..., idx, reg). The shuffle moves only
    per-block partials (<= blocks x groups x 2^p rows, each 24 bytes) —
    never the keys themselves."""
    by = list(by or [])
    partials = ds.map_batches(
        lambda t: hll_partial(t, col, by or None, p),
        batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby([*by, "idx"]).max("reg")
    return merged.map_batches(
        lambda t: t.rename_columns([*by, "idx", "reg"]),
        batch_format="pyarrow", zero_copy_batch=True)


def hll_estimate(idx: np.ndarray, reg: np.ndarray, p: int) -> float:
    """Deterministic HLL estimate from sparse registers (missing register
    = 0). math.fsum keeps the harmonic sum ordering-invariant."""
    m = 1 << p
    v = m - len(idx)                         # registers still at zero
    s = math.fsum(math.ldexp(1.0, -int(r)) for r in reg) + v
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and v > 0:
        return m * math.log(m / v)           # linear counting
    return e


def approx_ndv(ds: ray.data.Dataset, col: str,
               by: list[str] | None = None, p: int = 14) -> pa.Table:
    """Approximate COUNT(DISTINCT col) [GROUP BY by]: returns a small
    Arrow table (by..., ndv: double). Driver-side finalize is bounded by
    groups x 2^p register rows (16 KiB/group at p=14) — the inputs never
    leave the cluster un-sketched."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    by = list(by or [])
    regs = collect_arrow(hll_registers(ds, col, by or None, p))
    if not by:
        est = hll_estimate(regs["idx"].to_numpy(), regs["reg"].to_numpy(), p)
        return pa.table({"ndv": pa.array([est], pa.float64())})
    import pandas as pd
    df = regs.to_pandas()
    out = (df.groupby(by, sort=True)
           .apply(lambda g: hll_estimate(g["idx"].to_numpy(),
                                         g["reg"].to_numpy(), p),
                  include_groups=False)
           .rename("ndv").reset_index())
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the set-algebra complement of
# HLL: a synopsis of the k SMALLEST distinct splitmix64 hash values.
# Union of synopses is just "k smallest of the concatenation", so two
# corpora sketched independently support |A u B|, |A n B| and Jaccard
# estimates (Beyer et al. 2007) — e.g. eval-set contamination RATE
# between two corpora with NO join and NO key shuffle: each side ships
# k * 8 bytes. Unlike HLL, the synopsis is exactly SQL-replayable
# (SELECT DISTINCT hash ORDER BY hash LIMIT k), so the q119 oracle
# checks it bit-for-bit. When a set has < k distinct keys the synopsis
# IS the full hashed key set and every estimate is exact.


def kmv_partial(t: pa.Table, col: str, by: list[str] | None = None,
                k: int = 256) -> pa.Table:
    """One block's synopsis rows (by..., h): the k smallest DISTINCT
    hash values per group within this block."""
    x = t[col].combine_chunks().to_numpy(zero_copy_only=False)
    h = splitmix64(x.astype(np.uint64))
    if not by:
        u = np.unique(h)[:k]
        return pa.table({"h": pa.array(u, pa.uint64())})
    import pandas as pd
    gdf = t.select(by).to_pandas()
    codes, uniques = pd.factorize(
        pd.MultiIndex.from_frame(gdf) if len(by) > 1 else gdf[by[0]],
        sort=False)
    outs_g, outs_h = [], []
    for c in range(len(uniques)):
        u = np.unique(h[codes == c])[:k]
        outs_g.append(np.full(len(u), c))
        outs_h.append(u)
    g = np.concatenate(outs_g) if outs_g else np.array([], np.int64)
    hv = np.concatenate(outs_h) if outs_h else np.array([], np.uint64)
    cols: dict = {}
    if len(by) > 1:
        for j, name in enumerate(by):
            cols[name] = pa.array([uniques[int(i)][j] for i in g])
    else:
        cols[by[0]] = pa.array(uniques.take(g.astype(np.int64)))
    cols["h"] = pa.array(hv, pa.uint64())
    return pa.table(cols)


def kmv_synopsis(ds: ray.data.Dataset, col: str,
                 by: list[str] | None = None, k: int = 256) -> pa.Table:
    """Merged synopsis (by..., h). Per-block partials (<= k rows each)
    merge driver-side — bounded by blocks x k x 8 bytes, never by input;
    raise k only with the 1/sqrt(k) error target, not with data size."""
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        collect_arrow,
    )
    by = list(by or [])
    parts = collect_arrow(ds.map_batches(
        lambda t: kmv_partial(t, col, by or None, k),
        batch_format="pyarrow", zero_copy_batch=True))
    if not by:
        u = np.unique(parts["h"].to_numpy())[:k]
        return pa.table({"h": pa.array(u, pa.uint64())})
    import pandas as pd
    df = parts.to_pandas()
    out = (df.drop_duplicates([*by, "h"])
           .sort_values([*by, "h"])
           .groupby(by, sort=True).head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def kmv_ndv(h: np.ndarray, k: int) -> float:
    """NDV estimate from one synopsis: exact count when the set had
    fewer than k distinct keys, else (k-1) * 2^64 / h_k."""
    h = np.sort(np.asarray(h, np.uint64))
    if len(h) < k:
        return float(len(h))
    return (k - 1) * (2.0 ** 64) / float(h[k - 1])


def kmv_overlap(ha: np.ndarray, hb: np.ndarray, k: int) -> dict:
    """Set-algebra estimates from two synopses: build the union synopsis
    (k smallest of the concatenation), estimate rho = |union-synopsis
    members present in BOTH sides| / |union synopsis|; then
    jaccard ~= rho, |A u B| from the union synopsis, |A n B| = rho * |A u B|."""
    ha = np.asarray(ha, np.uint64)
    hb = np.asarray(hb, np.uint64)
    union = np.unique(np.concatenate([ha, hb]))[:k]
    both = np.intersect1d(union, ha, assume_unique=True)
    both = np.intersect1d(both, hb, assume_unique=True)
    rho = len(both) / len(union) if len(union) else 1.0
    u_est = kmv_ndv(union, k)
    return {"jaccard": rho, "union": u_est, "intersection": rho * u_est}


def corpus_overlap(ds_a: ray.data.Dataset, ds_b: ray.data.Dataset,
                   col: str, k: int = 1024) -> dict:
    """Contamination-rate estimate between two corpora keyed by ``col``
    (e.g. content sha): each side reduces to a k-value synopsis
    independently — no join, no cross-corpus shuffle."""
    ha = kmv_synopsis(ds_a, col, k=k)["h"].to_numpy()
    hb = kmv_synopsis(ds_b, col, k=k)["h"].to_numpy()
    out = kmv_overlap(ha, hb, k)
    out["ndv_a"] = kmv_ndv(ha, k)
    out["ndv_b"] = kmv_ndv(hb, k)
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch — the FREQUENCY complement of HLL (NDV) and KMV (set
# algebra): per-key count estimates from a fixed d x w counter matrix
# (Cormode & Muthukrishnan 2005). Counters are pure SUMS, so per-block
# partials merge by addition and the shuffle moves <= blocks x d x w
# 24-byte rows — never the keys; point query = min over the d rows of
# counter[row, hash_row(key) % w]. Guarantees: est >= true always;
# est <= true + (e/w) * N with prob 1 - e^-d. Row hashes reuse
# splitmix64 with per-row additive seeds, so the FULL counter state is
# SQL-replayable bit-exactly (the q121 oracle). NOTE: unlike HLL/KMV,
# sum-merge is NOT idempotent — retries must be exactly-once (Ray task
# retries are; cross-epoch use must ride the manifest protocol).

# per-row seeds: splitmix64(1..8) — fixed constants, embedded in SQL
_CMS_SEEDS = [int(splitmix64(np.array([j + 1], np.uint64))[0])
              for j in range(8)]


def _cms_check(d: int, w: int) -> None:
    if not (1 <= d <= len(_CMS_SEEDS)):
        raise ValueError(f"d must be in [1, {len(_CMS_SEEDS)}]")
    if w < 2:
        raise ValueError("w must be >= 2")


def cms_hash(x: np.ndarray, row: int, w: int) -> np.ndarray:
    """idx of key x in counter row ``row``: splitmix64(x + seed_row) % w
    (uint64 wrap-around addition — mirrored exactly in cms_hash_sql)."""
    h = splitmix64(np.asarray(x, np.uint64) + np.uint64(_CMS_SEEDS[row]))
    return (h % np.uint64(w)).astype(np.int64)


def cms_hash_sql(key_expr: str, row: int, w: int) -> str:
    """SQL expression mirroring cms_hash bit-for-bit (the additive seed
    rides splitmix64's own mod-2^64 HUGEINT arithmetic)."""
    sm = splitmix64_sql(f"CAST(({key_expr}) AS HUGEINT) + {_CMS_SEEDS[row]}")
    return f"CAST(({sm}) % {w} AS BIGINT)"


def cms_partial(t: pa.Table, col: str, by: list[str] | None = None,
                d: int = 4, w: int = 1024) -> pa.Table:
    """One block's sparse counter partial: rows (by..., row, idx, cnt)."""
    _cms_check(d, w)
    x = t[col].combine_chunks().to_numpy(zero_copy_only=False)
    n = len(x)
    if not by:
        codes = np.zeros(n, np.int64)
        ngroups = 1 if n else 0
        uniques = None
    else:
        import pandas as pd
        gdf = t.select(by).to_pandas()
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(gdf) if len(by) > 1 else gdf[by[0]],
            sort=False)
        codes = codes.astype(np.int64)
        ngroups = len(uniques)
    # one flat bincount over (group, row, idx)
    flat_parts = []
    for j in range(d):
        idx = cms_hash(x, j, w)
        flat_parts.append((codes * d + j) * w + idx)
    flat = np.concatenate(flat_parts) if flat_parts and n else \
        np.array([], np.int64)
    cnt = np.bincount(flat, minlength=ngroups * d * w)
    nz = np.nonzero(cnt)[0]
    g, rem = nz // (d * w), nz % (d * w)
    cols: dict = {}
    if by:
        if len(by) > 1:
            for jj, name in enumerate(by):
                cols[name] = pa.array([uniques[int(i)][jj] for i in g])
        else:
            cols[by[0]] = pa.array(uniques.take(g))
    cols["row"] = pa.array(rem // w, pa.int64())
    cols["idx"] = pa.array(rem % w, pa.int64())
    cols["cnt"] = pa.array(cnt[nz], pa.int64())
    return pa.table(cols)


def cms_counters(ds: ray.data.Dataset, col: str,
                 by: list[str] | None = None,
                 d: int = 4, w: int = 1024) -> ray.data.Dataset:
    """Merged counter state (by..., row, idx, cnt) — the only shuffle is
    the partial-sum groupby, bounded by groups x d x w rows total."""
    _cms_check(d, w)
    by = list(by or [])
    partials = ds.map_batches(
        lambda t: cms_partial(t, col, by or None, d, w),
        batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby([*by, "row", "idx"]).sum("cnt")
    return merged.map_batches(
        lambda t: t.rename_columns([*by, "row", "idx", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True)


def cms_estimate(counters: pa.Table, keys: np.ndarray,
                 d: int = 4, w: int = 1024) -> np.ndarray:
    """Point-frequency estimates for ``keys`` from one group's counter
    table: min over rows of cnt[row, hash_row(key)] (missing cell = 0)."""
    _cms_check(d, w)
    dense = np.zeros((d, w), np.int64)
    dense[counters["row"].to_numpy(), counters["idx"].to_numpy()] = \
        counters["cnt"].to_numpy()
    keys = np.asarray(keys)
    est = np.full(len(keys), np.iinfo(np.int64).max)
    for j in range(d):
        est = np.minimum(est, dense[j, cms_hash(keys, j, w)])
    return est


# ---------------------------------------------------------------------------
# Fixed-range histogram partials — the mergeable DISTRIBUTION summary that
# completes the family (HLL "how many distinct", KMV "how much overlap",
# CMS "how often each", histogram "how are values spread"). Bin counts
# sum-merge exactly like CMS counters (confluent under any slicing, NOT
# idempotent), and cumulative bins answer approximate quantiles with
# error bounded by one bin width. Binning is pure integer arithmetic so
# the SQL oracle replays it bit-exactly (no float floor edge cases):
# bin -1 = underflow (x < lo), bin nbins = overflow (x >= hi).

def hist_check(lo: int, hi: int, nbins: int) -> int:
    if nbins <= 0 or hi <= lo or (hi - lo) % nbins:
        raise ValueError(
            f"need hi > lo, nbins > 0 and nbins | (hi - lo); got "
            f"lo={lo} hi={hi} nbins={nbins}")
    return (hi - lo) // nbins


def hist_partial(t: pa.Table, col: str, by: list[str] | None = None,
                 lo: int = 0, hi: int = 1024, nbins: int = 64) -> pa.Table:
    """One block's bin-count partial: rows (by..., bin, cnt); nulls
    ignored; integer column required (exact binning contract)."""
    step = hist_check(lo, hi, nbins)
    sub = t.select([*(by or []), col])
    sub = sub.filter(pc.is_valid(sub[col]))
    xv = np.asarray(sub[col].to_numpy(zero_copy_only=False), np.int64)
    b = (xv - lo) // step
    b[xv < lo] = -1
    b[xv >= hi] = nbins
    sub = sub.drop_columns([col]).append_column("bin", pa.array(b, pa.int64()))
    out = sub.group_by([*(by or []), "bin"]).aggregate([([], "count_all")])
    cnt = out["count_all"].cast(pa.int64())
    return out.drop_columns(["count_all"]).append_column("cnt", cnt)


def hist_quantile(bins: pa.Table, qs, lo: int = 0, hi: int = 1024,
                  nbins: int = 64) -> np.ndarray:
    """Approximate quantiles from ONE group's bin counts — linear
    interpolation within the quantile's bin (error <= one bin width).
    Underflow/overflow bins clamp to lo/hi."""
    step = hist_check(lo, hi, nbins)
    b = bins["bin"].to_numpy(zero_copy_only=False)
    c = bins["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(b)
    b, c = b[order], c[order]
    cum = np.cumsum(c)
    total = cum[-1] if len(cum) else 0.0
    out = np.empty(len(qs), np.float64)
    for i, q in enumerate(qs):
        if total == 0:
            out[i] = np.nan
            continue
        target = q * total
        j = int(np.searchsorted(cum, target, side="left"))
        j = min(j, len(b) - 1)
        if b[j] < 0:
            out[i] = float(lo)
            continue
        if b[j] >= nbins:
            out[i] = float(hi)
            continue
        prev = cum[j - 1] if j else 0.0
        frac = (target - prev) / (cum[j] - prev) if cum[j] > prev else 0.0
        out[i] = lo + b[j] * step + frac * step
    return out
