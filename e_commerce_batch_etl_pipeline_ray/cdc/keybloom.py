"""Per-file key Bloom sidecars — point-lookup file skipping for the lake.

Delta-Lake-style bloom-filter indexes (public feature: Databricks bloom
indexes, Parquet column bloom filters) re-expressed for this lake's
layout: every partition data file ``F`` gets an immutable sidecar
``F.kbloom`` holding a Bloom filter over the file's fused keys
(``repo\\x00path``). ``lake.point_read`` consults the sidecar before
opening the parquet: a needle set with no possible member skips the file
without reading its footer. The win scales with the LSM depth — a
partition carries one base plus up to K-1 delta files, and a point
lookup for a cold key otherwise opens ALL of them; with sidecars it
opens (on average) fpp x files.

Safety invariant (the only correctness rule): a sidecar must be a
SUPERSET of its file's keys — false positives only. Writers therefore
create the sidecar atomically next to the data file at write time
(inside the epoch tmp dir, so the promote rename publishes both
together, and crash cleanup removes both together); in-place row
REMOVAL (``lake.purge_keys``) may keep or rebuild the sidecar (the old
one is a superset, hence safe); any path that creates a NEW file either
writes a fresh sidecar or none at all (no sidecar -> no pruning,
always safe). Nothing may ever ADD rows to an existing file (lake files
are immutable once committed; purge only removes).

Hashing: h1 = pandas' stable 64-bit string hash over the fused key (the
same primitive `hash_partition_ids` relies on for resume-stable
routing), h2 = splitmix64(h1) | 1, probe i at (h1 + i*h2) mod m —
standard Kirsch–Mitzenmacher double hashing, fully vectorized.

Sidecar format: one JSON header line {"v", "m", "k", "n"} + raw
little-endian packed bit bytes. m is rounded to a byte multiple;
an empty file yields m=8 zero bits (every probe misses).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

BLOOM_SUFFIX = ".kbloom"
_HEADER_V = 1


def _fused_hash(repo, path) -> np.ndarray:
    """Stable uint64 per (repo, path) key — pandas' fixed-key string hash
    over the fused key (identical input contract to hash_partition_ids:
    per-value, no categorize shortcut)."""
    df = pa.table({"repo": repo, "path": path}).to_pandas()
    return pd.util.hash_pandas_object(
        df, index=False, categorize=False).to_numpy()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits rounded up to a byte multiple, k probes) for n keys."""
    if n <= 0:
        return 8, 1
    m = max(8, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _probe_positions(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(k*n,) flat probe bit positions via double hashing."""
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).ravel()


def build(repo, path, fpp: float = 0.01) -> bytes:
    """Serialized Bloom over the given key columns (Arrow arrays or
    chunked arrays; duplicates fine)."""
    n = len(repo)
    m, k = _params(n, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if n:
        pos = _probe_positions(_fused_hash(repo, path), k, m)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))
    header = json.dumps({"v": _HEADER_V, "m": m, "k": k, "n": n})
    return header.encode() + b"\n" + bits.tobytes()


def may_contain(blob: bytes, repo, path) -> np.ndarray:
    """Boolean per key: possibly present (True) / definitely absent."""
    nl = blob.index(b"\n")
    hdr = json.loads(blob[:nl])
    if hdr["v"] not in (_HEADER_V, 2):
        raise ValueError(f"unknown kbloom version {hdr['v']}")
    m, k = hdr["m"], hdr["k"]
    # v2 appends value-bloom bitsets after the key bits; key probes only
    # ever index below m, so the trailing bytes are inert here
    bits = np.frombuffer(blob[nl + 1:], dtype=np.uint8)
    n = len(repo)
    if n == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(_fused_hash(repo, path), k, m).reshape(k, n)
    hit = (bits[(pos >> np.uint64(3)).astype(np.int64)]
           >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=0)


def sidecar_path(data_path: str) -> str:
    return data_path + BLOOM_SUFFIX


def _column_hash(col) -> np.ndarray:
    """Stable uint64 per non-null value of a single column (same pandas
    primitive as the key hash; dtype-faithful through Arrow->pandas, so a
    needle cast to the column's Arrow type hashes identically)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    ser = pa.table({"v": col}).to_pandas()["v"]
    return pd.util.hash_pandas_object(ser, index=False,
                                      categorize=False).to_numpy()


def _build_bits(h1: np.ndarray, fpp: float) -> tuple[bytes, int, int, int]:
    n = len(h1)
    m, k = _params(n, fpp)
    bits = np.zeros(m // 8, dtype=np.uint8)
    if n:
        pos = _probe_positions(h1, k, m)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (pos & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes(), m, k, n


def _probe_bits(bits: np.ndarray, m: int, k: int,
                h1: np.ndarray) -> np.ndarray:
    n = len(h1)
    if n == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(h1, k, m).reshape(k, n)
    hit = (bits[(pos >> np.uint64(3)).astype(np.int64)]
           >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=0)


def write_sidecar(data_path: str, table: pa.Table,
                  fpp: float = 0.01, value_cols: tuple = ()) -> str:
    """Atomically (re)write the sidecar for ``data_path`` from its table.

    ``value_cols`` (CDCConfig.bloom_cols) additionally embeds one VALUE
    Bloom per listed column (non-null values; the Parquet
    column-bloom-filter / Databricks bloom-index shape) in the same
    sidecar file — a v2 header — so every path that carries, vacuums,
    clones or rebuilds the key sidecar transparently handles the value
    blooms too. Equality scans (zorder.plan_range_scan lo==hi) probe them
    to skip files. A listed column absent from the table is skipped (the
    file predates the column — no bloom, no pruning, always safe)."""
    key_bits, m, k, n = _build_bits(_fused_hash(table["repo"],
                                                table["path"]), fpp)
    header: dict = {"v": _HEADER_V, "m": m, "k": k, "n": n}
    chunks = [key_bits]
    if value_cols:
        vals = {}
        off = len(key_bits)
        for c in value_cols:
            if c not in table.column_names:
                continue
            vbits, vm, vk, vn = _build_bits(_column_hash(table[c]), fpp)
            vals[c] = [vm, vk, vn, off, len(vbits)]
            chunks.append(vbits)
            off += len(vbits)
        if vals:
            header = {"v": 2, "m": m, "k": k, "n": n, "vals": vals}
    blob = json.dumps(header).encode() + b"\n" + b"".join(chunks)
    out = sidecar_path(data_path)
    wip = f"{out}.wip.{os.getpid()}"
    with open(wip, "wb") as f:
        f.write(blob)
    os.replace(wip, out)
    return out


def sidecar_value_cols(files) -> tuple:
    """Union of value-bloom column names present in the given files'
    sidecars — lets a rewrite (optimize/zorder/merge) rebuild value blooms
    WITHOUT access to the writer's config."""
    cols: set = set()
    for f in files:
        sp = sidecar_path(f)
        if not os.path.exists(sp):
            continue
        with open(sp, "rb") as fh:
            first = fh.readline()
        hdr = json.loads(first)
        cols.update(hdr.get("vals", ()))
    return tuple(sorted(cols))


def value_verdict(blob: bytes, names, needle: pa.Array) -> bool | None:
    """Tri-state bloom verdict for a column known under any of ``names``
    (rename aliases, newest-first): True = may contain, False = provably
    absent, None = this sidecar holds no value bloom under any name (the
    caller must not prune on it)."""
    nl = blob.index(b"\n")
    hdr = json.loads(blob[:nl])
    vals = hdr.get("vals", {})
    for n in names:
        spec = vals.get(n)
        if spec is not None:
            vm, vk, vn, off, ln = spec
            body = blob[nl + 1:]
            bits = np.frombuffer(body[off:off + ln], dtype=np.uint8)
            return bool(_probe_bits(bits, vm, vk,
                                    _column_hash(needle)).any())
    return None


def value_may_contain(blob: bytes, col: str, needle: pa.Array) -> bool:
    """True if the file may contain ANY of the needle values in ``col``
    (cast the needles to the column's type first). Returns True — never
    prune — when the sidecar has no value bloom for the column (v1
    sidecar, or the column wasn't configured/present at write time)."""
    nl = blob.index(b"\n")
    hdr = json.loads(blob[:nl])
    spec = hdr.get("vals", {}).get(col)
    if spec is None:
        return True
    vm, vk, vn, off, ln = spec
    body = blob[nl + 1:]
    bits = np.frombuffer(body[off:off + ln], dtype=np.uint8)
    return bool(_probe_bits(bits, vm, vk, _column_hash(needle)).any())


def prune_files(files: list[str], repos: list[str],
                paths: list[str]) -> list[str]:
    """Drop files whose sidecar proves NO needle key can be present.
    Files without a sidecar are kept (no pruning without evidence).
    ``repos``/``paths`` are the PAIRED needle key columns."""
    repo_a = pa.array(repos, pa.string())
    path_a = pa.array(paths, pa.string())
    keep = []
    for f in files:
        sp = sidecar_path(f)
        if os.path.exists(sp):
            with open(sp, "rb") as fh:
                blob = fh.read()
            if not may_contain(blob, repo_a, path_a).any():
                continue
        keep.append(f)
    return keep
