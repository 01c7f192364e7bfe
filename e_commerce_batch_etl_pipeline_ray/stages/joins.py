"""Joins / lookups (SURVEY.md §2.4).

J1/J2 — broadcast lookup join: the reference broadcasts a 15-row
country->region table (``F.broadcast`` src/pipeline.py:61-99) and a 10-row
category metadata table (notebooks/06_optimizations.py:168-230). Ray-native
equivalent: the small side is an Arrow table shipped ONCE per worker via
``ray.put`` and mapped per batch with a vectorized ``pc.index_in`` + ``take``
— zero shuffle, the literal broadcast-join.

J3 — large-large hash join: ``Dataset.join`` (hash-partitioned) when
available; used for orders ⋈ customer style joins
(notebooks/06_optimizations.py:200-203 shows the non-broadcast path).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray

from e_commerce_batch_etl_pipeline_ray.core import FnStep
from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
    collect_arrow,
    collect_block_refs,
)


class _BroadcastLookup:
    """Actor-pool/task callable: resolves the broadcast ref once per worker
    process (in __init__ for actors; lazily for tasks) and maps every batch
    vectorized."""

    def __init__(self, small_ref, on: str, small_key: str,
                 value_cols: Sequence[str], defaults: Mapping[str, object]):
        small: pa.Table = ray.get(small_ref)
        self.on = on
        self.small_key = small.column(small_key).combine_chunks()
        self.values = {c: small.column(c).combine_chunks() for c in value_cols}
        self.defaults = dict(defaults)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[self.on], value_set=self.small_key)
        for name, col in self.values.items():
            # take with null indices yields null -> fill with default
            looked = pc.take(col, idx)
            if name in self.defaults:
                looked = pc.fill_null(looked, self.defaults[name])
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, looked)
            else:
                batch = batch.append_column(name, looked)
        return batch


def broadcast_lookup(small: pa.Table, on: str, small_key: str | None = None,
                     value_cols: Sequence[str] | None = None,
                     defaults: Mapping[str, object] | None = None) -> FnStep:
    """J1/J2 — left join against a small table, broadcast once.

    ``defaults`` fills non-matches (the reference's
    ``fillna({"region": "Other"})`` src/pipeline.py:96).
    """
    small_key = small_key or on
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in small.column_names if c != small_key]
    defaults = defaults or {}
    ref = ray.put(small)

    def _apply(ds):
        return ds.map_batches(
            _BroadcastLookup, batch_format="pyarrow", zero_copy_batch=True,
            fn_constructor_args=(ref, on, small_key, value_cols, defaults),
            concurrency=(1, 8))
    return FnStep(f"broadcast_lookup[{on}]", _apply)


def broadcast_dict_lookup(mapping: Mapping[str, object], on: str, out: str,
                          default: object = None) -> FnStep:
    """Tiny-dict variant of J1 (closure-captured, like the reference's 15-row
    literal list src/pipeline.py:71-87): vectorized via index_in over the
    dict's key array."""
    keys = pa.array(list(mapping.keys()))
    vals = pa.array(list(mapping.values()))

    def _fn(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[on], value_set=keys)
        looked = pc.fill_null(pc.take(vals, idx), default) if default is not None \
            else pc.take(vals, idx)
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, looked)
        return t.append_column(out, looked)

    def _apply(ds):
        return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)
    return FnStep(f"dict_lookup[{on}->{out}]", _apply)


def hash_join(right, on: Sequence[str] | str, join_type: str = "inner",
              right_on: Sequence[str] | str | None = None,
              num_partitions: int = 16, right_suffix: str = "_r") -> FnStep:
    """J3 — large-large hash-partitioned join via ``Dataset.join``.

    ``right`` is a Dataset. Both sides are hash-partitioned on the key —
    an all-to-all shuffle; prefer broadcast_lookup when one side is small.
    """
    on_cols = (on,) if isinstance(on, str) else tuple(on)
    r_on = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))

    def _apply(ds):
        return ds.join(right, join_type=join_type, on=on_cols, right_on=r_on,
                       num_partitions=num_partitions,
                       right_suffix=right_suffix)
    return FnStep(f"hash_join[{','.join(on_cols)}]", _apply)


def broadcast_semi_join(keys: pa.Table | "ray.data.Dataset", on: str,
                        anti: bool = False) -> FnStep:
    """Semi/anti join against a broadcast key set (ray_guide pattern): keep
    rows whose ``on`` value IS (semi) / IS NOT (anti) in the key set. The
    key set ships once via ray.put; each batch filters with a vectorized
    ``pc.is_in`` — no shuffle. Beyond the reference's operator set (it has
    no semi/anti joins) but required for blocklist/allowlist filtering in
    training-data pipelines.
    """
    import ray.data as rd
    if isinstance(keys, rd.Dataset):
        keys = collect_arrow(keys)
    key_arr = keys.column(0).combine_chunks() if keys.num_columns else pa.array([])
    ref = ray.put(key_arr)

    class _SemiJoin:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[on], value_set=self.keys)
            mask = pc.fill_null(mask, False)
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

    def _apply(ds):
        return ds.map_batches(_SemiJoin, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))
    return FnStep(f"{'anti' if anti else 'semi'}_join[{on}]", _apply)


def _bloom_hashes(values, num_bits: int, num_hashes: int):
    """k bit-positions per value via double hashing of the pandas siphash
    (the same deterministic value hash the partitioner uses)."""
    import numpy as np
    import pandas as pd
    h = pd.util.hash_pandas_object(
        values.to_pandas() if hasattr(values, "to_pandas") else pd.Series(values),
        index=False, categorize=False).to_numpy().astype(np.uint64)
    h2 = (h * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    m = np.uint64(num_bits)
    with np.errstate(over="ignore"):
        return [((h + np.uint64(i) * h2) % m).astype(np.int64)
                for i in range(num_hashes)]


def build_bloom(keys: "ray.data.Dataset | pa.Table", on: str,
                num_bits: int = 1 << 23, num_hashes: int = 4) -> bytes:
    """Distributed Bloom-filter build over a key column: each block emits a
    partial bitmap (num_bits/8 bytes regardless of key count), OR-reduced.
    Default 1 MiB / 4 hashes ~= 2.4% FP rate at 1M keys."""
    import numpy as np

    import ray.data as rd

    nbytes = num_bits // 8

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if t.num_rows:
            for idx in _bloom_hashes(t[on].combine_chunks(), num_bits, num_hashes):
                np.bitwise_or.at(bm, idx >> 3,
                                 (np.uint8(1) << (idx & 7).astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    if isinstance(keys, pa.Table):
        keys = rd.from_arrow(keys)
    partials = keys.map_batches(_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = np.zeros(nbytes, dtype=np.uint8)
    for ref in collect_block_refs(partials):
        t = ray.get(ref)
        for b in t["bm"].to_pylist() if "bm" in t.column_names else []:
            out |= np.frombuffer(b, dtype=np.uint8)
    return out.tobytes()


def bloom_semi_join(keys: "ray.data.Dataset | pa.Table", on: str,
                    num_bits: int = 1 << 23, num_hashes: int = 4) -> FnStep:
    """Bloom-filter SEMI-join prefilter for key sets too large to broadcast
    exactly (VERDICT r1 missing #4): ships a fixed-size bitmap (default
    1 MiB) once via ray.put instead of the raw key array, keeps every row
    whose key is PROBABLY in the set — no false negatives, a tunable few
    percent of false positives. Compose with an exact semi-join or a
    partitioned hash join downstream when exactness is required; as a
    prefilter it cuts the exact stage's input by the non-member fraction.

    NOT valid for anti-joins on its own (a false positive would DROP a
    legitimate row).
    """
    import numpy as np

    bitmap = build_bloom(keys, on, num_bits, num_hashes)
    bm_ref = ray.put(np.frombuffer(bitmap, dtype=np.uint8))

    class _BloomFilter:
        def __init__(self):
            self.bm = ray.get(bm_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            member = np.ones(t.num_rows, dtype=bool)
            for idx in _bloom_hashes(t[on].combine_chunks(), num_bits, num_hashes):
                member &= (self.bm[idx >> 3]
                           & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
            return t.filter(pa.array(member))

    def _apply(ds):
        return ds.map_batches(_BloomFilter, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))
    return FnStep(f"bloom_semi[{on}]", _apply)


def interval_join(points, intervals, ts_col: str, start_col: str,
                  end_col: str, key_col: str | None = None,
                  bucket_minutes: int = 60,
                  num_partitions: int = 32):
    """Distributed range/interval join: each point row is matched with
    every interval row satisfying ``start <= ts < end`` (and, when
    ``key_col`` is given, the same key) — the event-in-window shape
    (attribution windows, campaign periods, validity intervals) that a
    plain equi-join cannot express.

    Scale shape (ray_guide 'As-of / range join' generalization): time is
    bucketed at ``bucket_minutes``; every interval row is replicated to
    each bucket it covers (fan-out = interval length / bucket width — pick
    the bucket near the typical interval length), every point lands in
    exactly ONE bucket, both sides hash-shuffle ONCE on (key, bucket),
    and each partition does one vectorized pandas merge+filter. No
    replicated point rows means no output dedup pass is needed.

    Column names (other than ``key_col``) must be disjoint across sides.
    Returns point columns + interval columns, inner-join semantics.
    """
    import numpy as np
    import pandas as pd

    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )

    pcols = list(points.schema().names)
    icols = list(intervals.schema().names)
    shared = (set(pcols) & set(icols)) - ({key_col} if key_col else set())
    if shared:
        raise ValueError(f"interval_join column clash: {sorted(shared)}")
    out_icols = [c for c in icols if c != key_col]
    # resolve field types EAGERLY — the map closures must not capture the
    # Dataset objects themselves
    itypes = {c: intervals.schema().base_schema.field(c).type for c in icols}
    ptypes = {c: points.schema().base_schema.field(c).type for c in pcols}
    gus = np.int64(bucket_minutes) * 60_000_000    # bucket width in us
    all_cols = pcols + out_icols + ["_bkt", "_ivl"]

    def _bucketize_points(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        bkt = pc.floor(pc.divide(us.cast(pa.float64()), pa.scalar(float(gus))))
        t = t.append_column("_bkt", bkt.cast(pa.int64()))
        for c in out_icols:
            t = t.append_column(c, pa.nulls(t.num_rows, itypes[c]))
        t = t.append_column("_ivl", pa.array(
            np.zeros(t.num_rows, dtype=np.int8), pa.int8()))
        return t.select(all_cols)   # one column order across the union

    def _explode_intervals(t: pa.Table) -> pa.Table:
        s = t[start_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        e = t[end_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        b0 = s // gus
        # end EXCLUSIVE: the last covered bucket holds end - 1us
        b1 = np.maximum(b0, (np.maximum(e, s + 1) - 1) // gus)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), reps)
        # bucket sequence per replica: global arange minus each row's base
        off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        out = t.take(pa.array(idx, pa.int64()))
        out = out.append_column("_bkt", pa.array(b0[idx] + off, pa.int64()))
        for c in pcols:
            if c == key_col:
                continue
            out = out.append_column(c, pa.nulls(out.num_rows, ptypes[c]))
        out = out.append_column("_ivl", pa.array(
            np.ones(out.num_rows, dtype=np.int8), pa.int8()))
        return out.select(all_cols)

    part_keys = ([key_col] if key_col else []) + ["_bkt"]

    def _align(t: pa.Table) -> pa.Table:
        pid = hash_partition_ids(t, part_keys, num_partitions)
        return t.append_column("_rjpid", pa.array(pid, pa.int32()))

    tagged = points.map_batches(_bucketize_points, batch_format="pyarrow") \
        .union(intervals.map_batches(_explode_intervals,
                                     batch_format="pyarrow"))
    tagged = tagged.map_batches(_align, batch_format="pyarrow",
                                zero_copy_batch=True)

    merge_on = ([key_col] if key_col else []) + ["_bkt"]

    def _per_partition(g: pd.DataFrame) -> pd.DataFrame:
        pts = g[g._ivl == 0][pcols + ["_bkt"]]
        ivls = g[g._ivl == 1][([key_col] if key_col else [])
                              + out_icols + ["_bkt"]]
        if pts.empty or ivls.empty:
            return pd.DataFrame(columns=pcols + out_icols)
        m = pts.merge(ivls, on=merge_on)
        m = m[(m[start_col] <= m[ts_col]) & (m[ts_col] < m[end_col])]
        return m[pcols + out_icols]

    out = tagged.groupby("_rjpid").map_groups(_per_partition,
                                              batch_format="pandas")
    # the union's null padding made pandas promote int columns to float —
    # restore the source Arrow types
    out_schema = pa.schema([(c, ptypes[c]) for c in pcols]
                           + [(c, itypes[c]) for c in out_icols])

    def _cast(t: pa.Table) -> pa.Table:
        return t.select(out_schema.names).cast(out_schema)

    return out.map_batches(_cast, batch_format="pyarrow",
                           zero_copy_batch=True)


def salted_join(right, on: Sequence[str] | str, salt: int = 8,
                right_on: Sequence[str] | str | None = None,
                join_type: str = "inner",
                num_partitions: int = 16) -> FnStep:
    """Hot-key-safe shuffle join (SURVEY.md §7.4 #6): a plain hash join
    sends EVERY row of a hot key to one partition — one straggler task
    owns the skew. Salting splits each left key across ``salt``
    sub-partitions (a per-row cyclic salt — any assignment is correct for
    inner joins) and replicates each RIGHT row to all ``salt`` values, so
    the join key becomes (key, salt) and the hot key's work spreads over
    ``salt`` tasks. Cost: right side ships salt-fold — use when the right
    side is modest but too large (or too hot) to broadcast; result is
    IDENTICAL to the unsalted join.
    """
    import numpy as np

    on = [on] if isinstance(on, str) else list(on)
    ron = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if join_type != "inner":
        raise ValueError("salted_join supports inner joins (outer semantics "
                         "would need per-salt null-match reconciliation)")

    def _salt_left(t: pa.Table) -> pa.Table:
        return t.append_column("_salt", pa.array(
            np.arange(t.num_rows, dtype=np.int64) % salt, pa.int64()))

    def _replicate_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), salt)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("_salt", pa.array(
            np.tile(np.arange(salt, dtype=np.int64), n), pa.int64()))

    def _apply(ds):
        from e_commerce_batch_etl_pipeline_ray.stages.blockutil import detach
        r = right.map_batches(_replicate_right, batch_format="pyarrow",
                              zero_copy_batch=True)
        rs = right.schema().base_schema
        r = detach(r, pa.schema(list(rs) + [pa.field("_salt", pa.int64())]))
        lds = ds.map_batches(_salt_left, batch_format="pyarrow",
                             zero_copy_batch=True)
        joined = lds.join(r, join_type=join_type, on=tuple(on + ["_salt"]),
                          right_on=tuple(ron + ["_salt"]),
                          num_partitions=num_partitions)
        return joined.drop_columns(["_salt"])

    return FnStep(f"salted_join[{salt}x]", _apply)


def cross_join(small: pa.Table, num_cpus: float | None = None) -> FnStep:
    """CROSS JOIN against a SMALL broadcast side: the small table is
    ``ray.put`` once and every batch emits the vectorized cartesian
    product (left rows repeated, small side tiled — two take kernels, no
    shuffle). Output size is |left| x |small|: guard against accidental
    blow-ups by keeping ``small`` a dimension table (<= a few thousand
    rows). Name collisions raise."""
    import numpy as np

    if not isinstance(small, pa.Table):
        raise TypeError("cross_join small side must be a pyarrow Table")
    small = small.combine_chunks()

    def _apply(ds):
        small_ref = ray.put(small)  # put at apply time (Ray session owned
        # by the caller), read once per task from the object store

        def _fn(t: pa.Table) -> pa.Table:
            s = ray.get(small_ref)
            dup = set(t.column_names) & set(s.column_names)
            if dup:
                raise ValueError(f"cross_join: colliding columns {sorted(dup)}")
            n, m = t.num_rows, s.num_rows
            if n == 0 or m == 0:
                return pa.Table.from_arrays(
                    [pa.nulls(0, f.type) for f in t.schema] +
                    [pa.nulls(0, f.type) for f in s.schema],
                    names=list(t.column_names) + list(s.column_names))
            left = t.take(np.repeat(np.arange(n, dtype=np.int64), m))
            right = s.take(np.tile(np.arange(m, dtype=np.int64), n))
            for name in right.column_names:
                left = left.append_column(name, right[name])
            return left
        kwargs = {"num_cpus": num_cpus} if num_cpus else {}
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True, **kwargs)

    return FnStep("cross_join", _apply)
