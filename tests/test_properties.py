"""Property-based tests (hypothesis) for the correctness-critical kernels:
the LWW combine (the CDC upsert core), keyed dedup vs a pandas oracle,
bucketize edge behavior, and the deterministic partitioner."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from e_commerce_batch_etl_pipeline_ray.functions import scalar as F
from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
    combine_keep_extreme,
    hash_partition_ids,
)

rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d", "e"]),       # key1
              st.integers(0, 3),                                 # key2
              st.integers(0, 100),                               # lsn
              st.text(alphabet="xyz", min_size=0, max_size=4)),  # payload
    min_size=1, max_size=200)


def _table(rows):
    return pa.table({
        "k1": pa.array([r[0] for r in rows]),
        "k2": pa.array([r[1] for r in rows], pa.int64()),
        "lsn": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows]),
    })


@settings(max_examples=60, deadline=None)
@given(rows_strategy)
def test_combine_keep_extreme_matches_pandas_oracle(rows):
    """Winner per (k1,k2) == pandas idxmax on lsn (ties broken by payload
    desc to make both sides deterministic)."""
    t = _table(rows)
    got = combine_keep_extreme(t, ["k1", "k2"], ["lsn", "v"], descending=True)
    df = t.to_pandas().sort_values(["k1", "k2", "lsn", "v"],
                                   ascending=[True, True, False, False])
    exp = df.drop_duplicates(["k1", "k2"], keep="first")
    got_m = {(r.k1, r.k2): (r.lsn, r.v) for r in got.to_pandas().itertuples()}
    exp_m = {(r.k1, r.k2): (r.lsn, r.v) for r in exp.itertuples()}
    assert got_m == exp_m
    # output is sorted by key (the compacted-layout invariant)
    gk = list(zip(got["k1"].to_pylist(), got["k2"].to_pylist()))
    assert gk == sorted(gk)


@settings(max_examples=40, deadline=None)
@given(rows_strategy, st.integers(1, 4))
def test_combine_is_associative_over_splits(rows, n_splits):
    """Combining any block partition of the input then combining the results
    equals combining everything at once — the property that makes the
    per-batch combiner + per-partition reduce correct at ANY block layout."""
    t = _table(rows)
    whole = combine_keep_extreme(t, ["k1", "k2"], ["lsn", "v"], descending=True)
    n = t.num_rows
    bounds = sorted({0, n} | set(np.linspace(0, n, n_splits + 1, dtype=int)))
    parts = [t.slice(a, b - a) for a, b in zip(bounds, bounds[1:]) if b > a]
    partials = [combine_keep_extreme(p, ["k1", "k2"], ["lsn", "v"], descending=True)
                for p in parts]
    recombined = combine_keep_extreme(
        pa.concat_tables(partials), ["k1", "k2"], ["lsn", "v"], descending=True)
    assert whole.to_pydict() == recombined.to_pydict()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(-1e6, 1e6, allow_nan=False)),
                min_size=1, max_size=100))
def test_bucketize_total_and_ordered(values):
    """Every non-null value lands in exactly the bucket whose range holds it;
    nulls stay null."""
    thresholds = [0.0, 100.0, 1000.0]
    labels = ["neg", "small", "mid", "big"]
    out = F.bucketize(pa.array(values, pa.float64()), thresholds, labels)
    for v, lab in zip(values, out.to_pylist()):
        if v is None:
            assert lab is None
        elif v < 0:
            assert lab == "neg"
        elif v < 100:
            assert lab == "small"
        elif v < 1000:
            assert lab == "mid"
        else:
            assert lab == "big"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.text(min_size=0, max_size=8),
                          st.text(min_size=0, max_size=8)),
                min_size=1, max_size=100),
       st.integers(1, 64))
def test_hash_partition_ids_stable_and_in_range(pairs, p):
    """Partitioner is pure: same rows -> same ids (any order/duplication),
    ids within [0, P)."""
    t = pa.table({"repo": [a for a, _ in pairs], "path": [b for _, b in pairs]})
    ids1 = hash_partition_ids(t, ["repo", "path"], p)
    ids2 = hash_partition_ids(t, ["repo", "path"], p)
    assert (ids1 == ids2).all()
    assert ids1.min() >= 0 and ids1.max() < p
    # row-order independence: shuffled table gives the same id per row value
    perm = np.random.RandomState(0).permutation(len(pairs))
    t2 = t.take(pa.array(perm))
    ids3 = hash_partition_ids(t2, ["repo", "path"], p)
    assert (ids3 == ids1[perm]).all()


# --- sampling hash SQL parity (the q35/q36 oracle invariant) ---------------

@settings(max_examples=40, deadline=None)
@given(ids=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=300,
                    unique=True),
       seed=st.integers(0, 10_000))
def test_unit_hash_matches_duckdb_exactly(ids, seed):
    """The Knuth u32 unit hash must agree bit-for-bit with its documented
    SQL expression — the invariant every sampling/split oracle rests on."""
    import duckdb

    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        _unit_hash,
        sql_unit_hash,
    )
    got = _unit_hash(np.asarray(ids, dtype=np.int64), seed)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    exp = [r[0] for r in con.execute(
        f"SELECT {sql_unit_hash('id', seed)} FROM t ORDER BY rowid").fetchall()]
    assert got.tolist() == exp


@settings(max_examples=10, deadline=None)
@given(ids_a=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=150,
                      unique=True),
       ids_b=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=150,
                      unique=True),
       frac_a=st.floats(0.0, 1.0, allow_nan=False),
       frac_b=st.floats(0.0, 1.0, allow_nan=False),
       seed=st.integers(0, 10_000))
def test_mixture_matches_duckdb_exactly(ids_a, ids_b, frac_a, frac_b, seed):
    """Multi-source mixture SQL parity (extends the q36 oracle to arbitrary
    rates/seeds): the Ray mixture's per-row membership AND provenance tag
    equal the SQL reproduction (per-source hash predicate + UNION ALL) —
    bit-for-bit, at any fraction, including 0 and 1."""
    import duckdb

    import ray.data
    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        mixture,
        sql_unit_hash,
    )

    srcs = {"a": ids_a, "b": ids_b}
    datasets = [(n, ray.data.from_arrow(
        pa.table({"id": pa.array(v, pa.int64())}))) for n, v in srcs.items()]
    got = mixture(datasets, ["id", "id"], [frac_a, frac_b],
                  seed=seed).to_pandas()
    # an all-empty mixture comes back as a 0-row, column-less frame
    got_set = (set() if got.empty
               else set(zip(got["id"], got["_source"])))

    con = duckdb.connect()
    for n, v in srcs.items():
        con.execute(f"CREATE TABLE t_{n}(id BIGINT)")
        con.executemany(f"INSERT INTO t_{n} VALUES (?)", [(i,) for i in v])
    exp = con.execute(f"""
        SELECT id, 'a' AS _source FROM t_a
        WHERE {sql_unit_hash('id', seed)} < {frac_a!r}
        UNION ALL
        SELECT id, 'b' FROM t_b
        WHERE {sql_unit_hash('id', seed)} < {frac_b!r}
    """).fetchall()
    assert got_set == set(exp)
    assert len(got) == len(exp)          # no dup/loss through the union


# --- window frame kernels vs a brute-force per-row reference ----------------

frame_rows = st.lists(
    st.tuples(st.integers(1, 3),                 # key
              st.integers(0, 50),                # order/ts offset (minutes)
              st.one_of(st.none(),
                        st.floats(-100, 100, allow_nan=False))),  # value
    min_size=1, max_size=80)


@settings(max_examples=40, deadline=None)
@given(frame_rows, st.integers(0, 4))
def test_rows_frame_kernel_matches_bruteforce(rows, prec):
    """sum/avg/min/max/count over ROWS BETWEEN p PRECEDING AND CURRENT ROW
    == an O(n^2) per-row reference, including null skipping and all-null
    frames."""
    from e_commerce_batch_etl_pipeline_ray.stages.streaming import window_pass

    df = pd.DataFrame({"k": [r[0] for r in rows],
                       "o": range(len(rows)),
                       "v": [r[2] for r in rows]})
    fn = window_pass("k", ["o"], [
        {"kind": "sum", "col": "v", "rows_preceding": prec, "out": "s"},
        {"kind": "avg", "col": "v", "rows_preceding": prec, "out": "a"},
        {"kind": "min", "col": "v", "rows_preceding": prec, "out": "lo"},
        {"kind": "max", "col": "v", "rows_preceding": prec, "out": "hi"},
        {"kind": "count", "col": "v", "rows_preceding": prec, "out": "c"},
    ])
    got = fn(df.copy()).sort_values(["k", "o"]).reset_index(drop=True)
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    for i in range(len(ref)):
        k = ref.loc[i, "k"]
        # ROWS frame is POSITIONAL within the key: the last prec+1 rows
        grp = ref[ref.k == k].reset_index()
        pos = int(grp.index[grp["index"] == i][0])
        w = grp.loc[max(0, pos - prec):pos, "v"].dropna()
        assert int(got.loc[i, "c"]) == len(w)
        if len(w) == 0:
            assert pd.isna(got.loc[i, "s"]) and pd.isna(got.loc[i, "a"])
            assert pd.isna(got.loc[i, "lo"]) and pd.isna(got.loc[i, "hi"])
        else:
            assert abs(got.loc[i, "s"] - w.sum()) < 1e-6
            assert abs(got.loc[i, "a"] - w.mean()) < 1e-6
            assert got.loc[i, "lo"] == w.min() and got.loc[i, "hi"] == w.max()


@settings(max_examples=40, deadline=None)
@given(frame_rows, st.integers(0, 20))
def test_range_frame_kernel_matches_bruteforce(rows, win_minutes):
    """RANGE INTERVAL x PRECEDING (closed, peer-inclusive) == the O(n^2)
    per-row definition, with DUPLICATE timestamps allowed."""
    from e_commerce_batch_etl_pipeline_ray.stages.streaming import window_pass

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [r[0] for r in rows],
        "ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
        "seq": range(len(rows)),
        "v": [r[2] for r in rows]})
    w = pd.Timedelta(minutes=win_minutes)
    fn = window_pass("k", ["ts", "seq"], [
        {"kind": "sum", "col": "v", "range_preceding": w, "out": "s"},
        {"kind": "count", "col": "v", "range_preceding": w, "out": "c"},
    ])
    got = fn(df.copy()).sort_values(["k", "seq"]).reset_index(drop=True)
    ref = df.sort_values(["k", "seq"]).reset_index(drop=True)
    for i in range(len(ref)):
        k, ts = ref.loc[i, "k"], ref.loc[i, "ts"]
        win = ref[(ref.k == k) & (ref.ts <= ts) & (ref.ts >= ts - w)]["v"] \
            .dropna()
        assert int(got.loc[i, "c"]) == len(win), (i, k, ts)
        if len(win) == 0:
            assert pd.isna(got.loc[i, "s"])
        else:
            assert abs(got.loc[i, "s"] - win.sum()) < 1e-6


# --- incremental aggregate == batch under random splits ---------------------

inc_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.floats(-1000, 1000, allow_nan=False)),
    min_size=1, max_size=120)


@settings(max_examples=25, deadline=None)
@given(inc_rows, st.integers(1, 5), st.randoms(use_true_random=False))
def test_incremental_aggregate_split_invariant(rows, n_splits, rnd):
    """Folding ANY partition of the input as deltas (including empty
    deltas) finalizes to the same result as one batch pass — the
    mergeable-partials closure property behind IncrementalAggregate."""
    import numpy as np
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.stages import aggregates

    aggs = [("count", None, "n"), ("sum", "v", "s"), ("mean", "v", "m"),
            ("min", "v", "lo"), ("max", "v", "hi"), ("std", "v", "sd")]

    def _tbl(rs):
        return pa.table({"g": pa.array([r[0] for r in rs]),
                         "v": pa.array([round(r[1], 3) for r in rs],
                                       pa.float64())})

    batch = aggregates.IncrementalAggregate(["g"], aggs) \
        .update(ray.data.from_arrow(_tbl(rows))).result().to_pandas() \
        .sort_values("g").reset_index(drop=True)

    shuffled = list(rows)
    rnd.shuffle(shuffled)
    cuts = sorted(rnd.randrange(0, len(shuffled) + 1)
                  for _ in range(n_splits - 1))
    pieces, prev = [], 0
    for c in cuts + [len(shuffled)]:
        pieces.append(shuffled[prev:c])
        prev = c
    inc = aggregates.IncrementalAggregate(["g"], aggs)
    for piece in pieces:
        if piece:
            inc.update(ray.data.from_arrow(_tbl(piece)))
        else:
            inc.update(ray.data.from_arrow(_tbl([]).slice(0, 0)))
    got = inc.result().to_pandas().sort_values("g").reset_index(drop=True)
    assert list(got.g) == list(batch.g)
    for c in ("n", "lo", "hi"):
        assert (got[c] == batch[c]).all()
    for c in ("s", "m", "sd"):
        a = got[c].to_numpy(dtype=float)
        b = batch[c].to_numpy(dtype=float)
        ok = np.isclose(a, b, atol=1e-6, equal_nan=True)
        assert ok.all(), (c, a, b)


# ---------------------------------------------------------------------------
# Change-feed algebra: for ANY event log split at ANY point,
# apply_feed(live(prefix-state), diff(prefix-state, full-state)) must
# reproduce live(full-state) exactly — pure-kernel property, no engine.

@settings(max_examples=60, deadline=None)
@given(
    ops=st.lists(st.tuples(st.integers(0, 5), st.sampled_from("IUD")),
                 min_size=0, max_size=40),
    split_frac=st.floats(0.0, 1.0),
)
def test_change_feed_diff_apply_roundtrip(ops, split_frac):
    from e_commerce_batch_etl_pipeline_ray.cdc import feed as F

    def replay(evs):
        state = {}
        for lsn, (k, op) in evs:
            state[k] = (lsn, op)
        return state

    def to_table(state):
        rows = [{"lsn": lsn, "repo": f"r{k}", "path": f"p{k}",
                 "commit": f"c{lsn}", "_deleted": op == "D"}
                for k, (lsn, op) in sorted(state.items())]
        schema = pa.schema([("lsn", pa.int64()), ("repo", pa.string()),
                            ("path", pa.string()), ("commit", pa.string()),
                            ("_deleted", pa.bool_())])
        return pa.Table.from_pylist(rows, schema=schema)

    events = list(enumerate(ops))
    cut = int(len(events) * split_frac)
    prev_t = to_table(replay(events[:cut]))
    cur_t = to_table(replay(events))
    out_schema = F._feed_schema(prev_t.schema)
    fd = F._diff_states(prev_t, cur_t, 1, out_schema)

    def live(t):
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["_deleted"], False))
        return t.drop_columns(["_deleted"])

    rebuilt = F.apply_feed(live(prev_t), fd)
    expect = live(cur_t)
    got = {(r["repo"], r["path"]): (r["lsn"], r["commit"])
           for r in rebuilt.to_pylist()}
    exp = {(r["repo"], r["path"]): (r["lsn"], r["commit"])
           for r in expect.to_pylist()}
    assert got == exp
    # each key appears with a coherent change set: insert xor delete xor
    # (update_preimage + update_postimage), never mixed
    by_key = {}
    for r in fd.to_pylist():
        by_key.setdefault((r["repo"], r["path"]), set()).add(r["_change_type"])
    for types in by_key.values():
        assert types in ({"insert"}, {"delete"},
                         {"update_preimage", "update_postimage"})


# ---------------------------------------------------------------------------
# MERGE kernel algebra: for ANY prior state (live/tombstoned keys) and ANY
# source (with duplicate keys), the vectorized apply_merge equals a
# row-by-row Python oracle under parameterized clause predicates.

@settings(max_examples=80, deadline=None)
@given(
    prior_rows=st.lists(st.tuples(st.integers(0, 7), st.booleans()),
                        min_size=0, max_size=8, unique_by=lambda r: r[0]),
    src_rows=st.lists(st.tuples(st.integers(0, 7), st.integers(0, 99),
                                st.integers(0, 3)),
                      min_size=0, max_size=12),
    insert_on=st.booleans(),
    del_tag=st.integers(0, 3),
)
def test_merge_kernel_matches_row_oracle(prior_rows, src_rows, insert_on,
                                         del_tag):
    from e_commerce_batch_etl_pipeline_ray.cdc.merge import apply_merge

    schema = pa.schema([("lsn", pa.int64()), ("repo", pa.string()),
                        ("path", pa.string()), ("tag", pa.int64()),
                        ("_deleted", pa.bool_())])
    prior = pa.Table.from_pylist(
        [{"lsn": 1000 + k, "repo": "r", "path": f"p{k}",
          "tag": k % 4, "_deleted": dead}
         for k, dead in sorted(prior_rows)], schema=schema)
    src = pa.Table.from_pylist(
        [{"lsn": lsn, "repo": "r", "path": f"p{k}", "tag": tag,
          "_deleted": False}
         for k, lsn, tag in src_rows], schema=schema)

    def upd(s, t):            # update when the source tag differs
        import pyarrow.compute as pc_
        return pc_.not_equal(s["tag"], t["tag"])

    def dele(s, t):           # delete when source tag == del_tag
        import pyarrow.compute as pc_
        return pc_.equal(s["tag"], del_tag)

    merged, _ = apply_merge(prior, src, schema, upd, dele, insert_on)
    got = {r["path"]: (r["lsn"], r["tag"], r["_deleted"])
           for r in merged.to_pylist()}

    # row-by-row oracle
    state = {r["path"]: dict(r) for r in prior.to_pylist()}
    # source dedupe: highest lsn per key
    best: dict = {}
    for r in src.to_pylist():
        if r["path"] not in best or r["lsn"] > best[r["path"]]["lsn"]:
            best[r["path"]] = r
    for p, r in best.items():
        cur = state.get(p)
        live = cur is not None and not cur["_deleted"]
        if live:
            if r["tag"] == del_tag:
                state[p] = {"lsn": r["lsn"], "repo": "r", "path": p,
                            "tag": None, "_deleted": True}
            elif r["tag"] != cur["tag"]:
                state[p] = dict(r)
        elif insert_on:
            state[p] = dict(r)            # insert (revives tombstones)
    exp = {p: (r["lsn"], r["tag"], r["_deleted"]) for p, r in state.items()}
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(ids=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=200,
                    unique=True),
       seed=st.integers(0, 10_000),
       rate=st.floats(1e-6, 1.0, allow_nan=False))
def test_weighted_sample_matches_duckdb_exactly(ids, seed, rate):
    """Weighted Bernoulli selection (q123): u < rate * w must pick the
    SAME id set as the SQL twin for ANY ids/seed/rate — the hash is
    exact integer arithmetic and rate*w one correctly-rounded multiply,
    so there is no tolerance, the sets are equal."""
    import duckdb

    import pyarrow as pa

    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        _unit_hash,
        sql_unit_hash,
    )
    ids_np = np.asarray(ids, dtype=np.int64)
    w = ((ids_np * 37) % 5000).astype(np.float64)   # deterministic weights
    u = _unit_hash(ids_np, seed)
    keep = set(ids_np[u < np.minimum(1.0, rate * w)].tolist())
    con = duckdb.connect()
    con.register("t", pa.table({"id": ids_np, "w": w}))
    exp = {r[0] for r in con.execute(
        f"SELECT id FROM t WHERE {sql_unit_hash('id', seed)}"
        f" < LEAST(1.0, {rate!r} * w)").fetchall()}
    assert keep == exp


@settings(max_examples=20, deadline=None)
@given(ids=st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=200,
                    unique=True),
       seed=st.integers(0, 10_000),
       k=st.integers(1, 50))
def test_weighted_topk_open_hash_and_race_parity(ids, seed, k):
    """The (0,1)-open hash matches its SQL twin bit-for-bit, and the
    driver-side E-S race (sorted ln(u)/w) picks the same ids as the SQL
    replay on random inputs (1-ulp order ties never observed — the
    q124 oracle caveat, exercised here across arbitrary draws)."""
    import duckdb

    import pyarrow as pa

    from e_commerce_batch_etl_pipeline_ray.stages.sampling import (
        _unit_hash_open,
        sql_unit_hash_open,
    )
    ids_np = np.asarray(ids, dtype=np.int64)
    w = ((ids_np * 13) % 997 + 1).astype(np.float64)
    u = _unit_hash_open(ids_np, seed)
    con = duckdb.connect()
    con.register("t", pa.table({"id": ids_np, "w": w}))
    exp_u = np.array([r[0] for r in con.execute(
        f"SELECT {sql_unit_hash_open('id', seed)} FROM t").fetchall()])
    assert u.tolist() == exp_u.tolist()
    key = np.log(u) / w
    order = np.lexsort((ids_np, -key))
    got = ids_np[order[:k]].tolist()
    exp = [r[0] for r in con.execute(
        f"SELECT id FROM t ORDER BY ln({sql_unit_hash_open('id', seed)})"
        f" / w DESC, id LIMIT {k}").fetchall()]
    assert got == exp
