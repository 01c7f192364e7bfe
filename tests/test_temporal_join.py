"""Point-in-time (temporal) join against SCD2 history: brute-force
parity incl. deletion gaps, pre-first-version facts, open versions, and
column-collision suffixing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, scd2

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=8, paths_per_repo=40,
                         evolution_epoch=0, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1500)
N_EPOCHS = 2


def _events() -> pa.Table:
    return pa.concat_tables(
        [binlog.gen_epoch_table(SPEC, e) for e in range(N_EPOCHS)],
        promote_options="permissive")


def _brute(events: pa.Table, probes: list[tuple[str, str, int]]) -> dict:
    """(repo, path, at) -> commit or None, via linear replay."""
    logs: dict = {}
    seen = set()
    for r in sorted(events.to_pylist(), key=lambda r: r["lsn"]):
        k = (r["repo"], r["path"], r["lsn"])
        if k in seen:
            continue               # duplicate delivery
        seen.add(k)
        logs.setdefault((r["repo"], r["path"]), []).append(
            (r["lsn"], r["op"], r["commit"]))
    out = {}
    for repo, path, at in probes:
        log = logs.get((repo, path), [])
        best = None
        for lsn, op, commit in log:       # log is lsn-sorted
            if lsn <= at:
                best = (op, commit)
        out[(repo, path, at)] = None if best is None or best[0] == "D" \
            else best[1]
    return out


def test_temporal_join_matches_brute_force():
    events = _events()
    hist = scd2.scd2_history(
        ray.data.from_arrow(events).repartition(6), num_partitions=8)

    rng = np.random.default_rng(9)
    keys = sorted({(r, p) for r, p in zip(events["repo"].to_pylist(),
                                          events["path"].to_pylist())})
    probes = []
    max_lsn = int(events["lsn"].to_pylist()[-1]) + 100
    for repo, path in keys[::3][:120]:
        for at in rng.integers(0, max_lsn, size=3):
            probes.append((repo, path, int(at)))
    # also probe keys with deletes right at their boundaries
    dels = [r for r in events.to_pylist() if r["op"] == "D"][:20]
    for r in dels:
        probes.append((r["repo"], r["path"], r["lsn"]))        # at delete
        probes.append((r["repo"], r["path"], r["lsn"] - 1))    # just before

    facts = pa.table({
        "repo": pa.array([p[0] for p in probes]),
        "path": pa.array([p[1] for p in probes]),
        "lsn": pa.array([p[2] for p in probes], pa.int64()),
        "fact_id": pa.array(range(len(probes)), pa.int64()),
    })
    joined = scd2.temporal_join(
        ray.data.from_arrow(facts).repartition(5), hist,
        payload=["commit"], num_partitions=8)
    got = {(r["repo"], r["path"], r["lsn"]): r["commit"]
           for r in joined.take_all()}
    exp = _brute(events, probes)
    assert len(got) == len(set(probes))
    for k, v in exp.items():
        assert got[k] == v, k


def test_temporal_join_left_outer_and_collision():
    events = _events()
    hist = scd2.scd2_history(ray.data.from_arrow(events), num_partitions=4)
    facts = pa.table({
        "repo": pa.array(["org000/proj", "no/such"]),
        "path": pa.array(["nope.py", "x.py"]),
        "lsn": pa.array([10**9, 5], pa.int64()),
        # collides with the history payload column
        "commit": pa.array(["local-c1", "local-c2"]),
    })
    joined = scd2.temporal_join(ray.data.from_arrow(facts), hist,
                                payload=["commit"], num_partitions=4)
    rows = {(r["repo"], r["path"]): r for r in joined.take_all()}
    assert len(rows) == 2
    r = rows[("no/such", "x.py")]
    assert r["commit"] == "local-c2"      # fact column intact
    assert r["commit_dim"] is None        # no version -> null payload
    assert r["valid_from_lsn"] is None
