"""CDC engine correctness suite (SURVEY.md §5c / BASELINE.json north_star):
replay parity incl. sha256, out-of-order events, duplicate delivery,
mid-run crash/resume, additive schema evolution, determinism."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, oracle

SPEC = binlog.BinlogSpec(events_per_epoch=2000, n_repos=10, paths_per_repo=60,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=256, dup_lookback=3000)


@pytest.fixture(params=["map_groups", "actor_pool"])
def backend(request):
    """Core CDC tests run against BOTH merge backends."""
    return request.param


def _engine(tmp_path, **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / "lake"), num_partitions=8,
                           merge_concurrency=2, **kw)
    return engine.CDCEngine(cfg)


def _shutdown(eng):
    if eng._pool is not None:
        eng._pool.shutdown()


def _final_state(eng):
    df = eng.read().to_pandas()
    return {(r.repo, r.path): (r.lsn, r.commit, r.content_sha256,
                               getattr(r, "lang", None))
            for r in df.itertuples()}


def _oracle_state(spec, n_epochs):
    evs = pa.concat_tables([binlog.gen_epoch_table(spec, e) for e in range(n_epochs)],
                           promote_options="permissive")
    return {k: (v["lsn"], v["commit"], v["content_sha256"], v["lang"])
            for k, v in oracle.live_rows(oracle.replay(evs)).items()}


def test_replay_parity_with_sha256(tmp_path, backend):
    """Multi-epoch ingest (incl. dups, out-of-order, deletes, evolution)
    matches the sequential dict replay row-for-row with sha256 equality —
    on BOTH merge backends."""
    eng = _engine(tmp_path, backend=backend)
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(eng) == _oracle_state(SPEC, 3)
    _shutdown(eng)


def test_out_of_order_and_duplicate_delivery(tmp_path, backend):
    """Hand-built pathological batch: late stale update must lose; duplicate
    (key,lsn) delivery is idempotent; delete tombstone blocks resurrection
    by an earlier-LSN insert arriving later."""
    eng = _engine(tmp_path, backend=backend)

    def ev(lsn, op, path, content):
        import hashlib
        return {"lsn": lsn, "op": op, "repo": "r1", "path": path,
                "commit": f"c{lsn}", "lang": None, "content": content,
                "content_sha256": (hashlib.sha256(content.encode()).hexdigest()
                                   if content is not None else None)}

    import ray.data
    e0 = [ev(5, "I", "a.py", "v5"), ev(3, "U", "a.py", "v3"),   # stale loses
          ev(10, "D", "b.py", None),                            # tombstone first
          ev(7, "I", "c.py", "v7"), ev(7, "I", "c.py", "v7")]   # duplicate
    eng.ingest_epoch(ray.data.from_arrow(
        pa.Table.from_pylist(e0, schema=binlog.EVENT_SCHEMA_V2)), 0)
    # later epoch: resurrect attempt for b.py with lsn<10, plus stale dup of a.py
    e1 = [ev(8, "I", "b.py", "v8"), ev(3, "U", "a.py", "v3")]
    eng.ingest_epoch(ray.data.from_arrow(
        pa.Table.from_pylist(e1, schema=binlog.EVENT_SCHEMA_V2)), 1)

    df = eng.read().to_pandas().set_index("path")
    assert set(df.index) == {"a.py", "c.py"}          # b.py stays deleted
    assert df.loc["a.py", "lsn"] == 5 and df.loc["a.py", "content"] == "v5"
    assert df.loc["c.py", "lsn"] == 7


def test_update_to_missing_key_inserts(tmp_path, backend):
    import hashlib

    import ray.data
    eng = _engine(tmp_path, backend=backend)
    rows = [{"lsn": 1, "op": "U", "repo": "r", "path": "ghost.py",
             "commit": "c1", "lang": "py", "content": "x",
             "content_sha256": hashlib.sha256(b"x").hexdigest()}]
    eng.ingest_epoch(ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=binlog.EVENT_SCHEMA_V2)), 0)
    df = eng.read().to_pandas()
    assert len(df) == 1 and df.iloc[0]["path"] == "ghost.py"
    _shutdown(eng)


def test_crash_before_manifest_resume(tmp_path, backend):
    """Kill between data write and manifest commit -> resume re-runs the
    epoch; final state identical to the uninterrupted run."""
    eng = _engine(tmp_path, backend=backend)
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    # simulate crash: epoch 1's manifest vanishes, data dir remains
    os.remove(os.path.join(eng.cfg.lake_dir, "manifests", "epoch-0001.json"))
    assert eng.resume_point() == 1
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    assert _final_state(eng) == _oracle_state(SPEC, 2)
    _shutdown(eng)


def test_crash_mid_write_tmp_debris(tmp_path, backend):
    """Tmp dir debris from a crashed epoch is cleaned and the epoch re-runs."""
    eng = _engine(tmp_path, backend=backend)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    tmp = lake.epoch_dir(eng.cfg.lake_dir, 1, tmp=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-00000.parquet"), "w") as f:
        f.write("garbage")
    assert eng.resume_point() == 1
    assert not os.path.isdir(tmp)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    assert _final_state(eng) == _oracle_state(SPEC, 2)
    _shutdown(eng)


def test_epoch_order_enforced(tmp_path):
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    with pytest.raises(ValueError, match="out of order"):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 2)


def test_schema_evolution_additive_lang(tmp_path, backend):
    """Epoch 0 events lack `lang` entirely; epoch >=1 carries it. Old rows
    read back null-backfilled; snapshot at epoch 0 lacks the column."""
    spec = binlog.BinlogSpec(events_per_epoch=1500, n_repos=8, paths_per_repo=40,
                             evolution_epoch=1, content_chars_min=16,
                             content_chars_max=128)
    eng = _engine(tmp_path, backend=backend)
    eng.ingest_epoch(binlog.gen_epoch(spec, 0), 0)
    s0 = eng.read(epoch=0).schema()
    assert "lang" not in s0.names
    eng.ingest_epoch(binlog.gen_epoch(spec, 1), 1)
    df = eng.read().to_pandas()
    assert "lang" in df.columns
    # rows last touched pre-evolution have null lang; post-evolution non-D rows have it
    assert df[df.lsn < spec.events_per_epoch]["lang"].isna().all()
    assert df[df.lsn >= spec.events_per_epoch]["lang"].notna().all()
    assert _final_state(eng) == _oracle_state(spec, 2)
    _shutdown(eng)


def test_determinism_across_runs_and_parallelism(tmp_path):
    """Same seed -> byte-identical final state, independent of block layout."""
    eng1 = _engine(tmp_path / "a")
    eng2 = _engine(tmp_path / "b")
    for ep in range(2):
        eng1.ingest_epoch(binlog.gen_epoch(SPEC, ep, override_num_blocks=2), ep)
        eng2.ingest_epoch(binlog.gen_epoch(SPEC, ep, override_num_blocks=7), ep)
    assert _final_state(eng1) == _final_state(eng2)


def test_lineage_records(tmp_path):
    """Per-partition lineage in the manifest: files exist, watermarks and
    row counts are consistent (FIXTURES.md F7)."""
    eng = _engine(tmp_path)
    st = eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0, events_in=SPEC.events_per_epoch)
    m = lake.read_manifest(eng.cfg.lake_dir, 0)
    assert m["committed"] and m["epoch"] == 0
    assert m["lsn_watermark"] == st.lsn_watermark <= SPEC.events_per_epoch - 1
    total = 0
    for pid, rec in m["partitions"].items():
        assert os.path.exists(rec["file"]), rec["file"]
        assert rec["rows_total"] >= rec["rows_applied"] >= 0
        total += rec["rows_total"]
    assert total == eng.read(include_tombstones=True).count()


def test_hot_key_skew_bounded_and_correct(tmp_path):
    """Skew mitigation (SURVEY.md §7.4 #6): 90% of an epoch's events hit ONE
    (repo, path) key. The within-batch LWW combiner must cap that key's
    shuffle traffic at one row per input block, so no merge partition
    receives a delta proportional to the hot key's event count — and the
    final state still matches the replay oracle."""
    import hashlib

    import numpy as np
    import ray.data

    rng = np.random.RandomState(7)
    n = 20_000
    hot = rng.rand(n) < 0.9
    paths = np.where(hot, "hot.py",
                     np.char.add("f", rng.randint(0, 500, n).astype(str)))
    rows = []
    for lsn in range(n):
        content = f"v{lsn}"
        rows.append({
            "lsn": lsn, "op": "I", "repo": "r", "path": str(paths[lsn]),
            "commit": f"c{lsn}", "lang": "py", "content": content,
            "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
        })
    events = pa.Table.from_pylist(rows, schema=binlog.EVENT_SCHEMA_V2)

    eng = _engine(tmp_path)
    n_blocks = 8
    st = eng.ingest_epoch(
        ray.data.from_arrow(events).repartition(n_blocks), 0, events_in=n)

    # partition deltas are bounded: the hot key contributes <= n_blocks rows,
    # so no partition's applied-delta is within an order of magnitude of the
    # hot key's 18k events
    max_applied = max(r["rows_applied"] for r in st.lineage)
    assert max_applied < 2_000, st.lineage

    # correctness: hot key holds the max-LSN content; all keys parity
    exp = oracle.live_rows(oracle.replay(events))
    assert _final_state(eng) == {
        k: (v["lsn"], v["commit"], v["content_sha256"], v["lang"])
        for k, v in exp.items()}
    hot_lsns = [lsn for lsn in range(n) if paths[lsn] == "hot.py"]
    df = eng.read().to_pandas().set_index("path")
    assert df.loc["hot.py", "lsn"] == max(hot_lsns)


def test_delta_mode_parity_and_compaction(tmp_path, backend):
    """compact_interval=3: epochs 0,1 write delta files only (no state
    rewrite), epoch 2 compacts. Snapshots at EVERY epoch must match the
    oracle; after compaction the deltas are folded into one base file."""
    eng = _engine(tmp_path, compact_interval=3, backend=backend)
    for ep in range(4):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        assert _final_state(eng) == _oracle_state(SPEC, ep + 1), f"epoch {ep}"
    m2 = lake.read_manifest(eng.cfg.lake_dir, 2)     # compaction epoch
    assert all(not rec["deltas"] for rec in m2["partitions"].values())
    m3 = lake.read_manifest(eng.cfg.lake_dir, 3)     # delta epoch on top
    assert any(rec["deltas"] for rec in m3["partitions"].values())
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert any(rec["deltas"] for rec in m1["partitions"].values())
    _shutdown(eng)


def test_delta_mode_crash_resume(tmp_path, backend):
    """Crash between a delta epoch's data write and manifest commit: resume
    re-runs it; final state identical; no duplicate delta references."""
    eng = _engine(tmp_path, compact_interval=4, backend=backend)
    for ep in range(3):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    os.remove(os.path.join(eng.cfg.lake_dir, "manifests", "epoch-0002.json"))
    assert eng.resume_point() == 2
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 2), 2)
    assert _final_state(eng) == _oracle_state(SPEC, 3)
    m = lake.read_manifest(eng.cfg.lake_dir, 2)
    for rec in m["partitions"].values():
        assert len(rec["deltas"]) == len(set(rec["deltas"]))
    _shutdown(eng)


def test_delta_mode_matches_compact_mode(tmp_path):
    """Same binlog through compact-every-epoch vs delta+periodic-compaction
    -> byte-identical final state."""
    e1 = _engine(tmp_path / "a", compact_interval=1)
    e2 = _engine(tmp_path / "b", compact_interval=3)
    for ep in range(4):
        e1.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        e2.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(e1) == _final_state(e2)


def test_actor_pool_backend_parity_and_cache(tmp_path):
    """Persistent merge-worker backend: same final state as the map_groups
    backend across epochs (incl. evolution + dups), with actors surviving
    between epochs (cross-epoch in-memory state)."""
    e1 = _engine(tmp_path / "a")
    e2 = _engine(tmp_path / "b", backend="actor_pool")
    for ep in range(3):
        e1.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        e2.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(e1) == _final_state(e2) == _oracle_state(SPEC, 3)
    # same pool object across epochs -> persistent actors
    assert e2._pool is not None and len(e2._pool.workers) == 2
    e2._pool.shutdown()


def test_actor_pool_backend_crash_resume(tmp_path):
    """Backend restart (fresh engine = fresh actors, empty caches) resumes
    correctly from the lake after a crash before manifest commit."""
    eng = _engine(tmp_path, backend="actor_pool")
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    eng._pool.shutdown()
    os.remove(os.path.join(eng.cfg.lake_dir, "manifests", "epoch-0001.json"))
    eng2 = _engine(tmp_path, backend="actor_pool")   # same lake dir
    assert eng2.resume_point() == 1
    eng2.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    assert _final_state(eng2) == _oracle_state(SPEC, 2)
    eng2._pool.shutdown()


def test_fan_out_auto_resolution():
    """auto -> broadcast on one node, split on many; explicit modes pass
    through; junk rejected."""
    from e_commerce_batch_etl_pipeline_ray.cdc.actor_pool import resolve_fan_out
    assert resolve_fan_out("auto", n_nodes=1) == "broadcast"
    assert resolve_fan_out("auto", n_nodes=4) == "split"
    assert resolve_fan_out("broadcast", n_nodes=4) == "broadcast"
    assert resolve_fan_out("split", n_nodes=1) == "split"
    with pytest.raises(ValueError):
        resolve_fan_out("bogus")
    # in THIS sandbox (single host) auto must land on broadcast
    assert resolve_fan_out("auto") == "broadcast"


@pytest.mark.parametrize("fan_out", ["broadcast", "split"])
def test_actor_pool_worker_killed_mid_epoch(tmp_path, fan_out):
    """Kill a persistent MergeWorker between commit N and commit N+1: the
    in-flight epoch fails loudly (no partial manifest), and a re-run from
    the committed manifest (fresh pool, empty caches — the cache-
    invalidation path) reproduces the exact state a clean run produces.
    Covers BOTH fan-out modes."""
    import ray

    eng = _engine(tmp_path / "crash", backend="actor_pool", fan_out=fan_out)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    # hard-kill one worker: epoch 1's merge must fail mid-flight
    ray.kill(eng._pool.workers[0], no_restart=True)
    with pytest.raises(Exception) as ei:
        eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    assert "died" in str(ei.value).lower() or "actor" in str(ei.value).lower()
    # the failed epoch must NOT have committed
    assert lake.last_committed_epoch(eng.cfg.lake_dir) == 0
    _shutdown(eng)

    # recovery: fresh engine (fresh actors, empty caches) resumes from the
    # committed manifest and re-runs the epoch
    eng2 = _engine(tmp_path / "crash", backend="actor_pool", fan_out=fan_out)
    assert eng2.resume_point() == 1
    eng2.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    state = _final_state(eng2)
    _shutdown(eng2)

    # equal to the replay oracle AND to an uninterrupted clean run
    assert state == _oracle_state(SPEC, 2)
    clean = _engine(tmp_path / "clean", backend="actor_pool", fan_out=fan_out)
    for ep in range(2):
        clean.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert state == _final_state(clean)
    _shutdown(clean)


def test_actor_pool_delta_mode_parity(tmp_path):
    """actor_pool backend x LSM delta mode == map_groups compact-every state."""
    e1 = _engine(tmp_path / "a")
    e2 = _engine(tmp_path / "b", backend="actor_pool", compact_interval=2)
    for ep in range(3):
        e1.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        e2.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(e1) == _final_state(e2)
    e2._pool.shutdown()


def test_tombstone_gc(tmp_path, backend):
    """With gc_lateness_epochs=1, tombstones older than the watermark two
    epochs back are dropped at compaction; younger tombstones survive and
    still block resurrection."""
    import hashlib

    import ray.data

    def ev(lsn, op, path):
        c = None if op == "D" else f"v{lsn}"
        return {"lsn": lsn, "op": op, "repo": "r", "path": path,
                "commit": f"c{lsn}", "lang": None, "content": c,
                "content_sha256": (hashlib.sha256(c.encode()).hexdigest()
                                   if c else None)}

    # single partition: GC applies only to partitions TOUCHED by an epoch's
    # delta (cold partitions are GC'd when next written), so co-locate all
    # keys to observe the horizon behavior deterministically
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=1,
        merge_concurrency=1, gc_lateness_epochs=1, backend=backend))
    epochs = [
        [ev(0, "I", "a.py"), ev(1, "D", "a.py"), ev(2, "I", "b.py")],   # watermark 2
        [ev(3, "I", "c.py"), ev(4, "D", "c.py")],                       # watermark 4
        [ev(5, "I", "d.py")],   # gc horizon = watermark(epoch 0) = 2 -> tombstone lsn1 dropped
        [ev(6, "I", "e.py")],   # horizon = watermark(ep1) = 4 -> tombstone lsn4 dropped
    ]
    for i, evs in enumerate(epochs):
        eng.ingest_epoch(ray.data.from_arrow(
            pa.Table.from_pylist(evs, schema=binlog.EVENT_SCHEMA_V2)), i)

    full = eng.read(include_tombstones=True).to_pandas()
    tombs = set(full[full["_deleted"]]["path"]) if "_deleted" in full.columns else set()
    assert "a.py" not in tombs            # lsn 1 < horizon(2) -> GC'd
    assert "c.py" in tombs                # lsn 4 == horizon(4) -> kept (not <)
    live = set(eng.read().to_pandas()["path"])
    assert live == {"b.py", "d.py", "e.py"}
    _shutdown(eng)


def test_actor_pool_split_fanout_parity(tmp_path):
    """Split fan-out (multi-node-shaped exchange) == broadcast fan-out."""
    e1 = _engine(tmp_path / "a", backend="actor_pool")
    e2 = _engine(tmp_path / "b", backend="actor_pool", fan_out="split")
    for ep in range(2):
        e1.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        e2.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(e1) == _final_state(e2) == _oracle_state(SPEC, 2)
    e1._pool.shutdown(); e2._pool.shutdown()


# --- schema-evolution property (hypothesis) ---------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_schema_evolution_property(data):
    """Random tiny binlogs across the evolution boundary: any mix of ops,
    duplicate delivery (same or later epoch than the original), and
    arbitrary arrival order must replay to the dict-oracle state — with the
    additive `lang` column null for pre-evolution events everywhere."""
    import hashlib
    import tempfile

    import ray.data

    per_epoch = data.draw(st.integers(8, 30))
    n_epochs = 2
    keys = [("r%d" % r, "f%d.py" % p) for r in range(3) for p in range(3)]

    events = []          # one canonical payload per lsn
    for lsn in range(per_epoch * n_epochs):
        orig_epoch = lsn // per_epoch
        op = data.draw(st.sampled_from(["I", "U", "D"]))
        repo, path = data.draw(st.sampled_from(keys))
        content = None if op == "D" else f"body{lsn}"
        events.append({
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn:04d}",
            "lang": (None if orig_epoch == 0 or op == "D" else "py"),
            "content": content,
            "content_sha256": (hashlib.sha256(content.encode()).hexdigest()
                               if content is not None else None),
            "_orig": orig_epoch,
        })

    # delivery plan: original epoch + optional duplicate in same-or-later epoch
    deliveries = {0: [], 1: []}
    for e in events:
        deliveries[e["_orig"]].append(e)
        if data.draw(st.booleans()):
            deliveries[data.draw(st.integers(e["_orig"], n_epochs - 1))].append(e)
    for ep in deliveries:   # arbitrary arrival order within the epoch
        deliveries[ep] = data.draw(st.permutations(deliveries[ep]))

    def to_table(evs, with_lang):
        schema = binlog.EVENT_SCHEMA_V2 if with_lang else binlog.EVENT_SCHEMA_V1
        rows = [{k: v for k, v in e.items() if k != "_orig" and (with_lang or k != "lang")}
                for e in evs]
        return pa.Table.from_pylist(rows, schema=schema)

    lake_dir = tempfile.mkdtemp(prefix="cdc_prop_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir, num_partitions=4,
                                            merge_concurrency=1))
    for ep in range(n_epochs):
        eng.ingest_epoch(ray.data.from_arrow(to_table(deliveries[ep], ep >= 1)), ep)

    got = _final_state(eng)

    all_evs = to_table(sorted(events, key=lambda e: e["lsn"]), True)
    exp = {k: (v["lsn"], v["commit"], v["content_sha256"], v["lang"])
           for k, v in oracle.live_rows(oracle.replay(all_evs)).items()}
    assert got == exp
    shutil.rmtree(lake_dir, ignore_errors=True)


def test_pipelined_ingest_parity(tmp_path, backend):
    """Epoch-pipelined ingest (normalize N+1 overlapped with merge N) must
    produce the identical final state as the sequential loop, across the
    schema-evolution boundary, on both backends."""
    import ray.data
    e_seq = _engine(tmp_path / "seq", backend=backend)
    e_pipe = _engine(tmp_path / "pipe", backend=backend)
    for ep in range(3):
        e_seq.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    e_pipe.ingest_epochs_pipelined(
        [(ep, binlog.gen_epoch(SPEC, ep)) for ep in range(3)])
    assert _final_state(e_pipe) == _final_state(e_seq) == _oracle_state(SPEC, 3)
    _shutdown(e_seq); _shutdown(e_pipe)


def test_verify_sha_accepts_good_and_rejects_corrupt(tmp_path):
    """verify_sha=True: clean binlog ingests; a corrupted content byte (sha
    no longer matching) fails the epoch loudly."""
    import ray.data

    eng = _engine(tmp_path / "good", verify_sha=True)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    assert _final_state(eng) == _oracle_state(SPEC, 1)

    bad = binlog.gen_epoch_table(SPEC, 0)
    contents = bad["content"].to_pylist()
    for i, c in enumerate(contents):
        if c is not None:
            contents[i] = c + "TAMPERED"
            break
    bad = bad.set_column(bad.column_names.index("content"), "content",
                         pa.array(contents, pa.string()))
    eng2 = _engine(tmp_path / "bad", verify_sha=True)
    with pytest.raises(Exception, match="sha256 mismatch"):
        eng2.ingest_epoch(ray.data.from_arrow(bad), 0)


def test_multi_table_lake_independent_epochs(tmp_path):
    """Two tables under one root: independent epoch counters, schemas and
    crash recovery — corrupting one table's last manifest rolls back only
    that table."""
    import ray.data

    from e_commerce_batch_etl_pipeline_ray.cdc import multi

    root = str(tmp_path / "lake")
    mt = multi.MultiTableCDC(root, engine.CDCConfig(
        lake_dir="ignored", num_partitions=4, merge_concurrency=1))

    spec_b = binlog.BinlogSpec(events_per_epoch=800, n_repos=5,
                               paths_per_repo=30, evolution_epoch=1,
                               content_chars_min=16, content_chars_max=64,
                               seed=99)
    # table A: 2 epochs; table B: 1 epoch (different rates)
    for ep in range(2):
        mt.ingest_epoch("repos_a", binlog.gen_epoch(SPEC, ep), ep)
    mt.ingest_epoch("repos_b", binlog.gen_epoch(spec_b, 0), 0)

    assert mt.tables() == ["repos_a", "repos_b"]
    a = {(r.repo, r.path): r.lsn for r in mt.read("repos_a").to_pandas().itertuples()}
    exp_a = {k: v[0] for k, v in _oracle_state(SPEC, 2).items()}
    assert a == exp_a

    # crash table A's epoch-1 commit; B untouched
    os.remove(os.path.join(root, "tables", "repos_a", "manifests",
                           "epoch-0001.json"))
    pts = mt.resume_points()
    assert pts == {"repos_a": 1, "repos_b": 1}
    mt.ingest_epoch("repos_a", binlog.gen_epoch(SPEC, 1), 1)
    a2 = {(r.repo, r.path): r.lsn for r in mt.read("repos_a").to_pandas().itertuples()}
    assert a2 == exp_a
    assert mt.read("repos_b").count() > 0
    mt.shutdown()


def test_manifest_epoch_metrics(tmp_path):
    """Epoch-level observability record persisted in the manifest."""
    eng = _engine(tmp_path)
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0, events_in=SPEC.events_per_epoch)
    m = lake.read_manifest(eng.cfg.lake_dir, 0)
    met = m["metrics"]
    assert met["events_in"] == SPEC.events_per_epoch
    assert met["rows_applied"] > 0 and met["bytes_written"] > 0
    assert met["elapsed_s"] > 0 and met["mode"] == "compact"


def test_two_phase_shuffle_parity(tmp_path):
    """Opt-in winner-first shuffle (distributed winner join, no driver
    broadcast) produces the identical final state as the plain path,
    including dups/out-of-order/evolution."""
    e1 = _engine(tmp_path / "plain")
    e2 = _engine(tmp_path / "two_phase", two_phase_shuffle=True)
    for ep in range(2):
        e1.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        e2.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    assert _final_state(e2) == _final_state(e1) == _oracle_state(SPEC, 2)


def test_vacuum_keeps_carried_forward_files(tmp_path):
    """Vacuum removes only files unreferenced by the kept manifests: a
    partition file carried forward from an old epoch (untouched since)
    must survive, reads stay correct, old manifests disappear."""
    import hashlib

    import ray.data

    def ev(lsn, op, repo, path):
        c = None if op == "D" else f"v{lsn}"
        return {"lsn": lsn, "op": op, "repo": repo, "path": path,
                "commit": f"c{lsn}", "lang": None, "content": c,
                "content_sha256": (hashlib.sha256(c.encode()).hexdigest()
                                   if c else None)}

    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=1))
    # epoch 0: many keys spread over partitions
    e0 = [ev(i, "I", f"r{i % 7}", f"f{i}.py") for i in range(40)]
    eng.ingest_epoch(ray.data.from_arrow(
        pa.Table.from_pylist(e0, schema=binlog.EVENT_SCHEMA_V2)), 0)
    # epochs 1-2: touch ONE key -> most partitions carry forward epoch-0 files
    for ep in (1, 2):
        evs = [ev(100 + ep, "U", "r0", "f0.py")]
        eng.ingest_epoch(ray.data.from_arrow(
            pa.Table.from_pylist(evs, schema=binlog.EVENT_SCHEMA_V2)), ep)

    before = eng.read().to_pandas().sort_values(["repo", "path"])
    stats = lake.vacuum(eng.cfg.lake_dir, keep_last=1)
    assert stats["files_removed"] > 0 and stats["manifests_removed"] == 2
    after = eng.read().to_pandas().sort_values(["repo", "path"])
    assert before.values.tolist() == after.values.tolist()
    # resume still lands after the last epoch
    assert eng.resume_point() == 3


def test_schema_evolution_type_widening(tmp_path):
    """Beyond additive columns: a column whose type WIDENS between epochs
    (int32 -> int64) unifies permissively; early rows read back widened."""
    import hashlib

    import ray.data

    def ev(lsn, path, size, size_type):
        c = f"v{lsn}"
        return pa.Table.from_pylist([{
            "lsn": lsn, "op": "I", "repo": "r", "path": path,
            "commit": f"c{lsn}", "lang": None, "content": c,
            "content_sha256": hashlib.sha256(c.encode()).hexdigest(),
            "size": size,
        }], schema=binlog.EVENT_SCHEMA_V2.append(pa.field("size", size_type)))

    eng = _engine(tmp_path)
    eng.ingest_epoch(ray.data.from_arrow(
        ev(0, "a.py", 10, pa.int32())), 0)
    assert eng.read().schema().base_schema.field("size").type == pa.int32()
    eng.ingest_epoch(ray.data.from_arrow(
        ev(1, "b.py", 2**40, pa.int64())), 1)
    df = eng.read().to_pandas().sort_values("path")
    assert eng.read().schema().base_schema.field("size").type == pa.int64()
    assert df["size"].tolist() == [10, 2**40]


def _mt(tmp_path, sub="txlake"):
    from e_commerce_batch_etl_pipeline_ray.cdc import multi
    return multi.MultiTableCDC(str(tmp_path / sub), engine.CDCConfig(
        lake_dir="ignored", num_partitions=4, merge_concurrency=1))


def test_ingest_transaction_atomic_and_equals_independent(tmp_path):
    """A cross-table transaction commits every table's epoch; final state
    per table equals an independent (non-transactional) ingest of the
    same events."""
    spec_b = binlog.BinlogSpec(events_per_epoch=600, n_repos=4,
                               paths_per_repo=20, evolution_epoch=1,
                               content_chars_min=16, content_chars_max=64,
                               seed=41)
    mt = _mt(tmp_path)
    stats = mt.ingest_transaction({
        "repos_a": binlog.gen_epoch(SPEC, 0),
        "repos_b": binlog.gen_epoch(spec_b, 0),
    })
    assert set(stats) == {"repos_a", "repos_b"}
    assert mt.resume_points() == {"repos_a": 1, "repos_b": 1}
    # second transaction advances both atomically
    mt.ingest_transaction({
        "repos_a": binlog.gen_epoch(SPEC, 1),
        "repos_b": binlog.gen_epoch(spec_b, 1),
    })
    a = {(r.repo, r.path): r.lsn
         for r in mt.read("repos_a").to_pandas().itertuples()}
    assert a == {k: v[0] for k, v in _oracle_state(SPEC, 2).items()}
    b = {(r.repo, r.path): r.lsn
         for r in mt.read("repos_b").to_pandas().itertuples()}
    assert b == {k: v[0] for k, v in _oracle_state(spec_b, 2).items()}
    mt.shutdown()


def test_transaction_crash_before_decide_aborts(tmp_path):
    """Prepared (staged) manifests WITHOUT a txn record are aborted debris:
    nothing becomes visible, recover() clears the staged files, and the
    transaction can be re-run to the correct state."""
    mt = _mt(tmp_path)
    mt.ingest_transaction({"repos_a": binlog.gen_epoch(SPEC, 0)})
    # simulate a crash mid-PREPARE of the next txn: staged manifest
    # written, no txn record
    eng = mt.table("repos_a")
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1, staged_commit=True)
    assert mt.table("repos_a").last_committed_epoch() == 0  # invisible
    rep = mt.recover()
    assert rep["aborted_staged_cleaned"] == 1
    assert mt.resume_points() == {"repos_a": 1}
    # re-run cleanly
    mt.ingest_transaction({"repos_a": binlog.gen_epoch(SPEC, 1)})
    a = {(r.repo, r.path): r.lsn
         for r in mt.read("repos_a").to_pandas().itertuples()}
    assert a == {k: v[0] for k, v in _oracle_state(SPEC, 2).items()}
    mt.shutdown()


def test_transaction_crash_after_decide_rolls_forward(tmp_path):
    """A txn record whose manifests are still staged (crash between
    DECIDE and ROLL FORWARD) is rolled forward by recover(): both tables
    become visible together, byte-identical to the uncrashed result."""
    spec_b = binlog.BinlogSpec(events_per_epoch=600, n_repos=4,
                               paths_per_repo=20, evolution_epoch=1,
                               content_chars_min=16, content_chars_max=64,
                               seed=41)
    mt = _mt(tmp_path)
    # PREPARE both tables staged + DECIDE record, then "crash" (no roll
    # forward, no completed flag)
    sa = mt.table("repos_a").ingest_epoch(binlog.gen_epoch(SPEC, 0), 0,
                                          staged_commit=True)
    sb = mt.table("repos_b").ingest_epoch(binlog.gen_epoch(spec_b, 0), 0,
                                          staged_commit=True)
    assert sa.rows_applied > 0 and sb.rows_applied > 0
    mt._write_txn(0, {"txn": 0, "tables": {"repos_a": 0, "repos_b": 0},
                      "completed": False})
    assert mt.table("repos_a").last_committed_epoch() is None
    # fresh coordinator (as after restart) recovers forward
    mt2 = _mt(tmp_path)
    rep = mt2.recover()
    assert rep["manifests_rolled_forward"] == 2
    assert mt2.table("repos_a").last_committed_epoch() == 0
    assert mt2.table("repos_b").last_committed_epoch() == 0
    a = {(r.repo, r.path): r.lsn
         for r in mt2.read("repos_a").to_pandas().itertuples()}
    assert a == {k: v[0] for k, v in _oracle_state(SPEC, 1).items()}
    # recover is idempotent
    assert mt2.recover()["manifests_rolled_forward"] == 0
    mt.shutdown(); mt2.shutdown()


def test_late_event_lineage_metric(tmp_path, backend):
    """Manifest metrics count out-of-order arrivals: winners at-or-below
    their partition's prior watermark."""
    import hashlib

    import ray.data

    def ev(lsn, path, content="x"):
        return {"lsn": lsn, "op": "I", "repo": "r", "path": path,
                "commit": f"c{lsn}", "content": content,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest()}

    eng = _engine(tmp_path, backend=backend)
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist(
        [ev(100, "a"), ev(200, "b")])), 0)
    m0 = lake.read_manifest(eng.cfg.lake_dir, 0)
    assert m0["metrics"]["late_events"] == 0

    # epoch 1: one fresh event + one LATE arrival (lsn 50 < watermark)
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist(
        [ev(300, "c"), ev(50, "d")])), 1)
    m1 = lake.read_manifest(eng.cfg.lake_dir, 1)
    assert m1["metrics"]["late_events"] == 1
    _shutdown(eng)
