"""Key-Bloom sidecar suite (cdc/keybloom.py): no false negatives ever,
point_read parity with pruning on vs off (LSM delta chains, both
backends), pruning actually skips files, crash/resume + optimize +
vacuum + purge keep sidecars consistent with the safety invariant
(sidecar = superset of its file's keys)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import (
    binlog,
    engine,
    keybloom,
    lake,
)

SPEC = binlog.BinlogSpec(events_per_epoch=1200, n_repos=8, paths_per_repo=40,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=1500)


def _keys(n, prefix="k"):
    return ([f"{prefix}repo{i % 7}" for i in range(n)],
            [f"src/{prefix}{i}.py" for i in range(n)])


# -- pure kernel -------------------------------------------------------------

def test_no_false_negatives_and_fp_rate():
    repos, paths = _keys(5000)
    blob = keybloom.build(pa.array(repos), pa.array(paths), fpp=0.01)
    hit = keybloom.may_contain(blob, pa.array(repos), pa.array(paths))
    assert hit.all()                       # NEVER a false negative
    o_repos, o_paths = _keys(5000, prefix="other")
    fp = keybloom.may_contain(blob, pa.array(o_repos), pa.array(o_paths))
    assert fp.mean() < 0.05                # ~fpp, generous margin


def test_empty_and_single():
    blob = keybloom.build(pa.array([], pa.string()), pa.array([], pa.string()))
    assert not keybloom.may_contain(blob, pa.array(["a"]), pa.array(["b"]))[0]
    assert len(keybloom.may_contain(blob, pa.array([], pa.string()),
                                    pa.array([], pa.string()))) == 0
    blob1 = keybloom.build(pa.array(["r"]), pa.array(["p"]))
    assert keybloom.may_contain(blob1, pa.array(["r"]), pa.array(["p"]))[0]


def test_prune_files_keeps_unsidecarred(tmp_path):
    t = pa.table({"repo": ["a"], "path": ["x"]})
    f_with = str(tmp_path / "with.parquet")
    f_without = str(tmp_path / "without.parquet")
    pq.write_table(t, f_with)
    pq.write_table(t, f_without)
    keybloom.write_sidecar(f_with, t)
    # needle absent from the sidecarred file -> pruned; the bare file stays
    kept = keybloom.prune_files([f_with, f_without], ["zzz"], ["zzz"])
    assert kept == [f_without]
    kept = keybloom.prune_files([f_with, f_without], ["a"], ["x"])
    assert kept == [f_with, f_without]


# -- engine integration ------------------------------------------------------

def _build(tmp_path, name, epochs=2, **kw):
    cfg = engine.CDCConfig(lake_dir=str(tmp_path / name), num_partitions=4,
                           merge_concurrency=2, **kw)
    eng = engine.CDCEngine(cfg)
    for ep in range(epochs):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    if eng._pool is not None:
        eng._pool.shutdown()
    return cfg.lake_dir


def _needles():
    live = [(f"org{r:03d}/proj", f"src/mod{m}/file{m}.py")
            for r in range(SPEC.n_repos) for m in (3, 17)]
    miss = [(f"ghost{i}", "src/mod0/file0.py") for i in range(8)]
    return live + miss


@pytest.mark.parametrize("backend", ["map_groups", "actor_pool"])
def test_point_read_parity_bloom_on_vs_off_lsm(tmp_path, backend, ray_session):
    """Same binlog, LSM delta chain (interval 3 -> both epochs are deltas):
    bloom-pruned point_read == unpruned, rows and values."""
    on = _build(tmp_path, "on", backend=backend, compact_interval=3,
                key_bloom_fpp=0.01)
    off = _build(tmp_path, "off", backend=backend, compact_interval=3,
                 key_bloom_fpp=None)
    # sidecars exist on every data file of the bloom lake, none on the other
    for lk, expect in ((on, True), (off, False)):
        m = lake.read_manifest(lk, lake.last_committed_epoch(lk))
        files = []
        for rec in m["partitions"].values():
            files += ([rec["file"]] if rec.get("file") else []) \
                + list(rec.get("deltas", []))
        assert files and all(
            os.path.exists(keybloom.sidecar_path(f)) == expect
            for f in files)
    a = lake.point_read(on, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    b = lake.point_read(off, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def test_pruning_skips_files(tmp_path, ray_session):
    """A key that exists only in the epoch-1 delta prunes the epoch-0
    delta from its partition's chain; a ghost key prunes everything."""
    lk = _build(tmp_path, "lake", compact_interval=3)
    m = lake.read_manifest(lk, 1)
    # find a key present in epoch 1's delta but not epoch 0's
    e1 = binlog.gen_epoch_table(SPEC, 1)
    e0 = binlog.gen_epoch_table(SPEC, 0)
    k0 = {(r, p) for r, p in zip(e0["repo"].to_pylist(),
                                 e0["path"].to_pylist())}
    only1 = next((r, p) for r, p in zip(e1["repo"].to_pylist(),
                                        e1["path"].to_pylist())
                 if (r, p) not in k0)
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    pid = int(hash_partition_ids(
        pa.table({"repo": [only1[0]], "path": [only1[1]]}),
        ["repo", "path"], m["num_partitions"])[0])
    rec = m["partitions"][str(pid)]
    chain = ([rec["file"]] if rec.get("file") else []) \
        + list(rec.get("deltas", []))
    assert len(chain) == 2                 # both epochs wrote deltas
    kept = keybloom.prune_files(chain, [only1[0]], [only1[1]])
    assert len(kept) == 1                  # epoch-0 delta pruned
    assert keybloom.prune_files(chain, ["ghost"], ["nope"]) == []


def test_resume_rewrites_sidecars(tmp_path, ray_session):
    """Crash after epoch-1 data write, before its manifest: resume re-runs
    the epoch; sidecars exist and point_read parity holds."""
    lk = _build(tmp_path, "lake", epochs=2, compact_interval=3)
    os.remove(os.path.join(lk, "manifests", "epoch-0001.json"))
    cfg = engine.CDCConfig(lake_dir=lk, num_partitions=4,
                           merge_concurrency=2, compact_interval=3)
    eng = engine.CDCEngine(cfg)
    assert eng.resume_point() == 1
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 1), 1)
    ref = _build(tmp_path, "ref", epochs=2, compact_interval=3)
    a = lake.point_read(lk, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    b = lake.point_read(ref, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)


def test_optimize_inherits_sidecar(tmp_path, ray_session):
    lk = _build(tmp_path, "lake", compact_interval=3)
    res = lake.optimize(lk)
    assert res["partitions_compacted"] > 0
    m = lake.read_manifest(lk, res["epoch"])
    for rec in m["partitions"].values():
        if rec.get("file") and not rec.get("deltas"):
            assert os.path.exists(keybloom.sidecar_path(rec["file"]))
    a = lake.point_read(lk, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    ref = _build(tmp_path, "ref", compact_interval=3)
    b = lake.point_read(ref, _needles()).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)


def test_vacuum_keeps_live_sidecars_reclaims_dead(tmp_path, ray_session):
    lk = _build(tmp_path, "lake", epochs=3)     # compact every epoch
    m = lake.read_manifest(lk, 2)
    live = [rec["file"] for rec in m["partitions"].values()
            if rec.get("file")]
    res = lake.vacuum(lk, keep_last=1)
    assert res["files_removed"] > 0
    for f in live:
        assert os.path.exists(f)
        assert os.path.exists(keybloom.sidecar_path(f))
    # nothing but live data + sidecars left in epoch dirs
    for name in os.listdir(lk):
        if name.startswith("epoch="):
            for fn in os.listdir(os.path.join(lk, name)):
                full = os.path.join(lk, name, fn)
                assert full in live or full.removesuffix(
                    keybloom.BLOOM_SUFFIX) in live


def test_purge_rebuilds_sidecar(tmp_path, ray_session):
    lk = _build(tmp_path, "lake")
    row = lake.read_lake(lk).take(1)[0]
    key = (row["repo"], row["path"])
    lake.purge_keys(lk, [key])
    # the rewritten file's fresh bloom misses the purged key -> the whole
    # chain prunes and point_read returns typed-empty
    out = lake.point_read(lk, [key]).to_pandas()
    assert len(out) == 0
    m = lake.read_manifest(lk, lake.last_committed_epoch(lk))
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    pid = int(hash_partition_ids(
        pa.table({"repo": [key[0]], "path": [key[1]]}),
        ["repo", "path"], m["num_partitions"])[0])
    chain = [m["partitions"][str(pid)]["file"]]
    assert keybloom.prune_files(chain, [key[0]], [key[1]]) == []


def test_sidecar_deterministic():
    repos, paths = _keys(1000)
    a = keybloom.build(pa.array(repos), pa.array(paths))
    b = keybloom.build(pa.array(list(repos)), pa.array(list(paths)))
    assert a == b


# -- patch-lake integration ---------------------------------------------------

def test_patch_point_read_parity_and_prune(tmp_path, ray_session):
    """Cell-grain lake (LSM interval 3 -> delta chain): bloom-pruned
    point_read == unpruned; ghost keys return typed-empty."""
    import ray.data as rd

    from e_commerce_batch_etl_pipeline_ray.cdc import patch

    def _build(name, fpp):
        eng = patch.PatchCDCEngine(patch.PatchCDCConfig(
            lake_dir=str(tmp_path / name), num_partitions=4,
            merge_concurrency=2, compact_interval=3, key_bloom_fpp=fpp))
        for ep in range(2):
            t = patch.gen_patch_epoch_table(SPEC, ep)
            eng.ingest_epoch(rd.from_arrow(t).repartition(5), ep)
        return eng

    on = _build("pon", 0.01)
    off = _build("poff", None)
    needles = [(f"org{r:03d}/proj", f"src/mod{m}/file{m}.py")
               for r in range(4) for m in (3, 17)] \
        + [(f"ghost{i}", "nope.py") for i in range(6)]
    a = on.point_read(needles).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    b = off.point_read(needles).to_pandas() \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    # sidecars exist on every file of the bloom lake
    m = lake.read_manifest(on.cfg.lake_dir, 1)
    files = []
    for rec in m["partitions"].values():
        files += ([rec["file"]] if rec.get("file") else []) \
            + list(rec.get("deltas", []))
    assert files and all(os.path.exists(keybloom.sidecar_path(f))
                         for f in files)
    # ghost-only lookup: every chain prunes, typed-empty result
    ghosts = on.point_read([("ghostx", "nope.py")])
    assert ghosts.num_rows == 0 and "lsn" in ghosts.column_names
