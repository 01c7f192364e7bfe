"""CHECK constraints at ingest (CDCConfig.constraints): SQL three-valued
semantics (NULL passes), precedence (structural DLQ reasons beat checks,
first declared check wins), quarantine-vs-prefiltered-ingest parity with
the DLQ on, and the Delta fail-fast contract with the DLQ off (epoch
aborts, lake untouched, resume clean)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from e_commerce_batch_etl_pipeline_ray.cdc import binlog, dlq, engine, lake

SPEC = binlog.BinlogSpec(events_per_epoch=1500, n_repos=6, paths_per_repo=30,
                         evolution_epoch=1, content_chars_min=16,
                         content_chars_max=64, dup_lookback=2000)

MIN_LEN = 50       # fixture contents are 49-50 chars: the 49s violate
LEN_CHECK = ("content_min_len",
             lambda t: pc.greater_equal(pc.utf8_length(t["content"]),
                                        MIN_LEN))


def _norm(df):
    cols = sorted(df.columns)
    out = df[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    return out.astype(object).where(out.notna(), None)


def test_three_valued_semantics_and_precedence():
    t = pa.table({
        "lsn": pa.array([1, 2, -5, 3, 4], pa.int64()),
        "repo": pa.array(["r", "r", "r", None, "r"], pa.string()),
        "path": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        "op": pa.array(["I", "D", "I", "I", "I"], pa.string()),
        "content": pa.array(["x" * 50, None, "tiny", "tiny", "tiny"],
                            pa.string()),
        "content_sha256": pa.array([None] * 5, pa.string()),
    })
    checks = (LEN_CHECK,
              ("never_fires", lambda t: np.ones(t.num_rows, dtype=bool)))
    r = dlq.classify(t, check_sha=False, constraints=checks).to_pylist()
    # row0 satisfies; row1 is a delete with NULL content -> NULL passes
    # (three-valued CHECK); rows 2/3 are structurally bad FIRST; row4
    # violates the first-declared check
    assert r == [None, None, "bad_lsn", "null_key",
                 "check:content_min_len"]

    # first declared check wins among multiple violations
    both = (("a_first", lambda t: pc.greater_equal(
        pc.utf8_length(t["content"]), 100)), LEN_CHECK)
    r2 = dlq.classify(t.slice(4, 1), check_sha=False,
                      constraints=both).to_pylist()
    assert r2 == ["check:a_first"]

    # a constraint returning a non-boolean is a hard error
    with pytest.raises(TypeError, match="bad_ret"):
        dlq.constraint_violations(t, "bad_ret",
                                  lambda t: np.zeros(t.num_rows))


def test_dlq_quarantine_equals_prefiltered_ingest(tmp_path, ray_session):
    ev = binlog.gen_epoch_table(SPEC, 0)
    viol = dlq.constraint_violations(ev, *LEN_CHECK)
    assert 0 < viol.sum() < ev.num_rows   # the fixture really exercises it

    import ray.data
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2, dlq=True, constraints=(LEN_CHECK,)))
    eng.ingest_epoch(ray.data.from_arrow(ev).repartition(4), 0)
    m = lake.read_manifest(eng.cfg.lake_dir, 0)
    assert m["dlq_rows"] == int(viol.sum())

    q = dlq.read_dlq(eng.cfg.lake_dir).to_pandas()
    assert set(q["_dlq_reason"]) == {"check:content_min_len"}
    assert len(q) == int(viol.sum())

    # live state == ingesting the pre-cleaned stream into a fresh lake
    clean = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "clean"), num_partitions=4,
        merge_concurrency=2))
    clean.ingest_epoch(ray.data.from_arrow(ev.filter(~viol)).repartition(4),
                       0)
    assert _norm(eng.read().to_pandas()).equals(
        _norm(clean.read().to_pandas()))


def test_no_dlq_aborts_and_lake_untouched(tmp_path, ray_session):
    import ray.data
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=str(tmp_path / "lake"), num_partitions=4,
        merge_concurrency=2, constraints=(LEN_CHECK,)))
    ev0 = binlog.gen_epoch_table(SPEC, 0)
    clean0 = ev0.filter(~dlq.constraint_violations(ev0, *LEN_CHECK))
    eng.ingest_epoch(ray.data.from_arrow(clean0).repartition(4), 0)
    before = _norm(eng.read().to_pandas())

    ev1 = binlog.gen_epoch_table(SPEC, 1)   # has violations
    with pytest.raises(Exception) as ei:
        eng.ingest_epoch(ray.data.from_arrow(ev1).repartition(4), 1)
    assert "content_min_len" in str(ei.value)

    # epoch 1 never committed; resume cleans debris and re-offers epoch 1
    assert eng.resume_point() == 1
    assert _norm(eng.read().to_pandas()).equals(before)
    # a repaired (filtered) epoch 1 then applies
    clean1 = ev1.filter(~dlq.constraint_violations(ev1, *LEN_CHECK))
    eng.ingest_epoch(ray.data.from_arrow(clean1).repartition(4), 1)
    assert lake.last_committed_epoch(eng.cfg.lake_dir) == 1
