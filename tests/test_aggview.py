"""Feed-driven aggregate view: retraction algebra vs direct recompute,
incremental == batch, crash-between-poll-and-commit safety, vanished
groups drop out."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import aggview, binlog, engine, lake, oracle

SPEC = binlog.BinlogSpec(seed=42, events_per_epoch=1500, n_repos=8,
                         paths_per_repo=40, evolution_epoch=0,
                         content_chars_min=16, content_chars_max=128,
                         dup_lookback=2000)
N_EPOCHS = 3


def _view(tmp_path, lake_dir):
    # local def: cloudpickle serializes it BY VALUE, so Ray workers never
    # try to import the test module
    def _add_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "content_len", pc.cast(pc.utf8_length(t["content"]), pa.float64()))

    return aggview.AggregateView(
        lake_dir, str(tmp_path / "view.parquet"), by=["lang"],
        sums=[("content_len", "sum_len")], value_fn=_add_len)


def _direct(lake_dir) -> dict:
    rows = lake.read_lake(lake_dir).take_all()
    out: dict = {}
    for r in rows:
        k = r["lang"]
        n, s = out.get(k, (0, 0.0))
        out[k] = (n + 1, s + len(r["content"]))
    return out


def _view_dict(v) -> dict:
    return {r["lang"]: (r["n_rows"], r["sum_len"])
            for r in v.read().to_pylist()}


def test_aggview_matches_direct_recompute(tmp_path):
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
    v = _view(tmp_path, lake_dir)
    stats = v.refresh()
    assert stats["epochs_applied"] == N_EPOCHS
    assert _view_dict(v) == _direct(lake_dir)
    # caught up: refresh is a no-op
    assert v.refresh()["epochs_applied"] == 0


def test_aggview_incremental_equals_batch(tmp_path):
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    v = _view(tmp_path, lake_dir)
    for ep in range(N_EPOCHS):
        eng.ingest_epoch(binlog.gen_epoch(SPEC, ep), ep)
        v.refresh()                       # epoch-by-epoch maintenance
    assert _view_dict(v) == _direct(lake_dir)
    # derived avg
    t = v.read(with_avg=[("sum_len", "avg_len")])
    for r in t.to_pylist():
        assert abs(r["avg_len"] - r["sum_len"] / r["n_rows"]) < 1e-12


def test_aggview_crash_between_poll_and_commit(tmp_path):
    """State+offset move together: re-running refresh after a simulated
    crash (state file untouched) never double-counts."""
    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    eng.ingest_epoch(binlog.gen_epoch(SPEC, 0), 0)
    v = _view(tmp_path, lake_dir)
    v.refresh()
    before = _view_dict(v)
    # crash simulation: second view instance on the same state path polls
    # again from the committed offset — applying nothing new
    v2 = _view(tmp_path, lake_dir)
    assert v2.refresh()["epochs_applied"] == 0
    assert _view_dict(v2) == before


def test_aggview_group_vanishes_when_all_rows_deleted(tmp_path):
    import hashlib

    def ev(lsn, op, path, lang=None, content=""):
        sha = hashlib.sha256(content.encode()).hexdigest() if op != "D" else None
        return {"lsn": lsn, "op": op, "repo": "r", "path": path,
                "lang": lang, "commit": f"c{lsn}",
                "content": content if op != "D" else None,
                "content_sha256": sha}

    lake_dir = str(tmp_path / "lake")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=4,
                                            merge_concurrency=1))
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist([
        ev(1, "I", "a", "py", "xxxx"), ev(2, "I", "b", "md", "yyyyyy")])), 0)
    v = _view(tmp_path, lake_dir)
    v.refresh()
    assert _view_dict(v) == {"py": (1, 4.0), "md": (1, 6.0)}
    eng.ingest_epoch(ray.data.from_arrow(pa.Table.from_pylist([
        ev(3, "D", "b"), ev(4, "U", "a", "py", "xxxxxxxx")])), 1)
    v.refresh()
    assert _view_dict(v) == {"py": (1, 8.0)}     # md dropped, py retracted+asserted
