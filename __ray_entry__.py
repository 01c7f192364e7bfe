"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: the CDC ingest engine (BASELINE.json north_star) on a small
    deterministic binlog — generate -> normalize+LWW combine -> hash shuffle
    -> merge-apply -> exactly-once manifest commit, two epochs across the
    schema-evolution boundary; returns the final live lake table. (The
    batch-relational showcase is queries()['q1_pricing_summary'].)"""
    import tempfile

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine
    spec = binlog.BinlogSpec(events_per_epoch=3000, n_repos=12,
                             paths_per_repo=80, evolution_epoch=1,
                             content_chars_min=32, content_chars_max=256)
    lake_dir = tempfile.mkdtemp(prefix="entry_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(lake_dir=lake_dir,
                                            num_partitions=8,
                                            merge_concurrency=2))
    for ep in range(2):
        eng.ingest_epoch(binlog.gen_epoch(spec, ep), ep)
    return eng.read().sort(["repo", "path"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys missing
    here get a rows-only check (non-SQL-expressible ops: near-dup sketches,
    model-scoring stages). q24 (CDC flagship) and q26 (orders chain) read
    deterministic parquet fixtures shared with their Ray pipelines —
    materialized here too so the driver may evaluate either side first."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    Q.ensure_oracle_fixtures()
    Q.ensure_q93_fixture()
    return dict(Q.ORACLE)
