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
    """Flagship pipeline on sf0.001: lineitem -> zero-copy Arrow filter +
    derived revenue -> pre-aggregated grouped pricing summary (the engine's
    showcase read->map_batches->aggregate chain)."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    return Q.q1_pricing_summary(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; keys missing
    here get a rows-only check (non-SQL-expressible ops: near-dup sketches,
    CDC replay, model-scoring stages)."""
    from e_commerce_batch_etl_pipeline_ray.pipelines import queries as Q
    return dict(Q.ORACLE)
