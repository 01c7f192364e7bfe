"""Core contracts: TableSpec (explicit schema enforcement) and Step/Pipeline.

The reference is emphatic about explicit, never-inferred schemas
(reference: src/extract.py:27-36, notebooks/01_data_ingestion.py:172-180) and
composes its transforms as a logged chain of plain functions
(reference: src/transform.py:168-184, src/pipeline.py:132-197). Here that
becomes:

* ``TableSpec`` — a named ``pyarrow.Schema`` plus an enforcement cast applied
  per batch inside ``map_batches(batch_format="pyarrow")``. Enforcement is
  zero-copy when the batch already conforms (Arrow cast is a no-op then).
* ``Step`` — anything with ``name`` and ``apply(ds) -> ds``. The operator
  library in ``stages/`` produces Steps; users extend the engine by writing
  their own (the reference's user-extension surface, SURVEY.md §2.9).
* ``Pipeline`` — ordered Steps with per-step audit logging (records in/out is
  OPT-IN via ``audit=True`` because each count forces an execution; the
  default composes lazily so the streaming executor fuses the whole chain).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa

import ray.data

logger = logging.getLogger("ecom_ray")


@dataclass(frozen=True)
class TableSpec:
    """An explicit schema contract for one logical table.

    Mirrors the reference's ``StructType`` usage (src/extract.py:27-36): the
    schema is declared up front and enforced by casting, never inferred.

    ``strict=True``  -> FAILFAST: unexpected/missing columns or uncastable
                        values raise (pyarrow raises on bad cast).
    ``strict=False`` -> PERMISSIVE: missing columns are null-backfilled,
                        extra columns dropped, bad casts -> error (use
                        ``safe=False`` cast semantics are NOT used; CSV-level
                        permissiveness lives in sources/csv_source.py).
    """

    name: str
    schema: pa.Schema
    strict: bool = True

    @property
    def column_names(self) -> list[str]:
        return list(self.schema.names)

    def enforce(self, table: pa.Table) -> pa.Table:
        """Cast ``table`` to exactly this schema (order, names, types)."""
        cols = []
        for fld in self.schema:
            if fld.name in table.column_names:
                col = table.column(fld.name)
                if col.type != fld.type:
                    col = col.cast(fld.type)
                cols.append(col)
            elif self.strict:
                raise KeyError(
                    f"TableSpec[{self.name}]: missing required column {fld.name!r}; "
                    f"have {table.column_names}"
                )
            else:
                cols.append(pa.nulls(table.num_rows, type=fld.type))
        if self.strict:
            extra = set(table.column_names) - set(self.schema.names)
            if extra:
                raise KeyError(
                    f"TableSpec[{self.name}]: unexpected columns {sorted(extra)}"
                )
        return pa.Table.from_arrays(cols, schema=self.schema)

    def enforce_step(self) -> "Step":
        spec = self

        def _fn(t: pa.Table) -> pa.Table:
            return spec.enforce(t)

        return FnStep(f"enforce[{self.name}]", lambda ds: ds.map_batches(
            _fn, batch_format="pyarrow", zero_copy_batch=True))


@runtime_checkable
class Step(Protocol):
    """One pipeline stage: Dataset in, Dataset out. Lazy — applying a Step
    must not trigger execution."""

    name: str

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset: ...


@dataclass
class FnStep:
    """Adapter: wrap a plain ``Dataset -> Dataset`` function as a Step."""

    name: str
    fn: Callable[[ray.data.Dataset], ray.data.Dataset]

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return self.fn(ds)


def batch_step(name: str, fn: Callable[[pa.Table], pa.Table], **map_kwargs) -> FnStep:
    """A Step that is a single zero-copy Arrow ``map_batches`` pass.

    This is the workhorse: every row-local operator (rename, cast, null ops,
    filters, derived columns, projection — reference src/transform.py) is one
    of these, so the streaming executor can fuse consecutive steps into one
    task per block.
    """
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)

    def _apply(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(fn, **kwargs)

    return FnStep(name, _apply)


@dataclass
class StepLog:
    step: str
    records_in: int
    records_out: int
    duration_s: float
    status: str = "OK"


@dataclass
class Pipeline:
    """Ordered Step chain with optional per-step audit.

    Reference semantics: ``run_all_transforms`` logs records in/out per step
    (src/transform.py:168-184); the notebook orchestrator records per-stage
    durations and row counts (notebooks/07_pipeline_orchestrator.py:139-150).
    Audit mode reproduces that but forces a count per step (extra passes) —
    keep it off for production runs; the lazy default lets Ray fuse stages.
    """

    steps: list[Step] = field(default_factory=list)
    name: str = "pipeline"

    def add(self, step: Step) -> "Pipeline":
        self.steps.append(step)
        return self

    def apply(self, ds: ray.data.Dataset, audit: bool = False,
              logs: list[StepLog] | None = None) -> ray.data.Dataset:
        for step in self.steps:
            if audit:
                t0 = time.perf_counter()
                n_in = ds.count()
                ds = step.apply(ds)
                n_out = ds.count()
                rec = StepLog(step.name, n_in, n_out, time.perf_counter() - t0)
                if logs is not None:
                    logs.append(rec)
                logger.info("step %-28s in=%9d out=%9d %.2fs",
                            rec.step, rec.records_in, rec.records_out, rec.duration_s)
            else:
                ds = step.apply(ds)
        return ds
