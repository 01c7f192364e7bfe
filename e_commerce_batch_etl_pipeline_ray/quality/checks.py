"""Data-quality framework (SURVEY.md §2.5 A4/A8, reference
src/quality_checks.py + notebooks/03_data_quality.py).

The reference runs 18 checks, each a separate filtered count over a cached
DataFrame (src/pipeline.py:116-129). Here ALL count-based metrics come from
ONE streaming map_batches pass (per-batch partials, driver-side reduce) — no
cache needed, no repeated scans; only the duplicate-rate check adds a
key-distinct pass (a thinned shuffle via local pre-distinct).

Report schema (FIXTURES.md F6, src/quality_checks.py:159-165):
    check_name, metric_value, threshold, status(PASS|WARN|FAIL), detail
Gate semantics: FAIL aborts the pipeline (the notebook orchestrator's
behavior, notebooks/07_pipeline_orchestrator.py:250-252) via
``DataQualityError`` unless ``gate=False`` (the src pipeline logs and
continues, src/pipeline.py:162-168).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import aggregates

REPORT_SCHEMA = pa.schema([
    ("check_name", pa.string()), ("metric_value", pa.float64()),
    ("threshold", pa.float64()), ("status", pa.string()),
    ("detail", pa.string()),
])


class DataQualityError(RuntimeError):
    """Raised by the gate when any check FAILs."""


@dataclass
class DQConfig:
    """Thresholds mirror config/pipeline_config.py:45-56."""
    min_rows: int = 1
    max_null_pct: Mapping[str, float] = field(default_factory=dict)  # col -> pct
    dup_keys: Sequence[str] | None = None
    max_dup_pct: float = 5.0
    non_positive_cols: Sequence[str] = ()      # numeric cols that must be > 0
    year_col: str | None = None
    year_range: tuple[int, int] = (2000, 2030)
    whitelist: Mapping[str, Sequence[str]] = field(default_factory=dict)
    range_checks: Mapping[str, tuple[float, float]] = field(default_factory=dict)
    warn_margin: float = 0.5   # WARN when metric within this fraction of threshold


def _row(name: str, value: float, threshold: float, status: str, detail: str) -> dict:
    return {"check_name": name, "metric_value": float(value),
            "threshold": float(threshold), "status": status, "detail": detail}


def _status(value: float, threshold: float, warn_margin: float) -> str:
    if value > threshold:
        return "FAIL"
    if threshold > 0 and value > threshold * (1 - warn_margin):
        return "WARN"
    return "PASS"


def run_checks(ds: ray.data.Dataset, cfg: DQConfig,
               gate: bool = False) -> tuple[pa.Table, str]:
    """Compute the full report. Returns (report_table, overall_status);
    raises DataQualityError on FAIL when ``gate``."""
    masks: dict[str, Callable[[pa.Table], object]] = {}
    null_cols = list(cfg.max_null_pct)
    for c in null_cols:
        masks[f"null__{c}"] = (lambda col: lambda t: pc.is_null(t[col]))(c)
    for c in cfg.non_positive_cols:
        masks[f"nonpos__{c}"] = (lambda col: lambda t: pc.less_equal(
            pc.fill_null(t[col], -1.0), 0))(c)
    if cfg.year_col:
        y_lo, y_hi = cfg.year_range
        masks["year_out_of_range"] = (
            lambda t, _c=cfg.year_col, _lo=y_lo, _hi=y_hi: pc.or_(
                pc.less(pc.year(t[_c]), _lo),
                pc.greater(pc.year(t[_c]), _hi)))
    for col, allowed in cfg.whitelist.items():
        masks[f"whitelist__{col}"] = (lambda c2, a2: lambda t: pc.invert(
            pc.fill_null(pc.is_in(t[c2], value_set=pa.array(list(a2))), False)))(col, allowed)
    for col, (lo, hi) in cfg.range_checks.items():
        masks[f"range__{col}"] = (lambda c2, l2, h2: lambda t: pc.or_(
            pc.less(t[c2], l2), pc.greater(t[c2], h2)))(col, lo, hi)

    counts = aggregates.global_counts(ds, masks) if masks else {"__rows": ds.count()}
    n = counts["__rows"]

    rows: list[dict] = []
    rows.append(_row("row_count", n, cfg.min_rows,
                     "PASS" if n >= cfg.min_rows else "FAIL",
                     f"rows={n} min={cfg.min_rows}"))
    for c in null_cols:
        pct = 100.0 * counts[f"null__{c}"] / n if n else 0.0
        thr = cfg.max_null_pct[c]
        rows.append(_row(f"null_pct__{c}", round(pct, 4), thr,
                         _status(pct, thr, cfg.warn_margin),
                         f"{counts[f'null__{c}']} nulls / {n}"))
    for c in cfg.non_positive_cols:
        bad = counts[f"nonpos__{c}"]
        rows.append(_row(f"non_positive__{c}", bad, 0,
                         "PASS" if bad == 0 else "FAIL", f"{bad} rows <= 0"))
    if cfg.year_col:
        bad = counts["year_out_of_range"]
        rows.append(_row("year_out_of_range", bad, 0,
                         "PASS" if bad == 0 else "FAIL",
                         f"{bad} rows outside {cfg.year_range}"))
    for col in cfg.whitelist:
        bad = counts[f"whitelist__{col}"]
        rows.append(_row(f"whitelist__{col}", bad, 0,
                         "PASS" if bad == 0 else "FAIL", f"{bad} rows off-list"))
    for col in cfg.range_checks:
        bad = counts[f"range__{col}"]
        rows.append(_row(f"range__{col}", bad, 0,
                         "PASS" if bad == 0 else "FAIL", f"{bad} rows out of range"))

    if cfg.dup_keys:
        from e_commerce_batch_etl_pipeline_ray.stages.dedup import distinct
        uniq = distinct(list(cfg.dup_keys), num_partitions=32).apply(ds).count()
        dup_pct = 100.0 * (n - uniq) / n if n else 0.0
        rows.append(_row("dup_pct", round(dup_pct, 4), cfg.max_dup_pct,
                         _status(dup_pct, cfg.max_dup_pct, cfg.warn_margin),
                         f"{n - uniq} duplicate rows on {list(cfg.dup_keys)}"))

    report = pa.Table.from_pylist(rows, schema=REPORT_SCHEMA)
    statuses = [r["status"] for r in rows]
    overall = "FAIL" if "FAIL" in statuses else ("WARN" if "WARN" in statuses else "PASS")
    if gate and overall == "FAIL":
        failed = [r["check_name"] for r in rows if r["status"] == "FAIL"]
        raise DataQualityError(f"DQ gate failed: {failed}")
    return report, overall
