"""Vectorized scalar kernels — the complete pyspark.sql.functions surface the
reference uses (SURVEY.md §2.8), expressed as pyarrow.compute.

Every function here is Array/ChunkedArray in -> Array out, suitable for use
inside ``map_batches(batch_format="pyarrow")``. No Python-per-row loops.

Reference call sites cited per function.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# temporal


def to_timestamp(col, fmt: str = "%m/%d/%Y %H:%M", unit: str = "us"):
    """Lenient timestamp parse: unparseable strings -> null.

    Reference: ``to_timestamp(col, "M/d/yyyy H:mm")`` src/transform.py:41
    (Spark's lenient mode nulls on mismatch).
    """
    return pc.strptime(col, format=fmt, unit=unit, error_is_null=True)


def year(col):
    """src/transform.py:128 -> pc.year"""
    return pc.year(col)


def month(col):
    """src/transform.py:129"""
    return pc.month(col)


def day_of_month(col):
    """src/transform.py:130 (dayofmonth)"""
    return pc.day(col)


def quarter(col):
    """notebooks/02_transformations.py:173"""
    return pc.quarter(col)


def day_of_week(col):
    """notebooks/02_transformations.py:174. Spark dayofweek numbering:
    1=Sunday..7=Saturday. Arrow with week_start=7 (Sunday), count_from_zero=True
    gives 0=Sunday..6=Saturday; add 1."""
    return pc.add(pc.day_of_week(col, count_from_zero=True, week_start=7),
                  pa.scalar(1, pa.int64()))


def month_name(col):
    """``date_format(col, 'MMMM')`` notebooks/02_transformations.py:175 -> full
    month name."""
    return pc.strftime(col, format="%B")


def date_diff_days(end, start):
    """``datediff(end, start)`` notebooks/02_transformations.py:177-179 —
    whole days between two timestamps/dates (end - start)."""
    return pc.days_between(start, end)


def strftime(col, fmt: str):
    return pc.strftime(col, format=fmt)


# ---------------------------------------------------------------------------
# arithmetic


def round2(col, ndigits: int = 2):
    """``round(x, 2)`` src/transform.py:131.

    round_mode matches Spark's HALF_UP and DuckDB's ROUND (half away from
    zero) — Arrow's default half_to_even would diverge from the oracle."""
    return pc.round(col, ndigits=ndigits, round_mode="half_towards_infinity")


def multiply(a, b):
    return pc.multiply(a, b)


def subtract(a, b):
    return pc.subtract(a, b)


def divide(a, b):
    return pc.divide(a, b)


def total_amount(quantity, unit_price, ndigits: int = 2):
    """``round(quantity * unit_price, 2)`` src/transform.py:131."""
    return pc.round(pc.multiply(pc.cast(quantity, pa.float64()), unit_price),
                    ndigits=ndigits, round_mode="half_towards_infinity")


def effective_price(unit_price, discount_percent, ndigits: int = 2):
    """``round(unit_price * (1 - discount/100), 2)``
    notebooks/02_transformations.py:188-193."""
    frac = pc.subtract(pa.scalar(1.0), pc.divide(pc.cast(discount_percent, pa.float64()),
                                                 pa.scalar(100.0)))
    return pc.round(pc.multiply(unit_price, frac), ndigits=ndigits,
                    round_mode="half_towards_infinity")


# ---------------------------------------------------------------------------
# string


def starts_with(col, prefix: str):
    """``startswith`` src/transform.py:132."""
    return pc.starts_with(col, pattern=prefix)


def lower(col):
    """notebooks/02_transformations.py:138."""
    return pc.utf8_lower(col)


def bool_from_string(col, true_value: str = "true"):
    """``lower(s) == 'true' -> True else False`` (null -> False)
    notebooks/02_transformations.py:136-141."""
    eq = pc.equal(pc.utf8_lower(col), true_value)
    return pc.fill_null(eq, False)


def is_in(col, values: list):
    """``isin`` status whitelist notebooks/03_data_quality.py:348-350."""
    return pc.is_in(col, value_set=pa.array(values))


# ---------------------------------------------------------------------------
# null handling


def is_null(col):
    return pc.is_null(col)


def is_valid(col):
    return pc.is_valid(col)


def fill_null(col, default):
    """``fillna`` src/transform.py:62-65, notebooks/02_transformations.py:59-68."""
    return pc.fill_null(col, default)


# ---------------------------------------------------------------------------
# conditionals


def if_else(cond, a, b):
    """``when/otherwise`` src/transform.py:62-65."""
    return pc.if_else(cond, a, b)


def bucketize(col, thresholds: list[float], labels: list[str]):
    """Ordered case/when threshold bucketing.

    ``len(labels) == len(thresholds) + 1``; row falls in bucket i when
    ``col < thresholds[i]`` (first match), else the last label. Nulls -> null.

    Reference: price_bucket thresholds 1/5/20/100 src/transform.py:133-140;
    revenue_band 500/2000/5000 notebooks/02_transformations.py:181-186.
    """
    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    out = pc.if_else(pc.is_valid(col), pa.scalar(labels[-1]), pa.scalar(None, pa.string()))
    # Build from the highest threshold down so the lowest matching wins.
    for thr, lab in zip(reversed(thresholds), reversed(labels[:-1])):
        out = pc.if_else(pc.less(col, thr), pa.scalar(lab), out)
    return out


def conditional_count(mask) -> int:
    """``count(when(cond, 1))`` notebooks/02_transformations.py:53-55 — count of
    True in a boolean mask (nulls excluded)."""
    return pc.sum(pc.fill_null(mask, False)).as_py() or 0


# --- extended Spark/ANSI scalar surface (round 3) ---------------------------
# Thin pyarrow.compute wrappers so pipelines read like pyspark.sql.functions;
# each mirrors the DuckDB/Spark function named in its docstring (conformance
# pinned by the q87 gauntlet oracle).

def upper(col):
    """UPPER(col)."""
    return pc.utf8_upper(col)


def trim(col):
    """TRIM(col) (whitespace both ends)."""
    return pc.utf8_trim_whitespace(col)


def ltrim(col):
    """LTRIM(col)."""
    return pc.utf8_ltrim_whitespace(col)


def rtrim(col):
    """RTRIM(col)."""
    return pc.utf8_rtrim_whitespace(col)


def length(col):
    """LENGTH(col) — codepoints, matching DuckDB length()."""
    return pc.cast(pc.utf8_length(col), pa.int64())


def substring(col, start: int, length_: int):
    """SUBSTR(col, start, length) — 1-based like SQL."""
    return pc.utf8_slice_codeunits(col, start - 1, start - 1 + length_)


def concat_ws(sep: str, *cols):
    """CONCAT_WS(sep, ...). Null inputs propagate null (Spark concat
    semantics; mirror with || in SQL, not CONCAT_WS which skips nulls)."""
    return pc.binary_join_element_wise(*cols, sep)


def lpad(col, width: int, fill: str = " "):
    """LPAD(col, width, fill)."""
    return pc.utf8_lpad(col, width, padding=fill)


def rpad(col, width: int, fill: str = " "):
    """RPAD(col, width, fill)."""
    return pc.utf8_rpad(col, width, padding=fill)


def replace(col, pattern: str, replacement: str):
    """REPLACE(col, pattern, replacement) — literal, all occurrences."""
    return pc.replace_substring(col, pattern=pattern,
                                replacement=replacement)


def regexp_extract(col, pattern: str, out_null_on_miss: bool = True):
    """regexp_extract(col, pattern) — first match of the whole pattern
    (RE2; null on no match, matching DuckDB regexp_extract's '' vs null
    needs care: DuckDB returns '' on miss — mirror with NULLIF)."""
    res = pc.extract_regex(col, pattern=f"(?P<m>{pattern})")
    return pc.struct_field(res, "m")


def regexp_contains(col, pattern: str):
    """col ~ pattern (RE2)."""
    return pc.match_substring_regex(col, pattern=pattern)


def ends_with(col, suffix: str):
    """ENDS_WITH / col LIKE '%suffix'."""
    return pc.ends_with(col, pattern=suffix)


def contains(col, needle: str):
    """CONTAINS(col, needle) — literal."""
    return pc.match_substring(col, pattern=needle)


def strpos(col, needle: str):
    """STRPOS / INSTR — 1-based index of first occurrence, 0 if absent."""
    return pc.add(pc.cast(pc.find_substring(col, pattern=needle),
                          pa.int64()), pa.scalar(1, pa.int64()))


def reverse(col):
    """REVERSE(col)."""
    return pc.utf8_reverse(col)


def abs_(col):
    """ABS(col)."""
    return pc.abs(col)


def ceil(col):
    """CEIL(col)."""
    return pc.ceil(col)


def floor(col):
    """FLOOR(col)."""
    return pc.floor(col)


def sqrt(col):
    """SQRT(col)."""
    return pc.sqrt(col)


def ln(col):
    """LN(col)."""
    return pc.ln(col)


def log10(col):
    """LOG10(col)."""
    return pc.log10(col)


def power(col, p):
    """POWER(col, p)."""
    return pc.power(col, p)


def mod(a, b):
    """MOD(a, b) — C-style sign (matches DuckDB % for positive b)."""
    import numpy as np  # noqa: F401
    return pc.subtract(a, pc.multiply(
        pc.cast(pc.floor(pc.divide(pc.cast(a, pa.float64()),
                                   pc.cast(b, pa.float64()))), pa.int64()),
        b))


def greatest(*cols):
    """GREATEST(...) — null-skipping like SQL."""
    return pc.max_element_wise(*cols)


def least(*cols):
    """LEAST(...)."""
    return pc.min_element_wise(*cols)


def coalesce(*cols):
    """COALESCE(...)."""
    return pc.coalesce(*cols)


def sign(col):
    """SIGN(col)."""
    return pc.cast(pc.sign(col), pa.int64())


def date_trunc_month(col):
    """DATE_TRUNC('month', ts)."""
    return pc.floor_temporal(col, unit="month")


def date_trunc_week(col):
    """DATE_TRUNC('week', ts) (ISO weeks, Monday start)."""
    return pc.floor_temporal(col, unit="week", week_starts_monday=True)


def date_add_days(col, days: int):
    """col + INTERVAL days DAY."""
    return pc.add(col, pa.scalar(days * 86400_000_000, pa.duration("us")))
