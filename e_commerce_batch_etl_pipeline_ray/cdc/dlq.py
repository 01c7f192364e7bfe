"""Dead-letter queue — row-level quarantine of malformed change events.

Production CDC pipelines (Debezium / Kafka Connect errors.tolerance=all +
errors.deadletterqueue, Spark badRecordsPath) route individually broken
records to a DLQ instead of failing the whole batch: the epoch still
commits, the bad rows are preserved verbatim with a reason, and an
operator repairs + re-submits them later (re-ingest is safe here — LWW at
the original lsn makes redelivery idempotent). This complements the
epoch-level DQ GATE (quality.checks via CDCConfig.dq, which aborts on
aggregate thresholds): the gate answers "is this batch healthy enough to
apply?", the DLQ answers "which exact rows can never apply?".

Validity contract (one reason per row, fixed precedence, and EXACTLY
mirrored by the q140 oracle's SQL CASE — including SQL three-valued
logic for NULL op):

1. ``null_key``      — repo IS NULL OR path IS NULL (no LWW identity)
2. ``bad_lsn``       — lsn IS NULL OR lsn < 0 (no position in the log)
3. ``bad_op``        — op IS NULL OR op NOT IN ('I','U','D','R')
4. ``sha_mismatch``  — op <> 'D' AND content IS NOT NULL AND
                       (content_sha256 IS NULL OR
                        content_sha256 <> sha256(content))

Exactly-once placement: quarantined rows are written as
``dlq-NNNNN.parquet`` files FLAT inside the epoch's data directory — they
ride the same atomic promote as the partition files, crash cleanup
removes them with the uncommitted epoch, and the committed manifest
records the accumulated ``dlq_files``/``dlq_rows`` so vacuum keeps them
alive and ``read_dlq`` never lists directories. Rows are preserved with
their ORIGINAL event columns (pre-normalize) plus ``_dlq_reason`` and
``_dlq_epoch``.

Reference seam: the reference validates per-row predicates in its clean
step (src/transform.py drop-invalid rules) but discards the rows; the
quarantine-and-replay shape is the CDC-native upgrade.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

VALID_OPS = ("I", "U", "D", "R")
REASON_COL = "_dlq_reason"
EPOCH_COL = "_dlq_epoch"


class ConstraintViolationError(RuntimeError):
    """Raised on a CHECK-constraint violation when the DLQ is off (the
    Delta Lake contract: the write fails, the table is untouched)."""


def _sha_mismatch_mask(t: pa.Table) -> np.ndarray:
    """Rows whose recomputed sha256(content) disagrees with content_sha256
    (missing sha counts as a mismatch when content is present). Bytes are
    hashed straight off the Arrow string buffer (same zero-copy layout as
    engine._verify_content_sha)."""
    n = t.num_rows
    out = np.zeros(n, dtype=bool)
    if "content" not in t.column_names or n == 0:
        return out
    col = t["content"].combine_chunks()
    content_valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    if "content_sha256" not in t.column_names:
        return content_valid            # content but no sha column at all
    expected = t["content_sha256"].combine_chunks()
    sha_valid = pc.is_valid(expected).to_numpy(zero_copy_only=False)
    out |= content_valid & ~sha_valid   # present content, NULL sha
    off_buf, data_buf = col.buffers()[1], col.buffers()[2]
    if off_buf is None or data_buf is None:
        return out
    width = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offsets = np.frombuffer(off_buf, dtype=width, count=n + 1,
                            offset=col.offset * np.dtype(width).itemsize)
    data = memoryview(data_buf)
    exp = expected.to_pylist()
    sha256 = hashlib.sha256
    for i in np.flatnonzero(content_valid & sha_valid):
        if sha256(data[offsets[i]:offsets[i + 1]]).hexdigest() != exp[i]:
            out[i] = True
    return out


def constraint_violations(t: pa.Table, name: str, fn) -> np.ndarray:
    """Rows violating one CHECK constraint, with SQL CHECK semantics: the
    constraint fails only where ``fn(t)`` IS FALSE — NULL (unknown, e.g. a
    predicate over a delete's null payload) passes, exactly like
    ``CHECK (expr)`` in SQL. ``fn`` returns a boolean Arrow array / numpy
    mask meaning "row satisfies the constraint"."""
    mask = fn(t)
    if isinstance(mask, np.ndarray):
        if mask.dtype != bool:
            raise TypeError(f"constraint {name!r} returned {mask.dtype}")
        return ~mask
    if isinstance(mask, (pa.Array, pa.ChunkedArray)):
        return pc.fill_null(pc.equal(mask, False),
                            False).to_numpy(zero_copy_only=False)
    raise TypeError(f"constraint {name!r} returned {type(mask).__name__}")


def classify(t: pa.Table, check_sha: bool = True,
             constraints: tuple = ()) -> pa.Array:
    """Per-row reason string (null = valid row), precedence as documented.
    ``constraints`` — ``((name, fn), ...)`` CHECK constraints — classify
    AFTER the structural reasons (a structurally-broken row quarantines
    with its structural reason; a structurally-valid row violating
    constraint k gets ``check:<name>``, first declared wins)."""
    n = t.num_rows

    def _np(mask) -> np.ndarray:
        if isinstance(mask, (pa.Array, pa.ChunkedArray)):
            return pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        return mask

    null_key = _np(pc.or_kleene(pc.is_null(t["repo"]),
                                pc.is_null(t["path"]))) \
        if {"repo", "path"} <= set(t.column_names) \
        else np.ones(n, dtype=bool)
    if "lsn" in t.column_names:
        bad_lsn = _np(pc.is_null(t["lsn"])) | _np(pc.less(t["lsn"], 0))
    else:
        bad_lsn = np.ones(n, dtype=bool)
    if "op" in t.column_names:
        bad_op = _np(pc.is_null(t["op"])) | ~_np(
            pc.is_in(t["op"], value_set=pa.array(VALID_OPS)))
    else:
        bad_op = np.ones(n, dtype=bool)
    reasons = np.full(n, None, dtype=object)
    if check_sha:
        not_delete = ~_np(pc.equal(t["op"], "D")) \
            if "op" in t.column_names else np.ones(n, dtype=bool)
        sha = _sha_mismatch_mask(t) & not_delete
        reasons[sha] = "sha_mismatch"
    reasons[bad_op] = "bad_op"
    reasons[bad_lsn] = "bad_lsn"
    reasons[null_key] = "null_key"
    if constraints:
        structurally_ok = np.array([r is None for r in reasons], dtype=bool)
        for name, fn in constraints:
            viol = constraint_violations(t, name, fn)
            hit = structurally_ok & viol & np.array(
                [r is None for r in reasons], dtype=bool)
            reasons[hit] = f"check:{name}"
    return pa.array(reasons, pa.string())


def enforce_factory(constraints: tuple):
    """map_batches fn for the NO-DLQ path (Delta contract): any CHECK
    violation aborts the epoch mid-pipeline — nothing was committed, the
    lake is untouched, crash cleanup removes the tmp debris at resume.
    Rows pass through unchanged (zero-copy) when every constraint holds."""
    def _fn(t: pa.Table) -> pa.Table:
        for name, fn in constraints:
            n = int(constraint_violations(t, name, fn).sum())
            if n:
                raise ConstraintViolationError(
                    f"CHECK constraint {name!r} violated by {n} row(s) in "
                    "a batch; epoch aborted (enable CDCConfig.dlq to "
                    "quarantine instead)")
        return t
    return _fn


def split_factory(check_sha: bool, keep: str, epoch: int | None = None,
                  constraints: tuple = ()):
    """map_batches fn: keep='good' passes valid rows through unchanged;
    keep='bad' returns quarantined rows + reason (+ epoch tag)."""
    if keep not in ("good", "bad"):
        raise ValueError(keep)

    def _fn(t: pa.Table) -> pa.Table:
        reason = classify(t, check_sha=check_sha, constraints=constraints)
        bad = pc.is_valid(reason)
        if keep == "good":
            return t.filter(pc.invert(bad))
        out = t.append_column(REASON_COL, reason).filter(bad)
        if epoch is not None:
            out = out.append_column(
                EPOCH_COL, pa.array([epoch] * out.num_rows, pa.int64()))
        return out
    return _fn


def read_dlq(lake_dir: str, epoch: int | None = None) -> ray.data.Dataset:
    """All quarantined rows accumulated so far (from the newest committed
    manifest's ``dlq_files``), schema-unified across evolution boundaries;
    ``epoch`` filters to one ingest epoch's quarantine."""
    import pyarrow.parquet as pq

    from e_commerce_batch_etl_pipeline_ray.cdc import lake

    last = lake.last_committed_epoch(lake_dir)
    if last is None:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    manifest = lake.read_manifest(lake_dir, last)
    files = list(manifest.get("dlq_files", []))
    # union schema across files, newest file's field order wins extras
    fields: dict[str, pa.Field] = {}
    for f in files:
        for fld in pq.read_schema(f):
            fields.setdefault(fld.name, fld)
    schema = pa.schema(list(fields.values()))
    if not files:
        return ray.data.from_arrow(pa.table({REASON_COL:
                                             pa.array([], pa.string())}))

    def _read(batch: pa.Table) -> pa.Table:
        out = []
        for f in batch["file"].to_pylist():
            t = pq.read_table(f)
            cols = []
            for fld in schema:
                if fld.name in t.column_names:
                    c = t[fld.name]
                    cols.append(c.cast(fld.type) if c.type != fld.type else c)
                else:
                    cols.append(pa.nulls(t.num_rows, type=fld.type))
            t = pa.Table.from_arrays(cols, schema=schema)
            if epoch is not None:
                t = t.filter(pc.equal(t[EPOCH_COL], epoch))
            out.append(t)
        return pa.concat_tables(out) if len(out) > 1 else out[0]

    return ray.data.from_items([{"file": f} for f in files]).map_batches(
        _read, batch_format="pyarrow", batch_size=1)


def reason_case_sql() -> str:
    """The validity CASE, verbatim for oracles — MUST mirror classify()."""
    ops = ", ".join(f"'{o}'" for o in VALID_OPS)
    return f"""CASE
  WHEN repo IS NULL OR path IS NULL THEN 'null_key'
  WHEN lsn IS NULL OR lsn < 0 THEN 'bad_lsn'
  WHEN op IS NULL OR op NOT IN ({ops}) THEN 'bad_op'
  WHEN op <> 'D' AND content IS NOT NULL
       AND (content_sha256 IS NULL OR content_sha256 <> sha256(content))
  THEN 'sha_mismatch'
END"""
