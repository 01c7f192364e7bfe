"""Deterministic distributed binlog generator (FIXTURES.md F2).

Emits insert/update/delete change events over a keyspace of source-code
repository files keyed by (repo, path), per BASELINE.json ``input_hint``.
Generation follows the reference's seeded-dirty-generator pattern
(data/sample/generate_sample.py:14-143) but is parallel and
order-independent: every event is a pure function of its global event index
through splitmix64 (see sources/generators.py), so the stream is identical
at any parallelism.

Pathological cases baked in (required by FIXTURES.md F2 / SURVEY.md §5):
  * hot-repo skew — ``hot_fraction`` of events target one repo (mirrors the
    reference's UK=52% country skew, data/sample/generate_sample.py:62);
  * duplicate delivery — ``dup_fraction`` of rows are byte-identical replicas
    of an earlier event (same LSN) possibly from a PRIOR epoch (which also
    yields cross-epoch out-of-order arrival);
  * out-of-order within an epoch — LSNs are shuffled across blocks anyway
    (correctness must come from LWW, never arrival order);
  * delete-then-reinsert and update-to-never-inserted keys arise naturally
    from random op assignment over a finite keyspace;
  * additive schema evolution — events before ``evolution_epoch`` carry NO
    ``lang`` column at all; later epochs add it (engine null-backfills old
    rows via Arrow schema unification).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.sources.generators import (
    rng_streams,
    uniform,
)

_U64 = np.uint64

LANGS = ["py", "rs", "go", "js", "md", "c"]

# column layout of the evolved event schema
EVENT_SCHEMA_V2 = pa.schema([
    ("lsn", pa.int64()), ("op", pa.string()),
    ("repo", pa.string()), ("path", pa.string()),
    ("commit", pa.string()), ("lang", pa.string()),
    ("content", pa.string()), ("content_sha256", pa.string()),
])
EVENT_SCHEMA_V1 = pa.schema([f for f in EVENT_SCHEMA_V2 if f.name != "lang"])


@dataclass(frozen=True)
class BinlogSpec:
    """Shape of the synthetic binlog. Defaults are test-sized; bench scales
    events_per_epoch up."""
    seed: int = 42
    events_per_epoch: int = 10_000
    n_repos: int = 50
    paths_per_repo: int = 500
    hot_fraction: float = 0.5        # share of events hitting the hot repo
    dup_fraction: float = 0.03       # duplicate-delivery rate
    dup_lookback: int = 15_000       # how far back (events) a duplicate may come from
    delete_fraction: float = 0.08
    update_fraction: float = 0.42    # remainder -> inserts
    evolution_epoch: int = 2         # epochs >= this carry the `lang` column
    content_chars_min: int = 64
    content_chars_max: int = 4096

    def total_keys(self) -> int:
        return self.n_repos * self.paths_per_repo


def _sha256_hex(strings: list[str | None]) -> list[str | None]:
    out = []
    for s in strings:
        out.append(hashlib.sha256(s.encode()).hexdigest() if s is not None else None)
    return out


def event_batch(ids: np.ndarray, spec: BinlogSpec, with_lang: bool) -> pa.Table:
    """Materialize events for global event indices ``ids`` (pure function)."""
    s = spec.seed
    # duplicate delivery: replica of an earlier event index (same LSN + payload)
    dup = uniform(ids, s, 200) < spec.dup_fraction
    back = 1 + (rng_streams(ids, s, 201) % _U64(spec.dup_lookback)).astype(np.int64)
    eff = np.where(dup & (ids >= back), ids - back, ids)

    lsn = eff.astype(np.int64)
    u_op = uniform(eff, s, 202)
    op = np.where(u_op < spec.delete_fraction, "D",
                  np.where(u_op < spec.delete_fraction + spec.update_fraction, "U", "I"))

    # key: hot repo gets hot_fraction of traffic; rest uniform over other repos
    hot = uniform(eff, s, 203) < spec.hot_fraction
    repo_i = np.where(
        hot, 0, 1 + (rng_streams(eff, s, 204) % _U64(max(1, spec.n_repos - 1))).astype(np.int64))
    path_i = (rng_streams(eff, s, 205) % _U64(spec.paths_per_repo)).astype(np.int64)
    repo = np.char.mod("org%03d/proj", repo_i).astype(object)
    path = np.array([f"src/mod{p % 40}/file{p}.py" for p in path_i], dtype=object)

    commit_u = rng_streams(eff, s, 206)
    commit = np.char.mod("%016x", commit_u.astype(np.int64) & 0x7FFFFFFFFFFFFFFF)
    commit = np.char.add(commit, commit)  # 32 hex
    commit = np.char.add(commit, np.char.mod("%08x", (commit_u >> _U64(32)).astype(np.int64)))

    # content: deterministic pseudo-code text, width varies per event
    width = (spec.content_chars_min
             + (rng_streams(eff, s, 207)
                % _U64(max(1, spec.content_chars_max - spec.content_chars_min))
                ).astype(np.int64))
    token = np.char.mod("v%016x", rng_streams(eff, s, 208).astype(np.int64) & 0x7FFFFFFFFFFFFFFF)
    contents: list[str | None] = []
    for o, w, tk, li in zip(op, width, token,
                            (rng_streams(eff, s, 209) % _U64(len(LANGS))).astype(np.int64)):
        if o == "D":
            contents.append(None)
        else:
            line = f"def {tk}(x):\n    return x * {int(w)}  # {LANGS[li]}\n"
            reps = max(1, int(w) // len(line))
            contents.append(line * reps)
    sha = _sha256_hex(contents)

    cols = {
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array(op.astype(object), pa.string()),
        "repo": pa.array(repo, pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": pa.array(commit.astype(object), pa.string()),
    }
    if with_lang:
        # lang is a function of the event's ORIGINAL epoch (eff), not the
        # delivery epoch: pre-evolution events have lang=null even when
        # re-delivered late, so duplicates stay byte-identical and LWW ties
        # (same LSN seen twice) are unambiguous.
        lang_i = (rng_streams(eff, s, 209) % _U64(len(LANGS))).astype(np.int64)
        lang = np.asarray(LANGS, dtype=object)[lang_i]
        pre_evolution = eff < spec.evolution_epoch * spec.events_per_epoch
        lang = np.where(pre_evolution | (np.asarray(op) == "D"), None, lang)
        cols["lang"] = pa.array(lang, pa.string())
    cols["content"] = pa.array(contents, pa.string())
    cols["content_sha256"] = pa.array(sha, pa.string())
    return pa.table(cols)


def gen_epoch(spec: BinlogSpec, epoch: int, **range_kwargs) -> ray.data.Dataset:
    """The epoch's micro-batch as a streaming Dataset (distributed generate)."""
    lo = epoch * spec.events_per_epoch
    with_lang = epoch >= spec.evolution_epoch

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy() + lo
        return event_batch(ids, spec, with_lang)

    return ray.data.range(spec.events_per_epoch, **range_kwargs).map_batches(
        _gen, batch_format="pyarrow")


def gen_epoch_table(spec: BinlogSpec, epoch: int) -> pa.Table:
    """Driver-side materialized epoch (for the replay oracle in tests)."""
    lo = epoch * spec.events_per_epoch
    ids = np.arange(lo, lo + spec.events_per_epoch, dtype=np.int64)
    return event_batch(ids, spec, epoch >= spec.evolution_epoch)
