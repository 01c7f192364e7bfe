"""Multi-table CDC lake: several independently-versioned CDC tables under
one root directory (TODO.md 'CDC: multi-table lakes').

Layout:

    root/
      tables/<name>/            one full single-table lake per table
        epoch=000N/  manifests/ ...
      txn/txn-000K.json         cross-table transaction records

Tables are fully independent — each has its own epoch counter, schema
chain, manifests and resume point, so a crashed ingest of one table
re-runs without touching the others, and different tables may sit at
different committed epochs (a real binlog fans out per-table streams at
per-table rates). The per-table engine is the unchanged CDCEngine; this
class is thin routing + discovery, PLUS one genuinely multi-table piece:
``ingest_transaction``, an atomic cross-table snapshot commit.

Transactional commit protocol (two-phase, write-ahead decide record,
roll-forward recovery):

  1. PREPARE  per table: full ingest with ``staged_commit=True`` — data
     dirs promoted as usual, manifest written to
     ``manifests/epoch-N.json.staged`` (INVISIBLE: readers/resume only
     see ``.json``).
  2. DECIDE   one atomic os.replace of ``txn/txn-K.json`` listing
     ``{table: epoch}``. This is the commit point for ALL tables at once.
  3. ROLL FORWARD  rename each staged manifest to final (idempotent).
  4. DONE     rewrite the txn record with ``completed: true`` (audit).

Crash before 2 -> no txn record -> ``recover()`` removes the staged
manifests as aborted debris (per-table ``clean_uncommitted`` then
reclaims the orphaned epoch dirs on the next resume). Crash between 2
and 4 -> ``recover()`` rolls the recorded txn FORWARD. Readers at any
instant see either every table's new epoch or none — visibility flips
only through step 3, reachable exactly when the txn record exists.
Single-writer rule: ``ingest_transaction``/``recover`` must not run
concurrently with each other or with vacuum (same rule the single-table
lake documents).

Reference lineage: generalizes the reference's single curated table +
run-log layout (src/load.py, notebooks/07_pipeline_orchestrator.py) the
same way the manifest generalizes its overwrite-idempotent sink.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import replace

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc import lake
from e_commerce_batch_etl_pipeline_ray.cdc.engine import CDCConfig, CDCEngine, EpochStats

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


class MultiTableCDC:
    """Router for per-table CDCEngines under one lake root, with
    cross-table transactional commits."""

    def __init__(self, root: str, config: CDCConfig):
        """``config.lake_dir`` is ignored; it is derived per table."""
        self.root = root
        self._template = config
        self._engines: dict[str, CDCEngine] = {}
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)

    def _table_dir(self, name: str) -> str:
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid table name {name!r}")
        return os.path.join(self.root, "tables", name)

    def table(self, name: str) -> CDCEngine:
        eng = self._engines.get(name)
        if eng is None:
            cfg = replace(self._template, lake_dir=self._table_dir(name))
            eng = CDCEngine(cfg)
            self._engines[name] = eng
        return eng

    def tables(self) -> list[str]:
        d = os.path.join(self.root, "tables")
        return sorted(n for n in os.listdir(d)
                      if os.path.isdir(os.path.join(d, n)))

    def ingest_epoch(self, table: str, events: ray.data.Dataset, epoch: int,
                     **kwargs) -> EpochStats:
        return self.table(table).ingest_epoch(events, epoch, **kwargs)

    def read(self, table: str, **kwargs) -> ray.data.Dataset:
        return self.table(table).read(**kwargs)

    def resume_points(self) -> dict[str, int]:
        """Per-table next epoch to ingest (rolls unfinished transactions
        forward first, then cleans each table's crash debris).
        Independent counters — one table's crash never rolls back
        another."""
        self.recover()
        return {name: self.table(name).resume_point()
                for name in self.tables()}

    def shutdown(self) -> None:
        for eng in self._engines.values():
            if eng._pool is not None:
                eng._pool.shutdown()

    # --- cross-table transactions -------------------------------------

    def _txn_dir(self) -> str:
        return os.path.join(self.root, "txn")

    def _next_txn_id(self) -> int:
        d = self._txn_dir()
        if not os.path.isdir(d):
            return 0
        ids = [int(f[len("txn-"):-len(".json")]) for f in os.listdir(d)
               if f.startswith("txn-") and f.endswith(".json")]
        return max(ids) + 1 if ids else 0

    def _write_txn(self, txn_id: int, record: dict) -> None:
        d = self._txn_dir()
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"txn-{txn_id:04d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, path)

    def _read_txns(self) -> list[tuple[int, dict]]:
        d = self._txn_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for f in sorted(os.listdir(d)):
            if f.startswith("txn-") and f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append((int(f[len("txn-"):-len(".json")]),
                                json.load(fh)))
        return out

    def recover(self) -> dict:
        """Roll committed-but-unfinished transactions FORWARD, then clear
        aborted prepares' staged manifests. Idempotent; must not run
        concurrently with an in-flight ``ingest_transaction``."""
        rolled, cleaned = 0, 0
        for txn_id, rec in self._read_txns():
            if rec.get("completed"):
                continue
            for name, epoch in rec["tables"].items():
                lake.promote_staged_manifest(self._table_dir(name),
                                             int(epoch))
                rolled += 1
            rec["completed"] = True
            self._write_txn(txn_id, rec)
        for name in self.tables():
            cleaned += lake.clean_staged(self._table_dir(name))
        return {"manifests_rolled_forward": rolled,
                "aborted_staged_cleaned": cleaned}

    def ingest_transaction(self, events_by_table: dict[str, ray.data.Dataset],
                           events_in: dict[str, int] | None = None
                           ) -> dict[str, EpochStats]:
        """Atomic multi-table snapshot commit: ingest one epoch into EVERY
        named table such that readers see all of them or none (protocol in
        the module docstring). Per-table epoch counters stay independent —
        each table commits its own next epoch."""
        self.recover()
        stats: dict[str, EpochStats] = {}
        epochs: dict[str, int] = {}
        for name in sorted(events_by_table):
            eng = self.table(name)
            epoch = eng.resume_point()
            stats[name] = eng.ingest_epoch(
                events_by_table[name], epoch,
                events_in=(events_in or {}).get(name),
                staged_commit=True)
            epochs[name] = epoch
        txn_id = self._next_txn_id()
        self._write_txn(txn_id, {"txn": txn_id, "tables": epochs,
                                 "completed": False})
        for name, epoch in epochs.items():
            lake.promote_staged_manifest(self._table_dir(name), epoch)
        self._write_txn(txn_id, {"txn": txn_id, "tables": epochs,
                                 "completed": True})
        return stats
