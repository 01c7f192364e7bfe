"""Multi-table CDC lake: several independently-versioned CDC tables under
one root directory (TODO.md 'CDC: multi-table lakes').

Layout:

    root/
      tables/<name>/            one full single-table lake per table
        epoch=000N/  manifests/ ...

Tables are fully independent — each has its own epoch counter, schema
chain, manifests and resume point, so a crashed ingest of one table
re-runs without touching the others, and different tables may sit at
different committed epochs (a real binlog fans out per-table streams at
per-table rates). The per-table engine is the unchanged CDCEngine; this
class is deliberately thin routing + discovery, not a new commit protocol.

Reference lineage: generalizes the reference's single curated table +
run-log layout (src/load.py, notebooks/07_pipeline_orchestrator.py) the
same way the manifest generalizes its overwrite-idempotent sink.
"""

from __future__ import annotations

import os
import re
from dataclasses import replace

import ray.data

from e_commerce_batch_etl_pipeline_ray.cdc.engine import CDCConfig, CDCEngine, EpochStats

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


class MultiTableCDC:
    """Router for per-table CDCEngines under one lake root."""

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
        """Per-table next epoch to ingest (cleans each table's crash
        debris). Independent counters — one table's crash never rolls
        back another."""
        return {name: self.table(name).resume_point()
                for name in self.tables()}

    def shutdown(self) -> None:
        for eng in self._engines.values():
            if eng._pool is not None:
                eng._pool.shutdown()
