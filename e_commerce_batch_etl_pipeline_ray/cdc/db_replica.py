"""Exactly-once replication of the change feed into a TRANSACTIONAL SQL
sink — the Kafka-Connect-JDBC-sink (upsert mode) shape: a downstream
warehouse table follows the lake, and the consumer offset commits INSIDE
the same sink transaction as the data, so crash-at-any-point either
applies an epoch window fully (offset advanced) or not at all (offset
unmoved, redelivery applies the identical statements).

Per sync():

1. read the durable offset from the sink's own ``_cdc_offsets`` row;
2. plan the feed window (offset .. latest committed epoch) — the
   manifest-pruned change feed (cdc/feed.change_feed), no lake scan;
3. reduce the window to ONE FINAL ACTION PER KEY with a distributed
   keyed dedup (max (_commit_epoch, lsn) non-preimage change wins —
   the same finals rule as feed.apply_feed), so statement order inside
   the transaction is irrelevant and redelivery is idempotent even
   row-by-row;
4. stream the winners to the driver batch-wise and apply them in one
   sink transaction: delete -> DELETE by key, insert/update_postimage ->
   upsert (INSERT OR REPLACE); then UPDATE the offset row and COMMIT.

SQLite stands in for the JDBC warehouse exactly as in
sources/db_sink.py (SURVEY §7.5: identical transaction/batching
semantics, no external service in this container). The target table is
created on first sync from the feed's Arrow schema with (repo, path) as
PRIMARY KEY — which is also what makes INSERT OR REPLACE an upsert.
"""

from __future__ import annotations

import os
import sqlite3

import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.cdc import feed as _feed
from e_commerce_batch_etl_pipeline_ray.cdc import lake

KEY = ["repo", "path"]
_META = "_cdc_offsets"

_SQL_TYPES = {
    "int64": "INTEGER", "int32": "INTEGER", "bool": "INTEGER",
    "double": "REAL", "float": "REAL",
}


def _sql_type(t: pa.DataType) -> str:
    return _SQL_TYPES.get(str(t), "TEXT")


class DBReplica:
    """One replica table in one SQLite file, following one lake."""

    def __init__(self, lake_dir: str, db_path: str, table: str = "replica"):
        if not table.replace("_", "").isalnum():
            raise ValueError(f"unsafe table name {table!r}")
        self.lake_dir = lake_dir
        self.db_path = db_path
        self.table = table

    # -- sink-side state -----------------------------------------------------

    def _connect(self) -> sqlite3.Connection:
        os.makedirs(os.path.dirname(self.db_path) or ".", exist_ok=True)
        con = sqlite3.connect(self.db_path)
        con.execute(f"CREATE TABLE IF NOT EXISTS {_META} "
                    "(tbl TEXT PRIMARY KEY, next_epoch INTEGER NOT NULL)")
        return con

    def offset(self) -> int:
        """Next epoch to consume (0 on a fresh sink)."""
        con = self._connect()
        try:
            row = con.execute(
                f"SELECT next_epoch FROM {_META} WHERE tbl = ?",
                (self.table,)).fetchone()
            return row[0] if row else 0
        finally:
            con.close()

    def _ensure_table(self, con: sqlite3.Connection,
                      schema: pa.Schema) -> list[str]:
        cols = [f.name for f in schema
                if f.name not in (_feed.CHANGE_COL, _feed.EPOCH_COL)]
        defs = ", ".join(
            f'"{f.name}" {_sql_type(f.type)}' for f in schema
            if f.name in cols)
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{self.table}" ({defs}, '
            f"PRIMARY KEY (repo, path))")
        # additive schema evolution follows the lake: new feed columns
        # become nullable sink columns (same transaction as the data)
        have = {r[1] for r in con.execute(
            f'PRAGMA table_info("{self.table}")')}
        for f in schema:
            if f.name in cols and f.name not in have:
                con.execute(f'ALTER TABLE "{self.table}" ADD COLUMN '
                            f'"{f.name}" {_sql_type(f.type)}')
        return cols

    # -- the sync loop body --------------------------------------------------

    def sync(self) -> dict:
        """Apply every unconsumed epoch window atomically; returns the
        window + applied/deleted counts ({'epochs': 0, ...} if caught
        up)."""
        from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
            dedup_keyed,
        )

        latest = lake.last_committed_epoch(self.lake_dir)
        start = self.offset()
        if latest is None or latest < start:
            return {"epochs": 0, "applied": 0, "deleted": 0,
                    "next_epoch": start}

        changes = _feed.change_feed(self.lake_dir, from_epoch=start,
                                    to_epoch=latest)
        finals = dedup_keyed(
            KEY, [_feed.EPOCH_COL, "lsn"], descending=True,
            num_partitions=8).apply(
                changes.filter(
                    expr=f"{_feed.CHANGE_COL} != 'update_preimage'"))

        con = self._connect()
        applied = deleted = 0
        cols: list[str] | None = None
        try:
            con.execute("BEGIN")
            for batch in finals.iter_batches(batch_format="pyarrow",
                                             batch_size=4096):
                if cols is None:
                    cols = self._ensure_table(con, batch.schema)
                    collist = ", ".join(f'"{c}"' for c in cols)
                    ph = ", ".join("?" * len(cols))
                    upsert = (f'INSERT OR REPLACE INTO "{self.table}" '
                              f"({collist}) VALUES ({ph})")
                    delete = (f'DELETE FROM "{self.table}" '
                              "WHERE repo = ? AND path = ?")
                ct = batch[_feed.CHANGE_COL].to_pylist()
                rows = batch.select(cols).to_pylist()
                keys = list(zip(batch["repo"].to_pylist(),
                                batch["path"].to_pylist()))
                ups = [tuple(r[c] for c in cols)
                       for r, t in zip(rows, ct) if t != "delete"]
                dels = [k for k, t in zip(keys, ct) if t == "delete"]
                if ups:
                    con.executemany(upsert, ups)
                    applied += len(ups)
                if dels:
                    con.executemany(delete, dels)
                    deleted += len(dels)
            if cols is None and latest >= start:
                # feed window had zero changes: still advance the offset
                pass
            con.execute(
                f"INSERT INTO {_META} (tbl, next_epoch) VALUES (?, ?) "
                "ON CONFLICT(tbl) DO UPDATE SET next_epoch = excluded"
                ".next_epoch", (self.table, latest + 1))
            con.commit()          # data + offset land atomically
        except BaseException:
            con.rollback()
            raise
        finally:
            con.close()
        return {"epochs": latest - start + 1, "applied": applied,
                "deleted": deleted, "next_epoch": latest + 1}

    def read(self) -> pa.Table:
        """The replica table as Arrow (driver-side; a replica read-back is
        a spot check, not a data path)."""
        con = self._connect()
        try:
            cur = con.execute(f'SELECT * FROM "{self.table}"')
            names = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            con.close()
        return pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows]) if rows else pa.table(
                {n: pa.array([], pa.string()) for n in names})
