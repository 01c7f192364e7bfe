"""S6/S9 — batched, partition-parallel, idempotent relational DB sink and
read-back reader.

Reference semantics (src/load.py:46-92, notebooks/05_mysql_load.py:215-259):
JDBC MySQL writer with batchsize 5000-10000, 4 parallel connections,
rewriteBatchedStatements, truncate-then-append, column projection + type
downcasts first; spot-check reader (notebooks/05_mysql_load.py:288-303).

Here the DB is SQLite (stdlib; WAL mode allows multi-process writers) so the
semantics — batched executemany, N parallel writer actors each owning one
connection, truncate-then-load idempotency, read-back verification — are
real and tested without a MySQL server. Swapping the connection factory for
a MySQL driver is a one-liner per actor.
"""

from __future__ import annotations

import os
import sqlite3
import time

import pyarrow as pa

import ray.data


class _DBWriter:
    """One actor = one connection (the reference's 'numPartitions=4 parallel
    connections'); each batch becomes executemany chunks of ``batch_rows``."""

    def __init__(self, db_path: str, table: str, columns: list[str],
                 batch_rows: int):
        # check_same_thread=False: Ray actor __call__ runs on a different
        # thread than __init__; the actor serializes its own calls
        self.conn = sqlite3.connect(db_path, timeout=60.0,
                                    check_same_thread=False)
        self.conn.execute("PRAGMA journal_mode=WAL")
        self.conn.execute("PRAGMA synchronous=NORMAL")
        self.table = table
        self.columns = columns
        self.batch_rows = batch_rows
        placeholders = ",".join("?" * len(columns))
        # INSERT OR REPLACE: a Ray task retry after a partially-committed
        # attempt re-applies idempotently instead of violating the unique
        # business key (the reference's MySQL unique index,
        # sql/create_tables.sql:67, acts as the same upsert guard)
        self.sql = (f"INSERT OR REPLACE INTO {table} ({','.join(columns)}) "
                    f"VALUES ({placeholders})")

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = [t[c].to_pylist() for c in self.columns]
        rows = list(zip(*cols))
        written = 0
        for i in range(0, len(rows), self.batch_rows):
            chunk = rows[i:i + self.batch_rows]
            for attempt in range(5):
                try:
                    with self.conn:
                        self.conn.executemany(self.sql, chunk)
                    break
                except sqlite3.OperationalError:   # writer lock contention
                    time.sleep(0.05 * (attempt + 1))
            else:
                raise RuntimeError("db write failed after retries")
            written += len(chunk)
        return pa.table({"rows_written": pa.array([written], pa.int64())})


def write_table(ds: ray.data.Dataset, db_path: str, table: str,
                columns: list[str], schema_sql: str,
                mode: str = "truncate", batch_rows: int = 5000,
                concurrency: int = 4) -> int:
    """Write ``columns`` of ``ds`` into ``table``. ``mode='truncate'``
    reproduces the reference's truncate-then-append idempotency
    (src/load.py:79). Returns rows written."""
    conn = sqlite3.connect(db_path)
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute(schema_sql)
    if mode == "truncate":
        conn.execute(f"DELETE FROM {table}")
    conn.commit()
    conn.close()

    out = ds.select_columns(columns).map_batches(
        _DBWriter, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(db_path, table, columns, batch_rows),
        concurrency=concurrency, num_cpus=0.5)
    import pyarrow.compute as pc
    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import collect_arrow
    totals = collect_arrow(out)
    return pc.sum(totals["rows_written"]).as_py() or 0


def read_query(db_path: str, query: str) -> pa.Table:
    """S9 — spot-check reader (COUNT(*)/sample subqueries back from the DB,
    notebooks/05_mysql_load.py:288-303)."""
    conn = sqlite3.connect(db_path)
    cur = conn.execute(query)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    conn.close()
    return pa.Table.from_pylist([dict(zip(names, r)) for r in rows])
