"""Local mirror of the driver's correctness gate: run each __ray_entry__
query AND its DuckDB oracle on the same sf dir, compare row count, schema
(column names) and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, sort rows by all columns,
    hash the normalized CSV repr (floats to 6 sig decimals)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.stages.blockutil import (
        silence_empty_bundle_warnings,
    )
    silence_empty_bundle_warnings()

    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    unknown = only - set(queries)
    if unknown:
        print(f"WARNING: unknown query names ignored: {sorted(unknown)}")
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (no oracle — rows-only)")
            continue
        exp = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rowcount {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"schema {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems:
            hg, he = value_hash(got), value_hash(exp)
            if hg != he:
                problems.append(f"value hash {hg} != {he}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if len(got) == len(exp) and sorted(got.columns) == sorted(exp.columns):
                g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                e = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
                diff = (g != e) & ~(g.isna() & e.isna())
                bad = diff.any(axis=1)
                print(g[bad].head(3), "\n--- vs ---\n", e[bad].head(3))
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(got)} hash match")

    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
