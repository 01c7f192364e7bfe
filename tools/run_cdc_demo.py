"""End-to-end CDC engine drive: generate a binlog, ingest N epochs
(including the schema-evolution boundary), simulate a crash + resume, and
verify the final lake state against the single-process replay oracle.

Usage: python tools/run_cdc_demo.py [--events 20000] [--epochs 4]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=16)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, oracle

    spec = binlog.BinlogSpec(events_per_epoch=args.events, evolution_epoch=2)
    lake_dir = tempfile.mkdtemp(prefix="cdc_lake_", dir="/tmp")
    eng = engine.CDCEngine(engine.CDCConfig(
        lake_dir=lake_dir, num_partitions=args.partitions, merge_concurrency=4))

    t0 = time.time()
    for ep in range(args.epochs):
        evs = binlog.gen_epoch(spec, ep)
        st = eng.ingest_epoch(evs, ep, events_in=spec.events_per_epoch)
        print(f"epoch {ep}: applied={st.rows_applied} watermark={st.lsn_watermark} "
              f"parts={st.partitions_touched} bytes={st.bytes_written}")
    elapsed = time.time() - t0
    total_events = args.events * args.epochs
    print(f"ingest: {total_events} events in {elapsed:.2f}s "
          f"({total_events/elapsed:,.0f} events/s)")

    # crash simulation: delete the last manifest (crash between data write
    # and commit), leave data dir -> resume must re-run the epoch cleanly
    last = eng.last_committed_epoch()
    os.remove(os.path.join(lake_dir, "manifests", f"epoch-{last:04d}.json"))
    nxt = eng.resume_point()
    assert nxt == last, f"resume point {nxt} != {last}"
    st = eng.ingest_epoch(binlog.gen_epoch(spec, nxt), nxt)
    print(f"crash/resume: re-ingested epoch {nxt}, watermark={st.lsn_watermark}")

    # oracle parity
    all_events = pa.concat_tables(
        [binlog.gen_epoch_table(spec, e) for e in range(args.epochs)],
        promote_options="permissive")
    expected = oracle.live_rows(oracle.replay(all_events))
    got = eng.read().to_pandas()
    got_keys = set(zip(got["repo"], got["path"]))
    exp_keys = set(expected.keys())
    assert got_keys == exp_keys, (
        f"key sets differ: {len(got_keys)} vs {len(exp_keys)}; "
        f"sample diff {list(exp_keys ^ got_keys)[:3]}")
    mismatch = 0
    for _, row in got.iterrows():
        e = expected[(row["repo"], row["path"])]
        if (row["content_sha256"] != e["content_sha256"]
                or row["commit"] != e["commit"] or row["lsn"] != e["lsn"]
                or row.get("lang") != e.get("lang")):
            mismatch += 1
    assert mismatch == 0, f"{mismatch} row mismatches"
    print(f"oracle parity: {len(got)} live rows, sha256/commit/lsn/lang all match")

    shutil.rmtree(lake_dir)
    ray.shutdown()
    print("CDC demo OK")


if __name__ == "__main__":
    main()
