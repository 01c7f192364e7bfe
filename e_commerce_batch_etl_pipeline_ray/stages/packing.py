"""Sequence packing: group documents into token-budget bins (the LLM
training-data "pack sequences to context length" step).

Shape: docs are hash-partitioned on id (the usual `_pid` pattern — ONE
Python call per partition, not per doc), each partition runs first-fit-
decreasing bin packing over its docs, and pack ids are made globally unique
as ``pid * 2**32 + local_bin``. Packing is partition-LOCAL by design: a
global optimum would need an all-to-all over every doc for a few percent of
bin savings (FFD is within 11/9·OPT + 1 bins per partition); at 100 TB the
partition-local version is embarrassingly parallel and deterministic —
partition assignment and in-partition order are pure functions of (id,
tokens), so a resumed run reproduces the same packs.

Docs LARGER than the budget get a singleton pack (flagged ``oversize``);
splitting/truncating is a caller policy, not silently applied here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from e_commerce_batch_etl_pipeline_ray.core import FnStep
from e_commerce_batch_etl_pipeline_ray.stages.dedup import hash_partition_ids

_PID = "__pack_pid"


def pack_sequences(id_col: str, tokens_col: str, budget: int,
                   num_partitions: int = 64) -> FnStep:
    """Assign every doc to a pack of at most ``budget`` total tokens.
    Output: one row per doc — (doc id, n_tokens, pack_id, oversize)."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def _pack_partition(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (id_col, pa.int64()), ("n_tokens", pa.int64()),
            ("pack_id", pa.int64()), ("oversize", pa.bool_()),
        ])
        if g.num_rows == 0:
            return out_schema.empty_table()
        pid = int(g[_PID][0].as_py())
        ids = g[id_col].to_numpy()
        toks = g[tokens_col].to_numpy().astype(np.int64)
        # first-fit decreasing: big docs first, deterministic tiebreak on id
        order = np.lexsort((ids, -toks))
        bin_free: list[int] = []            # remaining capacity per bin
        assign = np.empty(len(ids), dtype=np.int64)
        oversize = np.zeros(len(ids), dtype=bool)
        for row in order:
            t = int(toks[row])
            if t > budget:
                assign[row] = len(bin_free)
                bin_free.append(0)          # full singleton bin
                oversize[row] = True
                continue
            for b, free in enumerate(bin_free):
                if free >= t:
                    assign[row] = b
                    bin_free[b] = free - t
                    break
            else:
                assign[row] = len(bin_free)
                bin_free.append(budget - t)
        pack_ids = (np.int64(pid) << np.int64(32)) + assign
        return pa.table({
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(toks, pa.int64()),
            "pack_id": pa.array(pack_ids, pa.int64()),
            "oversize": pa.array(oversize, pa.bool_()),
        })

    def _apply(ds):
        def _assign_pid(t: pa.Table) -> pa.Table:
            p = hash_partition_ids(t, [id_col], num_partitions)
            return t.append_column(_PID, pa.array(p, pa.int32()))

        ds = ds.map_batches(_assign_pid, batch_format="pyarrow",
                            zero_copy_batch=True)
        return ds.groupby(_PID).map_groups(_pack_partition,
                                           batch_format="pyarrow")

    return FnStep(f"pack[{budget}]", _apply)
