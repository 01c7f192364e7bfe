"""END-TO-END TRAINING-DATA CURRICULUM BUILD — the flagship composition
of the LLM-data operator families into the pipeline a 100-TB corpus
actually runs, documents in, packed token shards out:

    lang-ID -> quality gate -> robust length gate (per language)
    -> exact dedup -> MinHash near-dup dedup (transitive clusters)
    -> deterministic per-language mixture sample
    -> distributed BPE train + tokenize -> sequence packing (FFD)
    -> hash-sharded parquet + a JSON build manifest

Every stage is one of the individually-oracled operators
(q14/q16/q20/q36/q44/q101/q37/q123/q127-128 families); this module adds
the COMPOSITION: stage ordering (cheap row-local gates before the
shuffle-heavy dedups; dedup before BPE so duplicated boilerplate cannot
dominate merge statistics), count lineage for the manifest, and the
resumable sharded layout (shard = hash(pack_id) % n_shards, one
directory per shard, so a re-run can skip or rebuild shards
independently).

Determinism: every gate is a pure function of row content/ids and every
sample is hash-based, so the SAME input yields the SAME shards at ANY
block layout or parallelism — the property the layout-invariance test
pins. Scale notes: stage counts ride the manifest (each .count() is a
metadata fold, no row fetch); the only driver-side materialization is
the BPE merge list (num_merges tuples)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray.data

from e_commerce_batch_etl_pipeline_ray.stages import (
    aggregates,
    bpe,
    neardup,
    packing,
    sampling,
    text,
)


@dataclass
class CurriculumConfig:
    out_dir: str
    quality_min: float = 0.25
    length_mad_c: float = 4.0
    neardup_threshold: float = 0.8
    lang_fractions: dict[str, float] = field(default_factory=dict)
    default_fraction: float = 1.0
    sample_seed: int = 0
    num_merges: int = 64
    pack_budget: int = 512
    n_shards: int = 8
    text_col: str = "text"
    id_col: str = "doc_id"


def build_curriculum(docs: ray.data.Dataset,
                     cfg: CurriculumConfig) -> dict:
    """Run the full build; returns the manifest dict (also written to
    ``out_dir/manifest.json``). Shards land in ``out_dir/shard=N/``."""
    tcol, idc = cfg.text_col, cfg.id_col
    counts: dict[str, int] = {"input": docs.count()}

    # 1. language ID (actor-pool, vectorized) — adds lang_pred
    ds = text.lang_id(tcol).apply(docs)

    # 2. quality gate (row-local). Materialize at each counted stage —
    # a .count() on a LAZY dataset re-executes the whole upstream chain
    # (the q110 lesson), and the robust gate's stats pass reads its
    # input twice anyway; the streaming executor spills oversized
    # materializations to the object store.
    ds = text.quality_score(tcol).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(
            t["quality"], pa.scalar(cfg.quality_min))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    counts["quality_gate"] = ds.count()

    # 3. robust length gate per predicted language (outliers can't
    #    poison their own threshold)
    ds = ds.map_batches(
        lambda t: t.append_column("__len", pa.compute.cast(
            pa.compute.utf8_length(t[tcol]), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = aggregates.robust_outlier_filter(
        ["lang_pred"], "__len", c=cfg.length_mad_c).apply(ds)
    ds = ds.drop_columns(["__len"]).materialize()
    counts["length_gate"] = ds.count()

    # 4. exact dedup (content sha, keep-min-id)
    ds = neardup.exact_dedup(tcol, idc).apply(ds).materialize()
    counts["exact_dedup"] = ds.count()

    # 5. near-dup dedup: LSH candidate pairs -> transitive clusters ->
    #    keep the min id per cluster
    pairs = neardup.minhash_lsh_pairs(ds, text_col=tcol, id_col=idc,
                                      threshold=cfg.neardup_threshold)
    ds = neardup.dedup_by_pairs(ds, pairs, id_col=idc)
    counts["near_dedup"] = ds.count()

    # 6. deterministic per-language mixture
    ds = sampling.stratified_sample(
        idc, "lang_pred", cfg.lang_fractions,
        default=cfg.default_fraction, seed=cfg.sample_seed).apply(ds)
    counts["mixture"] = ds.count()
    ds = ds.materialize()

    # 7. BPE train on the SURVIVING corpus (dedup first, so boilerplate
    #    can't dominate merge statistics), then tokenize
    merges = bpe.bpe_train(ds, cfg.num_merges, id_col=idc, text_col=tcol)
    toks = bpe.bpe_tokenize(ds, merges, id_col=idc, text_col=tcol)
    toks = toks.materialize()

    # 8. sequence packing (partition-local FFD over token counts)
    packs = packing.pack_sequences(idc, "n_tokens", cfg.pack_budget).apply(
        toks.select_columns([idc, "n_tokens"]))

    # 9. shard assignment + partitioned write (resumable layout).
    # pack_id rides back onto the token rows via a co-partitioned
    # tagged union on doc_id — Arrow joins cannot carry list<int32>
    # payload columns, and the union shuffles each row once anyway.
    from e_commerce_batch_etl_pipeline_ray.stages.dedup import (
        hash_partition_ids,
    )
    tok_type = pa.list_(pa.int32())

    def _tag(kind: str, has_tokens: bool):
        def _fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            out = pa.table({
                "_kind": pa.array([kind] * n),
                idc: t[idc].combine_chunks(),
                "tokens": (t["tokens"].combine_chunks().cast(tok_type)
                           if has_tokens else pa.nulls(n, tok_type)),
                "n_tokens": (t["n_tokens"] if has_tokens
                             else pa.nulls(n, pa.int64())),
                "pack_id": (t["pack_id"] if not has_tokens
                            else pa.nulls(n, pa.int64())),
            })
            pid = hash_partition_ids(out, [idc], 8)
            return out.append_column("_jpid", pa.array(pid, pa.int32()))
        return _fn

    def _attach(g: pa.Table) -> pa.Table:
        is_t = pa.compute.equal(g["_kind"], "t")
        tk = g.filter(is_t)
        pk = g.filter(pa.compute.invert(is_t))
        pos = pa.compute.index_in(tk[idc].combine_chunks(),
                                  value_set=pk[idc].combine_chunks())
        return pa.table({
            idc: tk[idc], "tokens": tk["tokens"],
            "n_tokens": tk["n_tokens"],
            "pack_id": pk["pack_id"].combine_chunks().take(pos)})

    out = (toks.map_batches(_tag("t", True), batch_format="pyarrow",
                            zero_copy_batch=True)
           .union(packs.map_batches(_tag("p", False),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True))
           .groupby("_jpid").map_groups(_attach, batch_format="pyarrow"))

    def _shard(t: pa.Table) -> pa.Table:
        pid = t["pack_id"].combine_chunks().to_numpy()
        return t.append_column(
            "shard", pa.array((pid % cfg.n_shards).astype(np.int32)))

    out = out.map_batches(_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
    counts["tokenized"] = toks.count()
    os.makedirs(cfg.out_dir, exist_ok=True)
    out.write_parquet(cfg.out_dir, partition_cols=["shard"],
                      mode="overwrite")

    token_total = int(toks.map_batches(
        lambda t: pa.table({"s": pa.array(
            [pa.compute.sum(t["n_tokens"]).as_py() or 0], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()["s"].sum())
    manifest = {
        "counts": counts,
        "tokens_total": token_total,
        "num_merges": len(merges),
        "pack_budget": cfg.pack_budget,
        "n_shards": cfg.n_shards,
        "merges": [list(m) for m in merges],
    }
    tmp = os.path.join(cfg.out_dir, "manifest.json.wip")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(cfg.out_dir, "manifest.json"))
    return manifest
