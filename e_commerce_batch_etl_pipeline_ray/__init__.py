"""Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch re-expression of the capabilities of
tishant24/E-Commerce-Batch-ETL-Pipeline (PySpark batch ETL: explicit-schema
extract, 8-step transform chain, 18-check data-quality gate, partitioned
Parquet + batched DB sink) as an idiomatic Ray Data engine, extended into a
CDC / incremental-ingest engine (binlog tail -> lake upsert with
last-writer-wins semantics, schema evolution, exactly-once epoch manifests)
per BASELINE.json, plus the large-scale training-data operators
(dedup family, similarity search, text analysis, multimodal plumbing).

Layout:
    core           TableSpec (schema contract) + Step / Pipeline protocol
    functions/     vectorized scalar kernels (pyarrow.compute wrappers)
    stages/        operator library: maps, filters, dedup, joins, aggregates,
                   sorts, text analysis, similarity search, multimodal
    sources/       readers (csv/parquet/memory), writers, synthetic generators
    quality/       data-quality check framework (report + gate)
    cdc/           binlog generator, LWW merge-apply engine, epoch manifests,
                   lake reader, single-process replay oracle
    pipelines/     composed end-to-end pipelines (retail conformance, orders,
                   cdc ingest)

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by the caller (tests' conftest fixture, bench.py, or the driver harness).
"""

from e_commerce_batch_etl_pipeline_ray.core import Pipeline, Step, TableSpec

__all__ = ["Pipeline", "Step", "TableSpec"]
__version__ = "0.1.0"
