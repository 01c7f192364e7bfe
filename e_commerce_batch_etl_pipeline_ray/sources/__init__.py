from e_commerce_batch_etl_pipeline_ray.sources import (  # noqa: F401
    csv_source,
    generators,
    memory,
    parquet_io,
)
