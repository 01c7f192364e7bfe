from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, oracle  # noqa: F401
