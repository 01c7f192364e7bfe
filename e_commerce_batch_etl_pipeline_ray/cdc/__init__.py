from e_commerce_batch_etl_pipeline_ray.cdc import binlog, engine, lake, multi, oracle  # noqa: F401
