from e_commerce_batch_etl_pipeline_ray.quality import checks  # noqa: F401
