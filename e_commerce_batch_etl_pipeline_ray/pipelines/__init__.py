from e_commerce_batch_etl_pipeline_ray.pipelines import retail  # noqa: F401
