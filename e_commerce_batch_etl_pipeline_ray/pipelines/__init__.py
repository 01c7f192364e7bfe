from e_commerce_batch_etl_pipeline_ray.pipelines import orders, queries, retail  # noqa: F401
