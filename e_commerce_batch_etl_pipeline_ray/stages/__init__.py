from e_commerce_batch_etl_pipeline_ray.stages import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    maps,
    multimodal,
    neardup,
    similarity,
    sorts,
    streaming,
    text,
)
