from e_commerce_batch_etl_pipeline_ray.cdc import (  # noqa: F401
    aggview,
    binlog,
    engine,
    feed,
    keybloom,
    lake,
    merge,
    multi,
    oracle,
    scd2,
    view,
)
