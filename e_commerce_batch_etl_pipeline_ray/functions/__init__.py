from e_commerce_batch_etl_pipeline_ray.functions import scalar

__all__ = ["scalar"]
