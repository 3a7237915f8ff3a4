from modular_etl_data_platform_spark.operators.transforms import apply_transformations
from modular_etl_data_platform_spark.operators.dedup import dedupe_latest

__all__ = ["apply_transformations", "dedupe_latest"]
