from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline

__all__ = ["MedallionPipeline"]
