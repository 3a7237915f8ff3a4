from modular_etl_data_platform_spark.queries.catalog import QUERIES, ORACLES, flagship

__all__ = ["QUERIES", "ORACLES", "flagship"]
