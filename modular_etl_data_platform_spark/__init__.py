"""modular_etl_data_platform_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the capabilities of the
reference config-driven medallion ETL framework
(lowjinshen/modular-etl-data-platform): schema-driven ingestion,
expression-based cleansing, declarative data-quality validation,
dedup/upsert, SCD Type 2 dimensional modeling, point-in-time star joins,
calculated measures — plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is expressed through the DataFrame / Spark SQL API so Catalyst
plans the physical execution (pushdown, pruning, broadcast, AQE).
"""

from modular_etl_data_platform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
