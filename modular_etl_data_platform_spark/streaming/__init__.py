from modular_etl_data_platform_spark.streaming.incremental import (
    stream_bronze_to_silver,
    stream_ingest,
)
from modular_etl_data_platform_spark.streaming.versioned_source import (
    VersionedTableStreamDataSource,
)

__all__ = [
    "stream_ingest",
    "stream_bronze_to_silver",
    "VersionedTableStreamDataSource",
]
