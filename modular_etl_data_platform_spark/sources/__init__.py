from modular_etl_data_platform_spark.sources.readers import read_source
from modular_etl_data_platform_spark.sources.audit import add_metadata_columns
from modular_etl_data_platform_spark.sources.sinks import (
    append_partitioned,
    overwrite_table,
    write_quarantine,
)

__all__ = [
    "read_source",
    "add_metadata_columns",
    "append_partitioned",
    "overwrite_table",
    "write_quarantine",
]
