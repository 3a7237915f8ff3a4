"""Audit/metadata column injection (SURVEY §2.1 S6).

Bronze tables carry ``ingestion_timestamp, ingestion_date, source_file,
record_source`` (reference: config/bronze/schema/README.md:34-39); Silver
adds ``updated_timestamp, record_source``
(reference: config/silver/schema/README.md:55-58). Implemented with
built-in column expressions only — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_metadata_columns(df: DataFrame, record_source: str) -> DataFrame:
    """Append the standard bronze audit columns."""
    return df.withColumns(
        {
            "ingestion_timestamp": F.current_timestamp(),
            "ingestion_date": F.current_date(),
            "source_file": F.input_file_name(),
            "record_source": F.lit(record_source),
        }
    )


def add_silver_audit(df: DataFrame, record_source: str) -> DataFrame:
    """Append the silver-layer audit columns."""
    return df.withColumns(
        {
            "updated_timestamp": F.current_timestamp(),
            "record_source": F.lit(record_source),
        }
    )
