from modular_etl_data_platform_spark.functions.scalar import (
    format_phone,
    null_safe_hash,
    date_key,
)

__all__ = ["format_phone", "null_safe_hash", "date_key"]
