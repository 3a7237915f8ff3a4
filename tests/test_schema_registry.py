from __future__ import annotations

import pytest
from pyspark.sql import types as T

from modular_etl_data_platform_spark.schema.registry import (
    SchemaRegistry,
    TableConfig,
    parse_datatype,
)

CONFIG = {
    "table_name": "silver_widgets",
    "source_table": "bronze_widgets",
    "load_type": "upsert",
    "primary_keys": ["widget_id"],
    "partition_by": ["event_date"],
    "incremental_column": "ingestion_date",
    "file_format": "csv",
    "delimiter": "|",
    "header": True,
    "file_path": "raw/widgets.csv",
    "columns": [
        {"name": "widget_id", "datatype": "bigint", "nullable": False},
        {"name": "name", "datatype": "string", "nullable": False,
         "transformation": "initcap(trim(name))"},
        {"name": "price", "datatype": "decimal(10,2)", "nullable": True},
        {"name": "event_date", "datatype": "date", "nullable": False},
        {"name": "tags", "datatype": "array<string>", "nullable": True},
        {"name": "score", "datatype": "double", "nullable": True},
    ],
    "metadata_columns": [
        {"name": "ingestion_timestamp", "datatype": "timestamp", "nullable": False},
    ],
    "data_quality_rules": {"null_checks": ["widget_id"]},
}


def test_parse_primitives():
    assert parse_datatype("string") == T.StringType()
    assert parse_datatype("bigint") == T.LongType()
    assert parse_datatype("long") == T.LongType()
    assert parse_datatype("integer") == T.IntegerType()
    assert parse_datatype("boolean") == T.BooleanType()
    assert parse_datatype("date") == T.DateType()
    assert parse_datatype("timestamp") == T.TimestampType()
    assert parse_datatype("double") == T.DoubleType()
    assert parse_datatype("binary") == T.BinaryType()


def test_parse_decimal_and_complex():
    assert parse_datatype("decimal(10,2)") == T.DecimalType(10, 2)
    assert parse_datatype("DECIMAL(12, 4)") == T.DecimalType(12, 4)
    assert parse_datatype("array<string>") == T.ArrayType(T.StringType())
    assert parse_datatype("map<string,int>") == T.MapType(T.StringType(), T.IntegerType())
    with pytest.raises(ValueError):
        parse_datatype("not_a_type!!")


def test_table_config_accessors():
    cfg = TableConfig(raw=CONFIG)
    assert cfg.table_name == "silver_widgets"
    assert cfg.primary_keys == ["widget_id"]
    assert cfg.partition_by == ["event_date"]
    assert cfg.incremental_column == "ingestion_date"
    assert cfg.required_columns() == ["widget_id", "name", "event_date"]
    assert cfg.transformations() == {"name": "initcap(trim(name))"}
    assert cfg.source_info["delimiter"] == "|"
    schema = cfg.spark_schema()
    assert schema["price"].dataType == T.DecimalType(10, 2)
    assert schema["tags"].dataType == T.ArrayType(T.StringType())
    full = cfg.spark_schema(include_metadata=True)
    assert "ingestion_timestamp" in full.names


def test_registry_register_get():
    reg = SchemaRegistry()
    reg.register(CONFIG)
    assert reg.get("silver_widgets").load_type == "upsert"
    assert reg.tables() == ["silver_widgets"]
