from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from modular_etl_data_platform_spark.operators.validate import RuleSet

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


REFERENCE_CONFIGS = "/root/reference/config"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIGS), reason="reference repo not present"
)
def test_registry_parses_all_reference_configs(spark):
    """Drop-in config compatibility: every one of the reference's 16 real
    config files compiles through this registry — schema, PKs, SCD
    columns, measures, dimension joins, DQ rules. (``spark`` fixture:
    rule compilation emits Column objects, which need a live session;
    the registry itself is session-free.)"""
    import pathlib

    from pyspark.sql import types as T

    paths = sorted(pathlib.Path(REFERENCE_CONFIGS).rglob("*_schema.json"))
    assert len(paths) == 16
    reg = SchemaRegistry()
    for p in paths:
        cfg = reg.load(p)
        schema = cfg.spark_schema(include_metadata=True)
        assert isinstance(schema, T.StructType) and len(schema) > 0

    # dimension dialect: per-column scd_type flags match the scd_config block
    dim = reg.get("dim_customer")
    t2, t1 = dim.scd_columns()
    assert set(t2) == set(dim.scd_config["type2_columns"])
    assert set(t1) == set(dim.scd_config["type1_columns"])
    assert dim.business_key == "customer_id"
    assert dim.surrogate_key == "customer_key"

    # fact dialect: measures + per-column references -> join specs
    fact = reg.get("fact_orders")
    measures = {m["name"] for m in fact.measure_columns()}
    assert {"order_total", "tax_amount", "shipping_fee", "item_count"} <= measures
    joins = {j["key_column"]: j["join_type"] for j in fact.dimension_joins()}
    assert joins["customer_key"] == "point_in_time"
    assert joins["order_date_key"] == "direct"

    # silver dialect: transformations + all five DQ rule classes parse
    silver = reg.get("silver_customers")
    assert "format_phone(phone)" in silver.transformations().values()
    rs = RuleSet.from_config(silver.data_quality_rules)
    kinds = {r.kind for r in rs.rules}
    assert {"null_check", "value_constraint", "format_validation"} <= kinds
    assert rs.uniqueness and rs.referential is not None


def test_silver_configs_cover_reference_transformation_surface():
    """Parity pin: every column the reference declares a cleansing
    transformation for (reference: config/silver/schema/*_schema.json)
    has a transformation in our demo configs too (updated_timestamp is
    stamped from the raw feed's updated_at where present, vs the
    reference's current_timestamp())."""
    import glob
    import json

    ref: dict[str, set] = {}
    for p in glob.glob("/root/reference/config/silver/schema/*_schema.json"):
        c = json.load(open(p))
        for col in c.get("columns", []):
            if col.get("transformation"):
                ref.setdefault(c["table_name"], set()).add(col["name"])
    if not ref:  # reference copy absent in this environment
        return
    ours: dict[str, set] = {}
    for p in glob.glob("configs/ecommerce/silver/*.json"):
        c = json.load(open(p))
        for col in c.get("columns", []):
            if col.get("transformation"):
                ours.setdefault(c["table_name"], set()).add(col["name"])
    for table, cols in ref.items():
        missing = cols - ours.get(table, set()) - {"updated_timestamp"}
        assert not missing, f"{table} missing transformations: {missing}"
