from __future__ import annotations

import json

import pytest

from modular_etl_data_platform_spark.schema.registry import TableConfig
from modular_etl_data_platform_spark.streaming.incremental import (
    stream_bronze_to_silver,
    stream_ingest,
)

CONFIG = {
    "table_name": "silver_readings",
    "source_table": "bronze_readings",
    "source_system": "sensors",
    "file_format": "json",
    "primary_keys": ["reading_id"],
    "columns": [
        {"name": "reading_id", "datatype": "bigint", "nullable": False},
        {"name": "sensor", "datatype": "string", "nullable": False,
         "transformation": "lower(trim(sensor))"},
        {"name": "value", "datatype": "double", "nullable": True},
    ],
    "data_quality_rules": {"null_checks": ["reading_id"]},
}


def test_stream_ingest_files(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    for batch in range(2):
        rows = [
            {"reading_id": batch * 10 + i, "sensor": f" S{i} ", "value": float(i)}
            for i in range(5)
        ]
        # streaming json source expects line-delimited
        (src / f"batch{batch}.json").write_text(
            "\n".join(json.dumps(r) for r in rows)
        )
    out = tmp_path / "bronze"
    ckpt = tmp_path / "ckpt"
    q = stream_ingest(
        spark, TableConfig(raw=CONFIG), str(src), str(out), str(ckpt)
    )
    q.awaitTermination(60)
    bronze = spark.read.parquet(str(out))
    assert bronze.count() == 10
    assert "ingestion_timestamp" in bronze.columns
    assert bronze.filter("record_source = 'sensors'").count() == 10


def test_stream_bronze_to_silver_upserts(spark, tmp_path):
    import datetime as dt

    bronze_dir = tmp_path / "bronze"
    rows = [
        (1, " A ", 1.0, dt.datetime(2024, 1, 1)),
        (1, " B ", 2.0, dt.datetime(2024, 1, 2)),  # newer version of key 1
        (2, " C ", 3.0, dt.datetime(2024, 1, 1)),
    ]
    spark.createDataFrame(
        rows, ["reading_id", "sensor", "value", "ingestion_timestamp"]
    ).write.parquet(str(bronze_dir))

    silver_dir = tmp_path / "silver"
    ckpt = tmp_path / "ckpt2"
    q = stream_bronze_to_silver(
        spark, TableConfig(raw=CONFIG), str(bronze_dir), str(silver_dir), str(ckpt)
    )
    q.awaitTermination(60)
    silver = spark.read.parquet(str(silver_dir))
    got = {r.reading_id: r.sensor for r in silver.collect()}
    assert got == {1: "b", 2: "c"}  # keyed-latest + transformation applied
