"""Golden end-to-end medallion pipeline test on seeded fixtures that
replicate the reference's e-commerce semantics: pipe-delimited orders CSV
with injected duplicates + a forced null, JSON customers with an SCD2
address-change update file (reference:
data/generators/generate_sample_data.py:47-195)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.facts import DimensionLookup, load_fact
from modular_etl_data_platform_spark.operators.quality import (
    assert_healthy,
    orphaned_fact_violations,
    scd2_current_violations,
)
from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
from modular_etl_data_platform_spark.schema.registry import TableConfig

N_ORDERS = 50
N_DUPES = 3


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    # orders: pipe CSV, header, duplicates + one bad row (negative total)
    lines = ["order_id|customer_id|order_date|order_status|order_total"]
    for i in range(N_ORDERS):
        status = ["pending", "shipped", "delivered"][i % 3]
        lines.append(f"{i}|{i % 10}|2024-01-{(i % 27) + 1:02d}|{status.upper()} |{10.0 + i}")
    for i in range(N_DUPES):  # duplicate re-emits of existing orders
        lines.append(f"{i}|{i % 10}|2024-01-{(i % 27) + 1:02d}|SHIPPED |{10.0 + i}")
    lines.append(f"{N_ORDERS}|3|2024-01-05|shipped|-99.0")  # DQ violation
    (d / "orders.csv").write_text("\n".join(lines))

    # customers: JSON array
    customers = [
        {"customer_id": c, "first_name": f"  name{c}  ", "city": "springfield", "tier": "gold"}
        for c in range(10)
    ]
    (d / "customers.json").write_text(json.dumps(customers))
    return str(d)


BRONZE_ORDERS = {
    "table_name": "bronze_orders",
    "source_system": "order_management",
    "file_format": "csv",
    "delimiter": "|",
    "header": True,
    "file_path": "orders.csv",
    "primary_keys": ["order_id"],
    "partition_by": ["ingestion_date"],
    "columns": [
        {"name": "order_id", "datatype": "bigint", "nullable": False},
        {"name": "customer_id", "datatype": "bigint", "nullable": False},
        {"name": "order_date", "datatype": "date", "nullable": False},
        {"name": "order_status", "datatype": "string", "nullable": False},
        {"name": "order_total", "datatype": "double", "nullable": True},
    ],
}

SILVER_ORDERS = {
    "table_name": "silver_orders",
    "source_table": "bronze_orders",
    "load_type": "upsert",
    "primary_keys": ["order_id"],
    "incremental_column": "ingestion_date",
    "columns": [
        {"name": "order_id", "datatype": "bigint", "nullable": False},
        {"name": "customer_id", "datatype": "bigint", "nullable": False},
        {"name": "order_date", "datatype": "date", "nullable": False},
        {
            "name": "order_status",
            "datatype": "string",
            "nullable": False,
            "transformation": "lower(trim(order_status))",
        },
        {"name": "order_total", "datatype": "double", "nullable": True},
    ],
    "data_quality_rules": {
        "null_checks": ["order_id", "customer_id"],
        "value_constraints": {
            "order_status": ["pending", "processing", "shipped", "delivered", "cancelled"],
            "order_total": ">= 0",
        },
    },
}

DIM_CUSTOMER = {
    "table_name": "dim_customer",
    "primary_keys": ["customer_id"],
    "columns": [],
    "scd_config": {
        "type2_columns": ["city", "tier"],
        "type1_columns": ["first_name"],
        "hash_delimiter": "|",
    },
}


@pytest.fixture(scope="module")
def pipeline(spark, raw_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    return MedallionPipeline(spark, warehouse=str(wh), raw_base=raw_dir)


def test_ep1_bronze_ingest(pipeline):
    cfg = TableConfig(raw=BRONZE_ORDERS)
    pipeline.ingest_bronze(cfg)
    bronze = pipeline.read_table("bronze_orders")
    assert bronze.count() == N_ORDERS + N_DUPES + 1
    for col in ("ingestion_timestamp", "ingestion_date", "source_file", "record_source"):
        assert col in bronze.columns
    assert bronze.select("record_source").first().record_source == "order_management"
    assert bronze.select("source_file").first().source_file.endswith("orders.csv")


def test_ep2_silver_transform(pipeline):
    cfg = TableConfig(raw=SILVER_ORDERS)
    metrics = pipeline.transform_silver(cfg)
    silver = pipeline.read_table("silver_orders")
    assert silver.count() == N_ORDERS  # dupes collapsed, bad row quarantined
    assert metrics["quarantined"] == 1
    # transformations applied
    statuses = {r.order_status for r in silver.select("order_status").distinct().collect()}
    assert statuses <= {"pending", "processing", "shipped", "delivered", "cancelled"}
    # quarantine table captured the bad row with its failed rules in the
    # normalized error-record shape (shared schema across silver tables)
    errs = pipeline.read_table("silver_dq_errors").filter("failed_rules != '[]'")
    assert errs.count() == 1
    row = errs.first()
    assert row.table_name == "silver_orders"
    assert "value_constraint:order_total" in row.failed_rules
    assert '"order_id"' in row.row_payload
    # watermark stored
    assert pipeline._watermarks.get("silver_orders") is not None


def test_ep2_incremental_rerun_is_noop(pipeline):
    cfg = TableConfig(raw=SILVER_ORDERS)
    before = pipeline.read_table("silver_orders").count()
    pipeline.transform_silver(cfg)  # watermark excludes everything
    assert pipeline.read_table("silver_orders").count() == before


def test_ep3_scd2_dimension(pipeline, spark):
    cfg = TableConfig(raw=DIM_CUSTOMER)
    t0 = dt.datetime(2024, 1, 1)
    batch1 = spark.createDataFrame(
        [(c, f"name{c}", "springfield", "gold", t0) for c in range(10)],
        ["customer_id", "first_name", "city", "tier", "updated_timestamp"],
    )
    dim1 = pipeline.build_dimension(cfg, batch1)
    assert dim1.count() == 10
    assert_healthy(dim1, ["customer_id"])

    # ~30% move cities later (the reference's scd-update file semantics)
    t1 = dt.datetime(2024, 6, 1)
    batch2 = spark.createDataFrame(
        [(c, f"name{c}", "shelbyville", "gold", t1) for c in range(3)],
        ["customer_id", "first_name", "city", "tier", "updated_timestamp"],
    )
    dim2 = pipeline.build_dimension(cfg, batch2)
    assert dim2.count() == 13  # 10 original + 3 new versions
    assert_healthy(dim2, ["customer_id"])
    moved = dim2.filter((F.col("customer_id") == 0) & F.col("is_current")).first()
    assert moved.city == "shelbyville"
    old = dim2.filter((F.col("customer_id") == 0) & ~F.col("is_current")).first()
    assert old.city == "springfield" and old.valid_to == t1


def test_ep3_fact_load(pipeline, spark):
    silver = pipeline.read_table("silver_orders").withColumn(
        "order_ts", F.col("order_date").cast("timestamp")
    )
    dim = pipeline.read_table("dim_customer")
    fact = load_fact(
        silver,
        lookups=[
            DimensionLookup(
                dim=dim,
                business_key="customer_id",
                join_type="point_in_time",
                event_time="order_ts",
                select=["surrogate_key", "city"],
            )
        ],
        date_keys={"order_date_key": "order_date"},
        measures={"order_total_with_fee": "order_total + 2.5"},
    )
    rows = fact.collect()
    assert len(rows) == N_ORDERS
    r = rows[0]
    assert r.order_date_key == int(r.order_date.strftime("%Y%m%d"))
    assert abs(r.order_total_with_fee - (r.order_total + 2.5)) < 1e-9
    # all orders are dated 2024-01 → before the June move → city = springfield
    assert {x.city for x in rows} == {"springfield"}
    # no orphans against the dimension
    assert orphaned_fact_violations(
        fact, dim, "customer_id", "customer_id"
    ).count() == 0


def test_quality_detects_broken_dim(spark):
    t0 = dt.datetime(2024, 1, 1)
    broken = spark.createDataFrame(
        [
            (1, t0, dt.datetime(2024, 6, 1), True, "a"),
            (1, dt.datetime(2024, 5, 1), dt.datetime(9999, 12, 31), True, "b"),
        ],
        ["bk", "valid_from", "valid_to", "is_current", "attr"],
    )
    assert scd2_current_violations(broken, ["bk"]).count() == 1
    with pytest.raises(AssertionError):
        assert_healthy(broken, ["bk"])


def test_transform_silver_enforces_referential_integrity(spark, tmp_path):
    """Declared RI rules quarantine orphan children during the silver
    load (J5 -> S10), using the already-loaded parent silver table."""
    import json as _json

    from pyspark.sql import functions as F

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "parents.json").write_text(_json.dumps([{"pid": 1}, {"pid": 2}]))
    (raw / "children.json").write_text(
        _json.dumps(
            [{"cid": 10, "pid": 1}, {"cid": 11, "pid": 2}, {"cid": 12, "pid": 99}]
        )
    )
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"), raw_base=str(raw))
    parent_cfg = TableConfig(
        {
            "table_name": "bronze_parents",
            "file_format": "json",
            "file_path": "parents.json",
            "primary_keys": ["pid"],
            "columns": [{"name": "pid", "datatype": "bigint", "nullable": False}],
        }
    )
    child_cfg = TableConfig(
        {
            "table_name": "bronze_children",
            "file_format": "json",
            "file_path": "children.json",
            "primary_keys": ["cid"],
            "columns": [
                {"name": "cid", "datatype": "bigint", "nullable": False},
                {"name": "pid", "datatype": "bigint", "nullable": False},
            ],
        }
    )
    pipe.ingest_bronze(parent_cfg)
    pipe.ingest_bronze(child_cfg)
    pipe.transform_silver(
        TableConfig(
            {
                "table_name": "silver_parents",
                "source_table": "bronze_parents",
                "primary_keys": ["pid"],
                "columns": parent_cfg.raw["columns"],
            }
        )
    )
    m = pipe.transform_silver(
        TableConfig(
            {
                "table_name": "silver_children",
                "source_table": "bronze_children",
                "primary_keys": ["cid"],
                "columns": child_cfg.raw["columns"],
                "data_quality_rules": {
                    "referential_integrity": {
                        "pid": {
                            "reference_table": "silver_parents",
                            "reference_column": "pid",
                        }
                    }
                },
            }
        )
    )
    assert m == {"quarantined": 1, "upserted": 2}
    errors = spark.read.parquet(pipe.table_path("silver_dq_errors"))
    orphan = errors.filter(
        F.get_json_object("row_payload", "$.cid") == "12"
    ).collect()
    assert len(orphan) == 1
    assert "referential_integrity:pid" in orphan[0].failed_rules


def test_analyze_table_records_cbo_statistics(spark, tmp_path):
    """analyze_table registers a path-based warehouse table in the
    catalog and records table + column statistics the CBO can read
    (reference: config/gold/schema/README.md:391 ANALYZE TABLE step)."""
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"))
    spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(40)], "pk long, grp string"
    ).write.parquet(pipe.table_path("gold_stats_demo"))

    stats = pipe.analyze_table("gold_stats_demo", columns=["pk"])
    try:
        assert "Statistics" in stats  # table-level: sizeInBytes + rowCount
        assert "40 rows" in stats["Statistics"]
        assert "distinct_count" in stats["col:pk"]
        # the catalog (not just the return value) must carry the stats
        desc = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE EXTENDED gold_stats_demo").collect()
        }
        assert "rows" in desc["Statistics"]
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_stats_demo")

    with pytest.raises(FileNotFoundError):
        pipe.analyze_table("never_built")
