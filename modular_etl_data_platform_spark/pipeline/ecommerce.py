"""End-to-end e-commerce medallion demo: the reference's full declared
pipeline (16-config surface, reference: config/{bronze,silver,gold}/schema/)
re-expressed as this engine's config dialect under ``configs/ecommerce/``
and executed Spark-first.

Flow (reference ordering contract: config/gold/schema/README.md:455-459):
bronze ingest (5 sources, CSV pipe/comma + JSON + glob) → silver
transform/validate/dedup/upsert (5 tables) → gold dims (SCD2 customer +
product, generated date dim) → gold facts (PIT/current joins, date keys,
item counts, calculated measures).

A user of the reference runs exactly this by pointing ``run_pipeline`` at
their raw directory; every layer lands as parquet under ``warehouse``.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from modular_etl_data_platform_spark.operators.date_dim import build_dim_date
from modular_etl_data_platform_spark.operators.facts import DimensionLookup, load_fact
from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
from modular_etl_data_platform_spark.schema.registry import SchemaRegistry, TableConfig

CONFIG_DIR = str(Path(__file__).resolve().parents[2] / "configs" / "ecommerce")

BRONZE_TABLES = [
    "bronze_customers",
    "bronze_products",
    "bronze_orders",
    "bronze_order_items",
    "bronze_inventory",
]
SILVER_TABLES = [
    "silver_customers",
    "silver_products",
    "silver_orders",
    "silver_order_items",
    "silver_inventory",
]


def _dim_lookup(pipe: MedallionPipeline, spec: dict) -> DimensionLookup:
    dim = pipe.read_table(spec["dimension"])
    if "key_alias" in spec:
        dim = dim.withColumnRenamed("surrogate_key", spec["key_alias"])
    return DimensionLookup(
        dim=dim,
        business_key=spec["business_key"],
        join_type=spec.get("join_type", "current"),
        event_time=spec.get("event_time"),
        select=list(spec.get("select", [])),
    )


def build_fact(pipe: MedallionPipeline, config: TableConfig) -> DataFrame:
    """C5: declarative fact build from a gold fact config."""
    raw = config.raw
    base = pipe.read_table(config.source_table)
    lookups = [_dim_lookup(pipe, s) for s in config.dimension_joins()]
    counts_from = None
    if "counts_from" in raw:
        cf = raw["counts_from"]
        counts_from = (pipe.read_table(cf["child"]), cf["fk"], cf["count_col"])
    fact = load_fact(
        base,
        lookups,
        measures=raw.get("measures") or None,
        date_keys=raw.get("date_keys") or None,
        counts_from=counts_from,
    )
    pipe.write_table(fact, config.table_name, config.partition_by or None)
    return pipe.read_table(config.table_name)


def run_pipeline(
    spark: SparkSession,
    raw_dir: str,
    warehouse: str,
    config_dir: str = CONFIG_DIR,
    with_updates: bool = True,
    storage: str = "parquet",
) -> dict[str, dict]:
    """Run the full medallion flow; returns per-table metrics.

    ``storage="versioned"`` runs every layer on ``VersionedTable``
    manifests (the reference's Delta deployment shape): each silver
    upsert / SCD2 merge / fact rebuild publishes a new snapshot, so the
    warehouse is time-travelable across the whole run AND across
    reruns."""
    reg = SchemaRegistry(config_dir=config_dir)
    pipe = MedallionPipeline(spark, warehouse, raw_base=raw_dir, storage=storage)
    metrics: dict[str, dict] = {}

    # EP1: bronze
    for t in BRONZE_TABLES:
        df = pipe.ingest_bronze(reg.get(t))
        metrics[t] = {"ingested": df.count()}

    # EP2: silver
    for t in SILVER_TABLES:
        metrics[t] = pipe.transform_silver(reg.get(t))

    # EP3: gold — dims first (ordering contract), then facts
    dim_customer = pipe.build_dimension(
        reg.get("gold_dim_customer"), pipe.read_table("silver_customers")
    )
    metrics["gold_dim_customer"] = {"rows": dim_customer.count()}

    if with_updates and os.path.exists(os.path.join(raw_dir, "customers_update.json")):
        pipe.ingest_bronze(reg.get("bronze_customer_updates"))
        metrics["silver_customer_updates"] = pipe.transform_silver(
            reg.get("silver_customer_updates")
        )
        # merge the update batch into silver_customers (keyed upsert), then
        # re-derive the dimension from the updated silver state
        updates = pipe.read_table("silver_customer_updates")
        pipe.upsert_table(updates, "silver_customers", ["customer_id"])
        dim_customer = pipe.build_dimension(
            reg.get("gold_dim_customer"), pipe.read_table("silver_customers")
        )
        metrics["gold_dim_customer"] = {"rows": dim_customer.count()}

    dim_product = pipe.build_dimension(
        reg.get("gold_dim_product"), pipe.read_table("silver_products")
    )
    metrics["gold_dim_product"] = {"rows": dim_product.count()}

    dd_cfg = reg.get("gold_dim_date")
    rng = dd_cfg.raw["date_range"]
    dim_date = build_dim_date(spark, rng["start"], rng["end"])
    pipe.write_table(dim_date, "gold_dim_date")
    metrics["gold_dim_date"] = {"rows": dim_date.count()}

    for t in ["gold_fact_orders", "gold_fact_order_items", "gold_fact_inventory"]:
        fact = build_fact(pipe, reg.get(t))
        metrics[t] = {"rows": fact.count()}

    return metrics
