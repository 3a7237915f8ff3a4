"""SparkSession factory with scale-minded defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configuration
keys are what you would set on a 1000-executor cluster — AQE for runtime
re-planning (skew joins, coalescing post-shuffle partitions), Arrow for any
Pandas-UDF path, and a shuffle-partition count sized to the parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "modular-etl-data-platform-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    At 100 TB the same knobs apply: AQE coalesces / skew-splits shuffle
    partitions at runtime, broadcast threshold keeps dimension joins
    shuffle-free, and ``maxPartitionBytes`` bounds scan-task memory.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (Spark's legacy parquet timestamp encoding) carries NO
        # footer min/max statistics, which kills timestamp data skipping
        # (VersionedTable stats, watermark file pruning). Micros is what
        # Delta writes and every modern reader expects.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Python Data Source filter pushdown (off by default in Spark
        # 4.1): lets format("versioned_table") reads turn pushed range/
        # equality predicates into log-stats FILE skipping
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the testdata parquet tables as temp views; return dict of DFs."""
    if names is None:
        names = [
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        ]
    from pyspark.sql import functions as F

    dfs = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":
                # Adapt to either testdata generation of events.ts:
                # TIMESTAMP(NANOS) (vectorized reader rejects -> read as
                # long, floor to micros, the coercion DuckDB applies) or
                # TIMESTAMP_NTZ micros (cast to session-zone timestamp;
                # session zone is UTC so the values are identical).
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = spark.read.parquet(path)
                if df.schema["ts"].dataType.typeName() in ("long", "integer"):
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                else:
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            else:
                df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs


def load_warehouse(spark: SparkSession, warehouse: str):
    """Register every table in a warehouse directory as a temp view — the
    reference's worked BI queries (reference:
    config/gold/schema/README.md:399-436) run verbatim against these
    (``gold_fact_orders``, ``gold_dim_customer``, ...). VERSIONED tables
    resolve through their commit log to the CURRENT snapshot (a raw
    directory read would either fail or sweep up superseded versions'
    files), so the same BI queries run unchanged over a
    ``storage="versioned"`` warehouse."""
    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        is_versioned_table,
    )

    dfs = {}
    if not os.path.isdir(warehouse):
        return dfs
    for name in sorted(os.listdir(warehouse)):
        path = os.path.join(warehouse, name)
        if not os.path.isdir(path):
            continue
        try:
            if is_versioned_table(path):
                df = VersionedTable(spark, path).read()
            else:
                df = spark.read.parquet(path)
        except Exception:
            continue
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
