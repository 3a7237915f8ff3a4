from __future__ import annotations


from pyspark.sql import functions as F

from modular_etl_data_platform_spark.devdata import FixtureSpec, generate
from modular_etl_data_platform_spark.schema.registry import TableConfig
from modular_etl_data_platform_spark.sources.readers import read_source
from modular_etl_data_platform_spark.sources.sinks import write_bucketed, write_clustered

INVENTORY_CFG = {
    "table_name": "bronze_inventory",
    "source_system": "warehouse",
    "file_format": "json",
    "file_path": "inventory_*.json",  # multi-file glob source (S4)
    "primary_keys": ["product_id", "snapshot_date"],
    "columns": [
        {"name": "product_id", "datatype": "bigint", "nullable": False},
        {"name": "snapshot_date", "datatype": "string", "nullable": False},
        {"name": "quantity_on_hand", "datatype": "integer", "nullable": True},
        {"name": "quantity_reserved", "datatype": "integer", "nullable": True},
    ],
}


def test_devdata_generator_deterministic(tmp_path):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    m1 = generate(str(d1), FixtureSpec(seed=7))
    m2 = generate(str(d2), FixtureSpec(seed=7))
    assert m1 == m2
    assert (d1 / "orders.csv").read_text() == (d2 / "orders.csv").read_text()
    assert m1["orders_on_disk"] > m1["orders_unique"]  # dupes injected


def test_glob_source_reads_all_daily_files(spark, tmp_path):
    meta = generate(str(tmp_path), FixtureSpec())
    df = read_source(spark, TableConfig(raw=INVENTORY_CFG), base_path=str(tmp_path))
    assert df.count() == meta["inventory_rows"]
    # per-file lineage available via input_file_name
    files = df.select(F.input_file_name().alias("f")).distinct().count()
    assert files == 7


def test_write_clustered_file_ranges_disjoint(spark, tmp_path):
    df = spark.range(0, 10000).withColumn("k", F.col("id") % 1000)
    path = str(tmp_path / "clustered")
    write_clustered(df.repartition(8), path, cluster_by=["k"], num_files=8)
    # each parquet file should cover a narrow, mostly-disjoint k range
    out = spark.read.parquet(path)
    stats = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(stats) > 1
    spans = sorted((r.lo, r.hi) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # ranges don't interleave → min/max pruning works


def test_write_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 5000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 5000).withColumn("w", F.col("id") * 3)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(left, "b_left", ["id"], num_buckets=8)
        write_bucketed(right, "b_right", ["id"], num_buckets=8)
        # force the big-big (sort-merge) path a 100 TB join would take;
        # tiny test tables would otherwise broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_left").join(spark.table("b_right"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: shuffle-free join
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_bronze_quarantines_malformed_rows(spark, tmp_path):
    """PERMISSIVE parse failures land in bronze_dq_errors with their raw
    text; clean rows ingest normally — nothing is silently nulled."""
    from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
    from modular_etl_data_platform_spark.schema.registry import TableConfig

    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "readings.csv").write_text(
        "reading_id,value\n1,10.5\nnot_a_number,oops\n3,30.0\n"
    )
    cfg = TableConfig(
        raw={
            "table_name": "bronze_readings",
            "source_system": "sensors",
            "file_format": "csv",
            "file_path": "readings.csv",
            "columns": [
                {"name": "reading_id", "datatype": "bigint", "nullable": False},
                {"name": "value", "datatype": "double", "nullable": True},
            ],
        }
    )
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"), raw_base=str(raw))
    pipe.ingest_bronze(cfg)
    bronze = pipe.read_table("bronze_readings")
    assert sorted(r.reading_id for r in bronze.collect()) == [1, 3]
    errors = pipe.read_table("bronze_dq_errors").collect()
    assert len(errors) == 1
    assert errors[0].rule == "malformed_record"
    assert "not_a_number" in errors[0].failed_value


def test_compact_table_reduces_files(spark, tmp_path):
    from modular_etl_data_platform_spark.sources.sinks import compact_table

    path = str(tmp_path / "t")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 small files
    import os

    before = sum(
        1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert before >= 32
    after = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_compact_table_partitioned_preserves_layout(spark, tmp_path):
    from modular_etl_data_platform_spark.sources.sinks import compact_table

    path = str(tmp_path / "pt")
    df = spark.range(0, 3000).withColumn("pk", F.col("id") % 3)
    df.repartition(24).write.partitionBy("pk").parquet(path)
    import os

    def pq_files():
        return sum(
            1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )

    before = pq_files()
    after = compact_table(
        spark, path, target_file_bytes=64 * 1024 * 1024, partition_by=["pk"]
    )
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == 3000
    # partition layout survives: three pk directories, each readable
    assert {r.pk for r in back.select("pk").distinct().collect()} == {0, 1, 2}


def test_roundtrip_queries_survive_interleaved_reinvocation(spark):
    """The harness may hold a returned frame while the SAME query is
    invoked again (wiping and rewriting its scratch dir). Every
    scratch-reading query returns through _pin (eager localCheckpoint),
    so the first frame's rows must stay collectable and identical —
    without the pin the second invocation's scratch wipe would race the
    first frame's lazy scan."""
    from modular_etl_data_platform_spark.queries.roundtrip_queries import (
        q105_compact_roundtrip,
        q109_text_scan_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    first_105 = q105_compact_roundtrip(spark, sf)
    first_109 = q109_text_scan_roundtrip(spark, sf)
    snap_105 = sorted(map(tuple, first_105.collect()))
    snap_109 = sorted(map(tuple, first_109.collect()))
    # re-invoke: wipes + rewrites the scratch dirs behind the first frames
    second_105 = q105_compact_roundtrip(spark, sf)
    second_109 = q109_text_scan_roundtrip(spark, sf)
    # the held frames still collect, unchanged
    assert sorted(map(tuple, first_105.collect())) == snap_105
    assert sorted(map(tuple, first_109.collect())) == snap_109
    # and agree with the fresh invocations (deterministic queries)
    assert sorted(map(tuple, second_105.collect())) == snap_105
    assert sorted(map(tuple, second_109.collect())) == snap_109
