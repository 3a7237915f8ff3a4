"""The full e-commerce medallion demo on VERSIONED storage
(MedallionPipeline(storage="versioned") — the reference's layers are
Delta tables; this runs them on the manifest-log analogue): identical
layer semantics, plus time travel across the in-run update batch AND
across a whole pipeline rerun, and a gold audit that reads a PINNED
snapshot."""

from __future__ import annotations

import pytest

from modular_etl_data_platform_spark.devdata import FixtureSpec, generate
from modular_etl_data_platform_spark.operators.versioned import (
    VersionedTable,
    is_versioned_table,
)
from modular_etl_data_platform_spark.pipeline.ecommerce import (
    CONFIG_DIR,
    run_pipeline,
)
from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline


@pytest.fixture(scope="module")
def vdemo(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("vecom_raw")
    wh = tmp_path_factory.mktemp("vecom_wh")
    expected = generate(str(raw), FixtureSpec())
    metrics = run_pipeline(spark, str(raw), str(wh), storage="versioned")
    return {
        "expected": expected,
        "metrics": metrics,
        "warehouse": str(wh),
        "raw": str(raw),
    }


def _pipe(spark, vdemo):
    return MedallionPipeline(spark, vdemo["warehouse"], storage="versioned")


def test_every_layer_is_versioned_with_parquet_semantics(spark, vdemo):
    """All layer tables publish manifest logs; the error tables stay
    plain parquet (append-only log contract); cardinalities match the
    fixture's expected values exactly — same answers as parquet mode."""
    exp, m = vdemo["expected"], vdemo["metrics"]
    wh = vdemo["warehouse"]
    for t in (
        "bronze_orders",
        "silver_customers",
        "gold_dim_customer",
        "gold_fact_orders",
        "gold_dim_date",
    ):
        assert is_versioned_table(f"{wh}/{t}"), t
    assert not is_versioned_table(f"{wh}/silver_dq_errors")

    assert m["bronze_orders"]["ingested"] == exp["orders_on_disk"]
    assert m["bronze_customers"]["ingested"] == exp["customers"]
    pipe = _pipe(spark, vdemo)
    dim = pipe.read_table("gold_dim_customer")
    assert dim.filter("is_current").count() == exp["customers"]
    assert pipe.read_table("silver_orders").count() == exp["orders_unique"] - exp[
        "orders_negative"
    ]


def test_time_travel_across_update_batch(spark, vdemo):
    """The in-run customer update batch is a separate silver version:
    the pre-update snapshot is still readable and differs from head on
    exactly the updated business keys."""
    wh = vdemo["warehouse"]
    vt = VersionedTable(spark, f"{wh}/silver_customers")
    assert len(vt.versions()) >= 2
    v_first = vt.versions()[0]

    def state(df):  # the Type-2 address surface the update batch touches
        return {
            r.customer_id: (r.address_line1, r.city, r.postal_code)
            for r in df.collect()
        }

    before, head = state(vt.read(v_first)), state(vt.read())
    assert set(before) == set(head)  # updates change rows, not keys
    changed = {k for k in head if head[k] != before[k]}
    assert len(changed) == vdemo["expected"]["customer_updates"]


def test_rerun_is_idempotent_and_history_survives(spark, vdemo):
    """A full rerun on the same versioned warehouse ingests nothing new
    (file-lineage exactly-once), rebuilds gold to identical rows — and
    every pre-rerun snapshot stays time-travelable."""
    wh = vdemo["warehouse"]
    dim_vt = VersionedTable(spark, f"{wh}/gold_dim_customer")
    pre_versions = list(dim_vt.versions())
    pre_head = {
        tuple(r)
        for r in dim_vt.read().select("customer_id", "email", "is_current").collect()
    }

    m2 = run_pipeline(spark, vdemo["raw"], wh, storage="versioned")
    for t in ("bronze_orders", "bronze_customers", "bronze_inventory"):
        assert m2[t]["ingested"] == 0
    for t in ("gold_dim_customer", "gold_fact_orders", "gold_fact_order_items"):
        assert m2[t]["rows"] == vdemo["metrics"][t]["rows"], t

    # the pre-rerun head is now a historical version, readable unchanged
    assert dim_vt.versions()[: len(pre_versions)] == pre_versions
    replay = {
        tuple(r)
        for r in dim_vt.read(pre_versions[-1])
        .select("customer_id", "email", "is_current")
        .collect()
    }
    assert replay == pre_head


def test_gold_audit_reads_pinned_version(spark, vdemo):
    """C7 audit over versioned storage: clean at head, clean when PINNED
    to the exact dimension snapshot the facts were built against (the
    certify-what-you-consumed shape) — and a deliberately INCONSISTENT
    pin (facts at head, dimension rolled back to its pre-update
    snapshot) is CAUGHT as orphaned surrogate keys, which is precisely
    what a version-pinned audit exists to detect."""
    from modular_etl_data_platform_spark.pipeline.audit import (
        assert_clean,
        audit_warehouse,
    )

    wh = vdemo["warehouse"]
    report = audit_warehouse(spark, wh, CONFIG_DIR)
    assert "scd2_current" in report["gold_dim_customer"]
    assert_clean(report)

    dim_vt = VersionedTable(spark, f"{wh}/gold_dim_customer")
    consistent = audit_warehouse(
        spark,
        wh,
        CONFIG_DIR,
        at_versions={"gold_dim_customer": dim_vt.current_version()},
    )
    assert_clean(consistent)

    stale = audit_warehouse(
        spark,
        wh,
        CONFIG_DIR,
        at_versions={"gold_dim_customer": dim_vt.versions()[0]},
    )
    assert stale["gold_fact_orders"]["orphans_vs_gold_dim_customer"] > 0


def test_analyze_table_versioned_snapshot_stats(spark, vdemo):
    """ANALYZE over versioned storage: statistics come from the CURRENT
    snapshot only (manifest file list), never superseded versions."""
    pipe = _pipe(spark, vdemo)
    stats = pipe.analyze_table("gold_dim_customer", ["customer_id"])
    n_rows = pipe.read_table("gold_dim_customer").count()
    assert f"{n_rows} rows" in stats["Statistics"]
    assert "distinct_count=" in stats["col:customer_id"]


def test_silver_incremental_read_prunes_to_new_bronze_files(spark, tmp_path):
    """Round-8: the versioned-mode watermark read gets its file pruning
    back (parquet mode prunes via hive partitions; versioned mode must
    prune via log stats or every incremental pass scans the whole
    bronze table). Two silver passes over a multi-batch versioned
    bronze: the second pass's source scan must open ONLY the batch
    appended after the first pass — including skipping the old file
    whose max equals the watermark exactly (strictly-greater bound)."""
    import os

    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.schema.registry import TableConfig

    cfg = TableConfig(
        raw={
            "table_name": "silver_inc_v",
            "source_table": "bronze_inc_v",
            "load_type": "upsert",
            "primary_keys": ["id"],
            "incremental_column": "seq",
            "columns": [
                {"name": "id", "datatype": "bigint", "nullable": False},
                {"name": "seq", "datatype": "bigint", "nullable": False},
                {"name": "val", "datatype": "string", "nullable": True},
            ],
        }
    )
    pipe = MedallionPipeline(
        spark, warehouse=str(tmp_path / "wh"), storage="versioned"
    )
    bronze = VersionedTable(
        spark, pipe.table_path("bronze_inc_v"), stats_columns=["seq"]
    )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.col("id").alias("seq"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
        ).coalesce(1)

    bronze.write(batch(0, 100))
    bronze.write(batch(100, 180), mode="append")
    pipe.transform_silver(cfg, order_col="seq")
    assert pipe._watermarks.get("silver_inc_v") == "179"
    assert pipe.read_table("silver_inc_v").count() == 180

    bronze.write(batch(180, 220), mode="append")
    pruned = pipe._read_source_for_increment(
        "bronze_inc_v", "seq", pipe._watermarks.get("silver_inc_v")
    )
    opened = [os.path.basename(f) for f in pruned.inputFiles()]
    new_files = {
        os.path.basename(f)
        for f in bronze._read_manifest(3)["files"]
        if f not in set(bronze._read_manifest(2)["files"])
    }
    # ONLY the new batch's file is opened — 1 of the 3 on disk
    assert set(opened) == new_files and len(opened) == 1

    metrics = pipe.transform_silver(cfg, order_col="seq")
    assert metrics["upserted"] == 40
    assert pipe.read_table("silver_inc_v").count() == 220


def test_load_warehouse_resolves_versioned_tables_to_current_snapshot(
    spark, tmp_path
):
    """The SQL-passthrough surface (session.load_warehouse) must see a
    versioned warehouse: each versioned table resolves through its log
    to the CURRENT snapshot — before round 8 the raw directory read
    failed and the table silently vanished from the BI view set."""
    from modular_etl_data_platform_spark.session import load_warehouse

    wh = str(tmp_path / "wh")
    vt = VersionedTable(spark, f"{wh}/gold_t")
    vt.write(spark.range(5).selectExpr("id", "'old' v"))
    vt.upsert(spark.range(5).selectExpr("id", "'new' v"), ["id"])
    spark.range(3).selectExpr("id").write.parquet(f"{wh}/plain_t")
    dfs = load_warehouse(spark, wh)
    assert set(dfs) == {"gold_t", "plain_t"}
    assert dfs["gold_t"].count() == 5  # snapshot, not the union of versions
    assert {r.v for r in dfs["gold_t"].collect()} == {"new"}
    assert spark.sql("SELECT COUNT(*) n FROM gold_t").first().n == 5


def test_silver_merge_via_deletion_vectors_no_rewrite(spark, tmp_path):
    """MedallionPipeline(use_deletion_vectors=True): the silver keyed
    MERGE publishes through the DV path — the update batch rewrites no
    bronze-derived silver file, yet the visible state is identical to
    the rewrite-mode pipeline."""
    from pyspark.sql import functions as F

    wh_a, wh_b = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(i, i % 7, f"v{i}") for i in range(200)]
    upd = [(i, 99, "UPD") for i in range(50, 80)]

    def run(wh, dv):
        pipe = MedallionPipeline(
            spark, wh, storage="versioned", use_deletion_vectors=dv
        )
        df = spark.createDataFrame(rows, "id long, grp long, v string")
        pipe.upsert_table(df.coalesce(4), "silver_t", ["id"])
        pipe.upsert_table(
            spark.createDataFrame(upd, "id long, grp long, v string"),
            "silver_t",
            ["id"],
        )
        return pipe

    a = run(wh_a, dv=False)
    b = run(wh_b, dv=True)
    ra = {tuple(r) for r in a.read_table("silver_t").collect()}
    rb = {tuple(r) for r in b.read_table("silver_t").collect()}
    assert ra == rb and len(ra) == 200
    vt = VersionedTable(spark, b.table_path("silver_t"))
    m1, m2 = vt._read_manifest(1), vt._read_manifest(2)
    assert set(m1["files"]) <= set(m2["files"])  # nothing rewritten
    assert m2["dv"]  # matched rows vector-deleted
