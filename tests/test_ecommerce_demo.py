"""Golden end-to-end test of the full e-commerce medallion pipeline
(configs/ecommerce/) over the seeded fixture generator — the engine-level
replica of the reference's declared 16-config flow, with exact expected
cardinalities computable from the injected defects."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.devdata import FixtureSpec, generate
from modular_etl_data_platform_spark.operators.quality import (
    scd2_current_violations,
    scd2_overlap_violations,
)
from modular_etl_data_platform_spark.pipeline.ecommerce import run_pipeline

UPDATE_TS = dt.datetime(2024, 6, 1)


@pytest.fixture(scope="module")
def demo(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("ecom_raw")
    wh = tmp_path_factory.mktemp("ecom_wh")
    expected = generate(str(raw), FixtureSpec())
    metrics = run_pipeline(spark, str(raw), str(wh))
    return {"expected": expected, "metrics": metrics, "warehouse": str(wh), "raw": str(raw)}


def _read(spark, demo_dict, table):
    return spark.read.parquet(f"{demo_dict['warehouse']}/{table}")


def test_bronze_keeps_raw_duplicates(demo):
    exp, m = demo["expected"], demo["metrics"]
    assert m["bronze_orders"]["ingested"] == exp["orders_on_disk"]
    assert m["bronze_customers"]["ingested"] == exp["customers"]
    assert m["bronze_order_items"]["ingested"] == exp["order_items"]
    assert m["bronze_inventory"]["ingested"] == exp["inventory_rows"]


def test_silver_dedup_and_quarantine(spark, demo):
    exp, m = demo["expected"], demo["metrics"]
    # negative-total rows quarantined (every on-disk copy), dupes deduped
    assert m["silver_orders"]["quarantined"] == exp["order_rows_quarantined"]
    assert m["silver_orders"]["upserted"] == exp["orders_unique"] - exp["orders_negative"]
    assert m["silver_customers"]["upserted"] == exp["customers"]
    assert m["silver_inventory"]["upserted"] == exp["inventory_rows"]
    # cleansing applied: statuses lowercased/trimmed, emails lowered
    orders = _read(spark, demo, "silver_orders")
    bad = orders.filter(
        ~F.col("order_status").isin(
            "pending", "processing", "shipped", "delivered", "cancelled"
        )
    ).count()
    assert bad == 0
    cust = _read(spark, demo, "silver_customers")
    assert cust.filter(F.col("email") != F.lower(F.col("email"))).count() == 0
    # format_phone produced XXX-XXX-XXXX everywhere
    assert cust.filter(~F.col("phone").rlike(r"^\d{3}-\d{3}-\d{4}$")).count() == 0


def test_dim_customer_scd2_versions(spark, demo):
    exp = demo["expected"]
    dim = _read(spark, demo, "gold_dim_customer")
    # one extra version per changed customer
    assert dim.count() == exp["customers"] + exp["customer_updates"]
    assert dim.filter("is_current").count() == exp["customers"]
    # C7 invariants
    assert scd2_current_violations(dim, ["customer_id"]).count() == 0
    assert scd2_overlap_violations(dim, ["customer_id"]).count() == 0
    # changed customers: v1 closed at the update ts, v2 current with new city
    changed = dim.filter(F.col("city") == "Capital City").collect()
    assert len(changed) == exp["customer_updates"]
    for r in changed:
        assert r.is_current and r.version == 2 and r.valid_from == UPDATE_TS
    # Type-1: the phone update propagates to ALL versions of changed keys
    changed_ids = [r.customer_id for r in changed]
    phones = (
        dim.filter(F.col("customer_id").isin(changed_ids))
        .groupBy("customer_id")
        .agg(F.countDistinct("phone").alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in phones)
    assert (
        dim.filter(F.col("customer_id").isin(changed_ids))
        .filter(~F.col("phone").startswith("777-888-"))
        .count()
        == 0
    )


def test_fact_orders_pit_join(spark, demo):
    exp = demo["expected"]
    fact = _read(spark, demo, "gold_fact_orders")
    assert fact.count() == exp["orders_unique"] - exp["orders_negative"]
    # every order resolved a customer version (PIT join found its interval)
    assert fact.filter(F.col("customer_key").isNull()).count() == 0
    # orders BEFORE the update must see the original city, orders after see
    # the new one — for changed customers only
    dim = _read(spark, demo, "gold_dim_customer")
    changed_ids = [r.customer_id for r in dim.filter("version = 2").collect()]
    got = fact.filter(F.col("customer_id").isin(changed_ids))
    pre = got.filter(F.col("order_ts") < F.lit(UPDATE_TS))
    post = got.filter(F.col("order_ts") >= F.lit(UPDATE_TS))
    assert pre.filter(F.col("city") == "Capital City").count() == 0
    assert post.filter(F.col("city") != "Capital City").count() == 0
    assert post.count() > 0  # fixture spreads orders across the year
    # item_count folds the per-order child count (A3)
    items = _read(spark, demo, "silver_order_items")
    joined = (
        items.groupBy("order_id").count().join(fact, "order_id")
    )
    assert joined.filter(F.col("count") != F.col("item_count")).count() == 0


def test_fact_measures_and_inventory(spark, demo):
    exp = demo["expected"]
    fi = _read(spark, demo, "gold_fact_inventory")
    assert fi.count() == exp["inventory_rows"]
    bad = fi.filter(
        F.col("quantity_available")
        != F.col("quantity_on_hand") - F.col("quantity_reserved")
    ).count()
    assert bad == 0
    # items of quarantined (negative-total) orders are RI-orphans and were
    # themselves quarantined during the silver load — the fact holds
    # exactly the items whose parent order survived
    soi = _read(spark, demo, "silver_order_items")
    sorders = _read(spark, demo, "silver_orders")
    assert soi.join(sorders, "order_id", "left_anti").count() == 0
    n_quarantined_items = exp["order_items"] - soi.count()
    assert 0 < n_quarantined_items < exp["order_items"]
    foi = _read(spark, demo, "gold_fact_order_items")
    assert foi.count() == soi.count()
    # profit = (unit_price - unit_cost) * quantity, decimal-exact
    bad = foi.filter(
        F.col("profit").cast("double")
        != ((F.col("unit_price") - F.col("unit_cost")) * F.col("quantity")).cast(
            "double"
        )
    ).count()
    assert bad == 0


def test_star_query_revenue_by_city(spark, demo):
    """The reference's BI pattern (config/gold/schema/README.md:399-436):
    fact ⋈ dim_date ⋈ dim, grouped revenue — verified against a direct
    computation from silver."""
    fact = _read(spark, demo, "gold_fact_orders")
    dd = _read(spark, demo, "gold_dim_date")
    star = (
        fact.join(F.broadcast(dd), fact.order_date_key == dd.date_key)
        .groupBy("city", "year")
        .agg(F.sum(F.col("order_total")).alias("revenue"))
    )
    direct = (
        fact.withColumn("year", F.year("order_date"))
        .groupBy("city", "year")
        .agg(F.sum("order_total").alias("revenue"))
    )
    a = {(r.city, r.year): r.revenue for r in star.collect()}
    b = {(r.city, r.year): r.revenue for r in direct.collect()}
    assert a == b


def test_pipeline_rerun_is_idempotent(spark, demo):
    """Re-running the whole pipeline on the same warehouse changes
    nothing: bronze skips already-ingested files (source_file lineage),
    silver upserts re-apply, SCD2 replays are no-ops, facts rebuild to
    the same rows."""
    m1 = dict(demo["metrics"])
    m2 = run_pipeline(spark, demo["raw"], demo["warehouse"])
    # bronze ingested 0 new rows on the rerun
    for t in ("bronze_orders", "bronze_customers", "bronze_inventory"):
        assert m2[t]["ingested"] == 0
    # gold states identical
    for t in ("gold_dim_customer", "gold_dim_product", "gold_fact_orders",
              "gold_fact_order_items", "gold_fact_inventory"):
        assert m2[t]["rows"] == m1[t]["rows"], t
    dim = _read(spark, demo, "gold_dim_customer")
    assert dim.filter("is_current").count() == demo["expected"]["customers"]


def test_gold_audit_is_clean(spark, demo):
    """The config-driven C7 audit over the built warehouse finds zero
    violations and covers every gold table with declared invariants."""
    from modular_etl_data_platform_spark.pipeline.audit import (
        assert_clean,
        audit_warehouse,
    )
    from modular_etl_data_platform_spark.pipeline.ecommerce import CONFIG_DIR

    report = audit_warehouse(spark, demo["warehouse"], CONFIG_DIR)
    assert "gold_dim_customer" in report and "scd2_current" in report["gold_dim_customer"]
    assert any(k.startswith("orphans_vs_") for k in report.get("gold_fact_orders", {}))
    assert_clean(report)  # no violations anywhere


def test_order_total_semantics_match_reference_generator(spark, demo):
    """A4 (reference: generate_sample_data.py:231-243): for every clean
    order, order_total = Σ(line_total − discount_applied) + shipping_fee
    − discount_amount and tax_amount = 8% of the item subtotal."""
    orders = _read(spark, demo, "gold_fact_orders")
    items = _read(spark, demo, "gold_fact_order_items")
    sub = items.groupBy("order_id").agg(
        F.round(F.sum(F.col("line_total") - F.col("discount_applied")), 2).alias("subtotal")
    )
    j = orders.join(sub, "order_id").filter(F.col("order_total") > 0)
    mismatch_total = j.filter(
        F.abs(
            F.col("order_total")
            - F.round(F.col("subtotal") + F.col("shipping_fee") - F.col("discount_amount"), 2)
        ) > 0.011
    ).count()
    mismatch_tax = j.filter(
        F.abs(F.col("tax_amount") - F.round(F.col("subtotal") * 0.08, 2)) > 0.011
    ).count()
    assert mismatch_total == 0 and mismatch_tax == 0
    # derived measures present
    assert "gross_total" in orders.columns
    assert "net_line_total" in items.columns


def test_reference_bi_queries_run_verbatim(spark, demo):
    """The reference's three worked BI queries (reference:
    config/gold/schema/README.md:399-436) run verbatim over a built
    warehouse (table names map to our gold_* views) and return sane,
    internally-consistent results."""
    from modular_etl_data_platform_spark.session import load_warehouse

    views = load_warehouse(spark, demo["warehouse"])
    assert {"gold_fact_orders", "gold_dim_customer", "gold_dim_date"} <= set(views)
    for alias, view in (
        ("fact_orders", "gold_fact_orders"),
        ("dim_customer", "gold_dim_customer"),
        ("dim_date", "gold_dim_date"),
    ):
        views[view].createOrReplaceTempView(alias)

    current = spark.sql(
        """
        SELECT c.customer_tier, COUNT(*) as customer_count,
               AVG(o.order_total) as avg_order_value
        FROM fact_orders o
        JOIN dim_customer c ON o.customer_key = c.customer_key
        WHERE c.is_current = true
        GROUP BY c.customer_tier
        """
    ).collect()
    assert {r.customer_tier for r in current} <= {"bronze", "silver", "gold", "platinum"}

    historical = spark.sql(
        """
        SELECT o.order_date, c.customer_tier as tier_at_order_time,
               SUM(o.order_total) as total_sales
        FROM fact_orders o
        JOIN dim_customer c ON o.customer_key = c.customer_key
        GROUP BY o.order_date, c.customer_tier
        """
    )
    # PIT join: every fact row resolves exactly one dim version
    assert historical.agg(F.sum("total_sales")).collect()[0][0] is not None

    trend = spark.sql(
        """
        SELECT d.date, d.day_name, d.is_weekend, SUM(o.order_total) as daily_sales
        FROM fact_orders o
        JOIN dim_date d ON o.order_date_key = d.date_key
        WHERE d.year = 2024 AND d.quarter = 3
        GROUP BY d.date, d.day_name, d.is_weekend
        ORDER BY d.date
        """
    ).collect()
    assert len(trend) > 0
    assert all(r.day_name in
               {"Monday","Tuesday","Wednesday","Thursday","Friday","Saturday","Sunday"}
               for r in trend)
