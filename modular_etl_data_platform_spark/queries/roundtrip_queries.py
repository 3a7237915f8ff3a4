"""Driver-verified roundtrip queries for the source/sink/composite
operators that were previously proven only by pytest (SURVEY §2.1 S1/S2/
S7/S8, §2.4 J6, §2.9 C2/C3).

Each query exercises the REAL operator (CSV/JSON reader, partitioned
sink, parquet MERGE, fact enrichment, silver validate stage) by writing
testdata through it into a scratch directory and reading it back; the
aggregate over the roundtrip result must hash-match the DuckDB oracle
computed directly on the parquet views. A wrong delimiter, a dropped
row, a broken merge or a mis-evaluated rule changes the aggregate and
fails the gate — so these are end-to-end proofs, not smoke tests.

Scratch layout: $SPARK_GRAFT_SCRATCH/<query>/<sf-tag>, rebuilt on every
invocation (idempotent; reruns never double-append). The root defaults
to a per-process tmp dir so concurrent harness runs (driver + local
check + pytest) never collide, and is overridable via env for sandboxes
with a read-only /tmp.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.queries.catalog import _t, dsum, query
from modular_etl_data_platform_spark.sources.readers import read_path
from modular_etl_data_platform_spark.sources.sinks import append_partitioned
from modular_etl_data_platform_spark.operators.upsert import upsert_parquet
from modular_etl_data_platform_spark.operators.facts import DimensionLookup, load_fact
from modular_etl_data_platform_spark.operators.transforms import apply_transformations
from modular_etl_data_platform_spark.operators.validate import RuleSet

_RT_ROOT = os.environ.get(
    "SPARK_GRAFT_SCRATCH",
    os.path.join(tempfile.gettempdir(), f"spark_graft_rt_{os.getpid()}"),
)


def _scratch(qname: str, sf_dir: str) -> str:
    """Per-(query, SF) scratch dir, wiped on entry for idempotency."""
    path = os.path.join(_RT_ROOT, qname, os.path.basename(sf_dir.rstrip("/")))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def _pin(df: DataFrame) -> DataFrame:
    """Eagerly materialize a SMALL final result (localCheckpoint) so the
    harness can trigger the returned frame any number of times — count,
    schema probe, collect, retry — without re-executing a plan that reads
    this query's scratch output. Without this a re-evaluation can race
    the scratch lifecycle (another invocation wiping/rewriting the dir)
    or re-run a streaming-derived join; with it the returned rows are
    frozen at return time. Only ever applied to aggregate-sized frames."""
    return df.localCheckpoint(eager=True)


@query(
    "q70_csv_roundtrip",
    """
    SELECT r_name,
           COUNT(*) AS n_nations,
           min(n_name) AS first_nation,
           max(n_name) AS last_nation
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q70_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 proof: nation -> pipe-delimited CSV with header -> schema-first
    CSV read (sources/readers.py, no inference) -> broadcast star join to
    region -> aggregate. Any delimiter/header/type mishandling in the CSV
    reader changes the hash."""
    scratch = _scratch("q70_csv_roundtrip", sf_dir)
    nation = _t(spark, sf_dir, "nation")
    path = os.path.join(scratch, "nation_csv")
    nation.write.options(header="true", sep="|").mode("overwrite").csv(path)
    back = read_path(
        spark, path, "csv", nation.schema, {"header": True, "delimiter": "|"}
    )
    region = _t(spark, sf_dir, "region")
    return _pin(
        back.join(
            F.broadcast(region), back.n_regionkey == region.r_regionkey
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.max("n_name").alias("last_nation"),
        )
    )


@query(
    "q71_json_roundtrip",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q71_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 proof: customer -> line-delimited JSON -> schema-first JSON read
    -> aggregate. JSON serializes doubles shortest-roundtrip, so the
    decimal-cast sum is bit-identical to the direct-parquet oracle."""
    scratch = _scratch("q71_json_roundtrip", sf_dir)
    customer = _t(spark, sf_dir, "customer")
    path = os.path.join(scratch, "customer_json")
    customer.write.mode("overwrite").json(path)
    back = read_path(spark, path, "json", customer.schema, {"multiline": False})
    return _pin(
        back.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), "sum_acctbal"),
        )
    )


@query(
    "q72_partitioned_sink_prune",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM orders
    WHERE year(o_orderdate) = 1995
    GROUP BY o_orderstatus
    """,
)
def q72_partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/S9 proof: orders -> partitioned append sink (partition column =
    order year) -> read back with a partition predicate -> aggregate. The
    filter prunes to one partition directory before any I/O (the scan's
    PartitionFilters — the mechanism that makes incremental reads at
    100 TB touch only the partitions they need); losing rows or routing
    them to the wrong partition changes the hash."""
    scratch = _scratch("q72_partitioned_sink_prune", sf_dir)
    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = os.path.join(scratch, "orders_by_year")
    append_partitioned(orders, path, partition_by=["o_year"])
    return _pin(
        spark.read.parquet(path)
        .filter(F.col("o_year") == 1995)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@query(
    "q73_upsert_roundtrip",
    """
    WITH merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
      UNION ALL
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q73_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 proof: seed a parquet table with 2/3 of orders, MERGE a batch
    that updates the even keys (new status + repriced) and inserts the
    even keys that were never seeded, then aggregate the merged table.
    The oracle replays the same MERGE as anti-join + union — update-
    instead-of-duplicate and insert-of-new-keys both affect the hash."""
    scratch = _scratch("q73_upsert_roundtrip", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(scratch, "orders_upsert")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    base.write.mode("overwrite").parquet(path)
    updates = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    upsert_parquet(spark, updates, path, ["o_orderkey"])
    return _pin(
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@query(
    "q74_enrichment_margin",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_margin
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q74_enrichment_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 proof: fact enrichment through load_fact's DimensionLookup —
    part attributes (brand, retail price) join in broadcast-direct, the
    margin measure is computed from fact x dim columns (T8), then rolled
    up by brand. The dim side always broadcasts: enrichment never
    shuffles the fact at any scale."""
    lineitem = _t(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = _t(spark, sf_dir, "part")
    fact = load_fact(
        lineitem,
        [
            DimensionLookup(
                dim=part,
                business_key="p_partkey",
                join_type="direct",
                select=["p_brand", "p_retailprice"],
            )
        ],
        measures={
            "margin": "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity"
        },
    )
    return fact.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("margin"), "sum_margin"),
    )


#: silver-stage rule config for q75 (reference DQ dialect:
#: null_checks / value_constraints / format_validations)
_Q75_DQ = {
    "null_checks": ["c_custkey", "c_name"],
    "value_constraints": {
        "c_acctbal": ">= 0",
        "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY"],
    },
    # warning severity: flagged but NOT quarantined
    "format_validations": {"c_name": "^CUSTOMER#[0-9]+$"},
}


@query(
    "q75_silver_validate_stage",
    """
    SELECT c_custkey,
           upper(trim(c_name)) AS c_name,
           c_mktsegment,
           c_acctbal
    FROM customer
    WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
      AND (c_acctbal IS NULL OR c_acctbal >= 0)
      AND (c_mktsegment IS NULL OR c_mktsegment IN
           ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY'))
    """,
)
def q75_silver_validate_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3 proof: the silver transform+validate stages as the driver
    sees them — per-column expression transforms in one projection, then
    the config-driven RuleSet split (error rules quarantine, warning
    rules only flag). The valid side is returned; negative balances and
    the excluded segment land in quarantine, so rule evaluation is part
    of the hash. The oracle mirrors the NULL-passes-value-constraint
    semantics of the reference dialect."""
    customer = _t(spark, sf_dir, "customer")
    transformed = apply_transformations(
        customer, {"c_name": "upper(trim(c_name))"}
    )
    rules = RuleSet.from_config(_Q75_DQ)
    valid, _quarantined = rules.split(transformed)
    return valid.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "q105_compact_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           TRUE AS compacted
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q105_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (sinks.py::compact_table, the OPTIMIZE
    analogue): orders fragmented into 24 small files, compacted in place,
    read back. The hash pins row preservation (count + exact price sum
    per status) and the ``compacted`` flag pins that the file count
    actually dropped — a no-op "compaction" fails the gate."""
    import glob as _glob

    from modular_etl_data_platform_spark.sources.sinks import compact_table

    scratch = _scratch("q105_compact_roundtrip", sf_dir)
    tbl = os.path.join(scratch, "orders_small_files")
    orders = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    orders.repartition(24).write.mode("overwrite").parquet(tbl)
    n_before = len(_glob.glob(os.path.join(tbl, "*.parquet")))
    compact_table(spark, tbl)
    n_after = len(_glob.glob(os.path.join(tbl, "*.parquet")))
    back = spark.read.parquet(tbl)
    return _pin(
        back.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
            F.lit(bool(n_after < n_before)).alias("compacted"),
        )
    )


@query(
    "q106_clustered_write_prune",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_custkey BETWEEN 100 AND 199
    """,
)
def q106_clustered_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZORDER-analogue clustered write (sinks.py::write_clustered,
    reference config/gold/schema/README.md OPTIMIZE notes): orders
    range-clustered on o_custkey into narrow-key-range files, then a key
    range scanned back — parquet min/max stats prune non-matching files
    (plan/IO behavior pinned by test_sources.py); the hash pins that
    clustering reordered but lost/duplicated nothing."""
    from modular_etl_data_platform_spark.sources.sinks import write_clustered

    scratch = _scratch("q106_clustered_write_prune", sf_dir)
    tbl = os.path.join(scratch, "orders_clustered")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_clustered(orders, tbl, cluster_by=["o_custkey"], num_files=8)
    back = spark.read.parquet(tbl).filter(F.col("o_custkey").between(100, 199))
    return _pin(
        back.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


@query(
    "q107_bucketed_join_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def q107_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (sinks.py::write_bucketed): orders and
    lineitem saved bucketed on the join key as EXTERNAL tables in the
    scratch dir (in-memory catalog metadata only — no warehouse dir),
    then joined — both sides read pre-partitioned, so the join
    plans ZERO exchanges (pinned by test_sources.py); the hash pins the
    bucketed write/read path against the plain join's answer."""
    from modular_etl_data_platform_spark.sources.sinks import write_bucketed

    scratch = _scratch("q107_bucketed_join_roundtrip", sf_dir)
    write_bucketed(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "q107_orders_b",
        ["o_orderkey"],
        num_buckets=8,
        path=os.path.join(scratch, "orders_b"),
    )
    write_bucketed(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "q107_lineitem_b",
        ["l_orderkey"],
        num_buckets=8,
        path=os.path.join(scratch, "lineitem_b"),
    )
    o = spark.table("q107_orders_b")
    l = spark.table("q107_lineitem_b")
    return _pin(
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )


@query(
    "q108_orc_roundtrip",
    """
    SELECT n_regionkey,
           COUNT(*) AS n_nations,
           min(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q108_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan (readers.py::read_path format matrix): nation written as
    ORC and read back through the engine's reader; the aggregate must
    match the parquet oracle — a lossy type mapping or dropped stripe
    breaks the hash."""
    scratch = _scratch("q108_orc_roundtrip", sf_dir)
    tbl = os.path.join(scratch, "nation_orc")
    _t(spark, sf_dir, "nation").write.mode("overwrite").orc(tbl)
    back = read_path(spark, tbl, "orc")
    return _pin(
        back.groupBy("n_regionkey").agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


@query(
    "q110_catalog_table_roundtrip",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal,
           min(c_name) AS first_name
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q110_catalog_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 proof — managed-catalog table scan (reference
    config/gold/schema/README.md's ``spark.table`` access path): customer
    saved into the session catalog via ``saveAsTable`` (external path in
    scratch — metadata only in the catalog) and read back through
    ``spark.table``, the name-resolved scan every downstream consumer of
    a cataloged gold table uses. The aggregate must match the
    direct-parquet oracle: a catalog entry pointing at the wrong data,
    a schema drift in the metastore mapping, or a partial overwrite all
    break the hash."""
    scratch = _scratch("q110_catalog_table_roundtrip", sf_dir)
    customer = _t(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS q110_customer_cat")
    (
        customer.write.format("parquet")
        .mode("overwrite")
        .option("path", os.path.join(scratch, "customer_cat"))
        .saveAsTable("q110_customer_cat")
    )
    back = spark.table("q110_customer_cat")
    return _pin(
        back.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), "sum_acctbal"),
            F.min("c_name").alias("first_name"),
        )
    )


@query(
    "q109_text_scan_roundtrip",
    """
    SELECT COUNT(*) AS n_lines,
           -- CAST: DuckDB types SUM(BIGINT) as HUGEINT, which converts to
           -- float64 under a pandas canonicalizer ("350.0" vs "350")
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           CAST(SUM(len(n_name || '|' || CAST(n_nationkey AS VARCHAR)))
                AS BIGINT) AS char_sum
    FROM nation
    """,
)
def q109_text_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text scan (readers.py::read_path 'text'): nation serialized
    one row per line, read back as the ``value`` column, and re-parsed —
    line counts, parsed key sums and byte-ish lengths must match the
    relational oracle, pinning the line-oriented reader end to end."""
    scratch = _scratch("q109_text_scan_roundtrip", sf_dir)
    tbl = os.path.join(scratch, "nation_text")
    _t(spark, sf_dir, "nation").select(
        F.concat_ws("|", F.col("n_name"), F.col("n_nationkey")).alias("value")
    ).write.mode("overwrite").text(tbl)
    back = read_path(spark, tbl, "text")
    parsed = back.select(
        F.split(F.col("value"), "\\|").getItem(1).cast("long").alias("key"),
        F.length("value").alias("len"),
    )
    return _pin(
        parsed.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("key").alias("key_sum"),
            F.sum("len").alias("char_sum"),
        )
    )


@query(
    "q123_time_travel",
    """
    SELECT 1 AS version,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer
    UNION ALL
    SELECT 2 AS version,
           COUNT(*) + (SELECT COUNT(*) FROM customer WHERE c_nationkey = 3) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                + 1000.0 * (SELECT COUNT(*) FROM customer
                            WHERE c_mktsegment = 'BUILDING')
                + 50.0 * (SELECT COUNT(*) FROM customer WHERE c_nationkey = 3)
             AS DOUBLE) AS total_bal
    FROM customer
    """,
)
def q123_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel without Delta
    (operators/versioned.py::VersionedTable — the manifest-log pattern
    of the reference's Delta storage contract, single-writer): v1 is the
    customer table, v2 a MERGE that bumps every BUILDING customer's
    balance by 1000 and inserts a shadow row (+50.0 balance, offset key)
    per nation-3 customer. BOTH snapshots are then read back THROUGH the
    manifest log and aggregated; the oracle recomputes each version's
    expected row count and decimal-exact balance relationally. A broken
    manifest resolution, a MERGE that leaks into v1, or an upsert that
    drops/duplicates keys all hash-mismatch."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    cust = _t(spark, sf_dir, "customer")
    scratch = _scratch("q123_time_travel", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "cust_v"))
    vt.write(cust)
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    # shadow-key offset derived from the data (1-row agg), not a
    # constant: a fixed 10M offset collides with real keys at SF ≥ ~67,
    # silently turning inserts into updates and redding the gate at
    # exactly the scale the suite targets
    off = cust.agg(F.max("c_custkey")).first()[0] + 1
    inserts = cust.filter(F.col("c_nationkey") == 3).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(off)
    ).withColumn("c_acctbal", F.lit(50.0))
    vt.upsert(updates.unionByName(inserts), ["c_custkey"])

    def snap(v):
        return vt.read(v).agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal"), "total_bal"),
        )

    return _pin(snap(1).unionByName(snap(2)))


@query(
    "q125_schema_evolution",
    """
    SELECT n_regionkey,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN n_nationkey % 2 = 0
                         THEN CAST(n_nationkey AS DECIMAL(18,6)) END) AS DOUBLE)
             AS flag_sum
    FROM nation GROUP BY n_regionkey
    """,
)
def q125_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on MERGE (operators/upsert.py::merge_dataframes
    evolve_schema — Delta's mergeSchema for the parquet emulation): the
    nation table is written, then a batch carrying a NEW column (flag_val
    on even nation keys) upserts with evolve_schema=True. The widened
    table must null-fill history and carry batch values — the oracle
    recomputes per-region row counts, how many rows got the new column,
    and its decimal-exact sum. A widening that drops the column, fails
    to null-fill, or tears across partition files all hash-mismatch."""
    nat = _t(spark, sf_dir, "nation")
    scratch = _scratch("q125_schema_evolution", sf_dir)
    path = os.path.join(scratch, "nation_evolved")
    nat.write.parquet(path)
    batch = nat.filter(F.col("n_nationkey") % 2 == 0).withColumn(
        "flag_val", F.col("n_nationkey").cast("double")
    )
    upsert_parquet(spark, batch, path, ["n_nationkey"], evolve_schema=True)
    out = spark.read.parquet(path)
    return _pin(
        out.groupBy("n_regionkey").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("flag_val").alias("n_flagged"),
            dsum(F.coalesce(F.col("flag_val"), F.lit(0.0)), "flag_sum"),
        )
    )


@query(
    "q126_file_skipping",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 9999
    GROUP BY o_orderstatus
    """,
)
def q126_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level file skipping
    (operators/versioned.py::read_pruned): orders land in a versioned
    table as several range-disjoint file batches with per-file
    o_orderkey min/max recorded from the parquet footers; a key-range
    read then opens only the intersecting files. The oracle computes the
    same range filter relationally — a pruning bug that drops a file it
    shouldn't (or keeps rows outside the residual filter) changes the
    aggregate hash. The strictly-fewer-files property is pinned by
    test_versioned.py (engine-internal, not oracle-visible)."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = _scratch("q126_file_skipping", sf_dir)
    vt = VersionedTable(
        spark, os.path.join(scratch, "orders_v"), stats_columns=["o_orderkey"]
    )
    # range-disjoint batches -> disjoint footer min/max per file set
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        batch = orders.filter(
            (F.col("o_orderkey") >= splits[i]) & (F.col("o_orderkey") < splits[i + 1])
        ).coalesce(1)
        vt.write(batch, mode="append" if i else "overwrite")
    return _pin(
        vt.read_pruned("o_orderkey", 1000, 9999)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@query(
    "q129_zorder_write_prune",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
    FROM orders
    WHERE o_custkey BETWEEN 200 AND 400
      AND o_totalprice BETWEEN 100000 AND 200000
    """,
)
def q129_zorder_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional Z-ORDER clustered write
    (sinks.py::write_zordered — the true analogue of the reference's
    ``OPTIMIZE ... ZORDER BY``, config/gold/schema/README.md:381-389):
    orders written on a Morton curve over (o_custkey, o_totalprice), then
    scanned back with predicates on BOTH columns — each file carries a
    narrow min/max on every clustered column, so both predicates prune
    files (footer-stats behavior pinned by test_zorder.py). The hash pins
    that the rank-space bucketing + bit interleave + range shuffle
    reordered but lost/duplicated nothing."""
    from modular_etl_data_platform_spark.sources.sinks import write_zordered

    scratch = _scratch("q129_zorder_write_prune", sf_dir)
    tbl = os.path.join(scratch, "orders_z")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_zordered(
        orders, tbl, cluster_by=["o_custkey", "o_totalprice"], num_files=16
    )
    back = spark.read.parquet(tbl).filter(
        F.col("o_custkey").between(200, 400)
        & F.col("o_totalprice").between(100_000, 200_000)
    )
    return _pin(
        back.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_price"),
            F.sum("o_custkey").cast("long").alias("sum_cust"),
        )
    )


@query(
    "q132_pruned_upsert",
    """
    WITH batch AS (
      SELECT k AS o_orderkey, 'X' AS o_orderstatus,
             CAST(k AS DOUBLE) / 10 AS o_totalprice
      FROM range(1000, 5000) t(k)
    ),
    merged AS (
      SELECT * FROM batch
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey NOT BETWEEN 1000 AND 4999
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM merged GROUP BY o_orderstatus
    """,
)
def q132_pruned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned versioned MERGE (operators/versioned.py::upsert —
    Delta's MERGE data-skipping): orders land as range-disjoint files
    with o_orderkey footer stats; a batch covering EVERY key in
    [1000, 5000) (existing keys -> WHEN MATCHED update, absent keys ->
    NOT MATCHED insert) upserts through the manifest log. Only files
    whose stats range intersects the batch's key range are rewritten —
    the query itself pins the reuse (raises if no prior file was carried
    forward) and the oracle replays the full MERGE relationally, so a
    pruning bug that skips a matching file (stale survivor kept) or
    rewrites wrongly (row lost/duplicated) hash-mismatches."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = _scratch("q132_pruned_upsert", sf_dir)
    vt = VersionedTable(
        spark, os.path.join(scratch, "orders_v"), stats_columns=["o_orderkey"]
    )
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("o_orderkey") >= splits[i]) & (F.col("o_orderkey") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    before = set(vt._read_manifest(vt.current_version())["files"])
    batch = spark.range(1000, 5000).select(
        F.col("id").alias("o_orderkey"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("id").cast("double") / 10).alias("o_totalprice"),
    )
    v = vt.upsert(batch, ["o_orderkey"])
    reused = set(vt._read_manifest(v)["files"]) & before
    if not reused:  # the scale property IS the point — fail loudly
        raise AssertionError("pruned upsert carried no prior file forward")
    return _pin(
        vt.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_total"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@query(
    "q136_incremental_change_feed",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderkey % 4 >= 2
    GROUP BY o_orderstatus
    """,
)
def q136_incremental_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level change feed on a versioned table
    (operators/versioned.py::read_incremental): orders land as four
    appended batches (o_orderkey % 4 buckets); a consumer that last saw
    version 2 reads EXACTLY the rows appended since — batches 3 and 4 —
    at a cost proportional to the new data (the manifest diff is a
    path set-difference, no table re-scan). The oracle recomputes the
    same subset relationally; a feed that leaks old rows, drops a new
    file, or re-reads a compacted file all hash-mismatch."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = _scratch("q136_incremental_change_feed", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"))
    for i in range(4):
        batch = orders.filter(F.col("o_orderkey") % 4 == i).coalesce(1)
        vt.write(batch, mode="append" if i else "overwrite")
    return _pin(
        vt.read_incremental(since_version=2)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_total"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


@query(
    "q137_table_changes",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    batch AS (
      SELECT x AS k, 'X' AS s, CAST(x AS DOUBLE) / 10 AS p FROM range(1000, 3000) t(x)
    ),
    v3 AS (
      SELECT * FROM (
        SELECT * FROM batch
        UNION ALL
        SELECT k, s, p FROM base WHERE k NOT BETWEEN 1000 AND 2999
      ) WHERE k NOT BETWEEN 2000 AND 2499
    ),
    ch AS (
      SELECT COALESCE(n.k, o.k) AS k,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN o.s IS NOT DISTINCT FROM n.s
                   AND o.p IS NOT DISTINCT FROM n.p THEN NULL
                  ELSE 'update_postimage' END AS _change_type,
             CASE WHEN n.k IS NULL THEN o.p ELSE n.p END AS p
      FROM base o FULL OUTER JOIN v3 n ON o.k = n.k
    )
    SELECT _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM ch WHERE _change_type IS NOT NULL GROUP BY _change_type
    """,
)
def q137_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change data feed computed on read
    (operators/versioned.py::table_changes — Delta CDF semantics derived
    from the manifest diff): v1 lands orders as range-disjoint files,
    v2 MERGEs a batch over [1000, 3000) (updates + inserts), v3 DELETEs
    the [2000, 2500) key range with data skipping. table_changes(v1)
    must classify every surviving batch key as update/insert, every
    removed existing key as delete, and — critically — report ZERO
    changes for unchanged neighbors inside rewritten files. The oracle
    replays the same three states relationally and full-outer-diffs
    them; counts, key sums and decimal-exact price sums per change type
    all hash-pinned."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q137_table_changes", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"), stats_columns=["k"])
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    v_loaded = vt.current_version()  # the 4 load batches are versions 1-4
    batch = spark.range(1000, 3000).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id").cast("double") / 10).alias("p"),
    )
    vt.upsert(batch, ["k"])
    vt.delete_range("k", 2000, 2499)
    return _pin(
        vt.table_changes(v_loaded, primary_keys=["k"])
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )
    )


@query(
    "q139_versioned_incremental_silver",
    """
    WITH bronze AS (
      SELECT o_orderkey AS id, o_orderkey AS seq, o_orderstatus AS val
      FROM orders
    ),
    latest AS (
      SELECT id, seq, val,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
      FROM bronze
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS id_sum,
           COUNT(DISTINCT val) AS n_vals
    FROM latest WHERE rn = 1
    """,
)
def q139_versioned_incremental_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark file pruning on a VERSIONED bronze source
    (pipeline/medallion.py::_read_source_for_increment + versioned.py::
    read_pruned with a strictly-greater lower bound): bronze lands as
    three key-range-disjoint appended batches with per-file ``seq``
    stats; silver pass 1 consumes batches 1-2 and records the
    watermark, then batch 3 is appended and pass 2 runs. The query
    ASSERTS (raises — the scale property IS the point) that pass 2's
    source scan opened ONLY batch 3's file, including skipping the file
    whose max seq EQUALS the watermark; the oracle replays the full
    dedup-latest silver state relationally, so a pruning bug that skips
    a qualifying file (rows lost) or double-applies a batch changes the
    hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
    from modular_etl_data_platform_spark.schema.registry import TableConfig

    scratch = _scratch("q139_versioned_incremental_silver", sf_dir)
    bronze_src = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderstatus").alias("val"),
    )
    cfg = TableConfig(
        raw={
            "table_name": "silver_inc",
            "source_table": "bronze_inc",
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
        spark, warehouse=os.path.join(scratch, "wh"), storage="versioned"
    )
    bronze = VersionedTable(
        spark, pipe.table_path("bronze_inc"), stats_columns=["seq"]
    )
    lo_cut = 2_000
    hi_cut = 1_000_000_000_000
    b1 = bronze_src.filter(F.col("seq") < lo_cut).coalesce(1)
    b2 = bronze_src.filter(
        (F.col("seq") >= lo_cut) & (F.col("seq") < hi_cut)
    ).coalesce(1)
    bronze.write(b1)
    bronze.write(b2, mode="append")
    pipe.transform_silver(cfg, order_col="seq")

    b3 = bronze_src.filter(F.col("seq") >= hi_cut)  # empty at test SFs
    # make batch 3 non-empty and disjoint: re-key a slice above the max
    b3 = bronze_src.limit(0).unionByName(
        bronze_src.filter(F.col("seq") < 500).select(
            (F.col("id") + F.lit(hi_cut)).alias("id"),
            (F.col("seq") + F.lit(hi_cut)).alias("seq"),
            F.col("val"),
        )
    ).coalesce(1)
    bronze.write(b3, mode="append")
    pruned = pipe._read_source_for_increment(
        "bronze_inc", "seq", pipe._watermarks.get("silver_inc")
    )
    opened = set(os.path.basename(f) for f in pruned.inputFiles())
    head = bronze.current_version()
    new_files = {
        os.path.basename(f)
        for f in bronze._read_manifest(head)["files"]
        if f not in set(bronze._read_manifest(head - 1)["files"])
    }
    if opened != new_files:  # the scale property IS the point
        raise AssertionError(
            f"incremental silver scan opened {sorted(opened)}, "
            f"expected only the new batch's {sorted(new_files)}"
        )
    pipe.transform_silver(cfg, order_col="seq")
    # oracle scope: the original keys only (the re-keyed batch-3 rows
    # are engine-side plumbing; subtract them the same way relationally
    # would double the SQL for no extra signal)
    return _pin(
        pipe.read_table("silver_inc")
        .filter(F.col("id") < hi_cut)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("id").cast("long").alias("id_sum"),
            F.countDistinct("val").alias("n_vals"),
        )
    )


@query(
    "q140_check_constraints",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM (
      SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 0
      UNION ALL
      SELECT 'N' AS o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
    )
    GROUP BY o_orderstatus
    """,
)
def q140_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional CHECK constraints on a versioned table
    (operators/versioned.py::add_constraint + the Observation-enforced
    landing check): a ``o_totalprice > 0`` constraint is registered,
    then (1) a batch containing a NULL price lands — NULL evaluations
    PASS (SQL CHECK three-valued logic); (2) a violating batch
    (negative price) must raise ConstraintViolationError AND leave the
    version counter untouched — the transactional half: the rejected
    version never exists. The query raises if the violation is accepted
    or the rejection leaks a version; the oracle replays the surviving
    state (valid rows + the NULL row) relationally."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
        VersionedTable,
    )

    scratch = _scratch("q140_check_constraints", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"))
    vt.write(orders.filter(F.col("o_totalprice") > 0))
    vt.add_constraint("price_positive", "o_totalprice > 0")
    # NULL passes (three-valued logic): this append must succeed
    null_row = spark.createDataFrame(
        [(-1, "N", None)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    vt.write(null_row, mode="append")
    head = vt.current_version()
    bad = spark.createDataFrame(
        [(-2, "B", -5.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    try:
        vt.write(bad, mode="append")
        raise AssertionError("violating write was accepted")
    except ConstraintViolationError:
        pass
    if vt.current_version() != head:  # transactional: no version leaked
        raise AssertionError("rejected write published a version")
    return _pin(
        vt.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )
    )


@query(
    "q141_checkpointed_log_time_travel",
    """
    WITH b AS (
      SELECT o_orderkey, o_totalprice, o_orderkey % 12 AS bucket
      FROM orders
    )
    SELECT 7 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM b WHERE bucket < 7
    UNION ALL
    SELECT 12 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM b
    """,
)
def q141_checkpointed_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta-encoded commit log under a LONG history
    (operators/versioned.py::CommitLog — add/remove deltas + periodic
    checkpoints + ``_last_checkpoint``): 12 appended versions with
    checkpoint_interval=5 cross two checkpoint boundaries; version 7
    (checkpoint 5 + two deltas) and head (checkpoint 10 + two deltas)
    are both resolved and aggregated. The query also ASSERTS the scale
    contract directly: every non-checkpoint commit record is in delta
    form (no full file inventory), and checkpoints exist at 5 and 10.
    The oracle replays both snapshots relationally — a delta fold that
    drops/doubles a file, a checkpoint that snapshots the wrong state,
    or a hint that resolves the wrong head all change the hash."""
    from modular_etl_data_platform_spark.operators import versioned as V
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    scratch = _scratch("q141_checkpointed_log_time_travel", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", (F.col("o_orderkey") % 12).alias("bucket")
    )
    vt = VersionedTable(
        spark, os.path.join(scratch, "orders_v"), checkpoint_interval=5
    )
    for i in range(12):
        vt.write(
            orders.filter(F.col("bucket") == i).coalesce(1),
            mode="append" if i else "overwrite",
        )
    if vt.log.checkpoints() != [5, 10]:
        raise AssertionError(f"checkpoints at {vt.log.checkpoints()}, want [5, 10]")
    import json as _json

    for v in (2, 7, 12):  # delta-form commits (the O(batch) contract)
        rec = _json.loads(vt.log.store.read(V._commit_name(v)))
        if "files" in rec or "add" not in rec:
            raise AssertionError(f"commit {v} is not in delta form")

    def snap(v: int) -> DataFrame:
        return vt.read(v).agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )

    return _pin(snap(7).unionByName(snap(12)))


@query(
    "q143_analyze_statistics",
    """
    SELECT 'o_orderkey' AS column_name,
           COUNT(DISTINCT o_orderkey) AS distinct_count,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS num_nulls,
           CAST(MIN(o_orderkey) AS STRING) AS min_value,
           CAST(MAX(o_orderkey) AS STRING) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           COUNT(DISTINCT o_custkey),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(o_custkey) AS STRING),
           CAST(MAX(o_custkey) AS STRING)
    FROM orders
    """,
)
def q143_analyze_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE/CBO statistics hook, oracle-gated
    (pipeline/medallion.py::analyze_table — the reference's post-load
    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` step,
    reference: config/gold/schema/README.md:391): orders lands in a
    VERSIONED warehouse table, analyze_table computes per-column
    distinct/null/min/max over the current snapshot, and the recorded
    statistics are parsed back into rows and hash-compared against the
    oracle computing the same aggregates relationally — a stats pass
    that reads a stale snapshot, miscounts, or drops a column changes
    the hash. (exact COUNT DISTINCT here, matching the oracle; Spark's
    own ANALYZE uses HLL±5% — the versioned branch is the exact one.)"""
    import re as _re

    from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline

    scratch = _scratch("q143_analyze_statistics", sf_dir)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pipe = MedallionPipeline(
        spark, warehouse=os.path.join(scratch, "wh"), storage="versioned"
    )
    pipe.write_table(orders, "gold_orders_stats", stats_columns=["o_orderkey"])
    stats = pipe.analyze_table(
        "gold_orders_stats", columns=["o_orderkey", "o_custkey"]
    )
    rows = []
    for col in ("o_orderkey", "o_custkey"):
        m = _re.match(
            r"distinct_count=(\d+); num_nulls=(\d+); min=(.*); max=(.*)$",
            stats[f"col:{col}"],
        )
        if m is None:  # the hook's output contract is part of the proof
            raise AssertionError(f"unparseable stats line for {col}: {stats}")
        rows.append((col, int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)))
    return _pin(
        spark.createDataFrame(
            rows,
            "column_name string, distinct_count long, num_nulls long, "
            "min_value string, max_value string",
        )
    )


@query(
    "q144_timestamp_time_travel",
    """
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice FROM orders
    )
    SELECT 1 AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM v1
    UNION ALL
    SELECT 2 AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
    FROM v2
    """,
)
def q144_timestamp_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF time travel (operators/versioned.py — commit
    records carry their commit time; ``read(timestamp=...)`` resolves
    to the latest version at-or-before it): even orders land as v1,
    the odd rows append as v2; a read at EXACTLY v1's recorded commit
    time must reproduce v1 (at-or-before is inclusive), and a read at
    v2's time reproduces the full table. Both snapshots are aggregated
    and oracle-replayed — a resolution that rounds the wrong way,
    walks to the wrong record, or loses the boundary case changes the
    hash. (v2's Spark write takes orders of magnitude longer than a
    millisecond, so the two commit times can never collide.)"""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    scratch = _scratch("q144_timestamp_time_travel", sf_dir)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"))
    vt.write(orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(1))
    vt.write(
        orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(1), mode="append"
    )
    ts1 = vt._read_manifest(1)["ts"]
    ts2 = vt._read_manifest(2)["ts"]
    if not ts1 < ts2:  # the premise of the boundary assertion
        raise AssertionError(f"commit times not increasing: {ts1} vs {ts2}")

    def snap(label: int, ts: int) -> DataFrame:
        return vt.read(timestamp=ts).agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "sum_total"),
        )

    return _pin(snap(1, ts1).unionByName(snap(2, ts2)))


@query(
    "q145_deletion_vectors",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    live AS (
      SELECT * FROM base
      WHERE NOT COALESCE(s = 'F' AND k % 3 = 0, FALSE)
        AND NOT COALESCE(k < 1000, FALSE)
    ),
    deleted AS (
      SELECT * FROM base
      WHERE COALESCE(s = 'F' AND k % 3 = 0, FALSE)
         OR COALESCE(k < 1000, FALSE)
    )
    SELECT 'v_loaded' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM base
    UNION ALL
    SELECT 'live', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM live
    UNION ALL
    SELECT 'cdf_delete', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM deleted
    """,
)
def q145_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors
    (operators/versioned.py::delete_where — Delta's DV contract):
    orders land as four range-split files; two deletes run, one on an
    ARBITRARY non-range predicate (status + modular arithmetic — the
    shape delete_range cannot express) and one accumulating onto the
    same files. NEITHER rewrites a data file — the query asserts the
    snapshot's file list is bit-identical across both deletes (the
    merge-on-read property itself, not just the visible rows). Three
    legs hash-checked against the oracle: the pre-delete snapshot
    (time travel over the DV commits), the live rows (vector applied
    on read), and the row-level change feed, which must classify every
    vector-deleted row as a delete without a single file having moved."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q145_deletion_vectors", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"), stats_columns=["k"])
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    v_loaded = vt.current_version()
    files_loaded = vt._read_manifest(v_loaded)["files"]
    vt.delete_where("s = 'F' AND k % 3 = 0")
    # the second delete is range-shaped: the prune hint skips files
    # whose recorded k-range can't match (exact — stats are conservative)
    vt.delete_where("k < 1000", prune=("k", None, 999))
    head = vt.current_version()
    if vt._read_manifest(head)["files"] != files_loaded:
        raise AssertionError(
            "deletion vectors rewrote data files — merge-on-read violated"
        )

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )

    changes = vt.table_changes(v_loaded, primary_keys=["k"]).filter(
        F.col("_change_type") == "delete"
    )
    return _pin(
        leg("v_loaded", vt.read(version=v_loaded))
        .unionByName(leg("live", vt.read()))
        .unionByName(leg("cdf_delete", changes))
    )


@query(
    "q146_dv_merge",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    batch AS (
      SELECT x AS k, 'X' AS s, CAST(x AS DOUBLE) / 10 AS p
      FROM range(1000, 3000) t(x)
    ),
    merged AS (
      SELECT * FROM batch
      UNION ALL
      SELECT k, s, p FROM base WHERE k NOT BETWEEN 1000 AND 2999
    )
    SELECT 'pre' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM base
    UNION ALL
    SELECT 'merged', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM merged
    UNION ALL
    SELECT 'cdf_upd', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM batch WHERE k IN (SELECT k FROM base)
    """,
)
def q146_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV-backed MERGE (operators/versioned.py::upsert
    use_deletion_vectors=True — Delta's low-shuffle MERGE with deletion
    vectors): orders land as four range-split files, then a 2000-key
    batch merges WITHOUT rewriting a single data file — matched rows
    are vector-deleted via a PK-column-only scan and the batch lands as
    new files. The query asserts every pre-merge file is carried
    path-identical (the no-rewrite property) and that a vector exists.
    Oracle legs: the pre-merge snapshot (time travel), the merged state
    (vector applied + batch visible — any dropped survivor, surviving
    matched row, or lost insert changes the hash), and the change feed
    restricted to updates (vector-deleted rows whose key re-landed must
    classify as update_postimage, carrying the batch's values)."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q146_dv_merge", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"), stats_columns=["k"])
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    v_loaded = vt.current_version()
    files_loaded = vt._read_manifest(v_loaded)["files"]
    batch = spark.range(1000, 3000).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id").cast("double") / 10).alias("p"),
    )
    head = vt.upsert(batch, ["k"], use_deletion_vectors=True)
    m = vt._read_manifest(head)
    if not set(files_loaded) <= set(m["files"]):
        raise AssertionError("DV merge rewrote a data file")
    if not m["dv"]:
        raise AssertionError("DV merge recorded no deletion vector")

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )

    updates = vt.table_changes(v_loaded, primary_keys=["k"]).filter(
        F.col("_change_type") == "update_postimage"
    )
    return _pin(
        leg("pre", vt.read(version=v_loaded))
        .unionByName(leg("merged", vt.read()))
        .unionByName(leg("cdf_upd", updates))
    )


@query(
    "q149_update_where",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    u1 AS (
      SELECT k, s AS s0,
             CASE WHEN s = 'F' AND k % 7 = 0 THEN 'U' ELSE s END AS s,
             CASE WHEN s = 'F' AND k % 7 = 0 THEN p + k ELSE p END AS p
      FROM base
    ),
    u2 AS (
      SELECT k, s0,
             CASE WHEN k < 2000 THEN lower(s) ELSE s END AS s, p
      FROM u1
    ),
    chg AS (
      SELECT * FROM u2
      WHERE (s0 = 'F' AND k % 7 = 0) OR k < 2000
    )
    SELECT 'pre' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(SUM(ascii(s)) AS BIGINT) AS status_sum
    FROM base
    UNION ALL
    SELECT 'live', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE),
           CAST(SUM(ascii(s)) AS BIGINT)
    FROM u2
    UNION ALL
    SELECT 'cdf_upd', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE),
           CAST(SUM(ascii(s)) AS BIGINT)
    FROM chg
    """,
)
def q149_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE, both strategies
    (operators/versioned.py::update_where — Delta's UPDATE DML): orders
    land as four range-split files; update 1 (REWRITE strategy) hits an
    arbitrary status+modular predicate, and its assignment reads
    another column of the PRE-update row (p = p + k) — mis-ordered
    assignment evaluation changes the hash; update 2 (DELETION-VECTOR
    strategy, prune-hinted) lowercases the status of a key range
    WITHOUT rewriting a single file — the query asserts update 1
    rewrote exactly the matched file and update 2 rewrote nothing
    while recording a vector. Three legs oracle-replayed: the
    pre-update snapshot (time travel), the live state (both updates
    composed in commit order), and the row-level change feed, which
    must carry the FINAL image of every condition-matched row."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q149_update_where", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"), stats_columns=["k"])
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    v_loaded = vt.current_version()
    files_loaded = vt._read_manifest(v_loaded)["files"]
    v1 = vt.update_where({"p": "p + k", "s": "'U'"}, "s = 'F' AND k % 7 = 0")
    files_v1 = vt._read_manifest(v1)["files"]
    if not set(files_loaded) - set(files_v1):
        raise AssertionError("rewrite-strategy UPDATE rewrote no file")
    v2 = vt.update_where(
        {"s": "lower(s)"},
        "k < 2000",
        prune=("k", None, 1999),
        use_deletion_vectors=True,
    )
    m2 = vt._read_manifest(v2)
    if not set(files_v1) <= set(m2["files"]):
        raise AssertionError("DV-strategy UPDATE rewrote a data file")
    if not m2.get("dv"):
        raise AssertionError("DV-strategy UPDATE recorded no vector")

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
            F.sum(F.ascii("s")).cast("long").alias("status_sum"),
        )

    changes = vt.table_changes(v_loaded, primary_keys=["k"]).filter(
        F.col("_change_type") == "update_postimage"
    )
    return _pin(
        leg("pre", vt.read(version=v_loaded))
        .unionByName(leg("live", vt.read()))
        .unionByName(leg("cdf_upd", changes))
    )


@query(
    "q150_replace_where",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    batch AS (
      SELECT x AS k, 'R' AS s, CAST(x AS DOUBLE) / 100 AS p
      FROM range(1000, 3000) t(x)
    ),
    post AS (
      SELECT * FROM batch
      UNION ALL
      SELECT k, s, p FROM base WHERE NOT COALESCE(k >= 1000 AND k < 3000, FALSE)
    )
    SELECT 'pre' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM base
    UNION ALL
    SELECT 'post', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM post
    UNION ALL
    SELECT 'cdf_ins', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM batch WHERE k NOT IN (SELECT k FROM base)
    UNION ALL
    SELECT 'cdf_upd', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM batch WHERE k IN (SELECT k FROM base)
    """,
)
def q150_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replaceWhere (operators/versioned.py::overwrite_where — Delta's
    selective overwrite): orders land as four range-split files, then
    every live row in [1000, 3000) is atomically replaced by a
    synthetic batch. The prune hint restricts even the phase-1
    predicate scan to the one stats-intersecting file; the query
    asserts exactly that file was rewritten and every other carried
    path-identical. Four legs oracle-replayed: the pre-replace
    snapshot, the post state (any leaked old row, lost batch row, or
    touched outside-range row changes the hash), and the change feed
    split into inserts (batch keys new to the table) and updates
    (batch keys that replaced an existing order)."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q150_replace_where", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_v"), stats_columns=["k"])
    splits = [0, 5_000, 50_000, 500_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    v_loaded = vt.current_version()
    files_loaded = vt._read_manifest(v_loaded)["files"]
    batch = spark.range(1000, 3000).select(
        F.col("id").alias("k"),
        F.lit("R").alias("s"),
        (F.col("id").cast("double") / 100).alias("p"),
    )
    v = vt.overwrite_where(
        batch, "k >= 1000 AND k < 3000", prune=("k", 1000, 2999)
    )
    m = vt._read_manifest(v)
    removed = set(files_loaded) - set(m["files"])
    if len(removed) != 1:
        raise AssertionError(
            f"replaceWhere should rewrite exactly the one intersecting "
            f"file, rewrote {len(removed)}"
        )

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )

    cdf = vt.table_changes(v_loaded, primary_keys=["k"])
    return _pin(
        leg("pre", vt.read(version=v_loaded))
        .unionByName(leg("post", vt.read()))
        .unionByName(
            leg("cdf_ins", cdf.filter(F.col("_change_type") == "insert"))
        )
        .unionByName(
            leg(
                "cdf_upd",
                cdf.filter(F.col("_change_type") == "update_postimage"),
            )
        )
    )


@query(
    "q151_shallow_clone",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    src_after_dv AS (
      SELECT * FROM base WHERE NOT COALESCE(k % 10 = 7, FALSE)
    ),
    clone_live AS (
      SELECT k, s, CASE WHEN k < 5000 THEN p + 1000 ELSE p END AS p
      FROM src_after_dv
    ),
    src_live AS (
      SELECT * FROM src_after_dv WHERE NOT COALESCE(k % 10 = 3, FALSE)
    )
    SELECT 'clone_v1' AS snapshot, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM src_after_dv
    UNION ALL
    SELECT 'clone_live', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM clone_live
    UNION ALL
    SELECT 'src_live', COUNT(*), CAST(SUM(k) AS BIGINT),
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE)
    FROM src_live
    """,
)
def q151_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow clone (operators/versioned.py::clone — Delta's SHALLOW
    CLONE): orders land in a source table, a deletion-vector delete
    runs (so the clone must carry the vector, not just the files), then
    the table is cloned — the query asserts the clone's v1 references
    the source's files VERBATIM (zero data copied). Both sides then
    diverge: the clone updates a key range (rewrite — re-homing content
    into the clone), the source deletes a different residue class.
    Three legs oracle-replayed: the clone's v1 (must equal the source
    at clone time INCLUDING the carried vector), the clone's live state
    (update applied, source's later delete invisible), and the source's
    live state (clone's update invisible) — any cross-contamination
    between the two tables changes a hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q151_shallow_clone", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "src"), stats_columns=["k"])
    splits = [0, 50_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    vt.delete_where("k % 10 = 7")
    src_head = vt.current_version()
    src_files = vt._read_manifest(src_head)["files"]
    clone = vt.clone(os.path.join(scratch, "clone"))
    if clone._read_manifest(1)["files"] != src_files:
        raise AssertionError("clone v1 does not reference source files verbatim")
    clone.update_where({"p": "p + 1000"}, "k < 5000")
    vt.delete_where("k % 10 = 3")
    if vt.current_version() != src_head + 1:
        raise AssertionError("clone operations leaked commits into the source")

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )

    return _pin(
        leg("clone_v1", clone.read(version=1))
        .unionByName(leg("clone_live", clone.read()))
        .unionByName(leg("src_live", vt.read()))
    )


@query(
    "q152_bloom_point_lookup",
    """
    WITH t AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p
      FROM orders
    )
    SELECT 'hit' AS leg, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(COALESCE(SUM(CAST(p AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_price
    FROM t WHERE k = 7
    UNION ALL
    SELECT 'miss', COUNT(*), CAST(COALESCE(SUM(k), 0) AS BIGINT),
           CAST(COALESCE(SUM(CAST(p AS DECIMAL(18,6))), 0) AS DOUBLE)
    FROM t WHERE k = 1000000000000
    """,
)
def q152_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter file skipping (operators/versioned.py bloom
    sidecars — Delta's bloom filter index): orders land as four
    residue-class batches (k % 4), so every file's [min, max] spans the
    ENTIRE key domain and range stats can never prune a point lookup.
    The query ASSERTS (raises — the scale property IS the point) that
    (a) min/max alone keeps all four files, (b) the bloom probe opens
    at most two for an equality read on a present key including the one
    true file, and (c) a key absent from every file opens ZERO files.
    The oracle replays both point lookups relationally — a bloom false
    negative (rows lost) or a probe on the wrong column changes the
    hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q152_bloom_point_lookup", sf_dir)
    vt = VersionedTable(
        spark,
        os.path.join(scratch, "orders_b"),
        stats_columns=["k"],
        bloom_columns=["k"],
    )
    for r in range(4):
        part = orders.filter(F.col("k") % 4 == r).coalesce(1)
        vt.write(part, mode="append" if r else "overwrite")
    head = vt._read_manifest(vt.current_version())
    ranged = [
        f
        for f in head["files"]
        if VersionedTable._may_intersect(head["stats"].get(f), "k", 7, 7)
    ]
    if len(ranged) != 4:  # residue classes must defeat min/max pruning
        raise AssertionError(
            f"expected all 4 files range-kept for k=7, got {len(ranged)}"
        )
    hit = vt.read_pruned("k", 7, 7)
    opened = set(hit.inputFiles())
    if not (1 <= len(opened) <= 2):  # one true file + at most one fp
        raise AssertionError(
            f"bloom point read opened {len(opened)}/4 files, expected <=2"
        )
    miss = vt.read_pruned("k", 1_000_000_000_000, 1_000_000_000_000)
    if miss.inputFiles():
        raise AssertionError(
            "bloom probe on an absent key should open zero files"
        )

    def leg(label: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(label).alias("leg"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("key_sum"),
            F.coalesce(
                F.sum(F.col("p").cast("decimal(18,6)")), F.lit(0).cast("decimal(18,6)")
            ).cast("double").alias("sum_price"),
        )

    return _pin(leg("hit", hit).unionByName(leg("miss", miss)))


@query(
    "q153_merge_clauses",
    """
    WITH t AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p
      FROM orders
    ),
    src AS (
      SELECT k, 'SRC' AS s, CAST(k AS DOUBLE) / 10 + 10 AS p
      FROM t WHERE k < 3000
      UNION ALL
      SELECT k + 1000000000000, 'NEW', CAST(k AS DOUBLE)
      FROM t WHERE k < 500
    ),
    j AS (
      SELECT t.k AS tk, t.s AS ts, t.p AS tp,
             src.k AS sk, src.s AS ss, src.p AS sp
      FROM t FULL OUTER JOIN src ON t.k = src.k
    ),
    res AS (
      -- matched: delete if t.p > 150000, else update when s.k even,
      -- else keep unchanged
      SELECT tk AS k, CASE WHEN sk % 2 = 0 THEN ss ELSE ts END AS s,
             CASE WHEN sk % 2 = 0 THEN tp + sp ELSE tp END AS p
      FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL AND tp <= 150000
      UNION ALL
      -- not matched: conditional insert
      SELECT sk, lower(ss), sp
      FROM j WHERE tk IS NULL AND sk % 3 = 0
      UNION ALL
      -- not matched by source: delete k%1000=7, flag k%1000=11, keep rest
      SELECT tk, CASE WHEN tk % 1000 = 11 THEN 'X' ELSE ts END, tp
      FROM j WHERE sk IS NULL AND tk % 1000 != 7
    )
    SELECT s, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM res GROUP BY s
    """,
)
def q153_merge_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE INTO clause surface (operators/versioned.py::merge —
    Delta's ordered conditional whenMatched / whenNotMatched /
    whenNotMatchedBySource semantics, reference storage contract
    requirements.txt:2 delta-spark): orders land as a versioned table,
    then ONE merge applies five clauses at once — matched rows above a
    price threshold DELETE, even-keyed matches UPDATE from the source
    (first-match-wins order), odd unclaimed matches carry unchanged,
    source-only keys conditionally INSERT with expression assignments,
    and target-only rows split three ways (delete / flag-update /
    keep). The oracle replays the identical clause resolution
    relationally over a full outer join; per-status counts, key sums
    and decimal-exact price sums all hash-pinned — any clause
    mis-ordering, 3VL slip or type drift changes the hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q153_merge_clauses", sf_dir)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_m"), stats_columns=["k"])
    splits = [0, 50_000, 10**12]
    for i in range(len(splits) - 1):
        part = orders.filter(
            (F.col("k") >= splits[i]) & (F.col("k") < splits[i + 1])
        ).coalesce(1)
        vt.write(part, mode="append" if i else "overwrite")
    src = (
        orders.filter(F.col("k") < 3000)
        .select(
            "k",
            F.lit("SRC").alias("s"),
            (F.col("k").cast("double") / 10 + 10).alias("p"),
        )
        .unionByName(
            orders.filter(F.col("k") < 500).select(
                (F.col("k") + F.lit(10**12)).alias("k"),
                F.lit("NEW").alias("s"),
                F.col("k").cast("double").alias("p"),
            )
        )
    )
    vt.merge(
        src,
        on=["k"],
        matched=[
            ("delete", None, "t.p > 150000"),
            ("update", {"s": "s.s", "p": "t.p + s.p"}, "s.k % 2 = 0"),
        ],
        not_matched=[
            ("insert", {"k": "s.k", "s": "lower(s.s)", "p": "s.p"}, "s.k % 3 = 0"),
        ],
        not_matched_by_source=[
            ("delete", None, "t.k % 1000 = 7"),
            ("update", {"s": "'X'"}, "t.k % 1000 = 11"),
        ],
    )
    return _pin(
        vt.read()
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )
    )


@query(
    "q154_history_metrics",
    """
    WITH t AS (SELECT o_orderkey AS k FROM orders),
    n AS (SELECT COUNT(*) AS n_all FROM t),
    add200 AS (SELECT COUNT(*) AS n_new FROM t WHERE k < 200),
    del AS (SELECT COUNT(*) AS n_del FROM t WHERE k BETWEEN 2000 AND 2999)
    SELECT 1 AS version, 'overwrite' AS mode,
           n_all AS added_rows, 0 AS removed_rows
    FROM n
    UNION ALL
    SELECT 2, 'upsert', n_all + n_new, n_all FROM n, add200
    UNION ALL
    SELECT 3, 'delete', n_all + n_new - n_del, n_all + n_new
    FROM n, add200, del
    """,
)
def q154_history_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operation metrics on every commit (operators/versioned.py
    publish-time metrics — Delta's DESCRIBE HISTORY operationMetrics,
    derived from footer row counts already in hand, zero extra I/O):
    three commits with relationally-predictable row movement — full
    write, whole-table upsert (every prior row replaced + 200 new
    keys), range delete — and the HISTORY's recorded
    num_added_rows/num_removed_rows per version are returned as data.
    The oracle derives the same counts from orders directly, so a
    metrics bug (rows counted from the wrong side of the diff, carried
    files miscounted as added, removed rows not summed from the prior
    snapshot's stats) changes the hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    scratch = _scratch("q154_history_metrics", sf_dir)
    # deliberately NO stats_columns: every rewrite conservatively
    # touches all files, so removed-row counts are file-layout-
    # independent (the pruned variants are pinned by q132/q150/q153)
    vt = VersionedTable(spark, os.path.join(scratch, "orders_h"))
    vt.write(orders)
    batch = orders.unionByName(
        orders.filter(F.col("k") < 200).select(
            (F.col("k") + F.lit(10**12)).alias("k"), F.col("p")
        )
    )
    vt.upsert(batch, ["k"])
    vt.delete_range("k", 2000, 2999)
    rows = [
        (
            h["version"],
            h["mode"],
            int(h["metrics"]["num_added_rows"]),
            int(h["metrics"].get("num_removed_rows", 0)),
        )
        for h in vt.history()
    ]
    return _pin(
        spark.createDataFrame(
            rows, "version int, mode string, added_rows long, removed_rows long"
        )
    )


@query(
    "q155_generated_columns",
    """
    WITH t AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 100 = 0
                  THEN o_orderdate + INTERVAL 400 DAY
                  ELSE o_orderdate END AS ts
      FROM orders
    ),
    g AS (SELECT k, CAST(strftime(ts, '%Y%m%d') AS INT) AS date_key FROM t)
    SELECT CAST(date_key // 10000 AS INT) AS year, COUNT(*) AS n_rows,
           CAST(SUM(date_key) AS BIGINT) AS dk_sum,
           CAST(SUM(k) AS BIGINT) AS key_sum
    FROM g GROUP BY 1
    """,
)
def q155_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns (operators/versioned.py — Delta's GENERATED
    ALWAYS AS): a date_key column declared as an expression over ts is
    COMPUTED by the engine on every write (batches never supply it),
    recorded in per-file stats so date-range reads prune files
    (asserted in-query: the middle of three year-ranged files), kept
    consistent by UPDATE (changing ts recomputes date_key — asserted by
    the oracle replaying the same derivation), and enforced
    transactionally (a batch supplying a WRONG date_key must fail and
    publish nothing — asserted in-query). The oracle derives date_key
    relationally from the same timestamps, so a stale or mis-derived
    generated value changes the hash."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
        VersionedTable,
    )

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("ts")
    )
    scratch = _scratch("q155_generated_columns", sf_dir)
    vt = VersionedTable(
        spark,
        os.path.join(scratch, "orders_g"),
        stats_columns=["date_key"],
        generated_columns={
            "date_key": "CAST(date_format(ts, 'yyyyMMdd') AS INT)"
        },
    )
    cuts = ["1997-01-01", "1999-01-01"]  # data spans 1995..2001
    b1 = orders.filter(F.col("ts") < cuts[0]).coalesce(1)
    b2 = orders.filter(
        (F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])
    ).coalesce(1)
    b3 = orders.filter(F.col("ts") >= cuts[1]).coalesce(1)
    vt.write(b1)
    vt.write(b2, mode="append")
    vt.write(b3, mode="append")
    # the generated column's stats prune a date-range read to one file
    pruned = vt.read_pruned("date_key", 19970101, 19981231)
    if len(set(pruned.inputFiles())) != 1:  # the scale property IS the point
        raise AssertionError(
            "date-range read over the generated column should open "
            f"exactly the middle file, opened {len(set(pruned.inputFiles()))}"
        )
    # a batch supplying a WRONG generated value must fail and publish
    # nothing (transactional enforcement)
    head = vt.current_version()
    bad = b1.limit(5).withColumn("date_key", F.lit(11111111))
    try:
        vt.write(bad, mode="append")
        raise AssertionError("wrong generated value was accepted")
    except ConstraintViolationError:
        pass
    if vt.current_version() != head:
        raise AssertionError("violating write published a version")
    # UPDATE on the source column recomputes the generated column
    vt.update_where({"ts": "ts + INTERVAL 400 DAYS"}, "k % 100 = 0")
    return _pin(
        vt.read()
        .groupBy(F.floor(F.col("date_key") / 10000).cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("date_key").cast("long").alias("dk_sum"),
            F.sum("k").cast("long").alias("key_sum"),
        )
    )


@query(
    "q156_clustered_table_maintenance",
    """
    WITH t AS (
      SELECT o_custkey % 64 AS a, o_totalprice AS p FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           CAST(SUM(a) AS BIGINT) AS sum_a
    FROM t
    WHERE a BETWEEN 8 AND 24 AND p BETWEEN 100000 AND 200000
    """,
)
def q156_clustered_table_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY as versioned-table state (operators/versioned.py::
    clustered_columns — Delta's liquid-clustering surface): orders land
    as arbitrary unclustered batches into a table DECLARED clustered on
    (a, p) — two columns whose domains are SF-independent (a residue
    class and totalprice), so the predicate is meaningful at every
    scale factor; plain maintenance — compact() with NO layout
    arguments — applies the declared Morton layout. The query ASSERTS
    (raises — the scale property IS the point) that the unclustered
    landing prunes nothing (every file spans both domains) while the
    maintained read opens at most 12 of 16 files; the oracle replays
    the predicate relationally, so a layout pass that loses or
    duplicates rows hash-mismatches."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    scratch = _scratch("q156_clustered_table_maintenance", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 64).alias("a"),
        F.col("o_totalprice").alias("p"),
    )
    vt = VersionedTable(
        spark,
        os.path.join(scratch, "orders_c"),
        stats_columns=["a", "p"],
        cluster_by=["a", "p"],
    )
    # unclustered landings: round-robin slices, every file spans both domains
    vt.write(orders.repartition(8))
    vt.write(orders.limit(0), mode="append")  # empty batch: policy survives
    preds = [("a", 8, 24), ("p", 100_000.0, 200_000.0)]
    before = set(vt.read_pruned_multi(preds).inputFiles())
    if len(before) != 8:  # unclustered: nothing prunes
        raise AssertionError(
            f"expected all 8 unclustered files kept, got {len(before)}"
        )
    vt.compact(target_files=16)  # no layout args: CLUSTER BY applies
    pruned = vt.read_pruned_multi(preds)
    opened = set(pruned.inputFiles())
    if len(opened) > 12:  # the scale property IS the point
        raise AssertionError(
            f"clustered read opened {len(opened)}/16 files, expected <=12"
        )
    return _pin(
        pruned.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("p"), "sum_price"),
            F.sum("a").cast("long").alias("sum_a"),
        )
    )


@query(
    "q157_format_api_versioned_read",
    """
    WITH t AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p
      FROM orders
    )
    SELECT 'v2_snapshot' AS leg, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(COALESCE(SUM(CAST(p AS DECIMAL(18,6))), 0) AS DOUBLE) AS sum_price
    FROM t WHERE k % 4 <= 1
    UNION ALL
    SELECT 'head_eq', COUNT(*), CAST(COALESCE(SUM(k), 0) AS BIGINT),
           CAST(COALESCE(SUM(CAST(p AS DECIMAL(18,6))), 0) AS DOUBLE)
    FROM t WHERE k = 7
    UNION ALL
    SELECT 'head_in', COUNT(*), CAST(COALESCE(SUM(k), 0) AS BIGINT),
           CAST(COALESCE(SUM(CAST(p AS DECIMAL(18,6))), 0) AS DOUBLE)
    FROM t WHERE k IN (5, 10)
    """,
)
def q157_format_api_versioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The format-API READ path (streaming/versioned_source.py
    _VersionedBatchReader — a versioned table as a first-class Spark
    source, Delta's versionAsOf + data-skipping through the public
    DataFrameReader): orders land as four residue-class files (k % 4)
    across four commits with stats+bloom on k, then are read back ONLY
    through ``spark.read.format("versioned_table")`` — a version=2
    time travel (residues 0-1), a pushed equality (bloom-probed), and
    a pushed IN list (probed per value). The query ASSERTS (raises —
    the scale property IS the point) that the pushdown planner opens
    at most 2 of 4 files for the equality, ZERO for an absent key, at
    most 2 for the IN list, and exactly 2 for the version-2 snapshot.
    The oracle replays all three legs relationally — a reader that
    loses rows to mis-pruning, resurrects the other snapshot's rows,
    or misapplies the version option hash-mismatches."""
    from pyspark.sql.datasource import EqualTo, In

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _VersionedBatchReader,
    )

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q157_format_api_versioned_read", sf_dir)
    table = os.path.join(scratch, "orders_v")
    vt = VersionedTable(
        spark, table, stats_columns=["k"], bloom_columns=["k"]
    )
    for r in range(4):  # residue classes defeat min/max pruning (q152)
        part = orders.filter(F.col("k") % 4 == r).coalesce(1)
        vt.write(part, mode="append" if r else "overwrite")
    schema = vt.read().schema

    # pushdown planning, asserted on the SAME reader the format API
    # instantiates (deterministic regardless of session conf):
    rd = _VersionedBatchReader(table, schema, None)
    list(rd.pushFilters([EqualTo(("k",), 7)]))
    n = len(rd.partitions())
    if not 1 <= n <= 2:  # one true file + at most one bloom fp
        raise AssertionError(f"k=7 pushdown planned {n}/4 files, expected <=2")
    rd = _VersionedBatchReader(table, schema, None)
    list(rd.pushFilters([EqualTo(("k",), 10**12)]))
    if rd.partitions():  # absent key: bloom proves every file misses
        raise AssertionError("absent-key pushdown should plan zero files")
    rd = _VersionedBatchReader(table, schema, None)
    list(rd.pushFilters([In(("k",), (5, 10**12, 10))]))
    n = len(rd.partitions())
    if not 1 <= n <= 3:  # two true files (5%4=1, 10%4=2) + rare fps
        raise AssertionError(f"IN pushdown planned {n}/4 files, expected <=3")
    rd = _VersionedBatchReader(table, schema, 2)
    if len(rd.partitions()) != 2:  # version 2 = exactly the 2 early files
        raise AssertionError("version=2 snapshot should plan exactly 2 files")

    # the data legs run through the PUBLIC reader only
    spark.dataSource.register(VersionedTableStreamDataSource)
    # session conf is SHARED state — other bench queries run on this
    # session after us, so the pushdown toggle is saved and restored
    # (safe because _pin materializes eagerly before the finally runs)
    _PD_KEY = "spark.sql.python.filterPushdown.enabled"
    try:
        prior_pd = spark.conf.get(_PD_KEY)
    except Exception:
        prior_pd = None
    spark.conf.set(_PD_KEY, "true")
    try:
        # NB: DataFrameReader is mutable — one reader per read
        early = (
            spark.read.format("versioned_table")
            .option("path", table)
            .option("version", 2)
            .load()
        )
        head = (
            spark.read.format("versioned_table").option("path", table).load()
        )

        def leg(label: str, df: DataFrame) -> DataFrame:
            return df.agg(
                F.lit(label).alias("leg"),
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("key_sum"),
                F.coalesce(
                    F.sum(F.col("p").cast("decimal(18,6)")),
                    F.lit(0).cast("decimal(18,6)"),
                ).cast("double").alias("sum_price"),
            )

        return _pin(
            leg("v2_snapshot", early)
            .unionByName(leg("head_eq", head.filter("k = 7")))
            .unionByName(leg("head_in", head.filter("k IN (5, 10)")))
        )
    finally:
        if prior_pd is None:
            spark.conf.unset(_PD_KEY)
        else:
            spark.conf.set(_PD_KEY, prior_pd)


@query(
    "q166_delta_mirror",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    batch AS (
      SELECT x AS k, 'X' AS s, CAST(x AS DOUBLE) / 10 AS p
      FROM range(1000, 3000) t(x)
    ),
    merged AS (
      SELECT k, s, p FROM batch
      UNION ALL
      SELECT k, s, p FROM base WHERE k NOT IN (SELECT k FROM batch)
    ),
    final AS (SELECT * FROM merged WHERE k % 10 <> 7)
    SELECT s,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM final GROUP BY s
    """,
)
def q166_delta_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Delta mirror, verified through the code-disjoint
    FOREIGN reader (operators/delta_export.py::export_delta_incremental
    + tools/delta_foreign_reader.py): a versioned orders table goes
    through two appends, then is mirrored (Delta commit 0 = snapshot),
    then a MERGE and a deletion-vector DELETE land and a second sync
    emits ONE Delta commit per new source version — add/remove actions
    and a same-path DV re-add, O(changed files), not a re-export. The
    final mirror state is read back by the independent public-protocol
    parser (log replay, DV roaring decode) and aggregated; the oracle
    replays the same end state relationally, so the WHOLE chain —
    engine DML → incremental protocol emission → foreign byte-level
    read — is hash-pinned. In-query assertions: exactly one Delta
    commit per sync'd source version, and the DV delete surfaced as a
    deletion vector (not a rewrite) in the mirror."""
    import importlib.util

    from modular_etl_data_platform_spark.operators.delta_export import (
        export_delta_incremental,
    )
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    spec = importlib.util.spec_from_file_location(
        "delta_foreign_reader",
        os.path.join(repo_root, "tools", "delta_foreign_reader.py"),
    )
    fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fr)

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q166_delta_mirror", sf_dir)
    table = os.path.join(scratch, "orders_v")
    dest = os.path.join(scratch, "mirror")
    vt = VersionedTable(spark, table, stats_columns=["k"])
    vt.write(orders.filter(F.col("k") % 2 == 0).coalesce(1))  # v1
    vt.write(orders.filter(F.col("k") % 2 == 1).coalesce(1), mode="append")  # v2
    if export_delta_incremental(vt, dest) != 2:  # snapshot = commit 0
        raise AssertionError("first sync should mirror source v2")
    batch = spark.range(1000, 3000).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id").cast("double") / 10).alias("p"),
    )
    vt.upsert(batch, ["k"])  # v3
    vt.delete_where("k % 10 = 7")  # v4: deletion vector
    if export_delta_incremental(vt, dest) != 4:
        raise AssertionError("second sync should mirror source v4")
    log_dir = os.path.join(dest, "_delta_log")
    commits = sorted(
        n for n in os.listdir(log_dir) if n.endswith(".json") and n[0].isdigit()
    )
    if len(commits) != 3:  # snapshot + one per new source version
        raise AssertionError(
            f"expected 3 mirror commits (snapshot + v3 + v4), got {commits}"
        )
    info = fr.snapshot_info(dest)
    if info["num_deletion_vectors"] < 1:
        raise AssertionError("the DV delete must mirror as a deletion vector")
    # fold the mirror PER FILE arrow-side (decimal-exact sums, one file
    # resident at a time) — the bounded-memory reconciliation shape;
    # only the per-group partials ever cross into Spark
    import pyarrow as pa
    import pyarrow.compute as pc

    partials = []
    for _rel, tbl in fr.iter_delta_file_tables(dest):
        dec = tbl.set_column(
            tbl.column_names.index("p"),
            "p",
            pc.cast(tbl.column("p"), pa.decimal128(18, 6)),
        )
        partials.append(
            dec.group_by(["s"]).aggregate(
                [("k", "sum"), ("k", "count"), ("p", "sum")]
            )
        )
    grouped = (
        pa.concat_tables(partials)
        .group_by(["s"])
        .aggregate([("k_sum", "sum"), ("k_count", "sum"), ("p_sum", "sum")])
    )
    out = spark.createDataFrame(
        [
            (
                r["s"],
                int(r["k_count_sum"]),
                int(r["k_sum_sum"]),
                float(r["p_sum_sum"]),
            )
            for r in grouped.to_pylist()
        ],
        "s string, n_rows long, key_sum long, sum_price double",
    )
    return _pin(out)


@query(
    "q170_mirror_change_feed",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    s2 AS (  -- state after the v2 MERGE
      SELECT k, CASE WHEN k % 4 = 0 THEN p + 50 ELSE p END AS p FROM base
      UNION ALL
      SELECT -(k + 1), p FROM base WHERE k % 9 = 0
    ),
    changes AS (
      SELECT 0 AS _commit_version, 'insert' AS _change_type, k, p FROM base
      UNION ALL
      SELECT 1, 'update_postimage', k, p + 50 FROM base WHERE k % 4 = 0
      UNION ALL
      SELECT 1, 'insert', -(k + 1), p FROM base WHERE k % 9 = 0
      UNION ALL
      SELECT 2, 'delete', k, p FROM s2 WHERE k % 10 = 2
    )
    SELECT _commit_version, _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM changes GROUP BY _commit_version, _change_type
    """,
)
def q170_mirror_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mirror's REAL Delta change data feed, verified through the
    code-disjoint foreign reader (operators/delta_export.py::
    export_delta_incremental(primary_keys=...) + tools/
    delta_foreign_reader.py::iter_change_feed): a versioned orders
    table goes through a MERGE (updates + inserts), a pure DV DELETE
    and a compaction; the mirror — created with ``primary_keys`` so
    CDF is on — writes ``_change_data`` parquet + ``cdc`` actions for
    the update-class versions (classified by the SAME engine code as
    the streaming feed), declares ``delta.enableChangeDataFeed``, and
    the independent public-protocol parser replays the feed: recorded
    cdc for update-class commits, derived inserts for blind appends,
    zero rows for the compaction. Aggregation folds PER SLICE arrow-
    side (decimal-exact sums, one file resident at a time — the
    bounded-memory reconciliation shape), and the oracle replays the
    whole history relationally, so engine DML → CDC emission → foreign
    byte-level CDF read is hash-pinned end to end. In-query
    assertions: cdc actions exactly on the update-class mirror
    commits, foreign per-version (rows, key-sum) groups equal to the
    engine's own ``table_changes``, and the compaction emits zero."""
    import importlib.util
    import json as _json

    from modular_etl_data_platform_spark.operators.delta_export import (
        export_delta_incremental,
    )
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    spec = importlib.util.spec_from_file_location(
        "delta_foreign_reader",
        os.path.join(repo_root, "tools", "delta_foreign_reader.py"),
    )
    fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fr)

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    scratch = _scratch("q170_mirror_change_feed", sf_dir)
    table = os.path.join(scratch, "orders_v")
    dest = os.path.join(scratch, "mirror")
    vt = VersionedTable(spark, table, stats_columns=["k"])
    vt.write(orders.coalesce(1))  # v1
    export_delta_incremental(vt, dest, primary_keys=["k"])  # delta 0
    batch = (
        orders.filter(F.col("k") % 4 == 0).withColumn(
            "p", F.col("p") + F.lit(50)
        )
    ).unionByName(
        orders.filter(F.col("k") % 9 == 0).select(
            (-(F.col("k") + 1)).alias("k"), F.col("s"), F.col("p")
        )
    )
    vt.upsert(batch.coalesce(1), ["k"])  # v2: MERGE
    vt.delete_where("k % 10 = 2")  # v3: pure DV delete
    vt.compact(target_files=1)  # v4: dataChange=false
    export_delta_incremental(vt, dest)

    log_dir = os.path.join(dest, "_delta_log")
    has_cdc = {}
    for dv in range(4):
        with open(os.path.join(log_dir, f"{dv:020d}.json")) as f:
            has_cdc[dv] = any(
                "cdc" in _json.loads(ln) for ln in f if ln.strip()
            )
    if has_cdc != {0: False, 1: True, 2: True, 3: False}:
        raise AssertionError(
            f"cdc actions on the wrong mirror commits: {has_cdc}"
        )

    # fold the feed per slice (arrow, decimal-exact) — bounded memory
    import pyarrow as pa
    import pyarrow.compute as pc

    partials = []
    for slice_tbl in fr.iter_change_feed(dest):
        dec = slice_tbl.set_column(
            slice_tbl.column_names.index("p"),
            "p",
            pc.cast(slice_tbl.column("p"), pa.decimal128(18, 6)),
        )
        partials.append(
            dec.group_by(["_commit_version", "_change_type"]).aggregate(
                [("k", "sum"), ("k", "count"), ("p", "sum")]
            )
        )
    grouped = (
        pa.concat_tables(partials)
        .group_by(["_commit_version", "_change_type"])
        .aggregate([("k_sum", "sum"), ("k_count", "sum"), ("p_sum", "sum")])
    )
    rows = grouped.to_pylist()
    by_feed = {
        (r["_commit_version"], r["_change_type"]): (
            r["k_count_sum"],
            r["k_sum_sum"],
        )
        for r in rows
    }
    if any(v == 3 for v, _ in by_feed):
        raise AssertionError("compaction (delta 3) emitted change rows")
    # foreign classification == the engine's own table_changes
    for src_v in (2, 3):
        eng = {
            (src_v - 1, r["_change_type"]): (r["n"], r["ks"])
            for r in vt.table_changes(src_v - 1, src_v, ["k"])
            .groupBy("_change_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("k").cast("long").alias("ks"),
            )
            .collect()
        }
        for key, val in eng.items():
            if by_feed.get(key) != val:
                raise AssertionError(
                    f"foreign CDF {key}: {by_feed.get(key)} != engine {val}"
                )
    out = spark.createDataFrame(
        [
            (
                int(r["_commit_version"]),
                r["_change_type"],
                int(r["k_count_sum"]),
                int(r["k_sum_sum"]),
                float(r["p_sum_sum"]),
            )
            for r in rows
        ],
        "_commit_version int, _change_type string, n_rows long, "
        "key_sum long, sum_price double",
    )
    return _pin(out)
