"""Named query catalog: one entry per implemented operator (SURVEY §2).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus an
equivalent ANSI SQL string for the DuckDB oracle. Conventions that keep
the two engines hash-identical:

- **Exact aggregation**: doubles are cast to ``DECIMAL(18,6)`` *before*
  SUM/AVG in both engines. Decimal sums are exact and order-independent;
  float sums are not (parallel summation order differs), so raw
  ``SUM(double)`` would differ in the last bits between Spark and DuckDB.
  Final values are cast back to DOUBLE (sum) or divided by COUNT (avg) —
  deterministic once the decimal sum is exact.
- **Deterministic top-k**: every LIMIT is preceded by a total order
  (unique tie-break key).
- **Deterministic windows**: every row_number/rank orders by a unique key
  suffix.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.dedup import dedupe_latest, duplicate_keys
from modular_etl_data_platform_spark.operators.joins import asof_join, ri_orphans
from modular_etl_data_platform_spark.operators.date_dim import build_dim_date
from modular_etl_data_platform_spark.operators.scd2 import scd2_from_history
from modular_etl_data_platform_spark.functions.scalar import format_phone


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with a session-zone TIMESTAMP ``ts`` regardless
    of how the file stores it. Generations of the driver testdata have
    shipped ``ts`` as TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects — needs ``nanosAsLong`` + floor to micros, the same coercion
    DuckDB applies) and as plain TIMESTAMP_NTZ micros (readable directly).
    Adapt on the observed type so both engines always see identical values:
    the session zone is UTC, so NTZ -> LTZ is value-preserving."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type in ("long", "integer"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def dsum(col, alias: str, scale: int = 6):
    """Exact, engine-portable sum of a double column (see module docstring)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col, alias: str, scale: int = 6):
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)
    ).alias(alias)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5 A1/A2) — flagship pricing summary
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-aggregate pricing summary (TPC-H Q1 shape; A1/A2).

    Scale: partial aggregation map-side, single shuffle on the 2-column
    group key (6 groups) — the canonical Spark hash-agg plan.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Scan / filter / projection (S3, P1, T8)
# ---------------------------------------------------------------------------


@query(
    "q02_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_quantity > 45
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed to the parquet scan (P1, per-row T8
    arithmetic stays double: IEEE ops are deterministic per row)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        "l_returnflag",
    )


# ---------------------------------------------------------------------------
# Star joins (J7) + broadcast dimension chain
# ---------------------------------------------------------------------------


@query(
    "q03_star_join_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q03_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join chain (J7) with broadcast dims.

    Scale: nation/region/customer broadcast (no shuffle of lineitem for
    them); the only big shuffle is lineitem⋈orders on orderkey, which AQE
    converts to broadcast at small SF and sort-merge at 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Sort + deterministic top-k (§2.7)
# ---------------------------------------------------------------------------


@query(
    "q04_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q04_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort materialized)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Dedup keep-latest (W1) on the events stream table
# ---------------------------------------------------------------------------


@query(
    "q05_dedup_latest",
    """
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def q05_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keep-latest (W1) via the engine's dedupe_latest operator."""
    ev = _t(spark, sf_dir, "events")
    return dedupe_latest(ev, ["user_id"], "ts", tiebreakers=["event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Ranking window (W3)
# ---------------------------------------------------------------------------


@query(
    "q06_window_topn_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def q06_window_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-n via ranking window (W3); single shuffle on the key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# Anti / semi joins (J5 referential integrity)
# ---------------------------------------------------------------------------


@query(
    "q07_anti_join_customers_no_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q07_anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti orphan detection (J5) via the engine's ri_orphans."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return ri_orphans(c, o, fk="c_custkey", pk="o_custkey").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q08_semi_join_active_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS active_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q08_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")).dropDuplicates(), "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


# ---------------------------------------------------------------------------
# Date dimension generator (G1/C6)
# ---------------------------------------------------------------------------


def _holiday_case_sql() -> tuple[str, str]:
    """(is_holiday expr, holiday_name expr) for the DuckDB oracle, built
    from the SAME packaged calendar the Spark query uses."""
    from modular_etl_data_platform_spark.operators.date_dim import (
        load_holiday_calendar,
    )

    cal = load_holiday_calendar()
    in_list = ", ".join(f"DATE '{d}'" for d in cal)
    whens = " ".join(
        f"WHEN DATE '{d}' THEN '{n.replace(chr(39), chr(39) * 2)}'"
        for d, n in cal.items()
    )
    return f"date IN ({in_list})", f"CASE date {whens} END"


_IS_HOLIDAY_SQL, _HOLIDAY_NAME_SQL = _holiday_case_sql()


@query(
    "q09_date_dim",
    f"""
    WITH dates AS (
      SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2026-12-31', INTERVAL 1 DAY)) AS DATE) AS date
    )
    SELECT CAST(strftime(date, '%Y%m%d') AS INT) AS date_key,
           date,
           CAST(year(date) AS INT) AS year,
           CAST(quarter(date) AS INT) AS quarter,
           CAST(month(date) AS INT) AS month,
           monthname(date) AS month_name,
           CAST(day(date) AS INT) AS day_of_month,
           CAST(dayofweek(date) + 1 AS INT) AS day_of_week,
           dayname(date) AS day_name,
           CAST(weekofyear(date) AS INT) AS week_of_year,
           dayofweek(date) IN (0, 6) AS is_weekend,
           {_IS_HOLIDAY_SQL} AS is_holiday,
           {_HOLIDAY_NAME_SQL} AS holiday_name,
           CAST(year(date) AS INT) AS fiscal_year,
           CAST(quarter(date) AS INT) AS fiscal_quarter,
           CAST(month(date) AS INT) AS fiscal_period
    FROM dates
    """,
)
def q09_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension 2024-01-01 → 2026-12-31 (1,096 rows; G1/C6)
    with the config-driven US-federal holiday calendar applied
    (is_holiday/holiday_name; reference pins is_holiday false —
    gold_dim_date_schema.json:96 — pending exactly this calendar).

    DuckDB ``dayofweek`` is 0=Sunday..6; Spark is 1=Sunday..7 — the oracle
    shifts by +1 (the reference's own description/formula mismatch is
    documented at functions/scalar.py::is_weekend).
    """
    from modular_etl_data_platform_spark.operators.date_dim import (
        load_holiday_calendar,
    )

    return build_dim_date(
        spark, "2024-01-01", "2026-12-31", holidays=load_holiday_calendar()
    )


# ---------------------------------------------------------------------------
# SCD Type 2 built from a change stream (C4 semantics, SQL-checkable)
# ---------------------------------------------------------------------------


@query(
    "q10_scd2_versions",
    """
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                             '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 00:00:00.000000') AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL AS is_current,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INT) AS version,
           event_type AS attr
    FROM events
    WHERE event_type IN ('signup', 'purchase', 'error')
    """,
)
def q10_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 version chains from a change history (C4): valid_from/valid_to
    intervals, exactly one current row per key — the Gold invariants
    (reference: config/gold/schema/README.md:345-357) hold by construction.

    The output intervals are STRING-formatted (micros precision): the
    ``HIGH_DATE`` sentinel ``9999-12-31`` stays internal, but a
    pandas-based consumer (like the driver's canonicalizer) cannot hold
    it as a nanosecond timestamp — out-of-bounds — so the query surface
    ships strings and keeps the timestamp form an implementation detail."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    out = scd2_from_history(
        ev,
        keys=["user_id"],
        change_time="ts",
        attr_cols={"attr": "event_type"},
        tiebreakers=["event_id"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
        "version",
        "attr",
    )


# ---------------------------------------------------------------------------
# As-of join (J1 as-of variant)
# ---------------------------------------------------------------------------


@query(
    "q11_asof_join",
    """
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.best_ts AS asof_ts, r.best_value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    LEFT JOIN LATERAL (
      SELECT e.ts AS best_ts, e.value AS best_value
      FROM events e
      WHERE e.event_type = 'error' AND e.user_id = l.user_id AND e.ts <= l.ts
      ORDER BY e.ts DESC, e.event_id DESC
      LIMIT 1
    ) r ON TRUE
    """,
)
def q11_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click joined to the user's latest error at-or-before
    it (J1 as-of variant). Uses the linear union+window formulation — no
    pair expansion (see operators/joins.py::asof_join)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts"), F.col("value"), F.col("event_id").alias("err_id")
    )
    joined = asof_join(
        clicks,
        errors.withColumnRenamed("ts", "err_ts").withColumnRenamed("value", "err_value"),
        on="user_id",
        left_time="ts",
        right_time="err_ts",
        value_cols=["err_ts", "err_value"],
        tiebreaker="err_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_err_ts").alias("asof_ts"),
        F.col("asof_err_value").alias("asof_value"),
    )


# ---------------------------------------------------------------------------
# Declarative DQ validation (C3 / P4-P7 / A7)
# ---------------------------------------------------------------------------


@query(
    "q12_dq_metrics",
    """
    SELECT
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey_fails,
      CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 1 ELSE 0 END) AS BIGINT) AS status_domain_fails,
      CAST(SUM(CASE WHEN NOT (o_totalprice >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_range_fails,
      CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS priority_format_fails,
      COUNT(*) AS total_rows
    FROM orders
    """,
)
def q12_dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule engine (C3): null/set/range/regex rules compiled to
    Columns, pass/fail metrics aggregated in one pass (A7)."""
    from modular_etl_data_platform_spark.operators.validate import RuleSet

    rules = RuleSet.from_config(
        {
            "null_checks": ["o_custkey"],
            "value_constraints": {
                "o_orderstatus": ["O", "F", "P"],
                "o_totalprice": ">= 0",
            },
            "format_validations": {"o_orderpriority": "^[1-5]-"},
        }
    )
    df = _t(spark, sf_dir, "orders")
    return rules.metrics_wide(
        df,
        alias_map={
            "null_check:o_custkey": "null_custkey_fails",
            "value_constraint:o_orderstatus": "status_domain_fails",
            "value_constraint:o_totalprice": "totalprice_range_fails",
            "format_validation:o_orderpriority": "priority_format_fails",
        },
    )


# ---------------------------------------------------------------------------
# Uniqueness audit (A6)
# ---------------------------------------------------------------------------


@query(
    "q13_uniqueness_audit",
    """
    SELECT l_orderkey, COUNT(*) AS dup_count
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) > 1
    """,
)
def q13_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return duplicate_keys(li, ["l_orderkey"])


# ---------------------------------------------------------------------------
# Semi-additive aggregation (A5): last value per key, then aggregate
# ---------------------------------------------------------------------------


@query(
    "q14_semi_additive_last",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_last_value,
           COUNT(*) AS n_users
    FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    GROUP BY event_type
    """,
)
def q14_semi_additive_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive measure (A5): LAST across time per (user, type), SUM
    across users (reference: config/gold/schema/README.md:255-261)."""
    ev = _t(spark, sf_dir, "events")
    last = dedupe_latest(ev, ["user_id", "event_type"], "ts", tiebreakers=["event_id"])
    return last.groupBy("event_type").agg(
        dsum(F.col("value"), "sum_last_value"),
        F.count(F.lit(1)).alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Incremental watermark filter (P3)
# ---------------------------------------------------------------------------


@query(
    "q15_incremental_filter",
    """
    SELECT event_type, COUNT(*) AS new_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
    """,
)
def q15_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-style incremental filter (P3): only rows after the stored
    high-water mark are processed (partition-pruned when the layout is
    partitioned by the watermark column)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("new_events"),
        dsum(F.col("value"), "sum_value"),
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


@query(
    "q16_set_ops",
    """
    SELECT c_custkey FROM (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      EXCEPT
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    ) t
    """,
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT over yearly active-customer sets (§2.7 set ops)."""
    o = _t(spark, sf_dir, "orders")

    def actives(year: int):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    return actives(1995).exceptAll(actives(1996)).distinct()


# ---------------------------------------------------------------------------
# Fact load with PIT dimension resolution (C5: J1+J3+T5+T8)
# ---------------------------------------------------------------------------


@query(
    "q28_fact_pit_load",
    """
    WITH dim AS (
      SELECT user_id, ts AS valid_from,
             COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
             event_type AS attr,
             CAST(ROW_NUMBER() OVER w AS INT) AS version
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT c.event_id, c.user_id, c.ts,
           CAST(strftime(c.ts, '%Y%m%d') AS INT) AS date_key,
           d.attr, d.version,
           c.value * 1.1 AS net_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN dim d
      ON d.user_id = c.user_id AND c.ts >= d.valid_from AND c.ts < d.valid_to
    """,
)
def q28_fact_pit_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fact-load composition (C5): SCD2 dimension built from a change
    history, click facts PIT-joined to the version valid at event time
    (J1), derived yyyyMMdd date key (J3/T5), calculated measure (T8).

    Scale: the dimension is broadcast (pit_join default), so the fact
    table never shuffles — the 100 TB fact-load plan."""
    from modular_etl_data_platform_spark.operators.facts import (
        DimensionLookup,
        load_fact,
    )

    ev = _t(spark, sf_dir, "events")
    dim = scd2_from_history(
        ev.filter(F.col("event_type").isin("signup", "purchase", "error")),
        keys=["user_id"],
        change_time="ts",
        attr_cols={"attr": "event_type"},
        tiebreakers=["event_id"],
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    fact = load_fact(
        clicks,
        lookups=[
            DimensionLookup(
                dim=dim,
                business_key="user_id",
                join_type="point_in_time",
                event_time="ts",
                select=["attr", "version"],
            )
        ],
        date_keys={"date_key": "ts"},
        measures={"net_value": "value * 1.1"},
    )
    return fact.select(
        "event_id", "user_id", "ts", "date_key", "attr", "version", "net_value"
    )


# ---------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP (grouping sets)
# ---------------------------------------------------------------------------


@query(
    "q29_rollup_revenue",
    """
    SELECT c_mktsegment, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
    """,
)
def q29_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — Spark computes all grouping
    sets in one shuffle (Expand + single hash aggregate)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction: JSON props
# ---------------------------------------------------------------------------


@query(
    "q30_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(json_extract_string(props, '$.k')) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attribute extraction from the events props column — stays in
    codegen via get_json_object (no UDF)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# Silver cleansing transformations (P2/T1-T3/T7) as a query
# ---------------------------------------------------------------------------


@query(
    "q31_silver_cleanse",
    r"""
    WITH raw AS (
      SELECT c_custkey,
             '  ' || upper(c_name) || '  ' AS name_raw,
             lower(c_mktsegment) || ' ' AS seg_raw,
             '(' || substr(CAST(1000000000 + c_custkey * 7919 AS VARCHAR), 1, 3) || ') '
               || substr(CAST(1000000000 + c_custkey * 7919 AS VARCHAR), 4, 3) || '-'
               || substr(CAST(1000000000 + c_custkey * 7919 AS VARCHAR), 7, 4)
               || 'x' || CAST(c_custkey % 100 AS VARCHAR) AS phone_raw,
             CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE 'USA' END AS country_raw
      FROM customer
    )
    SELECT c_custkey,
           -- DuckDB has no initcap; our cleansed names are single-word so
           -- first-upper + rest-lower is exactly Spark's initcap here
           upper(substr(trim(name_raw), 1, 1)) || lower(substr(trim(name_raw), 2)) AS name_clean,
           upper(trim(seg_raw)) AS segment_clean,
           CASE WHEN length(regexp_replace(regexp_extract(phone_raw, '^([^xX]*)', 1), '[^0-9]', '', 'g')) >= 10
                THEN concat_ws('-',
                  substr(right(regexp_replace(regexp_extract(phone_raw, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 1, 3),
                  substr(right(regexp_replace(regexp_extract(phone_raw, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 4, 3),
                  substr(right(regexp_replace(regexp_extract(phone_raw, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 7, 4))
                ELSE NULL END AS phone_clean,
           coalesce(country_raw, 'USA') AS country_clean
    FROM raw
    """,
)
def q31_silver_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The silver cleansing contract as a query: trim/initcap/upper (T1),
    coalesce defaults (T2), format_phone (T7 — native regexp composition,
    no UDF), driven through the declarative transformation compiler (P2)."""
    from modular_etl_data_platform_spark.operators.transforms import (
        apply_transformations,
    )

    c = _t(spark, sf_dir, "customer")
    messy = c.selectExpr(
        "c_custkey",
        "concat('  ', upper(c_name), '  ') AS name_raw",
        "concat(lower(c_mktsegment), ' ') AS seg_raw",
        "concat('(', substr(cast(1000000000 + c_custkey * 7919 AS string), 1, 3), ') ',"
        " substr(cast(1000000000 + c_custkey * 7919 AS string), 4, 3), '-',"
        " substr(cast(1000000000 + c_custkey * 7919 AS string), 7, 4),"
        " 'x', cast(c_custkey % 100 AS string)) AS phone_raw",
        "CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE 'USA' END AS country_raw",
    )
    cleaned = apply_transformations(
        messy,
        {
            "name_clean": "initcap(trim(name_raw))",
            "segment_clean": "upper(trim(seg_raw))",
            "phone_clean": "format_phone(phone_raw)",
            "country_clean": "coalesce(country_raw, 'USA')",
        },
    )
    return cleaned.select(
        "c_custkey", "name_clean", "segment_clean", "phone_clean", "country_clean"
    )


# ---------------------------------------------------------------------------
# Per-order derived totals + item counts (A3/A4)
# ---------------------------------------------------------------------------


@query(
    "q32_order_totals_derived",
    """
    SELECT l_orderkey AS o_orderkey,
           COUNT(*) AS item_count,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS derived_total
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q32_order_totals_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-grain rollup of line items: per-order item_count (A3) and the
    derived order total (A4's generator semantics) in one aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    gross = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("item_count"),
        dsum(gross, "derived_total"),
    )


# ---------------------------------------------------------------------------
# Surrogate key allocation (W2)
# ---------------------------------------------------------------------------


@query(
    "q33_surrogate_keys",
    """
    SELECT c_custkey,
           ROW_NUMBER() OVER (ORDER BY c_custkey ASC) AS surrogate_key
    FROM customer
    """,
)
def q33_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense surrogate keys (W2) via the SCALABLE assigner
    (operators/scd2.py::assign_surrogate_keys): range-partitioned ranks +
    broadcast per-partition offsets — numbering identical to a global
    ROW_NUMBER() (the oracle) with no single-partition sort, and
    reproducible across retries unlike monotonically_increasing_id."""
    from modular_etl_data_platform_spark.operators.scd2 import assign_surrogate_keys

    return assign_surrogate_keys(
        _t(spark, sf_dir, "customer").select("c_custkey"),
        ["c_custkey"],
        "surrogate_key",
    )


# ---------------------------------------------------------------------------
# SCD2 as-of and current-version filters (P8/P9)
# ---------------------------------------------------------------------------

_SCD2_DIM_CTE = """
    WITH dim AS (
      SELECT user_id, ts AS valid_from,
             COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
             LEAD(ts) OVER w IS NULL AS is_current,
             CAST(ROW_NUMBER() OVER w AS INT) AS version,
             event_type AS attr
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
"""


def _scd2_events_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    return scd2_from_history(
        ev, keys=["user_id"], change_time="ts",
        attr_cols={"attr": "event_type"}, tiebreakers=["event_id"],
    )


@query(
    "q34_asof_dim_state",
    _SCD2_DIM_CTE
    + """
    SELECT user_id, attr, version
    FROM dim
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND valid_to > TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def q34_asof_dim_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel filter (P9): the dimension state as of a past instant —
    one version per key whose validity interval covers it
    (reference: config/gold/schema/README.md:183-189)."""
    d = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (
        _scd2_events_dim(spark, sf_dir)
        .filter((F.col("valid_from") <= d) & (F.col("valid_to") > d))
        .select("user_id", "attr", "version")
    )


@query(
    "q35_current_dim_rows",
    _SCD2_DIM_CTE
    + """
    SELECT user_id, attr, version
    FROM dim
    WHERE is_current
    """,
)
def q35_current_dim_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-version filter (P8): WHERE is_current — the default BI view
    of an SCD2 dimension (reference: config/gold/schema/README.md:178-181)."""
    return (
        _scd2_events_dim(spark, sf_dir)
        .filter(F.col("is_current"))
        .select("user_id", "attr", "version")
    )


# ---------------------------------------------------------------------------
# format_phone (T7) and RI quarantine (J5/S10)
# ---------------------------------------------------------------------------

# deterministic messy-phone synthesis: the testdata has no phone column, so
# derive 10 digits from the key and render them in the reference's messy raw
# forms ('(518)349-5931x0341', '001-581-896-0013x3890', dotted)
_PHONE_DIGITS_SPARK = "lpad(cast((c_custkey * 7919) % 10000000000 AS string), 10, '0')"
_PHONE_DIGITS_DUCK = "lpad(CAST((c_custkey * 7919) % 10000000000 AS VARCHAR), 10, '0')"


def _messy_phone(d: str) -> str:
    return (
        f"CASE CAST(c_custkey % 3 AS INT) "
        f"WHEN 0 THEN '(' || substr({d},1,3) || ')' || substr({d},4,3) || '-' || substr({d},7,4) || 'x03' "
        f"WHEN 1 THEN '001-' || substr({d},1,3) || '-' || substr({d},4,3) || '-' || substr({d},7,4) || 'X429' "
        f"ELSE substr({d},1,3) || '.' || substr({d},4,3) || '.' || substr({d},7,4) END"
    )


@query(
    "q38_format_phone",
    f"""
    WITH raw AS (SELECT c_custkey, {_messy_phone(_PHONE_DIGITS_DUCK)} AS messy_phone FROM customer)
    SELECT c_custkey, messy_phone,
           CASE WHEN length(regexp_replace(regexp_extract(messy_phone, '^([^xX]*)', 1), '[^0-9]', '', 'g')) >= 10
                THEN concat_ws('-',
                  substr(right(regexp_replace(regexp_extract(messy_phone, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 1, 3),
                  substr(right(regexp_replace(regexp_extract(messy_phone, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 4, 3),
                  substr(right(regexp_replace(regexp_extract(messy_phone, '^([^xX]*)', 1), '[^0-9]', '', 'g'), 10), 7, 4))
                ELSE NULL END AS phone
    FROM raw
    """,
)
def q38_format_phone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_phone (T7) — the reference's single custom function
    (reference: config/silver/schema/README.md:97-99), composed natively
    (regexp strip + substr) so it stays in whole-stage codegen: normalize
    messy forms with extensions/parens/dots to XXX-XXX-XXXX."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "messy_phone", F.expr(_messy_phone(_PHONE_DIGITS_SPARK))
    )
    return cust.select("c_custkey", "messy_phone", format_phone("messy_phone").alias("phone"))


@query(
    "q39_ri_quarantine",
    """
    SELECT o_orderkey,
           CAST(o_custkey AS VARCHAR) AS failed_value,
           'orders' AS rule_table,
           'fk_customer_id' AS rule_name,
           'error' AS severity
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal >= 0)
    """,
)
def q39_ri_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity quarantine (J5 → S10): anti-join orders
    against the valid-customer set (here: non-negative balance), emitting
    the error-table shape — table, rule, failed value, severity (reference:
    config/silver/schema/README.md:124-135, 291-308). Broadcast the parent
    key set; at 100 TB the anti-join stays shuffle-free."""
    orders = _t(spark, sf_dir, "orders")
    valid = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    return ri_orphans(orders, valid, fk="o_custkey", pk="c_custkey").select(
        "o_orderkey",
        F.col("o_custkey").cast("string").alias("failed_value"),
        F.lit("orders").alias("rule_table"),
        F.lit("fk_customer_id").alias("rule_name"),
        F.lit("error").alias("severity"),
    )


@query(
    "q40_windowed_event_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q40_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event-time aggregation — the batch twin of the
    streaming operator (streaming/incremental.py::windowed_event_counts,
    watermark bounds state in stream mode; a no-op here). Window start ==
    date_trunc('hour'), so the oracle is plain SQL."""
    from modular_etl_data_platform_spark.streaming.incremental import (
        windowed_event_counts,
    )

    return windowed_event_counts(_t(spark, sf_dir, "events"))


@query(
    "q41_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q41_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in one pass: GROUPING SETS (status×priority,
    status, grand total) with a distinct-count — Spark expands the sets
    into one shuffle instead of three scans. The reference has no grouping
    sets; free capability exposed (SURVEY §2.5 note). NULL group labels are
    coalesced to 'ALL' so they can't collide with data values (statuses
    are never NULL in this corpus)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "n_customers",
            "revenue",
        )
    )


@query(
    "q42_sessionization",
    """
    WITH e AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q42_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with the native ``session_window``
    aggregation (30-minute inactivity gap; window end = last event + gap,
    half-open). One shuffle on the session key — the batch twin of the
    stateful-streaming sessionizer (streaming/incremental.py::
    sessionize_events); the oracle is the classic gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q43_percentiles",
    """
    SELECT o_orderstatus AS status,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q43_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark's
    ``percentile`` matches DuckDB ``quantile_cont`` bit-for-bit. At 100 TB
    switch to ``approx_percentile`` (t-digest sketch, mergeable map-side);
    the exact form is the oracle-checkable baseline."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


@query(
    "q44_pivot",
    """
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS rev_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q44_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): revenue by priority × status. Explicit pivot
    values keep it one pass with no distinct-values pre-query — the rule
    at scale (an unvalued pivot first scans for the column domain)."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double"))
    )
    return piv.select(
        "priority",
        F.col("F").alias("rev_f"),
        F.col("O").alias("rev_o"),
        F.col("P").alias("rev_p"),
    )


@query(
    "q54_user_moving_stats",
    """
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mov_avg_4,
           CAST(ROW_NUMBER() OVER w AS INT) AS seq
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q54_user_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frames per user stream: lag/lead neighbours and a
    4-row trailing moving average (sum in decimal, divided by the frame
    count, so accumulation order can't drift between engines). One
    shuffle on user_id; all frames reuse that single sort."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-3, 0)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
        ).alias("mov_avg_4"),
        F.row_number().over(w).cast("int").alias("seq"),
    )


@query(
    "q55_skewed_distinct_count",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_user_id
    FROM events
    GROUP BY event_type
    """,
)
def q55_skewed_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group via the two-stage salted
    aggregation (operators/skew.py): partial distinct on
    (group, hash(value) % salt) then merge — a hot group's values spread
    over `salt` tasks instead of funneling into one. Same answer as the
    naive form (the oracle is plain COUNT(DISTINCT)); the shape is what
    survives a skewed 100 TB event stream."""
    from modular_etl_data_platform_spark.operators.skew import salted_distinct_count

    e = _t(spark, sf_dir, "events")
    return salted_distinct_count(e, "event_type", "user_id")


@query(
    "q57_rollup_cascade",
    """
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS bucket, event_type,
             COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS total
      FROM events GROUP BY 1, 2
    ),
    hour AS (
      SELECT date_trunc('hour', bucket) AS bucket, event_type,
             SUM(n) AS n, SUM(total) AS total
      FROM minute GROUP BY 1, 2
    ),
    day AS (
      SELECT date_trunc('day', bucket) AS bucket, event_type,
             SUM(n) AS n, SUM(total) AS total
      FROM hour GROUP BY 1, 2
    )
    SELECT 'minute' AS grain, bucket, event_type,
           CAST(n AS BIGINT) AS n, CAST(total AS DOUBLE) AS total FROM minute
    UNION ALL
    SELECT 'hour', bucket, event_type, CAST(n AS BIGINT), CAST(total AS DOUBLE) FROM hour
    UNION ALL
    SELECT 'day', bucket, event_type, CAST(n AS BIGINT), CAST(total AS DOUBLE) FROM day
    """,
)
def q57_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: minute → hour → day,
    each grain RE-AGGREGATED from the next finer grain rather than the raw
    events (counts and decimal sums are mergeable partials, so the cascade
    is exact — the oracle proves it). At 100 TB this is the only sane
    shape: the hour rollup reads minute-level rows (~1/60th of raw), the
    day rollup ~1/24th of that, and each level is incrementally
    maintainable from new partitions alone."""
    e = _t(spark, sf_dir, "events")

    def lift(df, trunc: str):
        return df.groupBy(
            F.date_trunc(trunc, "bucket").alias("bucket"), F.col("event_type")
        ).agg(F.sum("n").alias("n"), F.sum("total").alias("total"))

    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
    )
    minute = minute.cache()
    hour = lift(minute, "hour").cache()
    day = lift(hour, "day")

    def out(df, grain: str):
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("double").alias("total"),
        )

    return out(minute, "minute").unionByName(out(hour, "hour")).unionByName(
        out(day, "day")
    )


@query(
    "q61_salted_skew_join",
    """
    WITH dim AS (
      SELECT DISTINCT user_id, user_id % 5 AS tier FROM events
    )
    SELECT tier,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN dim USING (user_id)
    GROUP BY tier
    """,
)
def q61_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe many-to-one join via explicit salting
    (operators/skew.py::salted_join): the hot keys of the fact side are
    scattered over 8 salt values, the one-row-per-key dim side is
    replicated 8×, and the join runs on (key, salt) — a single hot key's
    rows land on 8 tasks instead of one. Results are EXACTLY the plain
    join's (the oracle is the unsalted form); broadcast is disabled for
    the join so the salted shuffle path is what actually executes, which
    is the regime this operator exists for (dim too big to broadcast,
    fact keys skewed)."""
    from modular_etl_data_platform_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events").select("user_id", "value")
    dim = (
        e.select("user_id")
        .dropDuplicates()
        .withColumn("tier", F.col("user_id") % 5)
    )
    joined = salted_join(
        e.hint("merge"), dim.hint("merge"), on="user_id", salt=8
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


def q56_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregations for interactive scale: HyperLogLog++ distinct
    users and t-digest quantiles per event type. Both are mergeable
    map-side sketches — constant memory per task, one tiny shuffle of
    sketch buffers, no sort — the 100 TB replacement for q55/q43's exact
    forms when ±2% is acceptable. NOT registered in the driver catalog
    AS-IS: no cross-engine oracle exists for the raw estimates (DuckDB's
    HLL/quantile sketches are a different implementation), so this entry
    would be permanently-red. The accuracy CONTRACT is driver-gated
    instead via :func:`q118_sketch_bounds` (bounds evaluated Spark-side
    as booleans, exact counts cross-checked); the tighter numeric bounds
    stay pytest-pinned in ``tests/test_catalog.py``."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.to_json(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
        ).alias("value_quantiles"),
    )


@query(
    "q118_sketch_bounds",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_bound,
           TRUE AS quantiles_within_bound
    FROM events GROUP BY event_type
    """,
)
def q118_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable contract for the q56 sketches. Sketch ESTIMATES
    can't be hash-compared cross-engine (DuckDB's HLL/quantile sketches
    are different implementations), but the accuracy CONTRACT can: the
    Spark side evaluates the bounds as booleans — HLL++ distinct within
    5% (2.5× the configured rsd) of the exact count, approx p50/p90/p99
    ordered, inside the value range, and p50 within 1% of the exact
    median — and the oracle asserts literal TRUE alongside the genuinely
    cross-checked exact counts. A sketch drifting out of contract at any
    SF turns a boolean FALSE and reds the driver gate; the tighter
    numeric bounds stay pytest-pinned (test_approx_sketches_bounded_by_exact).
    Scale: both sketches are mergeable map-side buffers — constant memory
    per task, one tiny shuffle — the 100 TB replacement for exact
    countDistinct/percentile when ±2% is acceptable."""
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__est"),
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("__aq"),
        F.expr("percentile(value, 0.5)").alias("__p50"),
        F.min("value").alias("__lo"),
        F.max("value").alias("__hi"),
    )
    hll_ok = (
        F.abs(F.col("__est") - F.col("exact_users"))
        <= F.greatest(F.lit(2.0), 0.05 * F.col("exact_users"))
    )
    aq = F.col("__aq")
    quant_ok = (
        (aq.getItem(0) <= aq.getItem(1))
        & (aq.getItem(1) <= aq.getItem(2))
        & (aq.getItem(0) >= F.col("__lo"))
        & (aq.getItem(2) <= F.col("__hi"))
        & (
            F.abs(aq.getItem(0) - F.col("__p50"))
            <= 0.01 * (F.col("__hi") - F.col("__lo"))
        )
    )
    return agg.select(
        "event_type",
        "exact_users",
        hll_ok.alias("hll_within_bound"),
        quant_ok.alias("quantiles_within_bound"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver smoke-check query."""
    return q01_pricing_summary(spark, sf_dir)


# corpus (LLM-data-pipeline) queries register themselves on import
from modular_etl_data_platform_spark.queries import corpus_queries  # noqa: E402,F401
from modular_etl_data_platform_spark.queries import roundtrip_queries  # noqa: E402,F401
from modular_etl_data_platform_spark.queries import timeseries_queries  # noqa: E402,F401
from modular_etl_data_platform_spark.queries import platform_queries  # noqa: E402,F401
from modular_etl_data_platform_spark.queries import proof_queries  # noqa: E402,F401
