"""Catalog entries for the platform-operations operators: CDC
application, drift monitoring, reconciliation, interpolated gap-fill,
and survivorship (golden-record) profiles.

These are the "run the platform" verbs around the reference's declared
ETL surface — applying a change feed (the delete-capable superset of the
silver upsert contract, reference config/silver/schema/README.md:113-122),
auditing a load end-to-end, and watching feeds for distribution drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators import timeseries as ts
from modular_etl_data_platform_spark.operators.cdc import apply_changes
from modular_etl_data_platform_spark.operators.dedup import golden_record
from modular_etl_data_platform_spark.operators.profiling import (
    candidate_keys,
    key_skew_topk,
    numeric_histogram,
)
from modular_etl_data_platform_spark.operators.reconcile import (
    column_drift,
    reconcile_amounts,
    reconciliation_report,
)
from modular_etl_data_platform_spark.queries.catalog import _t, query


@query(
    "q84_cdc_current_state",
    """
    WITH latest AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_event_type,
           round(value, 9) AS current_value,
           ts AS updated_at
    FROM latest
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q84_cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC application: treat the event stream as a change log
    (``error`` = delete, anything else = upsert) and collapse it to
    current per-user state — keys whose latest change is a delete drop
    out. One keep-latest window shuffle; (ts, event_id) totally orders
    changes so the winner is deterministic."""
    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    state = apply_changes(
        changes, keys=["user_id"], seq_cols=["ts", "event_id"]
    )
    return state.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 9).alias("current_value"),
        F.col("ts").alias("updated_at"),
    )


_DRIFT_SPLIT = "o_orderdate < TIMESTAMP '1998-01-01'"


@query(
    "q85_drift_report",
    f"""
    WITH m AS (
      SELECT
        CAST(SUM(CASE WHEN {_DRIFT_SPLIT} THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        CAST(SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN 1 ELSE 0 END) AS DOUBLE) AS nc,
        COUNT(DISTINCT CASE WHEN {_DRIFT_SPLIT} THEN o_custkey END) AS ck_db,
        COUNT(DISTINCT CASE WHEN NOT ({_DRIFT_SPLIT}) THEN o_custkey END) AS ck_dc,
        COUNT(DISTINCT CASE WHEN {_DRIFT_SPLIT} THEN o_orderstatus END) AS st_db,
        COUNT(DISTINCT CASE WHEN NOT ({_DRIFT_SPLIT}) THEN o_orderstatus END) AS st_dc,
        COUNT(DISTINCT CASE WHEN {_DRIFT_SPLIT} THEN o_totalprice END) AS tp_db,
        COUNT(DISTINCT CASE WHEN NOT ({_DRIFT_SPLIT}) THEN o_totalprice END) AS tp_dc,
        round(CAST(SUM(CASE WHEN {_DRIFT_SPLIT} AND o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN {_DRIFT_SPLIT} THEN 1 ELSE 0 END), 9) AS ck_nb,
        round(CAST(SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) AND o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN 1 ELSE 0 END), 9) AS ck_nc,
        round(CAST(SUM(CASE WHEN {_DRIFT_SPLIT} AND o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN {_DRIFT_SPLIT} THEN 1 ELSE 0 END), 9) AS st_nb,
        round(CAST(SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) AND o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN 1 ELSE 0 END), 9) AS st_nc,
        round(CAST(SUM(CASE WHEN {_DRIFT_SPLIT} AND o_totalprice IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN {_DRIFT_SPLIT} THEN 1 ELSE 0 END), 9) AS tp_nb,
        round(CAST(SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) AND o_totalprice IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN 1 ELSE 0 END), 9) AS tp_nc,
        round(CAST(SUM(CASE WHEN {_DRIFT_SPLIT} THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
              / SUM(CASE WHEN {_DRIFT_SPLIT} AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END), 9) AS tp_mb,
        round(CAST(SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)
              / SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END), 9) AS tp_mc
      FROM orders
    ),
    cat AS (
      SELECT o_orderstatus AS category,
             SUM(CASE WHEN {_DRIFT_SPLIT} THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN NOT ({_DRIFT_SPLIT}) THEN 1 ELSE 0 END) AS nc
      FROM orders GROUP BY o_orderstatus
    ),
    tvd AS (
      SELECT round(SUM(ABS(
               CAST(nb AS DOUBLE) / (SELECT SUM(nb) FROM cat)
               - CAST(nc AS DOUBLE) / (SELECT SUM(nc) FROM cat)
             )) / 2, 9) AS delta
      FROM cat
    )
    SELECT 'o_custkey' AS column_name, 'null_rate' AS metric,
           ck_nb AS baseline_value, ck_nc AS current_value,
           round(ck_nc - ck_nb, 9) AS delta FROM m
    UNION ALL
    SELECT 'o_custkey', 'distinct_count', CAST(ck_db AS DOUBLE),
           CAST(ck_dc AS DOUBLE), round(CAST(ck_dc AS DOUBLE) - CAST(ck_db AS DOUBLE), 9) FROM m
    UNION ALL
    SELECT 'o_orderstatus', 'null_rate', st_nb, st_nc, round(st_nc - st_nb, 9) FROM m
    UNION ALL
    SELECT 'o_orderstatus', 'distinct_count', CAST(st_db AS DOUBLE),
           CAST(st_dc AS DOUBLE), round(CAST(st_dc AS DOUBLE) - CAST(st_db AS DOUBLE), 9) FROM m
    UNION ALL
    SELECT 'o_totalprice', 'null_rate', tp_nb, tp_nc, round(tp_nc - tp_nb, 9) FROM m
    UNION ALL
    SELECT 'o_totalprice', 'distinct_count', CAST(tp_db AS DOUBLE),
           CAST(tp_dc AS DOUBLE), round(CAST(tp_dc AS DOUBLE) - CAST(tp_db AS DOUBLE), 9) FROM m
    UNION ALL
    SELECT 'o_totalprice', 'mean', tp_mb, tp_mc, round(tp_mc - tp_mb, 9) FROM m
    UNION ALL
    SELECT 'o_orderstatus', 'total_variation', CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), delta FROM tvd
    """,
)
def q85_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-window column drift: null rates, distinct counts, and a
    decimal-exact mean for each monitored column computed in ONE
    conditional scan pass (baseline = orders before 1998), plus the
    total-variation distance between the two windows' o_orderstatus
    distributions. The long (column, metric) format is what a monitoring
    sink ingests. At 100 TB swap the exact distincts for
    approx_count_distinct — the plan shape is otherwise unchanged."""
    orders = _t(spark, sf_dir, "orders")
    return column_drift(
        orders,
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
        columns=["o_custkey", "o_orderstatus", "o_totalprice"],
        mean_columns=["o_totalprice"],
        categorical_columns=["o_orderstatus"],
    )


@query(
    "q86_gap_fill_interpolated",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS daily_total
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(g.d AS DATE) AS day
      FROM span, LATERAL unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(d)
    ),
    joined AS (
      SELECT g.user_id, g.day, COALESCE(d.n_events, 0) AS n_events,
             d.daily_total
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    f AS (
      SELECT *,
        last_value(daily_total IGNORE NULLS) OVER wp AS prev_val,
        last_value(CASE WHEN daily_total IS NOT NULL THEN day END IGNORE NULLS)
          OVER wp AS prev_day,
        first_value(daily_total IGNORE NULLS) OVER wn AS next_val,
        first_value(CASE WHEN daily_total IS NOT NULL THEN day END IGNORE NULLS)
          OVER wn AS next_day
      FROM joined
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        wn AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
           round(daily_total, 9) AS daily_total,
           round(CASE
             WHEN daily_total IS NOT NULL THEN daily_total
             WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
               prev_val + (next_val - prev_val)
                 * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                    / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
             WHEN prev_val IS NOT NULL THEN prev_val
             ELSE next_val
           END, 9) AS filled_total,
           CASE WHEN daily_total IS NOT NULL THEN 'observed'
                ELSE 'interpolated' END AS fill_method
    FROM f
    """,
)
def q86_gap_fill_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with linear interpolation: missing days on each user's
    daily series get the straight-line value between the surrounding
    observed days, weighted by calendar distance — the alternative to
    q78's LOCF for metrics where holding a value flat would bias trailing
    aggregates. Same per-key plan shape as q78 (grid via sequence, one
    agg + one window shuffle); prev/next lookups share one Exchange."""
    out = ts.gap_fill_interpolated(_t(spark, sf_dir, "events"))
    return out.select(
        "user_id",
        "day",
        "n_events",
        F.round("daily_total", 9).alias("daily_total"),
        F.round("filled_total", 9).alias("filled_total"),
        "fill_method",
    )


@query(
    "q87_reconciliation_report",
    """
    WITH li AS (
      SELECT l_orderkey AS o_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                 * CAST(1 - l_discount AS DECIMAL(8,4))
                 * CAST(1 + l_tax AS DECIMAL(8,4))) AS source_total
      FROM lineitem GROUP BY l_orderkey
    ),
    rec AS (
      SELECT o.o_orderkey,
             li.source_total,
             CAST(o.o_totalprice AS DECIMAL(14,2)) AS target_total,
             CAST(o.o_totalprice AS DECIMAL(14,2)) - li.source_total AS diff,
             CASE
               WHEN li.source_total IS NULL THEN 'missing_in_source'
               WHEN o.o_orderkey IS NULL THEN 'missing_in_target'
               WHEN ABS(CAST(o.o_totalprice AS DECIMAL(14,2)) - li.source_total)
                    > CAST(0.01 AS DECIMAL(14,4)) THEN 'amount_mismatch'
               ELSE 'match'
             END AS recon_status
      FROM orders o FULL OUTER JOIN li ON li.o_orderkey = o.o_orderkey
    )
    SELECT recon_status,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           round(CAST(SUM(ABS(diff)) AS DOUBLE), 2) AS total_abs_diff,
           MIN(o_orderkey) AS example_key
    FROM rec GROUP BY recon_status
    """,
)
def q87_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-target amount reconciliation: recompute each order's
    total from its line items (decimal-exact, so sums are
    order-independent) and classify every order as match /
    amount_mismatch / missing_in_source (orders with no line items) /
    missing_in_target, then aggregate to the per-status report an
    on-call operator reads. Two agg shuffles + one co-partitioned
    full-outer join; the report groupBy is over ≤4 rows per status."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    src_amount = (
        F.col("l_extendedprice").cast("decimal(14,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
        * (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    )
    rec = reconcile_amounts(
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"),
            src_amount.alias("__amt"),
        ),
        orders,
        key="o_orderkey",
        source_amount=F.col("__amt"),
        target_amount=F.col("o_totalprice").cast("decimal(14,2)"),
        tolerance="0.01",
    )
    report = reconciliation_report(rec, key="o_orderkey")
    return report.select(
        "recon_status",
        "n_keys",
        F.round(F.col("total_abs_diff").cast("double"), 2).alias(
            "total_abs_diff"
        ),
        "example_key",
    )


@query(
    "q88_user_profile_survivorship",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN value END AS last_purchase_value,
             CASE WHEN event_type = 'error' THEN ts END AS last_error_ts
      FROM events
    ),
    g AS (
      SELECT user_id, event_type, ts,
             last_value(last_purchase_value IGNORE NULLS) OVER w
               AS last_purchase_value,
             last_value(last_error_ts IGNORE NULLS) OVER w AS last_error_ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_type AS last_event_type, ts AS last_seen,
           round(last_purchase_value, 9) AS last_purchase_value,
           last_error_ts
    FROM g WHERE rn = 1
    """,
)
def q88_user_profile_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) profile materialization: one row per
    user carrying the latest NON-NULL value of each tracked attribute
    (last purchase amount, last error time) plus the latest event — the
    MDM merge a plain keep-latest dedup can't express, because the
    winning row may have nulls an older row filled. One window shuffle;
    all survivor lookups share the same Exchange."""
    ev = _t(spark, sf_dir, "events")
    prepared = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "last_purchase_value"
        ),
        F.when(F.col("event_type") == "error", F.col("ts")).alias(
            "last_error_ts"
        ),
    )
    golden = golden_record(
        prepared,
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        survivor_cols=["last_purchase_value", "last_error_ts"],
    )
    return golden.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_seen"),
        F.round("last_purchase_value", 9).alias("last_purchase_value"),
        "last_error_ts",
    )


@query(
    "q89_candidate_keys",
    """
    WITH o AS (
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT o_orderkey) AS d0,
             COUNT(DISTINCT o_custkey) AS d1
      FROM orders
    ),
    l AS (
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT l_orderkey) AS d0,
             COUNT(DISTINCT (l_orderkey, l_linenumber)) AS d1
      FROM lineitem
    )
    SELECT 'orders(o_orderkey)' AS column_set, CAST(n AS BIGINT) AS n_rows,
           CAST(d0 AS BIGINT) AS n_distinct, d0 = n AS is_candidate_key FROM o
    UNION ALL
    SELECT 'orders(o_custkey)', CAST(n AS BIGINT), CAST(d1 AS BIGINT), d1 = n FROM o
    UNION ALL
    SELECT 'lineitem(l_orderkey)', CAST(n AS BIGINT), CAST(d0 AS BIGINT), d0 = n FROM l
    UNION ALL
    SELECT 'lineitem(l_orderkey,l_linenumber)', CAST(n AS BIGINT),
           CAST(d1 AS BIGINT), d1 = n FROM l
    """,
)
def q89_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery: which column sets uniquely identify rows
    — the schema-inference step before declaring primary_keys in a table
    config. All distinct counts per table are aggregates of one scan;
    lineitem needs the composite (orderkey, linenumber), orders only
    o_orderkey."""
    orders = candidate_keys(
        _t(spark, sf_dir, "orders"),
        [["o_orderkey"], ["o_custkey"]],
        label_prefix="orders",
    )
    lineitem = candidate_keys(
        _t(spark, sf_dir, "lineitem"),
        [["l_orderkey"], ["l_orderkey", "l_linenumber"]],
        label_prefix="lineitem",
    )
    return orders.unionByName(lineitem)


@query(
    "q90_value_histogram",
    """
    WITH b AS (
      SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
             CAST(MAX(o_totalprice) AS DOUBLE) AS hi
      FROM orders
    ),
    x AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
      WHERE o_totalprice IS NOT NULL
    ),
    bucketed AS (
      SELECT LEAST(CAST(FLOOR((x - lo) * 10 / (hi - lo)) AS BIGINT), 9)
               AS bucket, lo, hi
      FROM x, b
    )
    SELECT bucket,
           round(lo + bucket * (hi - lo) / 10, 9) AS bucket_lo,
           round(lo + (bucket + 1) * (hi - lo) / 10, 9) AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bucketed GROUP BY bucket, lo, hi
    """,
)
def q90_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice with data-derived bounds:
    a 1-row min/max aggregate broadcast back over the scan (never a
    collect), then a groupBy on ≤10 bucket ids. The distribution-shape
    companion to q82's moment profile."""
    return numeric_histogram(_t(spark, sf_dir, "orders"), "o_totalprice")


@query(
    "q91_key_skew_profile",
    """
    WITH counts AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT SUM(n_rows) AS t FROM counts),
    top AS (
      SELECT l_partkey, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, l_partkey ASC) AS rn
      FROM counts
    )
    SELECT l_partkey, n_rows,
           round(CAST(n_rows AS DOUBLE) / t, 9) AS share
    FROM top, total WHERE rn <= 10
    """,
)
def q91_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the 10 hottest l_partkey values with row
    counts and share of table — the pre-join diagnostic that decides
    between a plain shuffle join, AQE skew split, or explicit salting
    (q61). Top-k runs as TakeOrdered over per-key aggregates, never a
    global sort; ties break on the key for determinism."""
    return key_skew_topk(_t(spark, sf_dir, "lineitem"), "l_partkey", k=10)
