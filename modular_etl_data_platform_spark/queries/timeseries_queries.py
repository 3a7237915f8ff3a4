"""Catalog entries for the time-series operators (gap-fill / LOCF,
trailing time-range windows) — hypertable-style queries over ``events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.queries.catalog import _t, dsum, query
from modular_etl_data_platform_spark.operators import timeseries as ts
from modular_etl_data_platform_spark.operators import intervals as iv


@query(
    "q78_gap_fill_daily",
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
    )
    SELECT g.user_id, g.day,
           COALESCE(d.n_events, 0) AS n_events,
           d.daily_total,
           last_value(d.daily_total IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_known_total,
           d.daily_total IS NULL AS is_gap
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def q78_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill: per-user daily resample with explicit gap
    rows (n_events=0) and last-observation-carried-forward totals. The
    calendar grid is generated per key with sequence() — row count scales
    with span, not event count — and the LOCF window is partitioned by
    key, never global."""
    return ts.gap_fill_daily(_t(spark, sf_dir, "events"))


@query(
    "q79_trailing_time_window",
    """
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trailing,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS avg_trailing
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def q79_trailing_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour rolling count/sum/avg per user at every event —
    frame bounds defined by TIME (rangeBetween over epoch seconds), so
    bursty and sparse users both get true trailing-60-min semantics.
    Decimal-cast frame sums keep the incremental arithmetic exact and
    engine-portable."""
    return ts.trailing_time_window(_t(spark, sf_dir, "events"))


@query(
    "q80_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT f.cohort_day,
           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def q80_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later activity day as an offset from their cohort start. Two
    uniform-key aggregations plus a broadcastable (one row per user)
    cohort join — no windows, no skew, linear at any event volume."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("day")).dropDuplicates()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


@query(
    "q81_funnel_conversion",
    """
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
    FROM steps
    """,
)
def q81_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): per-user
    first-occurrence timestamps via one conditional aggregation (no
    windows, no self-joins — the classic funnel anti-pattern is a
    per-step self-join that shuffles events once per step), then ordered
    step predicates folded into counts. One shuffle on user_id, one
    1-row result."""
    ev = _t(spark, sf_dir, "events")
    steps = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("view", "click", "purchase")
        ]
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(reached_view.cast("int")).cast("long").alias("step_view"),
        F.sum(reached_click.cast("int")).cast("long").alias("step_click"),
        F.sum(reached_purchase.cast("int")).cast("long").alias("step_purchase"),
    )


@query(
    "q82_column_profile",
    """
    SELECT 'o_custkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def q82_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (the discovery step before authoring DQ
    rules): per column, row/null/distinct counts and min/max — computed
    in ONE pass over the table (every profile metric is an aggregate of
    the same scan; Spark evaluates them together, so the table is read
    once, not once per column). Values ship as strings so one schema
    covers every column type."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).cast("long").alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    profiles = [
        one.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__dist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q83_rate_anomalies",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type, day, n,
             CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS mu,
             COUNT(*) OVER w AS n_days,
             CAST(SUM(n * n) OVER w AS DOUBLE) AS sq
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           round(mu, 9) AS trailing_mean,
           round((n - mu) / sqrt(greatest(sq / n_days - mu * mu, 1e-9)), 9)
             AS z_score
    FROM stats
    WHERE n_days >= 7
    """,
)
def q83_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly scores: daily counts per event type z-scored
    against their own trailing-7-day window (frame excludes the current
    day). Counts are integers so the mean/variance arithmetic is
    bit-identical in both engines; z rounds to 9 dp. Daily aggregation is
    one uniform-key shuffle; the window partitions by event_type (bounded
    cardinality — sub-shard by week at extreme history lengths)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    mu = F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w)
    n_days = F.count(F.lit(1)).over(w)
    sq = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    stats = daily.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        mu.alias("mu"),
        n_days.alias("n_days"),
        sq.alias("sq"),
    ).filter(F.col("n_days") >= 7)
    z = (F.col("n") - F.col("mu")) / F.sqrt(
        F.greatest(
            F.col("sq") / F.col("n_days") - F.col("mu") * F.col("mu"),
            F.lit(1e-9),
        )
    )
    return stats.select(
        "event_type",
        "day",
        "n",
        F.round("mu", 9).alias("trailing_mean"),
        F.round(z, 9).alias("z_score"),
    )


@query(
    "q116_incremental_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           TRUE AS incremental
    FROM events
    GROUP BY 1, 2
    """,
)
def q116_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate maintenance
    (operators/timeseries.py::rollup_partial + merge_rollup): the hour
    rollup is built from the FIRST HALF of the event stream, then
    maintained by folding in the second half's partial — never
    re-scanning history — and must equal the full GROUP BY the oracle
    computes over all events. Exactness is the point: counts and
    DECIMAL sums are mergeable partials, so the maintained rollup is
    bit-identical to a full recompute (the ``incremental`` flag pins
    that the merge path actually ran on a non-empty delta). This is the
    q57 cascade's missing half — q57 re-aggregates finer grains,
    this maintains a grain from new raw rows alone, the only
    refresh shape that survives 100 TB of history."""
    e = _t(spark, sf_dir, "events")
    split = e.agg(
        F.timestamp_millis(
            ((F.unix_millis(F.min("ts")) + F.unix_millis(F.max("ts"))) / 2).cast(
                "long"
            )
        ).alias("mid")
    ).first()["mid"]
    base = ts.rollup_partial(e.filter(F.col("ts") < F.lit(split)))
    delta = ts.rollup_partial(e.filter(F.col("ts") >= F.lit(split)))
    n_delta = delta.limit(1).count()
    merged = ts.merge_rollup(base, delta)
    return merged.select(
        "bucket",
        "event_type",
        "n",
        F.col("total").cast("double").alias("total"),
        F.lit(bool(n_delta > 0)).alias("incremental"),
    )


_INCIDENT_MERGED_CTE = """
    iv AS (
      SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events WHERE event_type = 'error' AND value >= 195
    ),
    flagged AS (
      SELECT s, e,
             CASE WHEN s > MAX(e) OVER (ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM iv
    ),
    isl AS (
      SELECT s, e,
             SUM(brk) OVER (ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    ),
    merged AS (
      SELECT MIN(s) AS window_start, MAX(e) AS window_end,
             COUNT(*) AS n_source
      FROM isl GROUP BY island
    )
"""


def _incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severe-error trigger events -> 30-minute windows -> merged islands."""
    trig = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "error") & (F.col("value") >= 195)
    )
    return iv.merge_intervals(iv.build_intervals(trig, "ts", 1800))


@query(
    "q127_merge_incident_windows",
    f"WITH {_INCIDENT_MERGED_CTE} SELECT window_start, window_end, n_source FROM merged",
)
def q127_merge_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge (operators/intervals.py::merge_intervals):
    severe-error events each open a 30-minute incident window; overlapping
    and touching windows coalesce via the gaps-and-islands rewrite (two
    linear window passes, no self-join). The oracle is the identical
    rewrite in DuckDB — island numbering, half-open ends and touching-
    interval semantics all hash-checked. Keyless merge = single-partition
    window, deliberate and documented: incident windows number in the
    thousands even at 100 TB of events (trigger selectivity), and a
    global merge is inherently sequential."""
    return _incident_windows(spark, sf_dir).select(
        "window_start", "window_end", "n_source"
    )


@query(
    "q128_interval_join_attribution",
    f"""
    WITH {_INCIDENT_MERGED_CTE},
    j AS (
      SELECT m.window_start, m.window_end, e.user_id, e.value
      FROM events e JOIN merged m
        ON e.ts >= m.window_start AND e.ts < m.window_end
    )
    SELECT window_start, window_end,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM j GROUP BY window_start, window_end
    """,
)
def q128_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join (operators/intervals.py::interval_join): every
    event is attributed to the merged incident window containing its
    timestamp. There is NO equi key — the naive formulation is a
    BroadcastNestedLoopJoin (each event checked against every window);
    the operator turns it into an equi-join on 10-minute time bins with
    the exact range predicate as a residual filter
    (test_plans.py pins the no-nested-loop shape). The oracle runs the
    naive BETWEEN join in DuckDB, so the binning rewrite is proven
    result-identical to the quadratic reference plan."""
    ev = _t(spark, sf_dir, "events")
    joined = iv.interval_join(
        ev, _incident_windows(spark, sf_dir), "ts", bin_seconds=600
    )
    return joined.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value"), "sum_value"),
    )


@query(
    "q131_outside_incident_windows",
    f"""
    WITH {_INCIDENT_MERGED_CTE}
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM merged m
      WHERE e.ts >= m.window_start AND e.ts < m.window_end
    )
    GROUP BY event_type
    """,
)
def q131_outside_incident_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval ANTI join (interval_join how='left_anti'): the
    'exclude maintenance/incident windows' filter — events inside NO
    merged window, per-type aggregates. Anti semantics are with respect
    to the true containment predicate (it rides inside the join
    condition), not the coarse bin match; the oracle is the naive
    NOT EXISTS range scan in DuckDB."""
    ev = _t(spark, sf_dir, "events")
    outside = iv.interval_join(
        ev, _incident_windows(spark, sf_dir), "ts", bin_seconds=600, how="left_anti"
    )
    return outside.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), "sum_value"),
    )


# ---------------------------------------------------------------------------
# Interval operators over REAL SCD2 validity ranges: the reference's
# point-in-time semantics (config/gold/schema/README.md:197-210)
# re-expressed through merge_intervals / interval_join, oracle-checked
# against the PIT join itself.
# ---------------------------------------------------------------------------

#: clamp for the open-ended current version's HIGH_DATE sentinel —
#: strictly beyond the testdata's event range (all SFs span Jan 2024),
#: so clamping never changes containment, only bounds the bin explode
_SCD2_CLAMP = "2024-02-01 00:00:00"


def _scd2_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events-derived SCD2 dimension's validity ranges as keyed
    intervals (user_id, valid_from, vend, attr, version), the current
    version's 9999-12-31 sentinel clamped to just past the data window
    (an interval_join explodes [start, end] into time bins — an
    unclamped open interval would explode ~10^8 bins; production
    pipelines clamp to 'now' the same way)."""
    from modular_etl_data_platform_spark.queries.catalog import _scd2_events_dim

    return _scd2_events_dim(spark, sf_dir).select(
        "user_id",
        "valid_from",
        F.least(
            F.col("valid_to"), F.lit(_SCD2_CLAMP).cast("timestamp")
        ).alias("vend"),
        "attr",
        "version",
    )


_SCD2_DIM_DUCK = """
    dim AS (
      SELECT user_id, ts AS valid_from,
             COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
             event_type AS attr,
             CAST(ROW_NUMBER() OVER w AS INT) AS version
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
"""


@query(
    "q133_scd2_interval_pit",
    f"""
    WITH {_SCD2_DIM_DUCK}
    SELECT c.event_id, c.user_id, c.ts, d.attr, d.version
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    LEFT JOIN dim d
      ON d.user_id = c.user_id AND c.ts >= d.valid_from AND c.ts < d.valid_to
    """,
)
def q133_scd2_interval_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT-join equivalence of the binned interval join: click facts
    joined to the SCD2 dimension version valid at event time — computed
    with interval_join (keyed bins + residual range predicate, LEFT
    mode so never-versioned users survive with nulls), while the ORACLE
    runs the reference's point-in-time join itself (reference:
    config/gold/schema/README.md:197-210). SCD2 intervals are disjoint
    and adjacent per key, so the two formulations must agree row-for-row
    — a bin-boundary bug (double match / dropped edge) or clamp error
    changes the hash. One-day bins: validity runs span days-to-weeks in
    the testdata; each interval explodes into ≤32 bins."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = iv.interval_join(
        clicks,
        _scd2_validity_intervals(spark, sf_dir),
        "ts",
        start_col="valid_from",
        end_col="vend",
        bin_seconds=86_400,
        key_cols=["user_id"],
        how="left",
    )
    return joined.select("event_id", "user_id", "ts", "attr", "version")


@query(
    "q134_scd2_validity_coverage",
    f"""
    WITH {_SCD2_DIM_DUCK}
    SELECT user_id,
           strftime(MIN(valid_from), '%Y-%m-%d %H:%M:%S.%f') AS first_seen,
           strftime(MAX(LEAST(valid_to, TIMESTAMP '{_SCD2_CLAMP}')),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_until,
           CAST(COUNT(*) AS BIGINT) AS n_versions
    FROM dim GROUP BY user_id
    """,
)
def q134_scd2_validity_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free SCD2 coverage proof via merge_intervals: each key's
    validity ranges are adjacent half-open intervals (valid_to == next
    valid_from), so the gaps-and-islands merge MUST coalesce them into
    exactly ONE island per user spanning first change -> clamped
    sentinel with n_source = version count. The oracle computes that
    single-island answer relationally (per-user min/max/count over the
    PIT dimension) — if the merge fabricated a gap (extra islands:
    row-count mismatch) or misplaced a boundary (hash mismatch), the
    gate reds. Interval ends ship as formatted strings: the 9999
    sentinel is clamped, but the string surface keeps the query
    pandas-safe by convention (see q10)."""
    merged = iv.merge_intervals(
        _scd2_validity_intervals(spark, sf_dir),
        start_col="valid_from",
        end_col="vend",
        key_cols=["user_id"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return merged.select(
        "user_id",
        F.date_format("window_start", fmt).alias("first_seen"),
        F.date_format("window_end", fmt).alias("valid_until"),
        F.col("n_source").alias("n_versions"),
    )
