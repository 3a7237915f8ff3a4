"""Catalog entries for the time-series operators (gap-fill / LOCF,
trailing time-range windows) — hypertable-style queries over ``events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.queries.catalog import _t, query
from modular_etl_data_platform_spark.operators import timeseries as ts


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
