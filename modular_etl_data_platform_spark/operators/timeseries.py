"""Time-series operators: calendar gap-fill (resample + LOCF) and
trailing time-range rolling aggregates — the hypertable-style operations
a metrics/telemetry pipeline runs over event streams.

Scale design:

- **Gap-fill** generates each key's calendar grid with ``sequence()`` —
  a per-key projection whose row count is (span / step), independent of
  event count — then left-joins the actual per-bucket aggregates and
  forward-fills with ``last(..., ignorenulls=True)`` over a window
  partitioned BY KEY. Nothing is ever global: one shuffle for the
  per-bucket agg, one for the per-key window; grid explode is map-side.
- **Trailing time-range windows** use ``Window.rangeBetween`` over epoch
  seconds — the frame is defined by TIME, not row count, so sparse and
  bursty keys both get the semantics a trailing-60-min metric implies.
  Frames are computed per key partition; sums are decimal-cast so the
  incremental frame arithmetic is exact and order-independent (the same
  cross-engine convention as the aggregate catalog).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key daily resample with explicit gap rows: one row per key per
    calendar day between that key's first and last event; missing days
    get n_events=0 and carry the last known daily total forward (LOCF).

    Returns (key, day, n_events, daily_total, last_known_total, is_gap).
    ``daily_total`` is NULL on gap days (the fact that there was no
    observation is preserved); ``last_known_total`` is the LOCF series a
    dashboard or feature pipeline consumes."""
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .cast("double")
        .alias("daily_total"),
    )
    span = events.groupBy(key_col).agg(
        F.min(F.to_date(ts_col)).alias("__d0"),
        F.max(F.to_date(ts_col)).alias("__d1"),
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, [key_col, "day"], "left")
        .select(
            key_col,
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "daily_total",
            F.last("daily_total", ignorenulls=True).over(w).alias(
                "last_known_total"
            ),
            F.col("daily_total").isNull().alias("is_gap"),
        )
    )


def gap_fill_interpolated(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key daily resample with LINEAR interpolation across gap days
    (the companion to ``gap_fill_daily``'s LOCF): a missing day's value
    is the straight line between the previous and next observed daily
    totals, weighted by calendar distance. Sensor/metrics pipelines use
    this where LOCF would bias trailing aggregates on sparse keys.

    Same scale shape as ``gap_fill_daily`` — per-key grid via
    ``sequence()``, one agg shuffle, one window shuffle; the
    prev/next lookups are two frames over the SAME key window (one
    Exchange). Daily totals are decimal-summed (exact), so the
    interpolation arithmetic is deterministic; consumers round.

    Returns (key, day, n_events, daily_total, filled_total,
    fill_method) where fill_method ∈ ('observed', 'interpolated')."""
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .cast("double")
        .alias("daily_total"),
    )
    span = events.groupBy(key_col).agg(
        F.min(F.to_date(ts_col)).alias("__d0"),
        F.max(F.to_date(ts_col)).alias("__d1"),
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("daily_total").isNotNull(), F.col("day"))
    prev_val = F.last("daily_total", ignorenulls=True).over(w_prev)
    prev_day = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_val = F.first("daily_total", ignorenulls=True).over(w_next)
    next_day = F.first(obs_day, ignorenulls=True).over(w_next)
    frac = F.datediff(F.col("day"), prev_day).cast("double") / F.datediff(
        next_day, prev_day
    )
    interp = prev_val + (next_val - prev_val) * frac
    filled = (
        F.when(F.col("daily_total").isNotNull(), F.col("daily_total"))
        .when(prev_val.isNotNull() & next_val.isNotNull(), interp)
        .when(prev_val.isNotNull(), prev_val)
        .otherwise(next_val)
    )
    return grid.join(daily, [key_col, "day"], "left").select(
        key_col,
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "daily_total",
        filled.alias("filled_total"),
        F.when(F.col("daily_total").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interpolated"))
        .alias("fill_method"),
    )


def trailing_time_window(
    events: DataFrame,
    window_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing time-range rolling aggregate per key: for every event,
    the count/sum/avg of that key's events in the preceding
    ``window_seconds`` (inclusive) — frame bounds defined by TIME via
    ``rangeBetween`` over epoch seconds, not by row count."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_timestamp(ts_col))
        .rangeBetween(-window_seconds, 0)
    )
    dec_sum = F.sum(F.col(value_col).cast("decimal(18,6)")).over(w)
    n = F.count(F.lit(1)).over(w)
    return events.select(
        F.col("event_id"),
        F.col(key_col),
        F.col(ts_col),
        n.cast("long").alias("n_trailing"),
        dec_sum.cast("double").alias("sum_trailing"),
        (dec_sum.cast("double") / n).alias("avg_trailing"),
    )


def rollup_partial(
    events: DataFrame,
    grain: str = "hour",
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """One grain bucket of a continuous aggregate: (bucket, groups) ->
    (n, total) where ``total`` stays DECIMAL — the partials are exact and
    order-free, which is what makes them MERGEABLE (:func:`merge_rollup`)
    without drift. Cast to double only at the final read."""
    return events.groupBy(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        *[F.col(c) for c in group_cols],
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("total"),
    )


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Incrementally maintain a continuous aggregate: fold a new batch's
    partial rollup into the stored one — union + re-aggregate on the
    bucket keys, exact because counts and decimal sums are mergeable
    partials (the hypertable/materialized-rollup maintenance step).

    Scale shape: the stored rollup is ~1/grain-width the size of raw
    data and the delta covers only NEW buckets, so the shuffle is tiny;
    with the rollup table partitioned by bucket date, the rewrite
    touches only the partitions the delta lands in. This is the ONLY
    sane maintenance shape at 100 TB — re-scanning history to refresh a
    dashboard rollup is the anti-pattern this replaces (q57 reads the
    next-finer grain; this maintains a grain from new RAW rows alone)."""
    keys = ["bucket", *group_cols]
    return (
        existing.unionByName(delta)
        .groupBy(*[F.col(k) for k in keys])
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
