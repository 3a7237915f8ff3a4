"""Gap-fill / LOCF and trailing time-range windows
(operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime

from modular_etl_data_platform_spark.operators import timeseries as ts


def _events(spark):
    rows = [
        # user 1: events on day 1 and day 4 -> days 2,3 are gaps
        (1, 1, datetime(2024, 1, 1, 10, 0, 0), 10.0),
        (2, 1, datetime(2024, 1, 1, 11, 0, 0), 5.0),
        (3, 1, datetime(2024, 1, 4, 9, 0, 0), 7.0),
        # user 2: single day
        (4, 2, datetime(2024, 1, 2, 8, 0, 0), 1.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_gap_fill_daily_grid_and_locf(spark):
    out = {
        (r.user_id, str(r.day)): r for r in ts.gap_fill_daily(_events(spark)).collect()
    }
    # user 1 gets a 4-day grid; user 2 one day
    assert len([k for k in out if k[0] == 1]) == 4
    assert len([k for k in out if k[0] == 2]) == 1
    d1, d2, d3, d4 = (out[(1, f"2024-01-0{i}")] for i in (1, 2, 3, 4))
    assert (d1.n_events, d1.daily_total, d1.is_gap) == (2, 15.0, False)
    # gap days: zero events, NULL observation, LOCF carries day 1's total
    assert (d2.n_events, d2.daily_total, d2.is_gap) == (0, None, True)
    assert d2.last_known_total == 15.0 and d3.last_known_total == 15.0
    assert (d4.daily_total, d4.last_known_total, d4.is_gap) == (7.0, 7.0, False)


def test_trailing_time_window_is_time_not_rows(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 10, 0, 0), 1.0),
        (2, 1, datetime(2024, 1, 1, 10, 30, 0), 2.0),
        (3, 1, datetime(2024, 1, 1, 11, 15, 0), 4.0),  # ev1 aged out (75 min)
        (4, 2, datetime(2024, 1, 1, 10, 45, 0), 8.0),  # other key, own frame
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {r.event_id: r for r in ts.trailing_time_window(df).collect()}
    assert (out[1].n_trailing, out[1].sum_trailing) == (1, 1.0)
    assert (out[2].n_trailing, out[2].sum_trailing) == (2, 3.0)  # 30 min apart
    assert (out[3].n_trailing, out[3].sum_trailing) == (2, 6.0)  # ev1 aged out
    assert (out[4].n_trailing, out[4].sum_trailing) == (1, 8.0)  # per-key frames
    assert out[3].avg_trailing == 3.0


def test_merge_rollup_matches_full_recompute(spark):
    """Folding per-batch partials into a stored rollup must be exactly a
    full recompute — counts and decimal sums are mergeable; an empty
    delta is a no-op."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.timeseries import (
        merge_rollup,
        rollup_partial,
    )

    rows = [
        (i, "a" if i % 2 else "b", f"2024-01-01 0{i % 5}:0{i % 6}:00", i * 1.5)
        for i in range(60)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, value double"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")

    full = {
        (r.bucket, r.event_type): (r.n, r.total)
        for r in rollup_partial(events).collect()
    }
    # three arbitrary batches folded in sequence
    b1 = events.filter("user_id % 3 = 0")
    b2 = events.filter("user_id % 3 = 1")
    b3 = events.filter("user_id % 3 = 2")
    maintained = rollup_partial(b1)
    for b in (b2, b3):
        maintained = merge_rollup(maintained, rollup_partial(b))
    # empty delta is a no-op
    maintained = merge_rollup(maintained, rollup_partial(events.limit(0)))
    got = {
        (r.bucket, r.event_type): (r.n, r.total) for r in maintained.collect()
    }
    assert got == full
