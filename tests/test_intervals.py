"""Interval operators: gaps-and-islands merge semantics and the binned
interval-join rewrite (operators/intervals.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.intervals import (
    build_intervals,
    interval_join,
    merge_intervals,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _iv(spark, spans, key=None):
    rows = [
        ((key,) if key is not None else ()) + (_ts(a), _ts(b)) for a, b in spans
    ]
    cols = (["k"] if key is not None else []) + ["start", "end"]
    return spark.createDataFrame(rows, cols)


def test_merge_overlapping_and_touching(spark):
    # [0,10) overlaps [5,20); [20,30) touches [5,20) -> all one island;
    # [45,50) is separate
    df = _iv(spark, [(0, 10), (5, 20), (20, 30), (45, 50)])
    out = sorted(
        merge_intervals(df).select("window_start", "window_end", "n_source").collect()
    )
    assert out == [
        (_ts(0), _ts(30), 3),
        (_ts(45), _ts(50), 1),
    ]


def test_merge_nested_interval_does_not_split(spark):
    # [0,60) fully contains [10,20); a later [30,40) still falls inside
    # the running max(end) even though the previous ROW's end (20) is
    # before it — the running-max formulation gets this right where a
    # lag(end) formulation would split.
    df = _iv(spark, [(0, 60), (10, 20), (30, 40)])
    out = merge_intervals(df).collect()
    assert len(out) == 1 and out[0]["n_source"] == 3
    assert out[0]["window_start"] == _ts(0) and out[0]["window_end"] == _ts(60)


def test_merge_is_per_key(spark):
    a = _iv(spark, [(0, 10), (5, 15)], key="a")
    b = _iv(spark, [(0, 10), (30, 40)], key="b")
    out = merge_intervals(a.unionByName(b), key_cols=["k"]).collect()
    per_key = sorted((r["k"], r["window_start"], r["window_end"]) for r in out)
    assert per_key == [
        ("a", _ts(0), _ts(15)),
        ("b", _ts(0), _ts(10)),
        ("b", _ts(30), _ts(40)),
    ]


def test_build_intervals_half_open_length(spark):
    ev = spark.createDataFrame([(1, _ts(0))], ["id", "ts"])
    r = build_intervals(ev, "ts", 1800).collect()[0]
    assert r["end"] - r["start"] == dt.timedelta(seconds=1800)


def test_interval_join_boundary_semantics(spark):
    """start is inclusive, end is exclusive; events outside match nothing."""
    events = spark.createDataFrame(
        [(i, t) for i, t in enumerate([_ts(-1), _ts(0), _ts(9.999), _ts(10), _ts(25)])],
        ["event_id", "ts"],
    )
    windows = _iv(spark, [(0, 10), (20, 30)]).selectExpr(
        "start as window_start", "end as window_end"
    )
    got = {
        (r["event_id"], r["window_start"])
        for r in interval_join(events, windows, "ts", bin_seconds=60).collect()
    }
    assert got == {(1, _ts(0)), (2, _ts(0)), (4, _ts(20))}


def test_interval_join_long_window_spans_many_bins(spark):
    """A window much longer than the bin width still catches every event
    (the interval explodes into all covered bins)."""
    events = spark.createDataFrame(
        [(i, _ts(m)) for i, m in enumerate(range(0, 120, 7))], ["event_id", "ts"]
    )
    windows = _iv(spark, [(13, 101)]).selectExpr(
        "start as window_start", "end as window_end"
    )
    got = interval_join(events, windows, "ts", bin_seconds=60)
    expect = sum(1 for m in range(0, 120, 7) if 13 <= m < 101)
    assert got.count() == expect


def test_interval_join_keyed(spark):
    events = spark.createDataFrame(
        [(1, "a", _ts(5)), (2, "b", _ts(5))], ["event_id", "k", "ts"]
    )
    windows = _iv(spark, [(0, 10)], key="a").selectExpr(
        "k", "start as window_start", "end as window_end"
    )
    out = interval_join(events, windows, "ts", key_cols=["k"]).collect()
    assert [(r["event_id"], r["k"]) for r in out] == [(1, "a")]


def test_interval_join_left_semi(spark):
    events = spark.createDataFrame(
        [(1, _ts(5)), (2, _ts(50))], ["event_id", "ts"]
    )
    windows = _iv(spark, [(0, 10)]).selectExpr(
        "start as window_start", "end as window_end"
    )
    out = interval_join(events, windows, "ts", how="left_semi")
    assert [r["event_id"] for r in out.collect()] == [1]
    assert out.columns == ["event_id", "ts"]


def test_interval_join_left_outer_keeps_uncovered_rows(spark):
    events = spark.createDataFrame(
        [(1, _ts(5)), (2, _ts(50))], ["event_id", "ts"]
    )
    windows = _iv(spark, [(0, 10)]).selectExpr(
        "start as window_start", "end as window_end"
    )
    out = {
        (r["event_id"], r["window_start"])
        for r in interval_join(events, windows, "ts", how="left").collect()
    }
    assert out == {(1, _ts(0)), (2, None)}


def test_interval_join_left_anti_excludes_covered_rows(spark):
    """The 'exclude maintenance windows' filter: keep only events inside
    NO interval — anti semantics against the true containment test, not
    the coarse bin match (event 3 shares a bin with the window but falls
    outside it, so it must survive)."""
    events = spark.createDataFrame(
        [(1, _ts(5)), (2, _ts(50)), (3, _ts(10.5))], ["event_id", "ts"]
    )
    windows = _iv(spark, [(0, 10)]).selectExpr(
        "start as window_start", "end as window_end"
    )
    out = interval_join(events, windows, "ts", bin_seconds=3600, how="left_anti")
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3]
    assert out.columns == ["event_id", "ts"]


def test_interval_join_rejects_unknown_how(spark):
    events = spark.createDataFrame([(1, _ts(5))], ["event_id", "ts"])
    windows = _iv(spark, [(0, 10)])
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(events, windows, "ts", start_col="start", end_col="end", how="full")


def test_interval_join_plan_is_equi_not_nested_loop(spark, sf_dir):
    """The scale claim: the range-only join compiles to an equi-join on
    the time bin (hash-joinable), never BroadcastNestedLoopJoin —
    while the naive formulation of the same predicate IS a nested loop."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    windows = merge_intervals(
        build_intervals(ev.filter(F.col("value") >= 195), "ts", 1800)
    )
    binned = interval_join(ev, windows, "ts", bin_seconds=600)
    p = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p

    naive = ev.join(
        windows,
        (ev["ts"] >= windows["window_start"]) & (ev["ts"] < windows["window_end"]),
    )
    pn = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in pn or "CartesianProduct" in pn

    # and the rewrite is result-identical to the naive plan
    cols = ["event_id", "window_start"]
    assert sorted(map(tuple, binned.select(*cols).collect())) == sorted(
        map(tuple, naive.select(*cols).collect())
    )
