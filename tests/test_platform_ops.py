"""Platform-operations operators: CDC application (operators/cdc.py),
reconciliation + drift (operators/reconcile.py), survivorship
(operators/dedup.py::golden_record), and interpolated gap-fill
(operators/timeseries.py::gap_fill_interpolated)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators import timeseries as ts
from modular_etl_data_platform_spark.operators.cdc import (
    apply_changes,
    merge_changes,
)
from modular_etl_data_platform_spark.operators.dedup import golden_record
from modular_etl_data_platform_spark.operators.reconcile import (
    column_drift,
    reconcile_amounts,
    reconciliation_report,
)

CHANGE_COLS = ["k", "v", "op", "seq", "change_id"]


def test_apply_changes_latest_wins_and_deletes_drop(spark):
    log = spark.createDataFrame(
        [
            (1, "a1", "U", 1, 1),
            (1, "a2", "U", 2, 2),  # latest for k=1
            (2, "b1", "U", 1, 3),
            (2, "b2", "D", 2, 4),  # k=2 deleted last -> absent
            (3, "c1", "D", 1, 5),
            (3, "c2", "U", 2, 6),  # re-inserted after delete -> present
        ],
        CHANGE_COLS,
    )
    out = {
        r.k: r.v
        for r in apply_changes(log, ["k"], ["seq", "change_id"]).collect()
    }
    assert out == {1: "a2", 3: "c2"}


def test_apply_changes_tiebreak_is_deterministic(spark):
    # same seq for both changes -> change_id must break the tie
    log = spark.createDataFrame(
        [(1, "x", "U", 1, 10), (1, "y", "U", 1, 11)], CHANGE_COLS
    )
    out = apply_changes(log, ["k"], ["seq", "change_id"]).collect()
    assert [(r.k, r.v) for r in out] == [(1, "y")]


def test_merge_changes_upserts_and_deletes_into_snapshot(spark):
    snapshot = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, "gone")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, "new", "U", 5, 1),  # update k=1
            (3, None, "D", 5, 2),  # delete k=3
            (4, "ins", "U", 5, 3),  # insert k=4
        ],
        CHANGE_COLS,
    )
    out = {
        r.k: r.v
        for r in merge_changes(
            snapshot, changes, ["k"], ["seq", "change_id"]
        ).collect()
    }
    assert out == {1: "new", 2: "keep", 4: "ins"}


def test_apply_cdc_parquet_across_batches(spark, tmp_path):
    from modular_etl_data_platform_spark.operators.cdc import apply_cdc_parquet

    target = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, "a", "U", 1, 1), (2, "b", "U", 1, 2)], CHANGE_COLS
    )
    apply_cdc_parquet(spark, b1, target, ["k"], ["seq", "change_id"])
    assert {
        r.k: r.v for r in spark.read.parquet(target).collect()
    } == {1: "a", 2: "b"}

    # batch 2: update k=1, delete k=2, insert k=3
    b2 = spark.createDataFrame(
        [(1, "a2", "U", 2, 3), (2, None, "D", 2, 4), (3, "c", "U", 2, 5)],
        CHANGE_COLS,
    )
    apply_cdc_parquet(spark, b2, target, ["k"], ["seq", "change_id"])
    assert {
        r.k: r.v for r in spark.read.parquet(target).collect()
    } == {1: "a2", 3: "c"}


def test_stream_apply_cdc(spark, tmp_path):
    from modular_etl_data_platform_spark.streaming.incremental import (
        stream_apply_cdc,
    )

    src = tmp_path / "cdc_in"
    src.mkdir()
    schema = "k BIGINT, v STRING, op STRING, seq BIGINT, change_id BIGINT"
    # one file per micro-batch (maxFilesPerTrigger=1) so ordering is real
    spark.createDataFrame(
        [(1, "a", "U", 1, 1), (2, "b", "U", 1, 2)], CHANGE_COLS
    ).coalesce(1).write.parquet(str(src / "batch1"))
    spark.createDataFrame(
        [(1, "a2", "U", 2, 3), (2, None, "D", 2, 4)], CHANGE_COLS
    ).coalesce(1).write.parquet(str(src / "batch2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = stream_apply_cdc(
        spark,
        stream,
        str(tmp_path / "cdc_state"),
        str(tmp_path / "cdc_ckpt"),
        keys=["k"],
        seq_cols=["seq", "change_id"],
    )
    q.awaitTermination(120)
    got = {
        r.k: r.v
        for r in spark.read.parquet(str(tmp_path / "cdc_state")).collect()
    }
    assert got == {1: "a2"}


def test_golden_record_survives_latest_non_null(spark):
    rows = [
        # k=1: email filled early then null; phone only in the middle row
        (1, 1, "e1@x.com", None),
        (1, 2, None, "555"),
        (1, 3, None, None),
        # k=2: single row
        (2, 1, "e2@x.com", "111"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "email", "phone"])
    out = {
        r.k: r
        for r in golden_record(
            df, keys=["k"], order_cols=["seq"], survivor_cols=["email", "phone"]
        ).collect()
    }
    assert len(out) == 2
    assert (out[1].email, out[1].phone, out[1].seq) == ("e1@x.com", "555", 3)
    assert (out[2].email, out[2].phone) == ("e2@x.com", "111")


def test_reconcile_amounts_classifies_all_statuses(spark):
    items = spark.createDataFrame(
        [(1, "10.00"), (1, "5.00"), (2, "7.00"), (9, "1.00")],
        ["k", "amt"],
    ).select("k", F.col("amt").cast("decimal(14,2)").alias("amt"))
    target = spark.createDataFrame(
        [(1, "15.00"), (2, "9.50"), (3, "4.00")], ["k", "total"]
    ).select("k", F.col("total").cast("decimal(14,2)").alias("total"))
    rec = reconcile_amounts(
        items,
        target,
        key="k",
        source_amount=F.col("amt"),
        target_amount=F.col("total"),
    )
    status = {r.k: r.recon_status for r in rec.collect()}
    assert status == {
        1: "match",
        2: "amount_mismatch",
        3: "missing_in_source",
        9: "missing_in_target",
    }
    report = {
        r.recon_status: r.n_keys
        for r in reconciliation_report(rec, key="k").collect()
    }
    assert report == {
        "match": 1,
        "amount_mismatch": 1,
        "missing_in_source": 1,
        "missing_in_target": 1,
    }


def test_column_drift_metrics(spark):
    rows = [
        # window A (flag=1): no nulls, values 10/10/20, cat x,x,y
        (1, 10.0, "x"),
        (1, 10.0, "x"),
        (1, 20.0, "y"),
        # window B (flag=0): one null value, cat all y
        (0, None, "y"),
        (0, 30.0, "y"),
    ]
    df = spark.createDataFrame(rows, ["flag", "val", "cat"])
    out = {
        (r.column_name, r.metric): r
        for r in column_drift(
            df,
            F.col("flag") == 1,
            columns=["val", "cat"],
            mean_columns=["val"],
            categorical_columns=["cat"],
        ).collect()
    }
    nr = out[("val", "null_rate")]
    assert (nr.baseline_value, nr.current_value, nr.delta) == (0.0, 0.5, 0.5)
    dc = out[("val", "distinct_count")]
    assert (dc.baseline_value, dc.current_value) == (2.0, 1.0)
    mean = out[("val", "mean")]
    assert (mean.baseline_value, mean.current_value) == (round(40.0 / 3, 9), 30.0)
    # TVD: A = {x: 2/3, y: 1/3}, B = {x: 0, y: 1} -> (2/3 + 2/3)/2 = 2/3
    tvd = out[("cat", "total_variation")]
    assert tvd.delta == round(2.0 / 3, 9)


def test_candidate_keys_detects_composite_key(spark):
    from modular_etl_data_platform_spark.operators.profiling import (
        candidate_keys,
    )

    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (2, 1, "z")], ["a", "b", "c"]
    )
    out = {
        r.column_set: (r.n_distinct, r.is_candidate_key)
        for r in candidate_keys(df, [["a"], ["a", "b"]], "t").collect()
    }
    assert out == {"t(a)": (2, False), "t(a,b)": (3, True)}


def test_numeric_histogram_buckets_and_bounds(spark):
    from modular_etl_data_platform_spark.operators.profiling import (
        numeric_histogram,
    )

    # values 0..10: lo=0, hi=10, width=1; 10 lands in the last bucket
    df = spark.createDataFrame([(float(i),) for i in range(11)], ["v"])
    out = {r.bucket: r for r in numeric_histogram(df, "v", 10).collect()}
    assert len(out) == 10
    assert out[0].n_rows == 1 and (out[0].bucket_lo, out[0].bucket_hi) == (0.0, 1.0)
    assert out[9].n_rows == 2  # 9.0 and the max value 10.0
    assert out[9].bucket_hi == 10.0


def test_key_skew_topk_orders_and_shares(spark):
    from modular_etl_data_platform_spark.operators.profiling import (
        key_skew_topk,
    )

    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_topk(df, "k", k=2).collect()
    assert [(r.k, r.n_rows, r.share) for r in out] == [
        (1, 6, 0.6),
        (2, 3, 0.3),
    ]


def test_gap_fill_interpolated_linear_values(spark):
    rows = [
        # user 1: day 1 total 10, day 4 total 40 -> days 2,3 interpolate 20,30
        (1, 1, datetime(2024, 1, 1, 10, 0, 0), 10.0),
        (2, 1, datetime(2024, 1, 4, 9, 0, 0), 40.0),
        # user 2: single day, nothing to interpolate
        (3, 2, datetime(2024, 1, 2, 8, 0, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        (r.user_id, str(r.day)): r
        for r in ts.gap_fill_interpolated(df).collect()
    }
    assert out[(1, "2024-01-01")].filled_total == 10.0
    assert out[(1, "2024-01-02")].filled_total == 20.0
    assert out[(1, "2024-01-03")].filled_total == 30.0
    assert out[(1, "2024-01-04")].filled_total == 40.0
    assert out[(1, "2024-01-02")].fill_method == "interpolated"
    assert out[(1, "2024-01-01")].fill_method == "observed"
    assert out[(2, "2024-01-02")].filled_total == 1.0
    assert len(out) == 5
