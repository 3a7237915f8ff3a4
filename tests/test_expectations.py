"""Expectation-suite DQ adapter (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.expectations import ExpectationSuite


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30.0, "US"),
            (2, "bob", -5.0, "US"),
            (3, "carol", 45.0, "DE"),
            (4, None, 20.0, "FR"),
            (5, "eve", None, "XX"),
        ],
        ["id", "name", "score", "country"],
    )


def _suite(exps):
    return ExpectationSuite.from_config({"expectations": exps})


def test_row_level_fractions_and_mostly(spark, people):
    suite = _suite(
        [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "name", "mostly": 0.8}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "score", "min_value": 0, "mostly": 0.7}},
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "country", "value_set": ["US", "DE", "FR"]}},
        ]
    )
    res = {r.expectation_type: r for r in suite.validate(people).collect()}
    # 4/5 names non-null -> 0.8 meets mostly=0.8
    nn = res["expect_column_values_to_not_be_null"]
    assert nn.observed == pytest.approx(0.8) and nn.success
    # scores: 4 non-null, 3 >= 0 -> 0.75 >= 0.7
    bw = res["expect_column_values_to_be_between"]
    assert bw.observed == pytest.approx(0.75) and bw.success
    # countries: 4/5 in set, mostly defaults to 1.0 -> fail
    st = res["expect_column_values_to_be_in_set"]
    assert st.observed == pytest.approx(0.8) and not st.success


def test_nulls_do_not_fail_value_expectations(spark, people):
    suite = _suite(
        [{"expectation_type": "expect_column_values_to_be_between",
          "kwargs": {"column": "score", "min_value": -10, "max_value": 100}}]
    )
    r = suite.validate(people).collect()[0]
    # the null score is excluded from the denominator, not counted a fail
    assert r.observed == pytest.approx(1.0) and r.success


def test_table_level_expectations(spark, people):
    suite = _suite(
        [
            {"expectation_type": "expect_column_to_exist",
             "kwargs": {"column": "id"}},
            {"expectation_type": "expect_column_to_exist",
             "kwargs": {"column": "ghost"}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "id"}},
            {"expectation_type": "expect_compound_columns_to_be_unique",
             "kwargs": {"column_list": ["id", "country"]}},
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 5, "max_value": 5}},
            {"expectation_type": "expect_column_min_to_be_between",
             "kwargs": {"column": "score", "min_value": -10, "max_value": 0}},
            {"expectation_type": "expect_column_max_to_be_between",
             "kwargs": {"column": "score", "min_value": 40}},
            {"expectation_type": "expect_column_mean_to_be_between",
             "kwargs": {"column": "score", "min_value": 0, "max_value": 30}},
        ]
    )
    rows = suite.validate(people).collect()
    by = {(r.expectation_type, r.column): r for r in rows}
    assert by[("expect_column_to_exist", "id")].success
    assert not by[("expect_column_to_exist", "ghost")].success
    assert by[("expect_column_values_to_be_unique", "id")].success
    assert by[("expect_compound_columns_to_be_unique", "id|country")].success
    assert by[("expect_table_row_count_to_be_between", "")].observed == 5.0
    assert by[("expect_column_min_to_be_between", "score")].success
    assert by[("expect_column_max_to_be_between", "score")].success
    # mean = (30 - 5 + 45 + 20)/4 = 22.5
    m = by[("expect_column_mean_to_be_between", "score")]
    assert m.observed == pytest.approx(22.5) and m.success


def test_duplicate_detection_fails_uniqueness(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], ["id"])
    suite = _suite(
        [{"expectation_type": "expect_column_values_to_be_unique",
          "kwargs": {"column": "id"}}]
    )
    r = suite.validate(df).collect()[0]
    assert r.observed == pytest.approx(2 / 3) and not r.success
    assert not suite.success(df)


def test_single_aggregation_pass(spark, people):
    """The whole suite must evaluate in ONE aggregate job — no
    per-expectation scans (the GE-on-Spark anti-pattern)."""
    suite = _suite(
        [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "name"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "score", "min_value": 0}},
            {"expectation_type": "expect_column_values_to_be_unique",
             "kwargs": {"column": "id"}},
            {"expectation_type": "expect_column_mean_to_be_between",
             "kwargs": {"column": "score", "min_value": 0}},
        ]
    )
    plan = suite._agg_frame(people)._jdf.queryExecution().optimizedPlan().toString()
    # all observed values come from ONE aggregate over ONE scan of the
    # input — a per-expectation job would show multiple scans/aggregates
    assert plan.count("LocalRelation") + plan.count("Scan") + plan.count(
        "LogicalRDD"
    ) == 1, plan
    assert plan.count("Aggregate") == 1, plan


def test_to_ruleset_quarantines_row_failures(spark, people):
    suite = _suite(
        [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "name"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "score", "min_value": 0}},
            # fractional mostly must NOT become a row-level rule
            {"expectation_type": "expect_column_values_to_be_in_set",
             "kwargs": {"column": "country", "value_set": ["US"],
                        "mostly": 0.5}},
        ]
    )
    rs = suite.to_ruleset()
    assert len(rs.rules) == 2
    valid, quarantined = rs.split(people)
    assert sorted(r.id for r in valid.collect()) == [1, 3, 5]
    bad = {r.id: r.failed_rules for r in quarantined.collect()}
    assert set(bad) == {2, 4}
    assert bad[2] == ["expect_column_values_to_be_between:score"]
    assert bad[4] == ["expect_column_values_to_not_be_null:name"]


def test_empty_table_passes_vacuously(spark, people):
    """GE semantics: an empty table passes row-level expectations —
    including not_be_null, which must not fail on a NULL average."""
    empty = people.limit(0)
    suite = _suite(
        [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "name"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "score", "min_value": 0}},
        ]
    )
    rows = suite.validate(empty).collect()
    assert all(r.success and r.observed == 1.0 for r in rows)


def test_unknown_expectation_rejected():
    with pytest.raises(ValueError, match="unsupported expectation"):
        _suite([{"expectation_type": "expect_moon_phase", "kwargs": {}}])


def test_compound_unique_passes_vacuously_on_empty_table(spark, people):
    empty = people.filter(F.lit(False))
    suite = _suite(
        [{"expectation_type": "expect_compound_columns_to_be_unique",
          "kwargs": {"column_list": ["id", "country"]}}]
    )
    r = suite.validate(empty).first()
    assert r.success and r.observed == 1.0


def test_mostly_rejected_for_non_row_level_expectations():
    for t, kw in [
        ("expect_column_values_to_be_unique", {"column": "id"}),
        ("expect_compound_columns_to_be_unique", {"column_list": ["id"]}),
        ("expect_table_row_count_to_be_between", {"min_value": 1}),
    ]:
        with pytest.raises(ValueError, match="mostly"):
            _suite([{"expectation_type": t, "kwargs": {**kw, "mostly": 0.9}}])


def test_missing_column_records_failure_instead_of_raising(spark, people):
    """An expectation on an absent column must yield a failed result row,
    not an AnalysisException that kills the whole single-pass suite."""
    suite = _suite(
        [
            {"expectation_type": "expect_column_to_exist",
             "kwargs": {"column": "ghost"}},
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "ghost"}},
            {"expectation_type": "expect_compound_columns_to_be_unique",
             "kwargs": {"column_list": ["id", "ghost"]}},
            {"expectation_type": "expect_column_mean_to_be_between",
             "kwargs": {"column": "score", "min_value": 0}},
        ]
    )
    rows = suite.validate(people).collect()
    by = {(r.expectation_type, r.column): r for r in rows}
    assert not by[("expect_column_to_exist", "ghost")].success
    ghost_null = by[("expect_column_values_to_not_be_null", "ghost")]
    assert not ghost_null.success and ghost_null.observed is None
    ghost_uni = by[("expect_compound_columns_to_be_unique", "id|ghost")]
    assert not ghost_uni.success and ghost_uni.observed is None
    # healthy expectations in the same suite still evaluate
    assert by[("expect_column_mean_to_be_between", "score")].success
