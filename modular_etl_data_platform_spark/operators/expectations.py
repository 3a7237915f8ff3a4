"""Declarative expectation suites (great-expectations-style dialect).

The reference pins ``great-expectations`` as its declared DQ intent
(reference: requirements.txt:6) without shipping any suite; this module
provides the equivalent declarative surface Spark-first: a JSON suite of
``{"expectation_type": ..., "kwargs": {...}}`` entries — the public GE
suite shape — compiled onto the engine's own primitives.

Supported expectation types (the public core set):

- ``expect_column_to_exist``
- ``expect_column_values_to_not_be_null``       (mostly)
- ``expect_column_values_to_be_between``        (min/max, mostly)
- ``expect_column_values_to_be_in_set``         (value_set, mostly)
- ``expect_column_values_to_match_regex``       (regex, mostly)
- ``expect_column_values_to_be_unique``
- ``expect_compound_columns_to_be_unique``      (column_list)
- ``expect_table_row_count_to_be_between``
- ``expect_column_min_to_be_between``
- ``expect_column_max_to_be_between``
- ``expect_column_mean_to_be_between``

``mostly`` (pass-fraction threshold, default 1.0) follows GE semantics:
the expectation succeeds when at least that fraction of NON-NULL rows
passes (null handling likewise mirrors GE: nulls don't fail value/set/
regex expectations — ``not_be_null`` owns nulls).

Scale: ``validate`` evaluates EVERY expectation in ONE aggregation pass
over the table — each row-level expectation contributes one conditional
aggregate, table-level ones contribute count/min/max/mean/countDistinct
— so a 50-expectation suite costs a single scan + one 1-row shuffle at
any corpus size (the GE-on-Spark anti-pattern is one job per
expectation). Uniqueness uses exact count vs countDistinct in the same
pass. The row-level subset also bridges to :class:`RuleSet`
(:meth:`ExpectationSuite.to_ruleset`) so failing rows can be
quarantined through the standard silver flow (S10).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.validate import Rule, RuleSet

_ROW_LEVEL = {
    "expect_column_values_to_not_be_null",
    "expect_column_values_to_be_between",
    "expect_column_values_to_be_in_set",
    "expect_column_values_to_match_regex",
}


@dataclass
class Expectation:
    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)

    @property
    def column(self) -> str:
        return self.kwargs.get("column") or "|".join(
            self.kwargs.get("column_list", [])
        )

    @property
    def mostly(self) -> float:
        return float(self.kwargs.get("mostly", 1.0))

    def _value_predicate(self) -> F.Column:
        """Pass/fail per NON-NULL value (GE null semantics); only defined
        for the row-level types."""
        col = F.col(self.kwargs["column"])
        t = self.expectation_type
        if t == "expect_column_values_to_not_be_null":
            return col.isNotNull()
        if t == "expect_column_values_to_be_between":
            lo = self.kwargs.get("min_value")
            hi = self.kwargs.get("max_value")
            pred = F.lit(True)
            if lo is not None:
                pred = pred & (col >= F.lit(lo))
            if hi is not None:
                pred = pred & (col <= F.lit(hi))
            return col.isNull() | pred
        if t == "expect_column_values_to_be_in_set":
            return col.isNull() | col.isin(self.kwargs["value_set"])
        if t == "expect_column_values_to_match_regex":
            return col.isNull() | col.rlike(self.kwargs["regex"])
        raise ValueError(f"not a row-level expectation: {t}")


class ExpectationSuite:
    """A parsed suite; build with :meth:`from_config`, run with
    :meth:`validate` (one scan) or bridge to quarantine via
    :meth:`to_ruleset`."""

    def __init__(self, expectations: list[Expectation], name: str = "default"):
        self.name = name
        self.expectations = expectations

    @classmethod
    def from_config(cls, suite: dict[str, Any]) -> "ExpectationSuite":
        exps = [
            Expectation(e["expectation_type"], dict(e.get("kwargs", {})))
            for e in suite.get("expectations", [])
        ]
        known = _ROW_LEVEL | {
            "expect_column_to_exist",
            "expect_column_values_to_be_unique",
            "expect_compound_columns_to_be_unique",
            "expect_table_row_count_to_be_between",
            "expect_column_min_to_be_between",
            "expect_column_max_to_be_between",
            "expect_column_mean_to_be_between",
        }
        for e in exps:
            if e.expectation_type not in known:
                raise ValueError(f"unsupported expectation: {e.expectation_type}")
            if "mostly" in e.kwargs and e.expectation_type not in _ROW_LEVEL:
                # uniqueness/table-level expectations evaluate a single
                # suite-level statistic — a pass-fraction threshold has no
                # defined semantics there, and silently ignoring it would
                # let a suite author believe a tolerance is in force
                raise ValueError(
                    f"'mostly' is not supported for {e.expectation_type}"
                )
        return cls(exps, name=suite.get("expectation_suite_name", "default"))

    @staticmethod
    def _referenced_columns(e: Expectation) -> list[str]:
        """Columns an expectation's aggregate would read (empty for
        table-level row count)."""
        if "column" in e.kwargs:
            return [e.kwargs["column"]]
        return list(e.kwargs.get("column_list", []))

    # -- single-pass evaluation ---------------------------------------------
    def _agg_frame(self, df: DataFrame) -> DataFrame:
        """The ONE-row aggregate holding every expectation's observed
        value — a single scan regardless of suite size (exposed so tests
        can pin the single-pass plan)."""
        aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
        columns = set(df.columns)
        for i, e in enumerate(self.expectations):
            t = e.expectation_type
            if t == "expect_column_to_exist":
                continue  # schema-level, no aggregate
            if any(c not in columns for c in self._referenced_columns(e)):
                # an aggregate over an absent column would fail the WHOLE
                # single-pass frame with AnalysisException before
                # expect_column_to_exist could report anything; skip it
                # here and let validate() record the failed row
                continue
            if t in _ROW_LEVEL:
                pred = e._value_predicate()
                if t == "expect_column_values_to_not_be_null":
                    # fraction over ALL rows; vacuously 1.0 on an empty
                    # table (GE passes empty tables — and the other
                    # row-level types already coalesce the same way)
                    aggs.append(
                        F.coalesce(
                            F.avg(pred.cast("double")), F.lit(1.0)
                        ).alias(f"__e{i}")
                    )
                else:
                    # fraction over NON-NULL rows (vacuously 1.0 if none)
                    col = F.col(e.kwargs["column"])
                    aggs.append(
                        F.coalesce(
                            F.sum(
                                F.when(col.isNotNull() & pred, 1).otherwise(0)
                            ).cast("double")
                            / F.sum(F.when(col.isNotNull(), 1).otherwise(0)),
                            F.lit(1.0),
                        ).alias(f"__e{i}")
                    )
            elif t == "expect_column_values_to_be_unique":
                col = F.col(e.kwargs["column"])
                aggs.append(
                    F.coalesce(
                        F.countDistinct(col).cast("double")
                        / F.sum(F.when(col.isNotNull(), 1).otherwise(0)),
                        F.lit(1.0),
                    ).alias(f"__e{i}")
                )
            elif t == "expect_compound_columns_to_be_unique":
                cols = [F.col(c) for c in e.kwargs["column_list"]]
                # null out the zero denominator (ANSI mode throws on /0),
                # then coalesce like the single-column path: GE passes
                # empty tables vacuously
                aggs.append(
                    F.coalesce(
                        F.countDistinct(F.struct(*cols)).cast("double")
                        / F.nullif(F.count(F.lit(1)), F.lit(0)),
                        F.lit(1.0),
                    ).alias(f"__e{i}")
                )
            elif t == "expect_table_row_count_to_be_between":
                aggs.append(F.count(F.lit(1)).cast("double").alias(f"__e{i}"))
            elif t == "expect_column_min_to_be_between":
                aggs.append(
                    F.min(e.kwargs["column"]).cast("double").alias(f"__e{i}")
                )
            elif t == "expect_column_max_to_be_between":
                aggs.append(
                    F.max(e.kwargs["column"]).cast("double").alias(f"__e{i}")
                )
            elif t == "expect_column_mean_to_be_between":
                # decimal-exact mean (order-free; see catalog docstring)
                col = F.col(e.kwargs["column"])
                aggs.append(
                    (
                        F.sum(col.cast("decimal(18,6)")).cast("double")
                        / F.count(col)
                    ).alias(f"__e{i}")
                )
        return df.agg(*aggs)

    def validate(self, df: DataFrame) -> DataFrame:
        """Evaluate the whole suite in ONE aggregation pass; returns one
        row per expectation: (expectation_type, column, observed, success).

        ``observed`` is the GE-style observed value as a DOUBLE: the pass
        fraction for row-level expectations (over non-null rows, except
        not_be_null which is over all rows), the row count / min / max /
        mean / distinct-fraction for table-level ones.
        """
        row = self._agg_frame(df).first()
        columns = set(df.columns)

        results = []
        for i, e in enumerate(self.expectations):
            t = e.expectation_type
            if t == "expect_column_to_exist":
                observed = float(e.kwargs["column"] in columns)
                success = bool(observed)
            elif any(c not in columns for c in self._referenced_columns(e)):
                # the aggregate was skipped (absent column): record a
                # failed expectation row instead of blowing up the suite
                observed, success = None, False
            else:
                observed = row[f"__e{i}"]
                observed = float(observed) if observed is not None else None
                if t in _ROW_LEVEL:
                    success = observed is not None and observed >= e.mostly
                elif t in (
                    "expect_column_values_to_be_unique",
                    "expect_compound_columns_to_be_unique",
                ):
                    success = observed is not None and observed >= 1.0
                else:
                    lo = e.kwargs.get("min_value")
                    hi = e.kwargs.get("max_value")
                    success = observed is not None
                    if success and lo is not None:
                        success = observed >= lo
                    if success and hi is not None:
                        success = observed <= hi
            results.append((t, e.column, observed, bool(success)))
        spark = df.sparkSession
        return spark.createDataFrame(
            results,
            "expectation_type string, column string, observed double, success boolean",
        )

    def success(self, df: DataFrame) -> bool:
        return all(r.success for r in self.validate(df).collect())

    # -- bridge to the quarantine flow --------------------------------------
    def to_ruleset(self) -> RuleSet:
        """Compile the ROW-LEVEL expectations (mostly == 1.0 only: a
        fractional threshold is a suite-level verdict, not a per-row
        keep/drop decision) into a :class:`RuleSet` so failing rows can be
        quarantined through ``RuleSet.split`` / the silver stage."""
        rs = RuleSet()
        for e in self.expectations:
            if e.expectation_type not in _ROW_LEVEL or e.mostly < 1.0:
                continue
            rs.rules.append(
                Rule(
                    name=f"{e.expectation_type}:{e.column}",
                    column=e.column,
                    kind=e.expectation_type,
                    predicate=e._value_predicate(),
                    severity="error",
                )
            )
        return rs
