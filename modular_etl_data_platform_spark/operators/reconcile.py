"""Data reconciliation and drift monitoring — the audit operators a
platform runs AROUND its pipelines: source-vs-target amount
reconciliation (did the fact load lose or corrupt money?) and
between-window column drift (did the feed's distribution shift?).

These extend the reference's declarative DQ surface
(``config/silver/schema/README.md:255-273`` names "validation pass/fail
rates tracked" and RI checks) from row-level rules to table-level
monitoring.

Scale design:

- **Reconciliation** is two independent aggregations joined full-outer
  on the reconciliation key — each side shuffles once on its own key,
  the join key is the agg key (already co-partitioned post-agg), and the
  report is one tiny groupBy over the classification. Amounts are cast
  to DECIMAL *before* arithmetic so sums are exact and order-independent
  (doubles would make the match/mismatch threshold nondeterministic
  under shuffle-order changes).
- **Drift** computes every per-column moment metric in ONE conditional
  scan pass (each metric is an aggregate of the same scan with a window
  predicate folded in), plus one small groupBy per categorical column
  for distribution distance (total variation). Nothing is collected to
  the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reconcile_amounts(
    source: DataFrame,
    target: DataFrame,
    key: str,
    source_amount: Column,
    target_amount: Column,
    tolerance: str = "0.01",
) -> DataFrame:
    """Key-level reconciliation of a source aggregate against a target
    amount. ``source`` is aggregated per ``key`` (sum of
    ``source_amount``); ``target`` must be key-unique. Returns one row
    per key with a ``recon_status`` of ``match`` / ``amount_mismatch`` /
    ``missing_in_source`` / ``missing_in_target`` and the exact decimal
    ``diff`` (target - source). Cast both amount expressions to DECIMAL
    so comparison against ``tolerance`` is exact."""
    src = source.groupBy(key).agg(F.sum(source_amount).alias("source_total"))
    tgt = target.select(F.col(key), target_amount.alias("target_total"))
    joined = tgt.join(src, key, "full_outer")
    diff = F.col("target_total") - F.col("source_total")
    status = (
        F.when(F.col("source_total").isNull(), F.lit("missing_in_source"))
        .when(F.col("target_total").isNull(), F.lit("missing_in_target"))
        .when(F.abs(diff) > F.expr(f"CAST({tolerance} AS DECIMAL(14,4))"),
              F.lit("amount_mismatch"))
        .otherwise(F.lit("match"))
    )
    return joined.select(
        key,
        "source_total",
        "target_total",
        diff.alias("diff"),
        status.alias("recon_status"),
    )


def reconciliation_report(reconciled: DataFrame, key: str) -> DataFrame:
    """Aggregate a ``reconcile_amounts`` result into the per-status
    summary an on-call operator reads: row counts, total absolute
    drift, and the smallest affected key as a drill-down example."""
    return reconciled.groupBy("recon_status").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.abs("diff")).alias("total_abs_diff"),
        F.min(key).alias("example_key"),
    )


def column_drift(
    df: DataFrame,
    split_predicate: Column,
    columns: Sequence[str],
    mean_columns: Sequence[str] = (),
    categorical_columns: Sequence[str] = (),
    decimal_type: str = "decimal(18,4)",
) -> DataFrame:
    """Between-window drift report in long format: one row per
    (column, metric) with ``baseline_value`` (``split_predicate`` true),
    ``current_value`` (false), and delta. Metrics: ``null_rate`` and
    ``distinct_count`` for every column, ``mean`` for ``mean_columns``
    (decimal-exact sum, so the ratio is deterministic), and
    ``total_variation`` distance between category-share distributions
    for ``categorical_columns`` (reported in ``delta`` only).

    One scan pass computes all moment metrics; each categorical column
    adds one small groupBy. Rates/means round to 9 dp."""
    base = split_predicate
    curr = ~split_predicate

    def _rate(pred: Column, col: str) -> Column:
        nulls = F.sum((pred & F.col(col).isNull()).cast("long"))
        n = F.sum(pred.cast("long"))
        return F.round(nulls.cast("double") / n, 9)

    def _distinct(pred: Column, col: str) -> Column:
        return F.countDistinct(F.when(pred, F.col(col))).cast("double")

    def _mean(pred: Column, col: str) -> Column:
        # AVG semantics: denominator counts non-null values, not rows
        s = F.sum(F.when(pred, F.col(col).cast(decimal_type)))
        n = F.sum((pred & F.col(col).isNotNull()).cast("long"))
        return F.round(s.cast("double") / n, 9)

    aggs: list[Column] = []
    rows: list[tuple[str, str]] = []
    for c in columns:
        aggs += [
            _rate(base, c).alias(f"{c}__null_rate__b"),
            _rate(curr, c).alias(f"{c}__null_rate__c"),
            _distinct(base, c).alias(f"{c}__distinct_count__b"),
            _distinct(curr, c).alias(f"{c}__distinct_count__c"),
        ]
        rows += [(c, "null_rate"), (c, "distinct_count")]
    for c in mean_columns:
        aggs += [
            _mean(base, c).alias(f"{c}__mean__b"),
            _mean(curr, c).alias(f"{c}__mean__c"),
        ]
        rows.append((c, "mean"))
    one = df.agg(*aggs)
    parts = [
        one.select(
            F.lit(c).alias("column_name"),
            F.lit(m).alias("metric"),
            F.col(f"{c}__{m}__b").alias("baseline_value"),
            F.col(f"{c}__{m}__c").alias("current_value"),
            F.round(
                F.col(f"{c}__{m}__c") - F.col(f"{c}__{m}__b"), 9
            ).alias("delta"),
        )
        for c, m in rows
    ]
    for c in categorical_columns:
        shares = (
            df.select(
                F.col(c).alias("category"), base.alias("__is_base")
            )
            .groupBy("category")
            .agg(
                F.sum(F.col("__is_base").cast("long")).alias("nb"),
                F.sum((~F.col("__is_base")).cast("long")).alias("nc"),
            )
        )
        # totals via a 1-row broadcast, not a global (single-partition)
        # window — category cardinality is bounded but the idiom must
        # hold at any width (same pattern as curation/profiling shares)
        totals = shares.agg(
            F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
        )
        with_totals = shares.crossJoin(F.broadcast(totals))
        tvd = with_totals.agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("nb").cast("double") / F.col("tb")
                        - F.col("nc").cast("double") / F.col("tc")
                    )
                )
                / 2,
                9,
            ).alias("delta")
        ).select(
            F.lit(c).alias("column_name"),
            F.lit("total_variation").alias("metric"),
            F.lit(None).cast("double").alias("baseline_value"),
            F.lit(None).cast("double").alias("current_value"),
            "delta",
        )
        parts.append(tvd)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
