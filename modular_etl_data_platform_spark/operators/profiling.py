"""Data-profiling operators: candidate-key discovery, equi-width value
histograms, and join-key skew profiling — the discovery pass a platform
runs over an unfamiliar feed before authoring schemas, DQ rules
(reference config/silver/schema/README.md:139-157 declares the rules;
these operators find them), and join strategies.

Scale design:

- **Candidate keys**: all distinct counts for all candidate column sets
  are aggregates of ONE scan (Spark evaluates multi-DISTINCT aggregates
  with one Expand — n_sets+1 rows shuffled per input row, fine for
  profiling runs; use approx_count_distinct at 100 TB for a first pass
  and exact-verify only the survivors).
- **Histogram**: two-pass — a 1-row min/max aggregate broadcast back
  over the scan (the only correct distributed shape for data-derived
  bounds), then a groupBy on the bucket id (≤ n_buckets groups).
- **Key skew**: per-key counts (one map-combined shuffle) then
  TakeOrdered top-k — never a global sort; the 1-row total joins back
  by broadcast for the share column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_keys(
    df: DataFrame, column_sets: Sequence[Sequence[str]], label_prefix: str = ""
) -> DataFrame:
    """For each candidate column set: row count, distinct count, and
    whether the set uniquely identifies rows (a candidate key). Multi-
    column distincts use SQL ``COUNT(DISTINCT a, b)`` semantics (rows
    with any NULL member are skipped) — profile null-free columns or
    read ``n_distinct + n_nulls == n_rows`` accordingly."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    labels = []
    for i, cols in enumerate(column_sets):
        aggs.append(F.countDistinct(*cols).cast("long").alias(f"__d{i}"))
        labels.append(label_prefix + "(" + ",".join(cols) + ")")
    one = df.agg(*aggs)
    parts = [
        one.select(
            F.lit(label).alias("column_set"),
            F.col("__n").alias("n_rows"),
            F.col(f"__d{i}").alias("n_distinct"),
            (F.col(f"__d{i}") == F.col("__n")).alias("is_candidate_key"),
        )
        for i, label in enumerate(labels)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def numeric_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equi-width histogram with data-derived bounds: bucket i covers
    [lo + i·w, lo + (i+1)·w) with w = (max-min)/n_buckets; the max value
    folds into the last bucket. Empty buckets are omitted (join against
    a ``sequence()`` grid to densify). Bounds come from a 1-row
    aggregate broadcast over the scan — two passes, no collect."""
    bounds = df.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )
    x = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("__x")
    )
    bucket = F.least(
        F.floor(
            (F.col("__x") - F.col("__lo"))
            * n_buckets
            / (F.col("__hi") - F.col("__lo"))
        ),
        F.lit(n_buckets - 1),
    ).cast("long")
    width = (F.col("__hi") - F.col("__lo")) / n_buckets
    return (
        x.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "__lo", "__hi")
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            "bucket",
            F.round(F.col("__lo") + F.col("bucket") * width, 9).alias(
                "bucket_lo"
            ),
            F.round(F.col("__lo") + (F.col("bucket") + 1) * width, 9).alias(
                "bucket_hi"
            ),
            "n_rows",
        )
    )


def key_skew_topk(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Hottest join keys: per-key row counts, top-k by count (tie-broken
    by key for determinism), with each key's share of total rows — the
    pre-join diagnostic that decides whether a join needs salting or an
    AQE skew split. TakeOrdered top-k over the aggregated counts; the
    1-row total broadcasts back for the share."""
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").alias("__total"))
    top = counts.orderBy(F.col("n_rows").desc(), F.col(key_col).asc()).limit(k)
    return top.crossJoin(F.broadcast(total)).select(
        key_col,
        "n_rows",
        F.round(
            F.col("n_rows").cast("double") / F.col("__total"), 9
        ).alias("share"),
    )
