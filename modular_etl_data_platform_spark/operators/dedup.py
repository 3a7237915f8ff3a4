"""Keyed deduplication (SURVEY §2.6 W1): keep the latest row per key.

Algorithm per the reference contract "Deduplicate within batch (keep latest
by ingestion_timestamp)" (reference: config/silver/schema/README.md:113-122).

Scale notes:
- The window exchange shuffles on the primary key — exactly one shuffle.
- ``max_by``-style aggregation is an alternative when only a few columns
  are needed; the window form preserves the full row and lets AQE split
  skewed key partitions.
- For hot keys (heavy skew), pre-aggregate with a salted two-phase
  reduction: ``dedupe_latest_salted``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ingestion_timestamp",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one (latest) row per key.

    ``tiebreakers`` make the pick deterministic when ``order_col`` ties —
    essential for idempotent re-runs and for oracle comparison.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedupe_latest_salted(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    salt_buckets: int = 64,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Two-phase keyed dedup for skewed keys at scale.

    Phase 1 reduces within (key, salt) partitions — map-side-combinable —
    then phase 2 reduces the ``salt_buckets`` survivors per key. Use when a
    single key owns a large share of the batch (e.g. a crawler re-emitting
    one document millions of times); otherwise prefer ``dedupe_latest``.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    first = dedupe_latest(salted, keys + ["__salt"], order_col, tiebreakers)
    return dedupe_latest(first, keys, order_col, tiebreakers).drop("__salt")


def golden_record(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    survivor_cols: list[str],
) -> DataFrame:
    """Survivorship merge (MDM "golden record"): one row per key whose
    ``survivor_cols`` each carry the LATEST NON-NULL value seen for that
    key — unlike ``dedupe_latest``, which keeps one whole row and loses
    older rows' filled-in fields.

    Implementation is one window over the key (single shuffle):
    ``last(col, ignorenulls=True)`` per survivor column over the full
    frame ordered by ``order_cols`` (which must totally order rows within
    a key — include a unique id), then keep the last row per key. All
    survivor lookups share the same Exchange; cost is independent of the
    number of survivor columns."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    out = df
    for c in survivor_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return (
        out.withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Uniqueness audit (SURVEY §2.5 A6): keys appearing more than once."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
