"""Skew mitigation for joins and aggregations (SURVEY §4).

AQE's skew-join handles most sort-merge skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); these
operators cover the cases AQE can't:

- :func:`salted_join` — explicit salting for a *broadcast-ineligible*
  many-to-one join with a handful of hot keys: replicate each right-side
  row ``salt`` times, scatter the left side uniformly across the salt
  space, join on (key, salt). Shuffle partitions for a hot key shrink by
  ``salt``×. AQE splits oversized *partitions*, but when one KEY dominates
  a partition, only salting divides that key's rows.
- :func:`salted_distinct_count` — two-stage distinct aggregation for a
  skewed group key: partial distinct on (key, salt), then merge. The
  classic COUNT(DISTINCT) over a hot key otherwise funnels the whole key
  into one task.

Both preserve exact semantics; ``salt`` trades shuffle fan-out for hot-key
parallelism and should be ~(hot-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join with the left side's hot keys spread over ``salt``
    sub-keys. ``right`` must be the many-to-ONE side (each key at most one
    row — a dimension), since its rows are replicated per salt value."""
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalt.join(rsalt, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_key: str,
    distinct_col: str,
    salt: int = 32,
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group_key without funneling a hot
    group into one task: stage 1 dedups (key, hash-salt-of-value, value)
    partitions, stage 2 merges partial distinct counts.

    Salting by ``hash(value) % salt`` (not rand) keeps equal values in the
    same sub-group, so stage-2 SUM of partial counts is exact.
    """
    parted = (
        df.select(group_key, distinct_col)
        .withColumn("__salt", (F.hash(F.col(distinct_col)) % salt + salt) % salt)
        .groupBy(group_key, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return parted.groupBy(group_key).agg(
        F.sum("__partial").cast("long").alias(f"n_distinct_{distinct_col}")
    )
