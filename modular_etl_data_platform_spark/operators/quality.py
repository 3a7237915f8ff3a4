"""Gold-layer invariant checks (SURVEY §2.9 C7) + DQ metrics helpers.

The reference prescribes these as the Gold data-quality suite (reference:
config/gold/schema/README.md:345-357): exactly one current row per
business key, no overlapping validity ranges, no orphaned facts, measures
within expected ranges. Each check returns a DataFrame of violations
(empty == healthy) so they compose into monitoring jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_current_violations(dim: DataFrame, keys: list[str]) -> DataFrame:
    """Business keys with ≠ 1 current row."""
    return (
        dim.groupBy(*keys)
        .agg(F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n_current"))
        .filter(F.col("n_current") != 1)
    )


def scd2_overlap_violations(
    dim: DataFrame, keys: list[str], tiebreakers: list[str] | None = None
) -> DataFrame:
    """Version intervals that overlap their successor (valid_to > next
    valid_from) or are degenerate (valid_from >= valid_to).

    ``tiebreakers`` (e.g. ``["version"]``) totalize the window order when
    a key can carry duplicate valid_from values — without one, which row
    LEAD picks is engine-internal and the violation count can differ
    between engines."""
    order = [F.col("valid_from").asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead("valid_from").over(w)
    return (
        dim.withColumn("__next_from", nxt)
        .filter(
            (F.col("valid_from") >= F.col("valid_to"))
            | (F.col("__next_from").isNotNull() & (F.col("valid_to") > F.col("__next_from")))
        )
        .drop("__next_from")
    )


def orphaned_fact_violations(
    fact: DataFrame, dim: DataFrame, fact_fk: str, dim_key: str
) -> DataFrame:
    """Fact rows referencing no dimension row (J5 over surrogate keys)."""
    keys = dim.select(F.col(dim_key).alias(fact_fk)).dropDuplicates()
    return fact.join(F.broadcast(keys), fact_fk, "left_anti")


def measure_range_violations(
    fact: DataFrame, ranges: dict[str, tuple[float | None, float | None]]
) -> DataFrame:
    """Rows with any measure outside its [lo, hi] envelope."""
    cond = F.lit(False)
    for col, (lo, hi) in ranges.items():
        c = F.col(col)
        if lo is not None:
            cond = cond | (c < F.lit(lo))
        if hi is not None:
            cond = cond | (c > F.lit(hi))
    return fact.filter(cond)


def assert_healthy(dim: DataFrame, keys: list[str]) -> None:
    """Raise if any SCD2 invariant is violated (test/CI hook)."""
    n_cur = scd2_current_violations(dim, keys).count()
    n_olap = scd2_overlap_violations(dim, keys).count()
    if n_cur or n_olap:
        raise AssertionError(
            f"SCD2 invariants violated: {n_cur} current-count, {n_olap} overlap"
        )
