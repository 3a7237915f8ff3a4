"""Join operators (SURVEY §2.4 J1-J7): point-in-time, as-of, current-version,
referential-integrity.

Scale design:
- ``pit_join`` (J1) is an equi + interval-range join. With a dimension that
  is small relative to the fact (the normal star case) we ``broadcast`` it,
  so the range predicate is evaluated map-side with zero shuffle of the
  fact. For large dimensions Catalyst falls back to a sort-merge join on
  the business key with the range as a post-join filter; AQE handles skew.
- ``asof_join`` uses the union + window ("sort-merge as-of") formulation:
  instead of expanding all (left, right<=t) candidate pairs and reducing
  them (quadratic under hot keys), it unions the two inputs, sorts once per
  key by time, and carries the latest right-side values forward with
  ``last(ignorenulls)``. One shuffle, linear work — this is the 100 TB
  path for "latest reading before each event" joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    business_key: str | list[str],
    event_time: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version whose
    validity interval covers the event time
    (reference semantics: config/gold/schema/README.md:197-210;
    ``join_logic: "order_date BETWEEN valid_from AND valid_to"``).

    Uses the half-open convention ``valid_from <= t < valid_to`` so
    adjacent versions never both match.
    """
    keys = [business_key] if isinstance(business_key, str) else list(business_key)
    # rename the dim's key columns so the output has a single unambiguous
    # copy of each business key (they are equal by the join condition)
    d = dim
    for k in keys:
        d = d.withColumnRenamed(k, f"__dim_{k}")
    if broadcast_dim:
        d = F.broadcast(d)
    cond = None
    for k in keys:
        c = fact[k] == d[f"__dim_{k}"]
        cond = c if cond is None else (cond & c)
    cond = cond & (fact[event_time] >= d[valid_from]) & (fact[event_time] < d[valid_to])
    return fact.join(d, cond, how).drop(*[f"__dim_{k}" for k in keys])


def current_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    is_current_col: str = "is_current",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Current-version join (J2): join only ``is_current = true`` dim rows
    (reference: config/gold/schema/gold_fact_inventory_schema.json:43-46)."""
    d = dim.filter(F.col(is_current_col))
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreaker: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (or ``<`` when ``strict``) per key.

    Union + per-key window — linear, one shuffle (see module docstring).
    ``tiebreaker`` (ascending) makes the pick deterministic when several
    right rows share the same timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.col(left_time).alias("__t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[tiebreaker].dataType).alias("__tb")
        if tiebreaker
        else F.lit(0).alias("__tb"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        F.lit(0).alias("__side"),
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        (F.col(tiebreaker) if tiebreaker else F.lit(0)).alias("__tb"),
    ).select(*l_tagged.columns)  # align column order for unionByName safety

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal time (as-of is inclusive);
    # with strict=True left rows sort first so an equal-time right row is
    # not yet visible.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), side_order, F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out


def ri_orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str | None = None) -> DataFrame:
    """Referential-integrity anti-join (J5): child rows whose FK has no
    parent (reference: config/silver/schema/README.md:124-135)."""
    pk = pk or fk
    p = parent.select(F.col(pk).alias(fk)).dropDuplicates()
    return child.join(F.broadcast(p), fk, "left_anti")


def ri_valid(child: DataFrame, parent: DataFrame, fk: str, pk: str | None = None) -> DataFrame:
    """Left-semi complement of :func:`ri_orphans`."""
    pk = pk or fk
    p = parent.select(F.col(pk).alias(fk)).dropDuplicates()
    return child.join(F.broadcast(p), fk, "left_semi")
