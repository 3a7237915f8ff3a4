"""Fact-table builder (SURVEY §2.9 C5): dimension-key resolution,
calculated measures, derived date keys, per-group counts.

Composes the join operators (J1-J4/J6), scalar date keys (T5/J3) and
arithmetic measures (T8) per the reference's fact configs (reference:
config/gold/schema/README.md:321-341; gold_fact_orders_schema.json:30-46;
gold_fact_order_items_schema.json:104-162).

Scale: dimension lookups broadcast (dims are small by construction);
measures are projections; the optional per-parent counts (A3 item_count)
add one aggregation shuffle on the parent key, which AQE handles for skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.functions.scalar import date_key
from modular_etl_data_platform_spark.operators.joins import current_join, pit_join


@dataclass
class DimensionLookup:
    """One dimension-key resolution step for a fact load."""

    dim: DataFrame
    business_key: str | list[str]
    join_type: str = "point_in_time"  # point_in_time | current | direct
    event_time: str | None = None  # fact column, PIT joins only
    select: list[str] = field(default_factory=list)  # dim cols to carry


def load_fact(
    base: DataFrame,
    lookups: list[DimensionLookup],
    measures: dict[str, str] | None = None,
    date_keys: dict[str, str] | None = None,
    counts_from: tuple[DataFrame, str, str] | None = None,
) -> DataFrame:
    """Build a fact table.

    - ``lookups`` resolve surrogate keys / attributes from dimensions;
    - ``date_keys`` maps new-column → source timestamp column (yyyyMMdd
      int, computed — not joined, per J3);
    - ``measures`` maps new-column → SQL expression (T8);
    - ``counts_from`` = (child_df, child_fk, count_col): A3-style
      per-parent row counts folded in via one aggregation + join.
    """
    out = base
    for lk in lookups:
        dim = lk.dim
        if lk.select:
            keys = [lk.business_key] if isinstance(lk.business_key, str) else lk.business_key
            carry = [c for c in dict.fromkeys(list(keys) + lk.select)]
            extra = [
                c
                for c in ("valid_from", "valid_to", "is_current")
                if c in dim.columns and c not in carry
            ]
            dim = dim.select(*carry, *extra)
        if lk.join_type == "point_in_time":
            assert lk.event_time, "PIT lookup requires event_time"
            out = pit_join(out, dim, lk.business_key, lk.event_time)
            out = out.drop("valid_from", "valid_to", "is_current")
        elif lk.join_type == "current":
            out = current_join(out, dim, lk.business_key)
            out = out.drop("is_current")
        elif lk.join_type == "direct":
            out = out.join(F.broadcast(dim), lk.business_key, "left")
        else:
            raise ValueError(f"unknown join_type {lk.join_type}")
    for col, src in (date_keys or {}).items():
        out = out.withColumn(col, date_key(src))
    if counts_from is not None:
        child, fk, count_col = counts_from
        counts = child.groupBy(fk).agg(F.count(F.lit(1)).alias(count_col))
        out = out.join(counts, fk, "left").fillna({count_col: 0})
    for col, expr in (measures or {}).items():
        out = out.withColumn(col, F.expr(expr))
    return out
