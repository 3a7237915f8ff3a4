"""Date-dimension generator (SURVEY §2.8 G1 / §2.9 C6).

Materializes the calendar declared in the reference
(reference: config/gold/schema/gold_dim_date_schema.json:9-13, columns
:14-119) via ``sequence()`` + ``explode`` — fully JVM-side, no driver loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.functions.scalar import date_key, is_weekend

_DEFAULT_HOLIDAYS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs",
    "holidays_us_federal.json",
)


def load_holiday_calendar(path: str | None = None) -> dict[str, str]:
    """Config-driven holiday calendar: ``{"YYYY-MM-DD": name}``. The
    packaged default is the US federal calendar 2024-2026; point ``path``
    at any same-shaped JSON for other jurisdictions."""
    with open(path or _DEFAULT_HOLIDAYS) as f:
        cal = json.load(f)
    return dict(sorted(cal.items()))


def build_dim_date(
    spark: SparkSession,
    start: str,
    end: str,
    holidays: dict[str, str] | None = None,
) -> DataFrame:
    """Calendar table with derived attributes (T4/T5/T9).

    ``holidays`` maps ISO date → holiday name (see
    :func:`load_holiday_calendar`); when provided, ``is_holiday`` is real
    (reference pins it ``false`` pending a calendar —
    gold_dim_date_schema.json:96) and a ``holiday_name`` column is added.
    Without it the reference placeholder behavior is preserved exactly.

    Scale: the generated range is tiny (thousands of rows) — always the
    broadcast side of star joins; the holiday map folds in as a literal
    MAP lookup, no join.
    """
    dates = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS date"
    )
    if holidays:
        pairs = [x for d, n in holidays.items() for x in (F.lit(d), F.lit(n))]
        name_expr = F.element_at(
            F.create_map(*pairs), F.date_format("date", "yyyy-MM-dd")
        )
        holiday_cols = [
            name_expr.isNotNull().alias("is_holiday"),
            name_expr.alias("holiday_name"),
        ]
    else:
        holiday_cols = [F.lit(False).alias("is_holiday")]
    return dates.select(
        date_key("date").alias("date_key"),
        F.col("date"),
        F.year("date").cast("int").alias("year"),
        F.quarter("date").cast("int").alias("quarter"),
        F.month("date").cast("int").alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.dayofmonth("date").cast("int").alias("day_of_month"),
        F.dayofweek("date").cast("int").alias("day_of_week"),
        F.date_format("date", "EEEE").alias("day_name"),
        F.weekofyear("date").cast("int").alias("week_of_year"),
        is_weekend("date").alias("is_weekend"),
        # fiscal calendar declared = the civil calendar, per the reference
        # (gold_dim_date_schema.json:89-119)
        *holiday_cols,
        F.year("date").cast("int").alias("fiscal_year"),
        F.quarter("date").cast("int").alias("fiscal_quarter"),
        F.month("date").cast("int").alias("fiscal_period"),
    )
