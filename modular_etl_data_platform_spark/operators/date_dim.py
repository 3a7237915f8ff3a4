"""Date-dimension generator (SURVEY §2.8 G1 / §2.9 C6).

Materializes the calendar declared in the reference
(reference: config/gold/schema/gold_dim_date_schema.json:9-13, columns
:14-119) via ``sequence()`` + ``explode`` — fully JVM-side, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.functions.scalar import date_key, is_weekend


def build_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar table with derived attributes (T4/T5/T9).

    Scale: the generated range is tiny (thousands of rows) — always the
    broadcast side of star joins.
    """
    dates = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day)) AS date"
    )
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
        # reference placeholders (gold_dim_date_schema.json:89-119):
        # is_holiday is declared `false` pending a holiday calendar;
        # the fiscal calendar is declared = the civil calendar
        F.lit(False).alias("is_holiday"),
        F.year("date").cast("int").alias("fiscal_year"),
        F.quarter("date").cast("int").alias("fiscal_quarter"),
        F.month("date").cast("int").alias("fiscal_period"),
    )
