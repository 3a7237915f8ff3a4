"""Schema-first source readers (SURVEY §2.1 S1-S5).

Every read is performed with an explicit schema — no inference — matching
the reference's contract (reference: config/bronze/schema/README.md:72-75).
Glob paths (S4, e.g. ``raw/inventory_*.json``) work natively through
Spark's file listing; per-file lineage comes from ``input_file_name()`` in
the audit columns (sources/audit.py).

Scale note: schema-first reads keep the scan vectorized and enable filter
pushdown + column pruning; at 100 TB the parquet/CSV listing is
parallelized by Spark's driver-side InMemoryFileIndex, and
``maxPartitionBytes`` bounds per-task input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from modular_etl_data_platform_spark.schema.registry import TableConfig

#: Column that carries the raw text of rows the parser could not conform
#: to the declared schema (PERMISSIVE mode). Present in the read output
#: only when ``capture_corrupt=True``; the bronze ingest splits on it and
#: quarantines the failures.
CORRUPT_COL = "_corrupt_record"


def read_source(
    spark: SparkSession,
    config: TableConfig,
    base_path: str | None = None,
    path_override: str | None = None,
    capture_corrupt: bool = False,
) -> DataFrame:
    """Read a configured source (csv/json/parquet) with its declared schema.

    With ``capture_corrupt`` (csv/json only), malformed rows are NOT
    silently nulled: the declared schema is extended with
    :data:`CORRUPT_COL` holding the raw record text, so callers can
    quarantine them (reference error-handling contract:
    config/silver/schema/README.md:291-308, applied at the bronze edge).
    """
    info = config.source_info
    fmt = (info.get("file_format") or "parquet").lower()
    path = path_override or info.get("file_path")
    if path is None:
        raise ValueError(f"table {config.table_name} declares no file_path")
    if base_path:
        path = f"{base_path.rstrip('/')}/{path}"
    schema = config.spark_schema(include_metadata=False)
    if capture_corrupt and fmt in ("csv", "json"):
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return read_path(spark, path, fmt, schema, info)


def read_path(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | None = None,
    options: dict | None = None,
) -> DataFrame:
    options = options or {}
    fmt = fmt.lower()
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.options(
            header=str(bool(options.get("header", True))).lower(),
            sep=options.get("delimiter", ","),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
        ).csv(path)
    if fmt == "json":
        # raw files in the reference are JSON arrays -> multiLine default;
        # pass multiline=False for JSONL (line-delimited) sources
        return reader.options(
            multiLine=str(bool(options.get("multiline", True))).lower(),
            columnNameOfCorruptRecord=CORRUPT_COL,
        ).json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "text":
        # one row per line in a `value` string column; schema optional
        return reader.text(path)
    raise ValueError(f"Unsupported file_format: {fmt}")
