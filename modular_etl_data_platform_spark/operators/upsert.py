"""Keyed upsert / MERGE sink (SURVEY §2.1 S8).

Semantics per the reference contract (reference:
config/silver/schema/README.md:113-122,188-191): WHEN MATCHED → UPDATE,
WHEN NOT MATCHED → INSERT, where "matched" is equality on the primary
keys.

Implementation strategy:
- **Delta path** (used when ``delta-spark`` is importable): a real
  ``MERGE`` — transactional, file-level rewrite of matched files only.
- **Parquet fallback** (this environment): anti-join the target against
  the batch on the PKs and overwrite atomically via a staging directory.
  At 100 TB the fallback should be partition-scoped: only rewrite
  partitions present in the batch (``overwrite_partitions``), which is
  the same file-pruning win Delta's MERGE gets from data skipping.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not present in this environment
    from delta.tables import DeltaTable

    _HAS_DELTA = True
except ImportError:
    _HAS_DELTA = False


def merge_dataframes(
    target: DataFrame | None, batch: DataFrame, primary_keys: list[str]
) -> DataFrame:
    """Pure-DataFrame MERGE semantics: batch rows replace matching target
    rows; unmatched target rows survive. Returns the merged table."""
    if target is None:
        return batch
    survivors = target.join(
        batch.select(*primary_keys).dropDuplicates(), primary_keys, "left_anti"
    )
    return survivors.unionByName(batch.select(*target.columns))


def upsert_parquet(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    primary_keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """MERGE into a parquet table via staging + atomic move.

    The read-modify-write cycles through a staging dir because Spark
    cannot overwrite a path it is reading from.
    """
    if _HAS_DELTA and DeltaTable.isDeltaTable(spark, path):  # pragma: no cover
        dt = DeltaTable.forPath(spark, path)
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in primary_keys)
        (
            dt.alias("t")
            .merge(batch.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    exists = os.path.exists(path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    )

    # Partition-scoped merge: when every partition column is part of the
    # PK, a key can never move between partitions, so it is safe to merge
    # against ONLY the partitions the batch touches and dynamically
    # overwrite just those — untouched partitions are never read or
    # rewritten. This is the 100 TB shape: cost scales with the batch's
    # partitions, not the table.
    scoped = (
        exists
        and partition_by
        and all(c in primary_keys for c in partition_by)
    )
    if scoped:
        touched = batch.select(*partition_by).dropDuplicates()
        target = spark.read.parquet(path).join(
            F.broadcast(touched), list(partition_by), "left_semi"
        )
        merged = merge_dataframes(target, batch, primary_keys)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            # the plan both reads and overwrites the touched partitions;
            # localCheckpoint severs lineage so the write can't re-scan
            # files it is deleting
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return

    target = spark.read.parquet(path) if exists else None
    merged = merge_dataframes(target, batch, primary_keys)
    atomic_overwrite(merged, path, partition_by)


def atomic_overwrite(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Rewrite ``path`` with ``df`` via staging + rename-aside swap
    (mirrors compact_table): the target is never in a deleted state — a
    crash leaves either the old table or the new one plus a removable
    ``__old`` directory, not a hole. Safe when ``df`` reads from
    ``path`` (the write lands in staging first)."""
    staging = tempfile.mkdtemp(prefix="upsert_staging_")
    shutil.rmtree(staging)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    if os.path.exists(path):
        old = path.rstrip("/") + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        shutil.move(staging, path)
        shutil.rmtree(old)
    else:
        shutil.move(staging, path)


def overwrite_partitions(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Dynamic partition overwrite: replace only the partitions present in
    the batch (the scale-friendly shape of incremental fact loads)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch.write.mode("overwrite").partitionBy(partition_col).parquet(path)
