"""Change-data-capture application: collapse an ordered change log
(upserts + deletes) into current table state, or merge a change batch
into an existing snapshot.

The reference's silver layer declares keyed upserts only
(``config/silver/schema/README.md:113-122`` — WHEN MATCHED UPDATE /
WHEN NOT MATCHED INSERT); real CDC feeds (Debezium, Delta CDF) add a
delete opcode. This operator is that superset: the standard
``foreachBatch``/MERGE pattern Spark pipelines use to apply CDC.

Scale design: one shuffle on the key for the keep-latest window — the
same plan as dedup keep-latest (W1). ``row_number`` (not ``rank``) over
a TOTAL order (sequence columns must include a unique tiebreaker) keeps
the winner deterministic. Merging into a snapshot unions the snapshot
as implicit upserts BELOW every change (sequence literal ``-inf``), so
the merge is the same single-window plan — no extra join, and the
snapshot never needs to be re-sorted separately.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

UPSERT_OP = "U"
DELETE_OP = "D"


def apply_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """Collapse a CDC log to current state: keep the latest change per
    key (by ``seq_cols``, descending), then drop keys whose latest
    change is a delete. ``seq_cols`` must totally order changes within
    a key (include a unique id as the last column)."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = DELETE_OP,
) -> DataFrame:
    """Merge a CDC batch into an existing snapshot: snapshot rows act as
    upserts ordered before every change (their sequence columns are
    NULL, which ``desc`` orders last), so one keep-latest window yields
    the post-merge state. Columns of ``snapshot`` must be the payload
    columns of ``changes`` (no op/seq columns)."""
    payload = snapshot.columns
    base = snapshot.withColumn(op_col, F.lit(UPSERT_OP))
    for c in seq_cols:
        base = base.withColumn(c, F.lit(None).cast(changes.schema[c].dataType))
    aligned = changes.select(*payload, op_col, *seq_cols)
    log = base.select(*payload, op_col, *seq_cols).unionByName(aligned)
    return apply_changes(log, keys, seq_cols, op_col, delete_op).select(
        *payload
    )


def apply_cdc_parquet(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = DELETE_OP,
) -> None:
    """Apply a CDC micro-batch to a parquet table: upserts replace
    matching rows, deletes remove them, the rewrite is an atomic
    staging swap. The delete-capable superset of ``upsert_parquet``;
    like it, a Delta deployment would be a ``MERGE`` with a
    ``whenMatchedDelete`` clause instead."""
    from modular_etl_data_platform_spark.operators.upsert import (
        atomic_overwrite,
    )

    exists = os.path.exists(path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    )
    if exists:
        snapshot = spark.read.parquet(path)
        merged = merge_changes(
            snapshot, batch, keys, seq_cols, op_col, delete_op
        )
    else:
        payload = [
            c for c in batch.columns if c != op_col and c not in seq_cols
        ]
        merged = apply_changes(batch, keys, seq_cols, op_col, delete_op).select(
            *payload
        )
    atomic_overwrite(merged, path)
