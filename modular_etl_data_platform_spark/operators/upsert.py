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

Crash-safety contract of the parquet fallback (NOT a concurrency
contract — single writer only; concurrent writers need the Delta path):

- Staging is a SIBLING of the target (same filesystem), so the final
  swap is ``os.rename`` — atomic at the directory level, never a
  cross-device recursive copy.
- A crash leaves the target either fully old or fully new (per
  partition, for the scoped path), plus at most a ``__old`` /
  ``__staging`` leftover directory. ``recover_table`` — invoked
  automatically at the start of every ``upsert_parquet`` — heals any
  interrupted swap: rolls back a half-swapped table to the old state,
  or finishes a swap whose cleanup was interrupted.
- The scoped path is atomic PER PARTITION, not across partitions: a
  crash mid-merge can leave some touched partitions updated and others
  not (each individually consistent). Re-running the same upsert is
  idempotent and completes the merge. Cross-partition transactionality
  is exactly what Delta's log adds.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not present in this environment
    from delta.tables import DeltaTable

    _HAS_DELTA = True
except ImportError:
    _HAS_DELTA = False


def merge_dataframes(
    target: DataFrame | None,
    batch: DataFrame,
    primary_keys: list[str],
    evolve_schema: bool = False,
) -> DataFrame:
    """Pure-DataFrame MERGE semantics: batch rows replace matching target
    rows; unmatched target rows survive. Returns the merged table.

    ``evolve_schema=False`` (default): the target schema is the contract
    — batch columns the target lacks are DROPPED (``batch.select(target
    columns)`` raises if the batch is missing a target column, the
    loud-failure half of the contract).

    ``evolve_schema=True`` (Delta's ``mergeSchema``): the merged schema
    is the UNION — target-only columns null-fill on batch rows,
    batch-only columns null-fill on surviving target rows, new columns
    append after the target's (stable positions for downstream
    ``SELECT *`` consumers)."""
    if target is None:
        return batch
    if evolve_schema:
        for c in [c for c in batch.columns if c not in target.columns]:
            target = target.withColumn(c, F.lit(None).cast(batch.schema[c].dataType))
        for c in [c for c in target.columns if c not in batch.columns]:
            batch = batch.withColumn(c, F.lit(None).cast(target.schema[c].dataType))
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
    evolve_schema: bool = False,
) -> None:
    """MERGE into a parquet table via staging + atomic move.

    The read-modify-write cycles through a staging dir because Spark
    cannot overwrite a path it is reading from.

    ``evolve_schema=True`` widens the table to the union schema (see
    :func:`merge_dataframes`). A widening merge always takes the
    FULL-rewrite path even when partition-scoping applies: a scoped
    write would leave touched partitions on the new schema and untouched
    ones on the old, and a plain parquet read resolves the schema from
    one footer — the new column would silently vanish (or surface
    null-torn) depending on file order. One uniform rewrite per widening
    is the price of schema-on-file storage; widenings are rare events,
    and Delta (which records schema in its log) is the scale answer.
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

    recover_table(path)
    exists = os.path.exists(path) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    )

    # Partition-scoped merge: when every partition column is part of the
    # PK, a key can never move between partitions, so it is safe to merge
    # against ONLY the partitions the batch touches and dynamically
    # overwrite just those — untouched partitions are never read or
    # rewritten. This is the 100 TB shape: cost scales with the batch's
    # partitions, not the table.
    widening = (
        evolve_schema
        and exists
        and any(
            c not in spark.read.parquet(path).columns for c in batch.columns
        )
    )
    scoped = (
        exists
        and partition_by
        and all(c in primary_keys for c in partition_by)
        and not widening  # widening must rewrite ALL files (see docstring)
    )
    if scoped:
        touched = batch.select(*partition_by).dropDuplicates()
        target = spark.read.parquet(path).join(
            F.broadcast(touched), list(partition_by), "left_semi"
        )
        merged = merge_dataframes(target, batch, primary_keys, evolve_schema)
        # stage the merged touched partitions NEXT TO the target (same
        # filesystem), then swap each partition directory in with atomic
        # renames — no localCheckpoint needed (we never overwrite what we
        # read), and no dynamic-overwrite commit window where a crash can
        # tear an individual partition
        staging = _staging_dir(path)
        merged.write.mode("overwrite").partitionBy(*partition_by).parquet(staging)
        _swap_partitions(staging, path)
        return

    target = spark.read.parquet(path) if exists else None
    merged = merge_dataframes(target, batch, primary_keys, evolve_schema)
    atomic_overwrite(merged, path, partition_by)


def _staging_dir(path: str) -> str:
    """A staging directory that is a SIBLING of the target — same
    filesystem, so the final swap is an atomic ``os.rename`` rather than
    a cross-device recursive copy (the old ``/tmp`` staging was a copy on
    any multi-volume host: slow at scale and a wide crash window)."""
    staging = path.rstrip("/") + f"__staging{os.getpid()}"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    return staging


def _leaf_data_dirs(root: str) -> list[str]:
    """Relative paths of directories under ``root`` that directly contain
    parquet files (the partition leaves of a partitioned write; ``[""]``
    for an unpartitioned one)."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(os.path.relpath(dirpath, root))
    return leaves


def _swap_partitions(staging: str, path: str) -> None:
    """Atomically swap every partition directory present in ``staging``
    into ``path``: old partition renamed aside into ``<path>__old_parts``
    (a SIBLING — never inside the table, so a crash never leaves a bogus
    aside partition visible to readers), new partition renamed in, aside
    tree removed last. Atomic per partition; ``recover_table`` heals a
    crash between the two renames.

    The aside suffix is DISTINCT from the whole-table swap's
    ``__old_full``: the two interrupted states need opposite recoveries
    (restore missing partitions vs drop the aside), and a shared suffix
    would make a completed-but-uncleaned whole-table overwrite look like
    a torn partition swap — resurrecting partitions the overwrite
    legitimately removed."""
    old_root = path.rstrip("/") + "__old_parts"
    if os.path.exists(old_root):
        shutil.rmtree(old_root)
    os.makedirs(path, exist_ok=True)
    for rel in _leaf_data_dirs(staging):
        if rel == ".":
            raise ValueError(
                "_swap_partitions expects a partitioned staging layout; "
                "use atomic_overwrite for unpartitioned tables"
            )
        spart = os.path.join(staging, rel)
        tpart = os.path.join(path, rel)
        if os.path.exists(tpart):
            aside = os.path.join(old_root, rel)
            os.makedirs(os.path.dirname(aside), exist_ok=True)
            os.rename(tpart, aside)
        else:
            os.makedirs(os.path.dirname(tpart), exist_ok=True)
        os.rename(spart, tpart)
    if os.path.exists(old_root):
        shutil.rmtree(old_root)
    shutil.rmtree(staging)  # leftover _SUCCESS marker etc.


def recover_table(path: str) -> None:
    """Heal an interrupted atomic swap on ``path`` (idempotent; called at
    the start of every ``upsert_parquet``). The aside suffix encodes
    which swap was interrupted, because the two need OPPOSITE recoveries:

    - ``__old_full`` (whole-table swap): target missing → roll the old
      table back; target present → the swap COMPLETED and only cleanup
      crashed → drop the aside (its partitions may have been
      legitimately removed by the overwrite — restoring them would
      resurrect deleted rows / duplicate PKs);
    - ``__old_parts`` (per-partition swap): restore each aside partition
      the target is missing (those are mid-swap), then drop the aside;
    - stale ``__staging*`` from a crash before any rename → remove.
    """
    base_path = path.rstrip("/")
    old_full = base_path + "__old_full"
    if os.path.exists(old_full):
        if not os.path.exists(path):
            os.rename(old_full, path)
        else:
            shutil.rmtree(old_full)
    old_parts = base_path + "__old_parts"
    if os.path.exists(old_parts):
        for rel in _leaf_data_dirs(old_parts):
            if rel == ".":
                continue
            tgt = os.path.join(path, rel)
            if not os.path.exists(tgt):
                os.makedirs(os.path.dirname(tgt), exist_ok=True)
                os.rename(os.path.join(old_parts, rel), tgt)
        shutil.rmtree(old_parts)
    parent, base = os.path.split(base_path)
    parent = parent or "."
    if os.path.isdir(parent):
        for entry in os.listdir(parent):
            if entry.startswith(base + "__staging"):
                shutil.rmtree(os.path.join(parent, entry))


def atomic_overwrite(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Rewrite ``path`` with ``df`` via sibling staging + rename-aside
    swap (mirrors compact_table): the target is never in a deleted state —
    a crash leaves either the old table or the new one plus a leftover
    ``__old``/``__staging`` directory that ``recover_table`` removes or
    rolls back. Safe when ``df`` reads from ``path`` (the write lands in
    staging first). Staging is a sibling of ``path`` so both renames are
    same-filesystem atomic moves."""
    staging = _staging_dir(path)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    if os.path.exists(path):
        old = path.rstrip("/") + "__old_full"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)
    else:
        os.rename(staging, path)


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
