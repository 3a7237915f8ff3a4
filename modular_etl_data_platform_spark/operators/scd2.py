"""SCD Type 2 dimensional engine (SURVEY §2.9 C4).

Two entry points:

- :func:`scd2_from_history` — build a full SCD2 dimension from a change
  history in one pass (window lead): used for initial loads and as the
  SQL-checkable semantics oracle.
- :func:`apply_scd_type2` — incremental merge of a new batch into an
  existing dimension: change-detection via null-safe hash (T6), close old
  versions, insert new ones, Type-1 columns updated in place without a new
  version. Algorithm per the reference contract
  (reference: config/gold/schema/README.md:135-156, signature :305-319,
  per-dim config gold_dim_customer_schema.json:158-187).

Invariants (C7, reference: config/gold/schema/README.md:345-357):
exactly one ``is_current`` row per business key; no overlapping validity
ranges; ``valid_from < valid_to``. Enforced by construction; checked by
operators/quality.py.

Scale notes: both paths shuffle once on the business key. Multiple changes
for one key within a batch are ordered by change time and chained — no
lost updates. Idempotent: re-applying a batch with identical hashes is a
no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.functions.scalar import null_safe_hash

HIGH_DATE = "9999-12-31 00:00:00"


def scd2_from_history(
    df: DataFrame,
    keys: list[str],
    change_time: str,
    attr_cols: dict[str, str] | None = None,
    tiebreakers: list[str] | None = None,
    high_date: str = HIGH_DATE,
) -> DataFrame:
    """Build SCD2 version chains from a change history.

    Emits one row per change with ``valid_from``/``valid_to`` (half-open,
    next change's time), ``is_current`` and a per-key ``version`` number.
    """
    order = [F.col(change_time).asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(change_time)).over(w)
    out = df.select(
        *keys,
        F.col(change_time).alias("valid_from"),
        F.coalesce(nxt, F.lit(high_date).cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
        *[F.col(src).alias(dst) for dst, src in (attr_cols or {}).items()],
    )
    return out


def apply_scd_type2(
    current_dim: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    type2_cols: list[str],
    type1_cols: list[str] | None = None,
    change_time_col: str = "updated_timestamp",
    surrogate_key_col: str = "surrogate_key",
    hash_delimiter: str = "|",
    high_date: str = HIGH_DATE,
) -> DataFrame:
    """Incrementally merge ``batch`` into ``current_dim`` (may be None).

    Steps (one business-key shuffle):
      1. collapse the batch to version chains (handles multiple changes per
         key in one batch, consecutive-duplicate hashes dropped);
      2. compare the batch's first version against the dimension's current
         row hash — unchanged keys are a no-op (idempotency);
      3. close superseded current rows (``valid_to`` = first new change,
         ``is_current`` = false);
      4. union new versions; apply Type-1 overwrites across *all* versions
         of a key; assign surrogate keys.

    Surrogate keys are STABLE across merges: rows already in
    ``current_dim`` keep their key (facts and consumers holding keys from
    a prior run still point at the same dimension rows), and only new
    version rows draw keys from ``max(existing) + row_number`` — the
    per-batch offset-block allocation that also avoids renumbering (and
    re-sorting) the whole dimension each merge. Keys stay dense because a
    merge never deletes rows.
    """
    type1_cols = type1_cols or []
    batch_hash = batch.withColumn("__h", null_safe_hash(type2_cols, hash_delimiter))

    # 1. within-batch chains, dropping consecutive same-hash changes
    w = Window.partitionBy(*keys).orderBy(F.col(change_time_col).asc())
    chained = (
        batch_hash.withColumn("__prev_h", F.lag("__h").over(w))
        .filter(F.col("__prev_h").isNull() | (F.col("__prev_h") != F.col("__h")))
        .drop("__prev_h")
    )

    attr_cols = [c for c in batch.columns if c not in {change_time_col}]

    if current_dim is None or not current_dim.columns:
        versions = scd2_from_history(
            chained.drop("__h"),
            keys,
            change_time_col,
            attr_cols={c: c for c in attr_cols if c not in keys},
        )
        return _assign_surrogate(versions, keys, surrogate_key_col)

    cur = current_dim.withColumn(
        "__cur_h", null_safe_hash(type2_cols, hash_delimiter)
    )

    # 2. effective changes vs the dimension's current row per key:
    #    (a) drop late/duplicate deliveries (change_time <= current
    #        valid_from) — makes batch replays a no-op (idempotency);
    #    (b) drop the *leading* remaining row when its hash equals the
    #        current hash (a re-export of the present state is not a
    #        change; later rows in the chain are genuine — they differ
    #        from their predecessor, hence from the current state too).
    cur_active = cur.filter(F.col("is_current"))
    cur_meta = cur_active.select(
        *keys, F.col("valid_from").alias("__cur_vf"), "__cur_h"
    )
    eff = (
        chained.join(cur_meta, keys, "left")
        .filter(
            F.col("__cur_vf").isNull()
            | (F.col(change_time_col) > F.col("__cur_vf"))
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(~((F.col("__rn") == 1) & F.col("__h").eqNullSafe(F.col("__cur_h"))))
        .drop("__rn", "__cur_vf", "__cur_h")
    )
    affected = eff.groupBy(*keys).agg(
        F.min(change_time_col).alias("__first_change")
    )

    # 3. close superseded current rows (keeping their surrogate keys)
    has_sk = surrogate_key_col in current_dim.columns
    hist_cols = [c for c in current_dim.columns if c != surrogate_key_col]
    keep_cols = [*hist_cols, surrogate_key_col] if has_sk else hist_cols
    closed = (
        cur.join(affected, keys, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("__first_change").isNotNull(),
                F.col("__first_change"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("__first_change").isNull(),
        )
        .select(*keep_cols)
    )

    # 4. new version rows: the effective changes only
    new_versions = scd2_from_history(
        eff.drop("__h"),
        keys,
        change_time_col,
        attr_cols={c: c for c in attr_cols if c not in keys},
    ).drop("version")
    # align to history shape; new rows carry a NULL surrogate until step 5
    for c in hist_cols:
        if c not in new_versions.columns:
            new_versions = new_versions.withColumn(c, F.lit(None))
    if has_sk:
        new_versions = new_versions.withColumn(
            surrogate_key_col, F.lit(None).cast("long")
        )
    new_versions = new_versions.select(*keep_cols)

    merged = closed.unionByName(new_versions)

    # Type-1 overwrite: latest batch value propagates to every version
    if type1_cols:
        latest = batch.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(F.col(change_time_col).desc())
            ),
        ).filter(F.col("__rn") == 1)
        t1 = latest.select(*keys, *[F.col(c).alias(f"__t1_{c}") for c in type1_cols])
        merged = merged.join(t1, keys, "left")
        for c in type1_cols:
            merged = merged.withColumn(
                c, F.coalesce(F.col(f"__t1_{c}"), F.col(c))
            ).drop(f"__t1_{c}")

    # 5. recompute versions, then surrogate keys: existing rows keep
    #    theirs; new rows draw a max(existing)+row_number offset block.
    #    The MAX is attached as a broadcast 1-row frame so the whole merge
    #    stays one lazy plan (no driver action inside the operator).
    merged = _renumber(merged, keys)
    if not has_sk:
        return _assign_surrogate(merged, keys, surrogate_key_col)
    maxk = merged.agg(
        F.coalesce(F.max(surrogate_key_col), F.lit(0)).cast("long").alias("__start")
    )
    keyed = merged.filter(F.col(surrogate_key_col).isNotNull())
    fresh = assign_surrogate_keys(
        merged.filter(F.col(surrogate_key_col).isNull())
        .drop(surrogate_key_col)
        .crossJoin(F.broadcast(maxk)),
        [*keys, "valid_from"],
        surrogate_key_col,
        start_col="__start",
    ).drop("__start")
    return keyed.unionByName(fresh.select(*keyed.columns))


def _renumber(dim: DataFrame, keys: list[str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return dim.withColumn("version", F.row_number().over(w).cast("int"))


def assign_surrogate_keys(
    dim: DataFrame,
    order_cols: list[str],
    col: str = "surrogate_key",
    start: int = 0,
    start_col: str | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Deterministic dense surrogate keys (W2), assigned scalably.

    Produces EXACTLY ``start + row_number() over (ORDER BY order_cols)``
    — reproducible, unlike ``monotonically_increasing_id`` (reference
    suggests it at config/gold/schema/README.md:229; we deliberately
    deviate — see SURVEY §4) — but without the single-partition sort a
    global window needs: range-partition on the sort key, rank within
    each partition, then add per-partition offsets (a cumulative count
    over #partitions rows — tiny — broadcast back). Because ``order_cols``
    is a total order, the numbering is identical wherever the range
    boundaries land, so the samples the range partitioner draws don't
    affect the result (the same argument that makes RDD ``zipWithIndex``
    deterministic on sorted input).

    ``start_col`` names an already-attached constant column (e.g. the
    broadcast MAX of existing keys) to offset by, keeping the whole plan
    lazy; ``start`` is the int equivalent for driver-known offsets.

    The pid-stamped frame is localCheckpoint'ed (lazily): the offset
    branch and the rank branch must read the SAME materialization — two
    independent executions of the range exchange may sample different
    boundaries, silently mixing counts from one layout with pids from
    another. This is the DataFrame analogue of ``zipWithIndex``'s
    count-then-map two-job structure (RDDs get consistency for free
    because the RangePartitioner's boundaries are computed once on the
    driver; repartitionByRange re-samples per execution).
    """
    sort = [F.col(c).asc() for c in order_cols]
    if buckets is None:
        buckets = dim.sparkSession.sparkContext.defaultParallelism
    ranged = (
        dim.repartitionByRange(max(buckets, 1), *sort)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wp = Window.partitionBy("__pid").orderBy(*sort)
    ranked = ranged.withColumn("__rn", F.row_number().over(wp))
    wo = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranked.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(wo), F.lit(0)))
        .select("__pid", "__off")
    )
    base = F.col(start_col) if start_col else F.lit(start)
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(col, (base + F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def _assign_surrogate(dim: DataFrame, keys: list[str], col: str) -> DataFrame:
    return assign_surrogate_keys(dim, [*keys, "valid_from"], col)
