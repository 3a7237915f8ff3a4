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
         of a key; reassign dense surrogate keys.
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

    # 3. close superseded current rows
    hist_cols = [c for c in current_dim.columns if c != surrogate_key_col]
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
        .select(*hist_cols)
    )

    # 4. new version rows: the effective changes only
    new_versions = scd2_from_history(
        eff.drop("__h"),
        keys,
        change_time_col,
        attr_cols={c: c for c in attr_cols if c not in keys},
    ).drop("version")
    # align to history shape
    for c in hist_cols:
        if c not in new_versions.columns:
            new_versions = new_versions.withColumn(c, F.lit(None))
    new_versions = new_versions.select(*hist_cols)

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

    # recompute version + is_current deterministically, then surrogate keys
    merged = _renumber(merged, keys)
    return _assign_surrogate(merged, keys, surrogate_key_col)


def _renumber(dim: DataFrame, keys: list[str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return dim.withColumn("version", F.row_number().over(w).cast("int"))


def _assign_surrogate(dim: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Deterministic dense surrogate keys (W2).

    ``row_number`` over (business key, valid_from) — reproducible across
    retries, unlike ``monotonically_increasing_id`` (reference suggests it
    at config/gold/schema/README.md:229; we deliberately deviate — see
    SURVEY §4). A single global window is the known cost; at 100 TB
    allocate per-batch offset blocks instead (max existing key + batch
    row_number), which this function accepts via pre-partitioned input.
    """
    w = Window.orderBy(*[F.col(k).asc() for k in keys], F.col("valid_from").asc())
    return dim.withColumn(col, F.row_number().over(w).cast("long"))
