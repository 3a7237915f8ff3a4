"""Interval operators: overlapping-interval merge (gaps-and-islands) and
a binned interval join — the "which rows fall inside which time windows"
primitives an incident-attribution or downtime-accounting pipeline needs.

Spark has no native range-join optimization: a join whose only predicate
is ``ts BETWEEN start AND end`` plans as BroadcastNestedLoopJoin (every
event row compared against EVERY window). These operators provide the
scale paths:

- **merge_intervals** is the classic gaps-and-islands rewrite: sort each
  key's intervals by start, carry the running ``max(end)`` over the
  preceding rows, open a new island whenever ``start`` exceeds it, and
  island-number with a running sum. One shuffle (the per-key window);
  work is linear in interval count. Keyless merges fall back to a
  single-partition window — fine for the "few thousand incident
  windows" case it exists for, and documented as such.
- **interval_join** assigns every probe row to a fixed-width time bin
  and explodes each interval into the bins it overlaps, turning the
  nested-loop join into an **equi-join on bin** plus a residual range
  filter. A probe row lives in exactly one bin, so each (row, interval)
  pair is produced at most once — no post-join dedup. Cost is
  ``O(events + windows * avg_window_bins)`` shuffled by bin, versus
  ``O(events * windows)`` for the nested loop. Bin width trades explode
  factor (long windows -> many bins) against bucket fan-in (short bins
  -> more bins per window); set it near the median window length.

At 100 TB: events shuffle once on bin (uniform by construction — bins
are time, load tracks event-rate), windows explode map-side, and AQE
broadcasts the exploded window side when it is small (the common case:
thousands of incident windows vs billions of events), which removes the
event shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_intervals(
    df: DataFrame,
    ts_col: str,
    length_seconds: int,
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Each row opens an interval ``[ts, ts + length_seconds)`` — the
    usual way incident windows are seeded from trigger events."""
    keys = [F.col(k) for k in (key_cols or [])]
    return df.select(
        *keys,
        F.col(ts_col).alias("start"),
        (F.col(ts_col) + F.expr(f"INTERVAL {int(length_seconds)} SECOND")).alias(
            "end"
        ),
    )


def merge_intervals(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Coalesce overlapping (and touching) intervals per key.

    Returns one row per merged island: key columns plus
    ``(window_start, window_end, n_source)``. Touching intervals
    (``a.end == b.start``) merge — the half-open reading of adjacency.

    Scale: one shuffle on the key columns; islands are found with two
    linear window passes (running max(end), running sum of island
    breaks). With ``key_cols=None`` the window is single-partition —
    acceptable only when the interval count is small (incident windows),
    and deliberate: a global merge is inherently sequential.
    """
    keys = list(key_cols or [])
    w_order = [F.col(start_col).asc(), F.col(end_col).asc()]
    base = Window.partitionBy(*keys).orderBy(*w_order) if keys else Window.orderBy(
        *w_order
    )
    w_prev = base.rowsBetween(Window.unboundedPreceding, -1)
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    flagged = intervals.withColumn(
        "__new_island",
        F.when(F.col(start_col) > F.max(end_col).over(w_prev), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("__island", F.sum("__new_island").over(w_run))
    return (
        flagged.groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias("window_start"),
            F.max(end_col).alias("window_end"),
            F.count(F.lit(1)).alias("n_source"),
        )
        .drop("__island")
    )


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "window_start",
    end_col: str = "window_end",
    bin_seconds: int = 600,
    key_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join probe rows to every interval containing their timestamp
    (``start <= ts < end``) WITHOUT a nested-loop plan.

    Both sides are bucketed into ``bin_seconds``-wide time bins on the
    SECOND-truncated epoch: a probe row gets its single bin, an interval
    explodes (map-side, via ``sequence()``) into every bin between its
    truncated start and end. The join is then an equi-join on
    ``(key_cols..., bin)`` with the exact range predicate as a residual
    filter. Truncating both sides identically guarantees a covering
    interval always shares the probe's bin (the end bin is taken
    inclusively, over-covering by at most one bin — the residual filter
    removes the excess).

    ``how``:
    - "inner": one row per (probe row, containing interval);
    - "left": additionally keeps probe rows inside NO interval, with the
      interval columns null;
    - "left_semi": probe rows inside at least one interval;
    - "left_anti": probe rows inside NO interval (the
      "exclude maintenance windows" filter).
    The exact range predicate rides INSIDE the join condition, so outer
    and anti semantics are with respect to the true containment test,
    not the coarse bin match. Probe columns keep their names.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"interval_join supports inner|left|left_semi|left_anti, got {how!r}"
        )
    keys = list(key_cols or [])
    bin_s = int(bin_seconds)

    # a malformed interval (end < start) contains no timestamp under the
    # half-open test, so dropping it is semantics-preserving in every
    # mode — without this, sequence() would generate a DESCENDING bin
    # range for it (not an empty one) and explode garbage rows that the
    # residual filter pays to discard
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    p = probe.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bin_s))
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(bin_s)),
                F.floor(F.unix_timestamp(F.col(end_col)) / F.lit(bin_s)),
            )
        ),
    )
    cond = p["__bin"] == iv["__bin"]
    for k in keys:
        cond = cond & (p[k] == iv[k])
    cond = cond & (p[ts_col] >= iv[start_col]) & (p[ts_col] < iv[end_col])
    if how in ("left_semi", "left_anti"):
        return p.join(iv, cond, how).drop("__bin")
    joined = p.join(iv, cond, how).drop(p["__bin"]).drop(iv["__bin"])
    for k in keys:
        joined = joined.drop(iv[k])
    return joined
