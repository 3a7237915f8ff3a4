from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.scd2 import (
    apply_scd_type2,
    scd2_from_history,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _check_invariants(dim_rows):
    """Gold SCD2 invariants (C7): one current row per key, no overlapping
    validity, valid_from < valid_to."""
    by_key = {}
    for r in dim_rows:
        by_key.setdefault(r.bk, []).append(r)
    for key, rows in by_key.items():
        currents = [r for r in rows if r.is_current]
        assert len(currents) == 1, f"key {key}: {len(currents)} current rows"
        rows = sorted(rows, key=lambda r: r.valid_from)
        for r in rows:
            assert r.valid_from < r.valid_to
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to <= b.valid_from, f"overlap on {key}"


def test_scd2_from_history_invariants(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "NY"),
            (1, _ts("2024-03-01T00:00:00"), "CA"),
            (1, _ts("2024-06-01T00:00:00"), "TX"),
            (2, _ts("2024-02-01T00:00:00"), "WA"),
        ],
        ["bk", "updated", "state"],
    )
    dim = scd2_from_history(df, ["bk"], "updated", attr_cols={"state": "state"})
    rows = dim.collect()
    assert len(rows) == 4
    _check_invariants(rows)
    v = {(r.bk, r.version): (r.state, r.is_current) for r in rows}
    assert v[(1, 1)] == ("NY", False)
    assert v[(1, 3)] == ("TX", True)
    assert v[(2, 1)] == ("WA", True)


def test_apply_scd_type2_initial_and_incremental(spark):
    batch1 = spark.createDataFrame(
        [
            (1, "NY", "ny@x.com", _ts("2024-01-01T00:00:00")),
            (2, "WA", "wa@x.com", _ts("2024-01-01T00:00:00")),
        ],
        ["bk", "state", "email", "updated_timestamp"],
    )
    dim1 = apply_scd_type2(
        None, batch1, keys=["bk"], type2_cols=["state"], type1_cols=["email"]
    )
    rows1 = dim1.collect()
    assert len(rows1) == 2
    _check_invariants(rows1)

    # batch 2: key 1 changes state (new version), key 2 changes only email
    # (type-1: in-place, no new version), key 3 is brand new
    batch2 = spark.createDataFrame(
        [
            (1, "CA", "ny@x.com", _ts("2024-02-01T00:00:00")),
            (2, "WA", "wa2@x.com", _ts("2024-02-01T00:00:00")),
            (3, "TX", "tx@x.com", _ts("2024-02-01T00:00:00")),
        ],
        ["bk", "state", "email", "updated_timestamp"],
    )
    dim2 = apply_scd_type2(
        dim1, batch2, keys=["bk"], type2_cols=["state"], type1_cols=["email"]
    )
    rows2 = dim2.collect()
    _check_invariants(rows2)
    by = {}
    for r in rows2:
        by.setdefault(r.bk, []).append(r)
    assert len(by[1]) == 2  # NY closed + CA current
    old, new = sorted(by[1], key=lambda r: r.valid_from)
    assert (old.state, old.is_current) == ("NY", False)
    assert old.valid_to == _ts("2024-02-01T00:00:00")
    assert (new.state, new.is_current) == ("CA", True)
    assert len(by[2]) == 1  # type-1 only: no new version
    assert by[2][0].email == "wa2@x.com"
    assert len(by[3]) == 1 and by[3][0].is_current


def test_apply_scd_type2_idempotent(spark):
    batch = spark.createDataFrame(
        [(1, "NY", _ts("2024-01-01T00:00:00"))],
        ["bk", "state", "updated_timestamp"],
    )
    dim1 = apply_scd_type2(None, batch, keys=["bk"], type2_cols=["state"])
    dim2 = apply_scd_type2(dim1, batch, keys=["bk"], type2_cols=["state"])
    rows = dim2.collect()
    assert len(rows) == 1
    assert rows[0].is_current


def test_apply_scd_type2_multiple_changes_in_batch(spark):
    batch = spark.createDataFrame(
        [
            (1, "NY", _ts("2024-01-01T00:00:00")),
            (1, "CA", _ts("2024-02-01T00:00:00")),
            (1, "CA", _ts("2024-03-01T00:00:00")),  # same hash → dropped
            (1, "TX", _ts("2024-04-01T00:00:00")),
        ],
        ["bk", "state", "updated_timestamp"],
    )
    dim = apply_scd_type2(None, batch, keys=["bk"], type2_cols=["state"])
    rows = sorted(dim.collect(), key=lambda r: r.valid_from)
    assert [r.state for r in rows] == ["NY", "CA", "TX"]
    _check_invariants(rows)
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from


def test_surrogate_keys_stable_across_merges(spark):
    """Keys held by facts from a prior run must keep pointing at the same
    dimension rows after a merge: existing rows keep their surrogate key;
    only new version rows draw keys above max(existing). A new business
    key that sorts BEFORE existing keys must not shift anyone."""
    b1 = spark.createDataFrame(
        [(5, "NY", _ts("2024-01-01T00:00:00")), (9, "TX", _ts("2024-01-01T00:00:00"))],
        ["bk", "state", "updated_timestamp"],
    )
    dim1 = apply_scd_type2(None, b1, keys=["bk"], type2_cols=["state"])
    before = {(r.bk, r.state): r.surrogate_key for r in dim1.collect()}
    dim1 = spark.createDataFrame(dim1.collect(), dim1.schema)

    # batch 2: key 1 sorts before 5 and 9; key 5 gets a new version
    b2 = spark.createDataFrame(
        [(1, "WA", _ts("2024-02-01T00:00:00")), (5, "CA", _ts("2024-02-01T00:00:00"))],
        ["bk", "state", "updated_timestamp"],
    )
    dim2 = apply_scd_type2(dim1, b2, keys=["bk"], type2_cols=["state"])
    rows = dim2.collect()
    after = {(r.bk, r.state): r.surrogate_key for r in rows}
    for k, sk in before.items():
        assert after[k] == sk, f"existing row {k} was renumbered"
    new_keys = {after[(1, "WA")], after[(5, "CA")]}
    assert new_keys == {3, 4}  # max(existing)=2 + dense block
    sks = sorted(r.surrogate_key for r in rows)
    assert sks == list(range(1, len(rows) + 1))  # still dense overall


def test_assign_surrogate_matches_global_row_number_and_scales(spark):
    """assign_surrogate_keys must equal ROW_NUMBER() OVER (ORDER BY ...)
    exactly, while planning NO single-partition sort of the data (the
    only SinglePartition exchange allowed is the tiny per-partition
    offset aggregation)."""
    from modular_etl_data_platform_spark.operators.scd2 import assign_surrogate_keys

    df = spark.range(0, 10000).select(
        (F.col("id") * 37 % 9973).alias("bk"), F.col("id").alias("payload")
    ).dropDuplicates(["bk"])
    out = assign_surrogate_keys(df, ["bk"], "sk", start=100, buckets=8)
    got = {r.bk: r.sk for r in out.collect()}
    want = {
        bk: 100 + i + 1
        for i, bk in enumerate(sorted(r.bk for r in df.collect()))
    }
    assert got == want

    # the visible plan contains no GLOBAL sort — the only Sorts are
    # per-partition (global=false) under the pid-window; the offset
    # cumsum's single-partition window touches only #partitions rows
    # (buckets=8 above guarantees the multi-bucket offset path ran)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert not re.search(r"Sort \[[^\]]*\], true", plan), plan
