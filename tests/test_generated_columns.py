"""Generated columns (operators/versioned.py — Delta's GENERATED ALWAYS
AS): declared at table creation, auto-computed when a batch omits them,
validated transactionally when a batch supplies them, recomputed by
UPDATE, protected from rename/drop drift."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import (
    ConstraintViolationError,
    VersionedTable,
)

GEN = {"date_key": "CAST(date_format(ts, 'yyyyMMdd') AS INT)"}


def _mk(spark, tmp_path, **kw):
    return VersionedTable(
        spark, str(tmp_path / "t"), generated_columns=GEN, **kw
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp").select(
        "id", F.col("ts")
    )


def test_omitted_generated_column_is_computed(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(_batch(spark, [(1, dt.datetime(2024, 3, 5, 10))]))
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20240305)}
    # appends fill too, and the map is LOG state: a reopened handle
    # without the constructor arg still generates
    vt2 = VersionedTable(spark, vt.path)
    assert vt2.generated_columns() == GEN
    vt2.write(_batch(spark, [(2, dt.datetime(2025, 1, 2, 3))]), mode="append")
    assert (2, 20250102) in {
        tuple(r) for r in vt2.read().select("id", "date_key").collect()
    }


def test_supplied_value_is_validated(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    good = _batch(spark, [(1, dt.datetime(2024, 3, 5))]).withColumn(
        "date_key", F.lit(20240305)
    )
    vt.write(good)
    bad = _batch(spark, [(2, dt.datetime(2024, 3, 6))]).withColumn(
        "date_key", F.lit(99999999)
    )
    with pytest.raises(ConstraintViolationError, match="generated column"):
        vt.write(bad, mode="append")
    assert vt.current_version() == 1  # the violating version never exists
    assert vt.read().count() == 1


def test_update_recomputes_generated_columns(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(
        _batch(
            spark,
            [(1, dt.datetime(2024, 3, 5)), (2, dt.datetime(2024, 6, 7))],
        )
    )
    # updating the SOURCE column recomputes the generated one
    vt.update_where({"ts": "timestamp'2030-12-31 00:00:00'"}, "id = 1")
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20301231), (2, 20240607)}
    # assigning the generated column directly is refused
    with pytest.raises(ValueError, match="recomputed, never assigned"):
        vt.update_where({"date_key": "0"}, "id = 2")
    # DV strategy recomputes too
    vt.update_where(
        {"ts": "timestamp'2031-01-01 00:00:00'"},
        "id = 2",
        use_deletion_vectors=True,
    )
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20301231), (2, 20310101)}


def test_upsert_and_replace_where_fill(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(_batch(spark, [(1, dt.datetime(2024, 3, 5))]))
    vt.upsert(_batch(spark, [(1, dt.datetime(2026, 1, 1)), (3, dt.datetime(2027, 2, 2))]), ["id"])
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20260101), (3, 20270202)}
    vt.overwrite_where(
        _batch(spark, [(9, dt.datetime(2026, 5, 5))]).withColumn(
            "id", F.lit(9).cast("long")
        ),
        "id >= 3",
    )
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20260101), (9, 20260505)}


def test_generated_guards_rename_drop_and_stream_writer(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(_batch(spark, [(1, dt.datetime(2024, 3, 5))]))
    with pytest.raises(ValueError, match="is or references"):
        vt.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="is or references"):
        vt.rename_column("date_key", "dk")
    with pytest.raises(ValueError, match="must be dropped first"):
        vt.drop_column("ts")
    # dropping the generated column itself retires its expression
    vt.drop_column("date_key")
    assert vt.generated_columns() == {}
    vt.write(_batch(spark, [(5, dt.datetime(2024, 1, 1))]), mode="append")
    assert "date_key" not in vt.read().columns
    # format-API writer refuses generated tables loudly
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    vt2 = _mk(spark, tmp_path / "g")
    vt2.write(_batch(spark, [(1, dt.datetime(2024, 3, 5))]))
    df = _batch(spark, [(7, dt.datetime(2024, 8, 8))])
    with pytest.raises(Exception, match="generated columns"):
        df.write.format("versioned_table").mode("append").save(vt2.path)


def test_clone_carries_generated_expressions(spark, tmp_path):
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(_batch(spark, [(1, dt.datetime(2024, 3, 5))]))
    clone = vt.clone(str(tmp_path / "c"))
    assert clone.generated_columns() == GEN
    clone.write(_batch(spark, [(2, dt.datetime(2025, 1, 2))]), mode="append")
    assert (2, 20250102) in {
        tuple(r) for r in clone.read().select("id", "date_key").collect()
    }
    bad = _batch(spark, [(3, dt.datetime(2025, 1, 3))]).withColumn(
        "date_key", F.lit(1)
    )
    with pytest.raises(ConstraintViolationError):
        clone.write(bad, mode="append")


def test_merge_recomputes_and_refuses_generated(spark, tmp_path):
    """Full MERGE on a generated table: updates touching a referenced
    column recompute the generated one, inserts never need to supply
    it, and assigning it in a clause is refused (Delta's rule)."""
    import datetime as dt

    vt = _mk(spark, tmp_path)
    vt.write(
        _batch(spark, [(1, dt.datetime(2024, 3, 5)), (2, dt.datetime(2024, 6, 7))])
    )
    src = _batch(spark, [(1, dt.datetime(2030, 1, 1)), (9, dt.datetime(2031, 2, 2))])
    vt.merge(
        src,
        on=["id"],
        matched=[("update", {"ts": "s.ts"}, None)],
        not_matched=[("insert", {"id": "s.id", "ts": "s.ts"}, None)],
    )
    rows = {tuple(r) for r in vt.read().select("id", "date_key").collect()}
    assert rows == {(1, 20300101), (2, 20240607), (9, 20310202)}
    with pytest.raises(ValueError, match="recomputed, never assigned"):
        vt.merge(
            src,
            on=["id"],
            matched=[("update", {"date_key": "0"}, None)],
        )
