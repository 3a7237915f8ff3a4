"""Column mapping (operators/versioned.py rename_column/drop_column —
Delta's columnMapping feature): metadata-only RENAME/DROP, physical
parquet names pinned at column creation, protocol-gated at 3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import VersionedTable


def test_rename_is_metadata_only_and_reads_translate(spark, tmp_path):
    """RENAME COLUMN touches no data file; reads translate physical ->
    logical, time travel answers under each version's own names, the
    protocol floor records 3, and stats-based file skipping keeps
    working through the mapping."""
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    for base in (0, 100, 200):
        vt.write(
            spark.range(base, base + 100).select(
                F.col("id"), (F.col("id") * 2).alias("amount")
            ).coalesce(1),
            mode="append" if base else "overwrite",
        )
    files_before = vt._read_manifest(vt.current_version())["files"]
    v = vt.rename_column("amount", "total")
    m = vt._read_manifest(v)
    assert m["files"] == files_before  # zero data movement
    assert m["protocol"]["min_reader"] == 3
    assert m["column_mapping"]["total"] == "amount"
    got = vt.read()
    assert got.columns == ["id", "total"]
    assert got.filter("id = 42").first().total == 84
    # pre-rename snapshot answers under the OLD name
    old = vt.read(version=v - 1)
    assert old.columns == ["id", "amount"]
    assert old.filter("id = 42").first().amount == 84
    # file skipping via the mapping: the id stats still prune
    pruned = vt.read_pruned("id", 100, 150)
    assert 0 < len(pruned.inputFiles()) < len(files_before)
    assert pruned.count() == 51
    # rename of the stats column itself: pruning keeps working (the
    # physical name under the footers never changed)
    v2 = vt.rename_column("id", "key")
    assert {r.key for r in vt.read_pruned("key", 0, 3).collect()} >= {
        0, 1, 2, 3,
    }


def test_writes_after_rename_land_physical_and_roundtrip(spark, tmp_path):
    """Appends/upserts/updates after a rename: batches use the NEW
    logical name, files land under the pinned physical name, and every
    read path — including the renamed predicate DML — stays exact."""
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(10).select("id", F.lit(1.0).alias("a")).coalesce(1)
    )
    vt.rename_column("a", "b")
    vt.write(
        spark.range(10, 20).select("id", F.lit(2.0).alias("b")).coalesce(1),
        mode="append",
    )
    rows = {r.id: r.b for r in vt.read().collect()}
    assert rows[5] == 1.0 and rows[15] == 2.0
    # upsert on the new name merges across old- and new-landed files
    vt.upsert(
        spark.createDataFrame([(5, 9.0), (15, 9.0)], "id long, b double"),
        ["id"],
    )
    rows = {r.id: r.b for r in vt.read().collect()}
    assert rows[5] == 9.0 and rows[15] == 9.0 and len(rows) == 20
    # predicate DML through the mapping
    vt.update_where({"b": "b + 0.5"}, "id < 2")
    assert vt.read().filter("id = 0").first().b == 1.5
    vt.delete_where("b = 9.0")
    assert {r.id for r in vt.read().collect()} == set(range(20)) - {5, 15}
    # the physical footer name is the ORIGINAL one
    import pyarrow.parquet as pq

    m = vt._read_manifest(vt.current_version())
    names = set()
    for f in m["files"]:
        names.update(pq.ParquetFile(f).schema_arrow.names)
    assert "a" in names and "b" not in names


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    """DROP COLUMN tombstones the physical name: a later re-add of the
    same logical name gets a FRESH physical, so carried files null-fill
    instead of leaking the dead column's bytes back (the hazard Delta
    gates DROP COLUMN behind column mapping for)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(
        spark.range(5).select("id", F.lit("secret").alias("c")).coalesce(1)
    )
    v = vt.drop_column("c")
    m = vt._read_manifest(v)
    assert m["files"] == vt._read_manifest(v - 1)["files"]  # metadata-only
    assert vt.read().columns == ["id"]
    assert "c" in m["retired_physical"]
    # re-add the same logical name via a widening append
    vt.write(
        spark.range(5, 8).select("id", F.lit("fresh").alias("c")).coalesce(1),
        mode="append",
        evolve_schema=True,
    )
    rows = {r.id: r.c for r in vt.read().collect()}
    assert rows[6] == "fresh"
    assert rows[0] is None  # the dropped bytes stay dead
    # pre-drop snapshot still shows them (time travel)
    assert vt.read(version=v - 1).filter("id = 0").first().c == "secret"
    # and the fresh physical is the deterministic suffixed name
    assert vt.column_mapping()["c"] == "c_r1"


def test_constraint_references_block_rename_and_drop(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(5).selectExpr("id", "id * 2 AS a"))
    vt.add_constraint("a_nonneg", "a >= 0")
    with pytest.raises(ValueError, match="constraint"):
        vt.rename_column("a", "b")
    with pytest.raises(ValueError, match="constraint"):
        vt.drop_column("a")
    vt.drop_constraint("a_nonneg")
    assert vt.rename_column("a", "b") > 0


def test_restore_and_clone_carry_the_targets_mapping(spark, tmp_path):
    """RESTORE across a rename boundary republishes the TARGET's own
    mapping (the head's would mis-derive physicals); a clone of a
    mapped table carries mapping + tombstones verbatim."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(5).selectExpr("id", "id * 2 AS a").coalesce(1))
    v1 = vt.current_version()
    vt.rename_column("a", "b")
    vt.update_where({"b": "b + 1"}, "id = 0")
    # restore to the pre-rename snapshot: old logical name comes back,
    # values intact, and reads still resolve (identity naming restored)
    vt.restore(v1)
    got = vt.read()
    assert got.columns == ["id", "a"]
    assert got.filter("id = 0").first().a == 0
    # forward again and clone
    vt.rename_column("a", "z")
    c = vt.clone(str(tmp_path / "c"))
    assert c.read().columns == ["id", "z"]
    assert c.column_mapping() == vt.column_mapping()
    assert c.read().filter("id = 4").first().z == 8


def test_mapped_tables_stream_read_translate_and_writers_refuse(
    spark, tmp_path
):
    """The streaming source reads mapped files under their physical
    names and emits logical columns; the format-API writers refuse
    mapped tables loudly (they land logical-named files, which would
    corrupt the physical contract); delta_export carries the mapping
    out as Delta's columnMapping feature (round 9)."""
    import pyarrow as pa

    from modular_etl_data_platform_spark.operators.delta_export import (
        export_delta_snapshot,
    )
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _VersionedStreamReader,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    table = str(tmp_path / "t")
    vt = VersionedTable(spark, table)
    vt.write(spark.range(10).selectExpr("id", "id * 3 AS a").coalesce(1))
    vt.rename_column("a", "val")
    vt.write(
        spark.range(10, 15).selectExpr("id", "id * 3 AS val").coalesce(1),
        mode="append",
    )
    schema = vt.read().schema
    r = _VersionedStreamReader(table, schema, 0)
    parts = r.partitions({"version": 0}, {"version": vt.current_version()})
    got = pa.Table.from_batches([b for p in parts for b in r.read(p)])
    assert got.column_names == ["id", "val"]
    vals = dict(zip(got.column("id").to_pylist(), got.column("val").to_pylist()))
    assert vals[3] == 9 and vals[12] == 36  # both pre- and post-rename files
    with pytest.raises(Exception, match="column mapping"):
        (
            spark.range(20, 22)
            .selectExpr("id", "id * 3 AS val")
            .write.format("versioned_table")
            .mode("append")
            .option("path", table)
            .save()
        )
    # the export preserves the physical contract instead of refusing:
    # mapping mode=name with the physical parquet names in the schema
    import json as _json
    import os as _os

    dest = export_delta_snapshot(vt, str(tmp_path / "delta"))
    log0 = _os.path.join(dest, "_delta_log", f"{0:020d}.json")
    acts = [_json.loads(line) for line in open(log0) if line.strip()]
    md = next(a["metaData"] for a in acts if "metaData" in a)
    assert md["configuration"]["delta.columnMapping.mode"] == "name"
    assert "columnMapping" in acts[0]["protocol"]["readerFeatures"]


def test_rename_validations(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(3).selectExpr("id", "id AS a"))
    with pytest.raises(ValueError, match="no such column"):
        vt.rename_column("zz", "b")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column("a", "id")
    with pytest.raises(ValueError, match="no such column"):
        vt.drop_column("zz")
    vt.drop_column("a")
    with pytest.raises(ValueError, match="only column"):
        vt.drop_column("id")


def test_merge_clauses_through_the_mapping(spark, tmp_path):
    """Full MERGE on a renamed table: the source and every clause
    expression use the NEW logical name; files land physical, phase-1
    touched-file discovery and the insert path both translate."""
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(10).select("id", F.lit(1.0).alias("a")).coalesce(1)
    )
    vt.rename_column("a", "b")
    src = spark.createDataFrame(
        [(3, 9.0), (4, 0.5), (30, 5.0)], "id long, b double"
    )
    vt.merge(
        src,
        on=["id"],
        matched=[
            ("delete", None, "s.b < 1.0"),
            ("update", {"b": "t.b + s.b"}, None),
        ],
        not_matched=[("insert", None, None)],
    )
    rows = {r.id: r.b for r in vt.read().collect()}
    assert rows[3] == 10.0 and rows[30] == 5.0 and 4 not in rows
    assert len(rows) == 10  # 10 - deleted + inserted
    import pyarrow.parquet as pq

    m = vt._read_manifest(vt.current_version())
    names = set()
    for f in m["files"]:
        names.update(pq.ParquetFile(f).schema_arrow.names)
    assert "a" in names and "b" not in names  # physical contract held
