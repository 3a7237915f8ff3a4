"""Delta-protocol snapshot export (operators/delta_export.py):
structural conformance to the public Delta transaction protocol, plus a
real delta-spark read when the package is present (env-blocked in this
sandbox — the importorskip records the intent)."""

from __future__ import annotations

import json
import os

import pytest

from modular_etl_data_platform_spark.operators.delta_export import (
    export_delta_snapshot,
)
from modular_etl_data_platform_spark.operators.versioned import VersionedTable


@pytest.fixture()
def exported(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(0, 100).selectExpr("id", "cast(id as string) as v").coalesce(2)
    )
    vt.write(
        spark.range(100, 150).selectExpr("id", "cast(id as string) as v").coalesce(1),
        mode="append",
    )
    dest = str(tmp_path / "delta")
    export_delta_snapshot(vt, dest)
    return vt, dest


def _actions(dest):
    with open(os.path.join(dest, "_delta_log", f"{0:020d}.json")) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_export_writes_protocol_conformant_log(spark, exported):
    """One action per line: protocol (1/2), metaData whose schemaString
    round-trips to the snapshot's Spark schema, and one add per data
    file with relative path, true size, and numRecords stats."""
    from pyspark.sql import types as T

    vt, dest = exported
    acts = _actions(dest)
    protocol = [a["protocol"] for a in acts if "protocol" in a]
    meta = [a["metaData"] for a in acts if "metaData" in a]
    adds = [a["add"] for a in acts if "add" in a]
    assert protocol == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    assert len(meta) == 1 and meta[0]["format"]["provider"] == "parquet"
    schema = T.StructType.fromJson(json.loads(meta[0]["schemaString"]))
    # compare shape, not nullability: Spark relaxes nullable on parquet
    # READ while the log records the stricter write-time schema
    assert [(f.name, f.dataType) for f in schema.fields] == [
        (f.name, f.dataType) for f in vt.read().schema.fields
    ]
    assert len(adds) == len(vt._read_manifest(vt.current_version())["files"])
    total_rows = 0
    for add in adds:
        p = os.path.join(dest, add["path"])
        assert os.path.isfile(p) and not os.path.isabs(add["path"])
        assert add["size"] == os.path.getsize(p)
        assert add["partitionValues"] == {} and add["dataChange"] is True
        stats = json.loads(add["stats"])
        total_rows += stats["numRecords"]
        assert stats["minValues"]["id"] <= stats["maxValues"]["id"]
    assert total_rows == 150


def test_exported_files_reproduce_the_snapshot_exactly(spark, exported):
    """The destination's data files (read as plain parquet — reader-
    independent) must equal the source snapshot row-for-row, and the
    export must be a hard SNAPSHOT: later writes to the versioned table
    leave it untouched."""
    vt, dest = exported
    back = spark.read.parquet(*[os.path.join(dest, a["add"]["path"])
                                for a in _actions(dest) if "add" in a])
    assert {tuple(r) for r in back.collect()} == {
        (i, str(i)) for i in range(150)
    }
    vt.write(
        spark.range(900, 910).selectExpr("id", "cast(id as string) as v"),
        mode="append",
    )
    again = spark.read.parquet(dest)  # plain parquet read of the export dir
    assert again.count() == 150


def test_export_refuses_nonempty_destination(spark, exported, tmp_path):
    vt, dest = exported
    with pytest.raises(FileExistsError):
        export_delta_snapshot(vt, dest)


def test_export_time_travel_version(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(0, 10).selectExpr("id", "cast(id as string) as v").coalesce(1))
    vt.write(spark.range(0, 3).selectExpr("id", "cast(id as string) as v").coalesce(1))
    dest = str(tmp_path / "delta_v1")
    export_delta_snapshot(vt, dest, version=1)
    rows = {
        tuple(r)
        for r in spark.read.parquet(
            *[os.path.join(dest, a["add"]["path"]) for a in _actions(dest) if "add" in a]
        ).collect()
    }
    assert rows == {(i, str(i)) for i in range(10)}


def test_delta_spark_reads_the_export(spark, exported):
    """The real-reader proof — runs wherever delta-spark exists (pip is
    DNS-blocked in this sandbox; the skip is the documented absence)."""
    pytest.importorskip("delta")
    vt, dest = exported
    df = spark.read.format("delta").load(dest)
    assert df.count() == 150


def test_export_refuses_dv_snapshots(spark, tmp_path):
    """Hard-linking a DV'd snapshot would resurrect vector-deleted rows
    (protocol-1/2 Delta can't express deletion vectors) — the export
    must refuse and point at materialization, and succeed again once a
    compaction has purged the vectors."""
    import pytest as _pytest

    from modular_etl_data_platform_spark.operators.delta_export import (
        export_delta_snapshot,
    )
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(30).selectExpr("id").coalesce(1))
    vt.delete_where("id >= 20")
    with _pytest.raises(ValueError, match="deletion vectors"):
        export_delta_snapshot(vt, str(tmp_path / "exp"))
    v = vt.compact(target_files=1)  # materializes the vector
    dest = export_delta_snapshot(vt, str(tmp_path / "exp2"), version=v)
    import json as _json
    import os as _os

    log = sorted(_os.listdir(_os.path.join(dest, "_delta_log")))
    adds = [
        _json.loads(line)
        for line in open(_os.path.join(dest, "_delta_log", log[0]))
        if '"add"' in line
    ]
    assert len(adds) >= 1
    # the exported snapshot holds exactly the post-delete rows
    import pyarrow.parquet as pq

    n = sum(
        pq.ParquetFile(_os.path.join(dest, f)).metadata.num_rows
        for f in _os.listdir(dest)
        if f.endswith(".parquet")
    )
    assert n == 20
