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


# -- round-9: DV + column-mapping export (public Delta table features) ---------
import struct
import zlib


def _decode_rbm_array(data: bytes) -> set[int]:
    """Independent parser for the exported RoaringBitmapArray portable
    serialization — round-trips the writer against the spec's layout
    (magic, bitmap count, standard-format 32-bit roaring bitmaps)."""
    magic, n = struct.unpack_from("<iq", data, 0)
    assert magic == 1681511377
    pos = 12
    out: set[int] = set()
    for hi in range(n):
        cookie, ncont = struct.unpack_from("<ii", data, pos)
        assert cookie == 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
        base = pos
        pos += 8
        desc = []
        for _ in range(ncont):
            key, cardm1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            desc.append((key, cardm1 + 1))
        offsets = []
        for _ in range(ncont):
            (o,) = struct.unpack_from("<I", data, pos)
            pos += 4
            offsets.append(o)
        end = pos
        for (key, card), o in zip(desc, offsets):
            p = base + o
            if card <= 4096:
                for v in struct.unpack_from(f"<{card}H", data, p):
                    out.add((hi << 32) | (key << 16) | v)
                end = max(end, p + card * 2)
            else:
                bits = data[p : p + 8192]
                for bi, b in enumerate(bits):
                    for j in range(8):
                        if b & (1 << j):
                            out.add((hi << 32) | (key << 16) | (bi * 8 + j))
                end = max(end, p + 8192)
        pos = end
    return out


def test_dv_snapshot_exports_with_deletion_vectors(spark, tmp_path):
    """A vector-deleted snapshot exports WITHOUT materialization: the
    add action carries a protocol-conformant ``deletionVector``
    descriptor (u-storage, framed bin file, CRC32), the bitmap decodes
    to exactly the engine's deleted row positions, and the protocol
    action declares the deletionVectors table feature."""
    import base64 as _b64
    import uuid as _uuid

    import pyarrow.parquet as pq

    from modular_etl_data_platform_spark.operators.versioned import (
        _strip_scheme_py,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(30).selectExpr("id", "id * 2 as v").coalesce(1))
    vt.delete_where("id >= 20")
    dest = export_delta_snapshot(vt, str(tmp_path / "exp"))

    acts = _actions(dest)
    proto = acts[0]["protocol"]
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    adds = [a["add"] for a in acts if "add" in a]
    assert len(adds) == 1
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "u" and dv["cardinality"] == 10
    stats = json.loads(adds[0]["stats"])
    assert stats["numRecords"] == 30  # PHYSICAL rows
    assert stats["tightBounds"] is False

    # derive the file name from pathOrInlineDv exactly as a reader would
    dv_uuid = _uuid.UUID(bytes=_b64.b85decode(dv["pathOrInlineDv"]))
    bin_path = os.path.join(dest, f"deletion_vector_{dv_uuid}.bin")
    raw = open(bin_path, "rb").read()
    assert raw[0] == 1  # format version
    (size,) = struct.unpack_from(">i", raw, dv["offset"])
    assert size == dv["sizeInBytes"]
    data = raw[dv["offset"] + 4 : dv["offset"] + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, dv["offset"] + 4 + size)
    assert crc == zlib.crc32(data)

    # the bitmap equals the engine's own sidecar positions for the file
    state = vt.log.resolve(vt.current_version())
    src = state["files"][0]
    sc = state["dv"][src]
    tbl = pq.read_table(sc, columns=["file_path", "row_index"])
    want = {
        ix
        for fp, ix in zip(
            tbl.column("file_path").to_pylist(),
            tbl.column("row_index").to_pylist(),
        )
        if fp == _strip_scheme_py(src)
    }
    assert _decode_rbm_array(data) == want
    # physical rows minus the vector = the live snapshot
    assert stats["numRecords"] - dv["cardinality"] == vt.read().count()


def test_dv_bitmap_serialization_covers_container_shapes(tmp_path):
    """The roaring writer round-trips every container shape: sparse
    array containers, a >4096-cardinality bitmap container, multiple
    16-bit keys, and a >2^32 row index (second 32-bit bitmap with empty
    intermediates)."""
    from modular_etl_data_platform_spark.operators.delta_export import (
        _serialize_dv_bitmap,
    )

    cases = [
        [0, 1, 2],
        [5, 70000, 70001],                      # two 16-bit keys
        list(range(5000)),                       # bitmap container
        [3, (1 << 32) + 7, (2 << 32) + 1],       # 64-bit split + gaps
        [],
    ]
    for vals in cases:
        got = _decode_rbm_array(_serialize_dv_bitmap(sorted(vals)))
        assert got == set(vals), vals[:5]


def test_renamed_column_snapshot_exports_with_column_mapping(spark, tmp_path):
    """A column-mapped snapshot exports under mapping mode ``name``:
    every schema field carries columnMapping id + physicalName metadata
    matching the parquet files' PHYSICAL column names, configuration
    declares the mode, and the protocol declares the feature."""
    import pyarrow.parquet as pq

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(10).selectExpr("id", "cast(id as string) as v"))
    vt.rename_column("v", "label")
    dest = export_delta_snapshot(vt, str(tmp_path / "exp"))

    acts = _actions(dest)
    proto = acts[0]["protocol"]
    assert "columnMapping" in proto["readerFeatures"]
    md = acts[1]["metaData"]
    assert md["configuration"]["delta.columnMapping.mode"] == "name"
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(md["schemaString"])["fields"]
    }
    ids = [m["delta.columnMapping.id"] for m in fields.values()]
    assert sorted(ids) == list(range(1, len(fields) + 1))  # unique ids
    assert int(md["configuration"]["delta.columnMapping.maxColumnId"]) == max(ids)
    # physical names resolve against the actual parquet columns
    adds = [a["add"] for a in acts if "add" in a]
    phys_cols = set()
    for a in adds:
        pf = pq.ParquetFile(
            os.path.join(dest, a["path"])
        )
        phys_cols.update(pf.schema_arrow.names)
    for name, meta in fields.items():
        assert meta["delta.columnMapping.physicalName"] in phys_cols, name
    # the renamed logical column maps to a NON-identity physical name
    assert fields["label"]["delta.columnMapping.physicalName"] != "label"


def test_delta_spark_reads_dv_and_mapped_exports(spark, tmp_path):
    """Real-reader proof for the table-features exports — runs wherever
    delta-spark exists (pip is DNS-blocked in this sandbox; the skip is
    the documented absence)."""
    pytest.importorskip("delta")
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(30).selectExpr("id", "id * 2 as v").coalesce(1))
    vt.delete_where("id >= 20")
    vt.rename_column("v", "label")
    dest = export_delta_snapshot(vt, str(tmp_path / "exp"))
    df = spark.read.format("delta").load(dest)
    assert df.count() == 20
    assert set(df.columns) == {"id", "label"}


def test_mapping_export_annotates_nested_fields(spark, tmp_path):
    """Column-mapping ids/physicalNames must reach NESTED fields too —
    struct members and structs inside arrays (protocol: every nested
    field carries them)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(
        spark.range(3).selectExpr(
            "id",
            "named_struct('a', id, 'b', cast(id as string)) AS s",
            "array(named_struct('x', id)) AS arr",
        )
    )
    vt.rename_column("s", "payload")
    dest = export_delta_snapshot(vt, str(tmp_path / "exp"))
    md = next(a["metaData"] for a in _actions(dest) if "metaData" in a)
    schema = json.loads(md["schemaString"])

    ids = []

    def walk_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    walk_field(f)
            elif t.get("type") == "array":
                walk_type(t["elementType"])

    def walk_field(f):
        m = f.get("metadata") or {}
        assert "delta.columnMapping.id" in m, f["name"]
        assert "delta.columnMapping.physicalName" in m, f["name"]
        ids.append(m["delta.columnMapping.id"])
        walk_type(f.get("type"))

    for f in schema["fields"]:
        walk_field(f)
    assert sorted(ids) == list(range(1, len(ids) + 1))  # unique, dense
    assert int(md["configuration"]["delta.columnMapping.maxColumnId"]) == max(ids)
