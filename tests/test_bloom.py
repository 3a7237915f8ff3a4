"""Bloom-filter file skipping (operators/versioned.py bloom sidecars):
point-lookup pruning where min/max stats can't — Delta's bloom filter
index, sidecar form."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import (
    _BLOOM_MARK,
    VersionedTable,
    _bloom_key_bytes,
    _bloom_probe,
    _build_bloom,
)


def _interleaved(spark, residue: int, n: int = 400, mod: int = 4):
    """Keys k in [0, n) with k % mod == residue — every batch spans the
    whole key domain, so min/max ranges fully overlap across files and
    can never prune a point lookup."""
    return spark.range(0, n).filter(F.col("id") % mod == residue).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    ).coalesce(1)


def _mk(spark, tmp_path, **kw):
    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["k"], bloom_columns=["k"], **kw
    )
    for r in range(4):
        vt.write(_interleaved(spark, r), mode="append" if r else "overwrite")
    return vt


def test_bloom_unit_roundtrip():
    b = _build_bloom([1, 2, 3, "x"])
    assert b is not None
    for v in (1, 2, 3, "x"):
        assert _bloom_probe(b, _bloom_key_bytes(v))
    # a value never inserted: overwhelmingly likely to miss at this size
    misses = sum(
        not _bloom_probe(b, _bloom_key_bytes(v)) for v in range(1000, 1100)
    )
    assert misses >= 95
    # unsupported types record nothing / probe conservatively
    assert _bloom_key_bytes(1.5) is None
    assert _bloom_key_bytes(True) is None
    assert _build_bloom([1.5, 2.5]) is None


def test_point_read_opens_only_bloom_hit_files(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    head = vt._read_manifest(vt.current_version())
    assert len(head["files"]) == 4
    # min/max ranges all overlap: range-only pruning keeps every file
    ranged = [
        f
        for f in head["files"]
        if VersionedTable._may_intersect(head["stats"].get(f), "k", 17, 17)
    ]
    assert len(ranged) == 4
    pruned = vt.read_pruned("k", 17, 17)
    opened = set(pruned.inputFiles())
    # 17 % 4 == 1 → exactly one true file; fp could add a file but the
    # sha1-deterministic data here probes clean
    assert len(opened) < 4
    assert [tuple(r) for r in pruned.collect()] == [(17, "v17")]


def test_absent_key_reads_empty_and_multi_predicate_probes(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    # value outside every file: bloom prunes everything, result empty
    assert vt.read_pruned("k", 10**9, 10**9).count() == 0
    multi = vt.read_pruned_multi([("k", 17, 17)])
    assert len(set(multi.inputFiles())) < 4
    assert multi.count() == 1


def test_files_without_blooms_are_kept(spark, tmp_path):
    # table created WITHOUT bloom_columns, then reopened with them:
    # old files carry no bloom pointer and must stay readable
    plain = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["k"])
    plain.write(_interleaved(spark, 0))
    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["k"], bloom_columns=["k"]
    )
    vt.write(_interleaved(spark, 1), mode="append")
    head = vt._read_manifest(vt.current_version())
    marks = [bool((head["stats"].get(f) or {}).get(_BLOOM_MARK)) for f in head["files"]]
    assert sorted(marks) == [False, True]
    # k=4 lives in the un-bloomed v1 file: kept conservatively
    assert [tuple(r) for r in vt.read_pruned("k", 4, 4).collect()] == [(4, "v4")]


def test_blooms_carry_forward_and_survive_string_columns(spark, tmp_path):
    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["v"], bloom_columns=["v"]
    )
    vt.write(_interleaved(spark, 0))
    vt.write(_interleaved(spark, 1), mode="append")
    # append did not recompute v1's bloom: same sidecar pointer carried
    m1 = vt._read_manifest(1)
    m2 = vt._read_manifest(2)
    f1 = m1["files"][0]
    assert m2["stats"][f1][_BLOOM_MARK] == m1["stats"][f1][_BLOOM_MARK]
    opened = set(vt.read_pruned("v", "v17", "v17").inputFiles())
    assert len(opened) == 1
    assert vt.read_pruned("v", "v17", "v17").count() == 1


def test_vacuum_sweeps_unreferenced_sidecars(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    bloom_dir = os.path.join(vt.path, "_bloom")
    before = set(os.listdir(bloom_dir))
    assert len(before) == 4  # one sidecar per commit
    vt.compact()  # rewrite: fresh files, fresh sidecar
    assert len(os.listdir(bloom_dir)) == 5
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    after = set(os.listdir(bloom_dir))
    assert len(after) == 1  # only the compacted head's sidecar survives
    assert not (after & before)
    # the surviving index still serves point reads
    assert vt.read_pruned("k", 17, 17).count() == 1


def test_rewrites_rebuild_blooms_for_new_files(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    batch = spark.createDataFrame([(17, "NEW")], "k long, v string")
    vt.upsert(batch, ["k"])
    pruned = vt.read_pruned("k", 17, 17)
    assert [tuple(r) for r in pruned.collect()] == [(17, "NEW")]
    # untouched residue files still prune away on a key they don't hold
    assert len(set(pruned.inputFiles())) < len(
        vt._read_manifest(vt.current_version())["files"]
    )


def test_format_api_pushed_equality_probes_bloom(spark, tmp_path):
    """The pushdown batch reader probes the bloom index for pushed
    EQUALITY predicates: residue-class files defeat min/max, the bloom
    plans only the hit file(s), and results equal the unpruned filter."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _VersionedBatchReader,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    vt = _mk(spark, tmp_path)
    schema = vt.read().schema
    reader = _VersionedBatchReader(vt.path, schema, None)
    list(reader.pushFilters([EqualTo(("k",), 17)]))
    parts = reader.partitions()
    assert 1 <= len(parts) <= 2  # one true file + at most one fp, of 4
    # range predicates don't probe blooms: all 4 residue files planned
    r2 = _VersionedBatchReader(vt.path, schema, None)
    list(r2.pushFilters([GreaterThanOrEqual(("k",), 0)]))
    assert len(r2.partitions()) == 4
    df = (
        spark.read.format("versioned_table")
        .option("path", vt.path)
        .load()
        .filter("k = 17")
    )
    assert [tuple(r) for r in df.collect()] == [(17, "v17")]


def test_read_pruned_in_probes_each_value(spark, tmp_path):
    """IN-list file skipping: per-value range + bloom probing unioned
    over the list — a plain range over the list's span would keep every
    residue file; per-value probing keeps only the true holders."""
    vt = _mk(spark, tmp_path)
    # 17 and 21: both residue 1 -> ONE file; 18: residue 2 -> one more
    df = vt.read_pruned_in("k", [17, 21, 18])
    opened = set(df.inputFiles())
    assert len(opened) <= 3  # 2 true files + at most one fp, of 4
    assert {tuple(r) for r in df.collect()} == {
        (17, "v17"), (21, "v21"), (18, "v18"),
    }
    # all-absent values open nothing
    assert vt.read_pruned_in("k", [10**9, 10**9 + 1]).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one value"):
        vt.read_pruned_in("k", [])


def test_format_api_pushed_in_list_probes_per_value(spark, tmp_path):
    from pyspark.sql.datasource import In

    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _VersionedBatchReader,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    vt = _mk(spark, tmp_path)
    schema = vt.read().schema
    reader = _VersionedBatchReader(vt.path, schema, None)
    list(reader.pushFilters([In(("k",), (17, 21, 18))]))
    assert 2 <= len(reader.partitions()) <= 3  # residues {1, 2} of 4
    df = (
        spark.read.format("versioned_table")
        .option("path", vt.path)
        .load()
        .filter("k in (17, 21, 18)")
    )
    assert {tuple(r) for r in df.collect()} == {
        (17, "v17"), (21, "v21"), (18, "v18"),
    }
