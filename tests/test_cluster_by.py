"""CLUSTER BY as table state (operators/versioned.py — Delta's
liquid-clustering surface over the Morton rewrite): declared at
creation or altered later, every compaction defaults its layout to it."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import VersionedTable


def _data(spark, n=4096):
    # two independent uniform columns: linear layout on one leaves the
    # other unprunable; the Morton curve narrows BOTH per file
    return spark.range(n).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )


def _spans(vt, col):
    m = vt._read_manifest(vt.current_version())
    spans = []
    for f in m["files"]:
        rec = m["stats"].get(f, {}).get(col)
        if isinstance(rec, list):
            spans.append(rec[1] - rec[0])
    return spans


def test_compact_defaults_to_declared_clustering(spark, tmp_path):
    vt = VersionedTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["a", "b"],
        cluster_by=["a", "b"],
    )
    vt.write(_data(spark).repartition(8))  # unclustered landing
    assert vt.clustered_columns() == ["a", "b"]
    # a reopened handle reads the policy from the log
    assert VersionedTable(spark, vt.path).clustered_columns() == ["a", "b"]
    vt.compact(target_files=16)  # no layout args: CLUSTER BY applies
    # most files cover a narrow range on BOTH columns (z-order effect;
    # curve-boundary files may straddle one dimension) and point reads
    # skip on EITHER column — the unclustered landing had near-full
    # spans everywhere and pruned nothing
    for col, domain in (("a", 64), ("b", 64)):
        spans = sorted(_spans(vt, col))
        assert spans and spans[len(spans) // 2] <= domain / 2
        opened = set(vt.read_pruned(col, 3, 3).inputFiles())
        assert len(opened) <= 8  # of 16


def test_alter_cluster_by_and_ddl_interplay(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["a", "b"])
    vt.write(_data(spark).repartition(4))
    assert vt.clustered_columns() == []
    v = vt.set_clustered_columns(["a", "b"])
    assert vt.clustered_columns() == ["a", "b"]
    assert vt._read_manifest(v)["mode"] == "set_cluster_by"
    with pytest.raises(ValueError, match="not in schema"):
        vt.set_clustered_columns(["nope"])
    # rename follows the policy; drop removes the column from it
    vt.rename_column("b", "b2")
    assert vt.clustered_columns() == ["a", "b2"]
    vt.drop_column("b2")
    assert vt.clustered_columns() == ["a"]
    # CLUSTER BY NONE clears
    vt.set_clustered_columns([])
    assert vt.clustered_columns() == []


def test_auto_compact_keeps_cluster_layout(spark, tmp_path):
    vt = VersionedTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["a", "b"],
        cluster_by=["a", "b"],
    )
    for i in range(6):
        vt.write(
            _data(spark).filter(F.col("payload") % 6 == i).coalesce(1),
            mode="append" if i else "overwrite",
        )
    v = vt.maybe_compact(max_small_files=2, target_files=8)
    assert v is not None
    for col, domain in (("a", 64), ("b", 64)):
        spans = sorted(_spans(vt, col))
        assert spans and spans[len(spans) // 2] <= domain / 2
