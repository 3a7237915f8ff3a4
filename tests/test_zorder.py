"""Z-order clustered writes (sources/sinks.py::write_zordered): the
multi-column file-skipping claim, pinned with real parquet footer
statistics rather than plan text."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.sources.sinks import (
    write_clustered,
    write_zordered,
)


def _files_intersecting(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose footer [min,max] for ``col`` intersects [lo,hi], total
    files) — exactly the skipping decision a parquet reader makes."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                cc = rgm.column(ci)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit, len(files)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


def test_zorder_prunes_on_both_columns(spark, orders, tmp_path_factory):
    """Linear clustering on (custkey, totalprice) gives every file the
    FULL totalprice range (prunes nothing on it); the Morton curve gives
    narrow ranges on both, so a totalprice predicate skips most files."""
    root = str(tmp_path_factory.mktemp("zorder"))
    linear, zorder = f"{root}/linear", f"{root}/zorder"
    n_files = 16
    write_clustered(
        orders, linear, cluster_by=["o_custkey", "o_totalprice"], num_files=n_files
    )
    write_zordered(
        orders, zorder, cluster_by=["o_custkey", "o_totalprice"], num_files=n_files
    )

    lo, hi = 200_000.0, 210_000.0  # narrow totalprice band (range ~1.3k-500k)
    lin_hit, lin_total = _files_intersecting(linear, "o_totalprice", lo, hi)
    z_hit, z_total = _files_intersecting(zorder, "o_totalprice", lo, hi)
    assert lin_total >= 8 and z_total >= 8
    # linear: trailing column has ~full range everywhere
    assert lin_hit == lin_total
    # z-order: most files are skippable on the trailing column
    assert z_hit <= z_total // 2, (z_hit, z_total)

    # and the leading column still prunes on the z-ordered layout
    ck_hit, ck_total = _files_intersecting(zorder, "o_custkey", 10.0, 20.0)
    assert ck_hit < ck_total


def test_zorder_roundtrip_is_lossless(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder_rt")) + "/t"
    write_zordered(orders, path, cluster_by=["o_custkey", "o_totalprice"])
    back = spark.read.parquet(path)
    assert back.columns == orders.columns
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey"), F.sum(F.crc32(F.col("o_orderstatus")))).first()
    b = back.agg(F.sum("o_orderkey"), F.sum(F.crc32(F.col("o_orderstatus")))).first()
    assert tuple(a) == tuple(b)


def test_zorder_handles_nulls_and_skew(spark, tmp_path_factory):
    """NULLs map to bucket 0 and a 90%-one-value skewed column still
    spreads rows across files (equi-depth buckets are rank-space)."""
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7.0))
        .otherwise(F.col("id").cast("double"))
        .alias("skewed"),
        F.when(F.col("id") % 100 == 0, F.lit(None).cast("double"))
        .otherwise(F.rand(seed=1) * 100)
        .alias("with_nulls"),
        F.col("id"),
    )
    path = str(tmp_path_factory.mktemp("zorder_skew")) + "/t"
    write_zordered(df, path, cluster_by=["skewed", "with_nulls"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.filter(F.col("with_nulls").isNull()).count() == 100
    sizes = [
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    ]
    # no single file holds everything (the skewed value did not collapse
    # the curve) — range partitioning on the key spreads ties
    assert len(sizes) >= 2 and max(sizes) < 10_000


def test_zorder_three_dims_lossless(spark, orders, tmp_path_factory):
    """The Morton key generalizes beyond 2 dims: a 3-column clustering
    still roundtrips losslessly (bit interleave width = bits * ndims)."""
    path = str(tmp_path_factory.mktemp("zorder_3d")) + "/t"
    write_zordered(
        orders,
        path,
        cluster_by=["o_custkey", "o_totalprice", "o_orderkey"],
        num_files=8,
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )
