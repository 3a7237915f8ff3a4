"""Delta Lake MERGE path (operators/upsert.py::upsert_parquet Delta branch).

The reference runs on delta-spark (reference requirements.txt:2
``delta-spark==3.0.0``; write recipe config/bronze/schema/README.md:83-87;
MERGE contract config/silver/schema/README.md:113-122). This container does
not ship delta-spark, so the ACID ``DeltaTable.merge`` branch is
environment-blocked: the tested contract is the parquet merge-emulation
(test_upsert_properties.py), which this suite documents explicitly by
skipping — not silently — when the import is unavailable. On an
environment with delta-spark installed this file exercises the real MERGE
against the same semantics the emulation guarantees.
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip(
    "delta",
    reason="delta-spark not installed in this container — the DeltaTable.merge "
    "branch in operators/upsert.py is documented as UNTESTED here; the parquet "
    "emulation is the tested contract",
)


@pytest.fixture(scope="module")
def delta_spark(tmp_path_factory):
    """Dedicated session: Delta needs its SQL extension + catalog wired at
    build time (static confs), which the shared test session doesn't set."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-merge-test")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.shuffle.partitions", "4")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def test_delta_merge_upserts_and_preserves_unmatched(delta_spark, tmp_path):
    """Same contract the parquet emulation proves: matched keys update,
    new keys insert, untouched keys survive."""
    from delta.tables import DeltaTable

    from modular_etl_data_platform_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "dim")
    delta_spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "val"]
    ).write.format("delta").save(path)

    batch = delta_spark.createDataFrame([(2, "B"), (3, "c")], ["id", "val"])
    # upsert_parquet auto-detects the Delta table and takes the MERGE branch
    upsert_parquet(delta_spark, batch, path, primary_keys=["id"])

    got = {
        (r.id, r.val)
        for r in DeltaTable.forPath(delta_spark, path).toDF().collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c")}
