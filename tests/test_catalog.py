"""Smoke: every catalog query runs at sf0.001 and returns a stable schema."""

from __future__ import annotations

import pytest

from modular_etl_data_platform_spark.queries.catalog import QUERIES, ORACLES, flagship


def test_flagship_returns_rows(spark, sf_dir):
    df = flagship(spark, sf_dir)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
