"""In-process tests of the CLI surface (python -m modular_etl_data_platform_spark)."""

from __future__ import annotations

from modular_etl_data_platform_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_list_names_every_query(spark, capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert len(names) >= 60 and "q01_pricing_summary" in names


def test_cli_query_runs_and_explains(spark, capsys):
    rc = main(["query", "q01_pricing_summary", "--sf-dir", SF, "--limit", "3", "--explain"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out and "sum_qty" in out


def test_cli_query_unknown_name(spark, capsys):
    assert main(["query", "q999_nope", "--sf-dir", SF]) == 2


def test_cli_sql_passthrough(spark, capsys):
    rc = main(["sql", "SELECT COUNT(*) AS n FROM orders", "--sf-dir", SF])
    out = capsys.readouterr().out
    assert rc == 0 and "n" in out
