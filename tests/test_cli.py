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


def test_cli_ann_index_and_query(spark, capsys, tmp_path):
    idx = str(tmp_path / "idx")
    assert main(["ann-index", "--sf-dir", SF, "--out", idx]) == 0
    out = capsys.readouterr().out
    assert '"indexed"' in out
    # probes=1 routes by centroid similarity — the query's own cell may
    # lose the routing (label cells are arbitrary); with probes covering
    # every cell the exact self-match MUST surface
    assert main([
        "ann-query", "--index", idx, "--sf-dir", SF, "--vec-id", "0",
        "--k", "3", "--probes", "8",
    ]) == 0
    out = capsys.readouterr().out
    assert "cos_sim" in out and "1.0" in out  # self-match tops the list

    # learned cells path runs end-to-end
    idx2 = str(tmp_path / "idx_km")
    assert main(["ann-index", "--sf-dir", SF, "--out", idx2, "--kmeans", "4"]) == 0
    assert main([
        "ann-query", "--index", idx2, "--sf-dir", SF, "--vec-id", "0", "--k", "1",
    ]) == 0
    assert "cos_sim" in capsys.readouterr().out


def test_cli_expect_suite(spark, capsys, tmp_path):
    import json

    suite = tmp_path / "suite.json"
    suite.write_text(
        json.dumps(
            {
                "expectations": [
                    {"expectation_type": "expect_column_values_to_be_unique",
                     "kwargs": {"column": "c_custkey"}},
                    {"expectation_type": "expect_table_row_count_to_be_between",
                     "kwargs": {"min_value": 10}},
                ]
            }
        )
    )
    rc = main(["expect", str(suite), "customer", "--sf-dir", SF, "--strict"])
    out = capsys.readouterr().out
    assert rc == 0
    results = json.loads(out)
    assert all(r["success"] for r in results) and len(results) == 2

    # a failing suite must exit 1 under --strict
    suite.write_text(
        json.dumps(
            {
                "expectations": [
                    {"expectation_type": "expect_table_row_count_to_be_between",
                     "kwargs": {"min_value": 10_000_000}},
                ]
            }
        )
    )
    assert main(["expect", str(suite), "customer", "--sf-dir", SF, "--strict"]) == 1


def test_cli_versioned_table_ops(spark, capsys, tmp_path):
    import json

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "vt")
    vt = VersionedTable(spark, path)
    vt.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    vt.upsert(spark.createDataFrame([(2, "B")], "id long, v string"), ["id"])

    assert main([ "vt", path, "history"]) == 0
    hist = json.loads(capsys.readouterr().out)
    assert [h["version"] for h in hist] == [1, 2]
    assert all("n_files" in h and "schema" not in h for h in hist)

    assert main(["vt", path, "read", "--version", "1"]) == 0
    assert "a" in capsys.readouterr().out

    assert main(["vt", path, "restore", "--version", "1"]) == 0
    assert json.loads(capsys.readouterr().out)["new_version"] == 3

    assert main(["vt", path, "compact", "--target-files", "1"]) == 0
    capsys.readouterr()
    # dry run counts, touches nothing
    # --file-retention-seconds 0: reclaim immediately (no writer can be
    # in flight here); the default 1h gate would count/delete nothing
    assert main([
        "vt", path, "vacuum", "--keep-last", "1", "--dry-run",
        "--file-retention-seconds", "0",
    ]) == 0
    would = json.loads(capsys.readouterr().out)["would_delete_files"]
    assert would >= 1
    assert main([
        "vt", path, "vacuum", "--keep-last", "1",
        "--file-retention-seconds", "0",
    ]) == 0
    assert json.loads(capsys.readouterr().out)["deleted_files"] == would
    assert {tuple(r) for r in VersionedTable(spark, path).read().collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_cli_vt_delete_where(spark, capsys, tmp_path):
    """vt delete-where: merge-on-read DELETE from the CLI — publishes a
    new version, rows disappear, no data file rewritten; --column/--lo/
    --hi optionally pass the stats prune hint."""
    import json

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path, stats_columns=["id"])
    vt.write(spark.range(40).selectExpr("id", "id % 4 as grp").coalesce(2))
    files_before = vt._read_manifest(1)["files"]

    assert main(["vt", path, "delete-where", "--where", "grp = 2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_version"] == 2
    assert vt._read_manifest(2)["files"] == files_before  # no rewrite
    assert {r.id for r in vt.read().collect()} == {
        i for i in range(40) if i % 4 != 2
    }
    # prune-hinted range delete through the CLI
    assert main([
        "vt", path, "delete-where", "--where", "id < 5",
        "--column", "id", "--hi", "4",
    ]) == 0
    assert {r.id for r in vt.read().collect()} == {
        i for i in range(5, 40) if i % 4 != 2
    }


def test_cli_vt_convert(spark, capsys, tmp_path):
    """vt convert: in-place CONVERT-TO-DELTA analogue from the CLI."""
    import json

    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        is_versioned_table,
    )

    path = str(tmp_path / "plain")
    spark.range(50).select("id", (F.col("id") * 3).alias("v")).coalesce(
        1
    ).write.parquet(path)
    assert main(["vt", path, "convert", "--stats-columns", "id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1 and is_versioned_table(path)
    assert VersionedTable(spark, path).read().count() == 50


def test_cli_vt_update_where_and_clone(spark, capsys, tmp_path):
    """vt update-where: predicate UPDATE from the CLI (repeatable --set,
    optional --use-dv strategy); vt clone: shallow clone to --dest."""
    import json

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path, stats_columns=["id"])
    vt.write(spark.range(40).selectExpr("id", "id * 1.0 as p").coalesce(2))

    assert main([
        "vt", path, "update-where", "--where", "id < 10",
        "--set", "p = p + 100",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_version"] == 2
    assert vt.read().filter("id = 3").first().p == 103.0
    files_v2 = vt._read_manifest(2)["files"]
    assert main([
        "vt", path, "update-where", "--where", "id >= 30",
        "--set", "p = 0", "--use-dv",
    ]) == 0
    capsys.readouterr()
    assert set(files_v2) <= set(vt._read_manifest(3)["files"])  # no rewrite
    assert vt.read().filter("id >= 30").agg({"p": "sum"}).first()[0] == 0.0

    dest = str(tmp_path / "c")
    assert main(["vt", path, "clone", "--dest", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 1
    c = VersionedTable(spark, dest)
    assert c.read().count() == 40


def test_cli_vt_rename_and_drop_column(spark, capsys, tmp_path):
    """vt rename-column / drop-column: metadata-only ALTERs from the CLI."""
    import json

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path)
    vt.write(spark.range(5).selectExpr("id", "id * 2 AS a", "id AS junk"))
    assert main(["vt", path, "rename-column", "--old", "a", "--new", "b"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["new_version"] == 2
    assert vt.read().columns == ["id", "b", "junk"]
    assert main(["vt", path, "drop-column", "--drop", "junk"]) == 0
    capsys.readouterr()
    assert vt.read().columns == ["id", "b"]
    assert vt.read().filter("id = 3").first().b == 6


def test_cli_vt_merge_and_constraints(spark, capsys, tmp_path):
    """vt merge --clauses JSON drives the full MERGE surface; constraint
    add/drop round-trips through the CLI."""
    import json

    from modular_etl_data_platform_spark.__main__ import main
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path)
    vt.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (5, "e", 50)], "id long, v string, qty long"
        )
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(2, "B", 200), (3, "c", 30), (9, "z", 0)], "id long, v string, qty long"
    ).coalesce(1).write.parquet(src)
    clauses = json.dumps(
        [
            {"when": "matched", "action": "update", "condition": "s.qty >= 100"},
            {"when": "not_matched", "action": "insert", "condition": "s.qty > 0"},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "t.qty >= 50"},
        ]
    )
    assert main(
        ["vt", path, "merge", "--source", src, "--on", "id", "--clauses", clauses]
    ) == 0
    assert json.loads(capsys.readouterr().out)["new_version"] == 2
    rows = {tuple(r) for r in vt.read().collect()}
    assert rows == {(1, "a", 10), (2, "B", 200), (3, "c", 30)}

    assert main(
        ["vt", path, "add-constraint", "--name", "qty_pos", "--expr", "qty >= 0"]
    ) == 0
    assert json.loads(capsys.readouterr().out)["constraints"] == {
        "qty_pos": "qty >= 0"
    }
    assert main(["vt", path, "drop-constraint", "--name", "qty_pos"]) == 0
    assert json.loads(capsys.readouterr().out)["constraints"] == {}


def test_cli_vt_mirror_delta(spark, capsys, tmp_path):
    """vt mirror-delta: incremental Delta mirror from the CLI — first
    call snapshots, the second emits one Delta commit per new source
    version; the mirror stays foreign-readable."""
    import json
    import os
    import sys

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path, dest = str(tmp_path / "t"), str(tmp_path / "m")
    vt = VersionedTable(spark, path, stats_columns=["id"])
    vt.write(spark.range(20).selectExpr("id", "cast(id as string) as v").coalesce(1))

    assert main(["vt", path, "mirror-delta", "--dest", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"mirrored": dest, "source_version": 1}

    vt.write(
        spark.range(20, 30).selectExpr("id", "cast(id as string) as v").coalesce(1),
        mode="append",
    )
    vt.delete_where("id % 9 = 4")
    assert main(["vt", path, "mirror-delta", "--dest", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["source_version"] == 3
    log = os.path.join(dest, "_delta_log")
    assert len([n for n in os.listdir(log) if n.endswith(".json")]) == 3

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import delta_foreign_reader as fr

    tbl = fr.read_delta_table(dest)
    assert tbl.num_rows == vt.read().count()


def test_cli_vt_cdf_enable_and_change_feed(spark, capsys, tmp_path):
    """vt enable-cdf / change-feed / disable-cdf: write-time CDC from
    the CLI — the property lands as a metadata commit, a subsequent
    DELETE records its slice, and change-feed prints the per-commit
    rows (served from the recorded files)."""
    import json

    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        _commit_name,
    )

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path, stats_columns=["id"])
    vt.write(spark.range(30).selectExpr("id", "id % 3 as grp").coalesce(1))

    assert main(["vt", path, "enable-cdf", "--primary-keys", "id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"new_version": 2, "cdf": {"primary_keys": ["id"]}}

    assert main(["vt", path, "delete-where", "--where", "grp = 1"]) == 0
    capsys.readouterr()
    rec = json.loads(vt.log.store.read(_commit_name(3)))
    assert rec.get("cdc"), "CLI delete did not record its slice"

    assert main([
        "vt", path, "change-feed", "--since-version", "2", "--limit", "50",
    ]) == 0
    rows = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["id"] for r in rows) == [i for i in range(30) if i % 3 == 1]
    assert all(r["_commit_version"] == 3 for r in rows)

    assert main(["vt", path, "disable-cdf"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cdf"] == {}
