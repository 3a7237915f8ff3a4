"""Full MERGE INTO clause surface (operators/versioned.py::merge):
ordered conditional matched / not-matched / not-matched-by-source
clauses — Delta's complete MERGE semantics on the commit log."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import VersionedTable


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
            "id long, v string, qty long",
        )
    )
    return t


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, qty long")


def test_default_clauses_are_classic_upsert(spark, vt):
    vt.merge(_src(spark, [(2, "B", 200), (9, "z", 90)]), on=["id"])
    assert _rows(vt.read()) == {
        (1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40), (9, "z", 90),
    }


def test_conditional_update_and_delete_in_order(spark, vt):
    # first matching clause wins: qty>=30 deletes, else update from source
    vt.merge(
        _src(spark, [(1, "A", 100), (3, "C", 300), (4, "D", 400)]),
        on=["id"],
        matched=[
            ("delete", None, "t.qty >= 30"),
            ("update", None, None),
        ],
        not_matched=[("insert", None, None)],
    )
    assert _rows(vt.read()) == {(1, "A", 100), (2, "b", 20)}


def test_clause_order_matters(spark, vt):
    # same clauses reversed: unconditional update claims every match,
    # the delete never fires
    vt.merge(
        _src(spark, [(3, "C", 300)]),
        on=["id"],
        matched=[
            ("update", None, None),
            ("delete", None, "t.qty >= 30"),
        ],
    )
    assert (3, "C", 300) in _rows(vt.read())
    assert vt.read().count() == 4


def test_partial_assignments_and_insert_condition(spark, vt):
    vt.merge(
        _src(spark, [(2, "B", 999), (8, "y", 5), (9, "z", 90)]),
        on=["id"],
        matched=[("update", {"qty": "t.qty + s.qty"}, None)],
        not_matched=[
            ("insert", {"id": "s.id", "v": "upper(s.v)"}, "s.qty >= 50"),
        ],
    )
    rows = _rows(vt.read())
    assert (2, "b", 1019) in rows          # qty summed, v untouched
    assert (9, "Z", None) in rows          # insert: qty omitted -> null
    assert not any(r[0] == 8 for r in rows)  # insert condition filtered


def test_not_matched_by_source_clauses(spark, vt):
    # rows absent from the source: qty<=20 deleted, others flagged
    vt.merge(
        _src(spark, [(1, "a", 10)]),
        on=["id"],
        matched=[("update", None, None)],
        not_matched_by_source=[
            ("delete", None, "t.qty <= 20"),
            ("update", {"v": "concat(t.v, '!')"}, None),
        ],
    )
    assert _rows(vt.read()) == {(1, "a", 10), (3, "c!", 30), (4, "d!", 40)}


def test_unclaimed_rows_keep_and_null_condition_does_not_fire(spark, vt):
    vt.merge(
        _src(spark, [(1, "A", 100), (2, "B", 200)]),
        on=["id"],
        matched=[("update", None, "CASE WHEN s.id = 1 THEN NULL ELSE true END")],
    )
    rows = _rows(vt.read())
    assert (1, "a", 10) in rows   # NULL condition: clause does not fire
    assert (2, "B", 200) in rows
    assert len(rows) == 4


def test_merge_prunes_disjoint_files_without_nms(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "p"), stats_columns=["id"])
    lo = spark.range(0, 100).select(F.col("id"), F.lit(1).alias("qty")).coalesce(1)
    hi = spark.range(10_000, 10_100).select(
        F.col("id"), F.lit(1).alias("qty")
    ).coalesce(1)
    t.write(lo)
    t.write(hi, mode="append")
    files_before = set(t._read_manifest(t.current_version())["files"])
    src = spark.createDataFrame([(5, 99)], "id long, qty long")
    t.merge(src, on=["id"], matched=[("update", None, None)])
    head = t._read_manifest(t.current_version())
    carried = set(head["files"]) & files_before
    # the hi-range file is carried untouched; the lo file was rewritten
    assert len(carried) == 1
    assert t.read().filter("id = 5").first()["qty"] == 99
    # with a not-matched-by-source clause every file is in scope
    t.merge(
        src,
        on=["id"],
        matched=[("update", None, None)],
        not_matched_by_source=[("update", {"qty": "t.qty + 100"}, None)],
    )
    head2 = t._read_manifest(t.current_version())
    assert not (set(head2["files"]) & set(head["files"]))
    assert t.read().filter("id = 10050").first()["qty"] == 101


def test_duplicate_source_keys_rejected_with_matched_clause(spark, vt):
    dup = _src(spark, [(2, "x", 1), (2, "y", 2)])
    with pytest.raises(ValueError, match="duplicate merge keys"):
        vt.merge(dup, on=["id"], matched=[("update", None, None)])
    # insert-only merges allow them (both rows insert, as Delta does)
    ins = _src(spark, [(8, "x", 1), (8, "y", 2)])
    vt.merge(ins, on=["id"], matched=[], not_matched=[("insert", None, None)])
    assert vt.read().filter("id = 8").count() == 2


def test_merge_validations(spark, vt):
    with pytest.raises(ValueError, match="at least one clause"):
        vt.merge(_src(spark, []), on=["id"], matched=[])
    with pytest.raises(ValueError, match="invalid matched-clause"):
        vt.merge(_src(spark, []), on=["id"], matched=[("insert", None, None)])
    with pytest.raises(ValueError, match="no assignments"):
        vt.merge(_src(spark, []), on=["id"], matched=[("delete", {"v": "x"}, None)])
    with pytest.raises(ValueError, match="unknown column"):
        vt.merge(
            _src(spark, [(1, "a", 1)]),
            on=["id"],
            matched=[("update", {"nope": "1"}, None)],
        )
    with pytest.raises(ValueError, match="at least one equality key"):
        vt.merge(_src(spark, []), on=[], matched=[("update", None, None)])


def test_merge_is_a_gated_update_commit_for_streams(spark, vt, tmp_path):
    """A merge that rewrites files must register as an update commit in
    the streaming source's classification (remove non-empty)."""
    import json

    from modular_etl_data_platform_spark.operators.versioned import _commit_name

    vt.merge(_src(spark, [(1, "A", 100)]), on=["id"])
    rec = json.loads(vt.log.store.read(_commit_name(vt.current_version())))
    assert rec["mode"] == "merge"
    assert rec.get("remove")


def test_merge_rewrites_only_files_holding_source_keys(spark, tmp_path):
    """Phase-1 touched-file discovery: range pruning alone keeps every
    overlapping file; the key semi-join narrows the rewrite to files
    actually holding a source key."""
    t = VersionedTable(spark, str(tmp_path / "p"), stats_columns=["id"])
    # three files with INTERLEAVED ranges 0..299 (residue classes), so
    # min/max cannot separate them
    for r in range(3):
        part = (
            spark.range(0, 300)
            .filter(F.col("id") % 3 == r)
            .select("id", F.lit(1).alias("qty"))
            .coalesce(1)
        )
        t.write(part, mode="append" if r else "overwrite")
    before = set(t._read_manifest(t.current_version())["files"])
    # keys 0 and 9: both residue 0 — only that file holds them
    src = spark.createDataFrame([(0, 99), (9, 99)], "id long, qty long")
    t.merge(src, on=["id"], matched=[("update", None, None)])
    head = t._read_manifest(t.current_version())
    carried = set(head["files"]) & before
    assert len(carried) == 2  # residues 1 and 2 carried untouched
    assert t.read().filter("id in (0, 9)").agg(F.sum("qty")).first()[0] == 198


def test_insert_only_merge_rewrites_nothing(spark, tmp_path):
    """Delta's insert-only merge optimization: with only not-matched
    clauses every existing file carries; matched source keys classify
    out of the insert set without rewriting their files."""
    t = VersionedTable(spark, str(tmp_path / "i"), stats_columns=["id"])
    t.write(
        spark.range(0, 100).select("id", F.lit(1).alias("qty")).coalesce(1)
    )
    before = t._read_manifest(t.current_version())["files"]
    src = spark.createDataFrame(
        [(5, 99), (200, 99), (300, 0)], "id long, qty long"
    )
    t.merge(
        src,
        on=["id"],
        matched=[],
        not_matched=[("insert", None, "s.qty > 0")],
    )
    head = t._read_manifest(t.current_version())
    assert set(before) <= set(head["files"])  # zero rewrites
    rows = {tuple(r) for r in t.read().filter("id >= 100 or id = 5").collect()}
    assert rows == {(5, 1), (200, 99)}  # matched key NOT re-inserted; cond honored
