"""Write-time CDC (recorded change data feed).

The ``enable_change_data_feed`` contract (Delta's
``delta.enableChangeDataFeed`` analogue, reimplemented from the PUBLIC
protocol; reference anchor: the incremental-consumption contract of
config/silver/schema/README.md:265-268 at Delta's actual design point):
update-class DML persists its row-level change slice as
``_change_data/`` parquet riding the commit record's ``cdc`` key, and
every reader — streaming, batch ``table_changes``, batch
``read_change_feed``, the Delta mirror — prefers the recorded files
over the derived file diff. Recorded classification must equal derived
classification on every DML shape (the random-history half lives in
tests/test_change_feed_stream_properties.py); this file pins the
deterministic contracts:

- every update-class writer records (merge with conditional clauses,
  upsert both strategies, update_where both strategies, delete_where,
  restore), with derived-equality asserted per writer;
- suppression: a DML that verifiably changes nothing records an EMPTY
  slice (``"cdc": []``), and the feed emits zero rows for it;
- blind appends and insert-only merges record nothing (Delta's rule:
  readers synthesize inserts from the add actions);
- the streaming reader serves recorded versions from
  ``_CFRecordedPartition``s whose paths live under ``_change_data/``
  and never name a data file (the zero-re-read contract);
- batch ``table_changes`` serves a single-version range from the
  recorded files; ``read_change_feed`` unions per-version slices;
- vacuum keeps cdc files of retained versions and reclaims them after
  log truncation;
- the mirror forwards recorded cdc verbatim (the derive path is
  poisoned in the test — constructing it fails loudly).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.operators.versioned import (
    _CDC_DIR,
    VersionedTable,
    _commit_name,
)
from modular_etl_data_platform_spark.streaming.versioned_source import (
    _CFRecordedPartition,
    _VersionedChangeFeedStreamReader,
)


def _mk(spark, tmp_path, name, files=2, rows=60):
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("s"),
        (F.col("id") * 1.5).alias("p"),
    )
    vt = VersionedTable(
        spark, os.path.join(str(tmp_path), name), stats_columns=["k"]
    )
    vt.write(df.coalesce(files))
    vt.enable_change_data_feed(["k"])
    return vt


def _rec(vt, v):
    return json.loads(vt.log.store.read(_commit_name(v)))


def _cdf_schema(vt):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        list(vt.read().schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )


def _recorded_rows(vt, v):
    """The stream reader's slice for version v — asserting every
    partition is a recorded one pointing under _change_data/ and never
    at a data file (the zero-re-read contract)."""
    rd = _VersionedChangeFeedStreamReader(vt.path, _cdf_schema(vt), 0, ["k"])
    parts = rd.partitions({"version": v - 1}, {"version": v})
    data_files = set(vt.log.resolve(v)["files"])
    for p in parts:
        assert isinstance(p, _CFRecordedPartition), type(p).__name__
        assert os.sep + _CDC_DIR + os.sep in p.path
        assert p.path not in data_files
    rows = []
    for p in parts:
        for b in rd.read(p):
            rows.extend(pa.Table.from_batches([b]).to_pylist())
    return rows


def _derived_rows(vt, v):
    """The same slice via the DERIVED classifier: a reader whose store
    view hides the cdc key, forcing the file-diff path."""
    rd = _VersionedChangeFeedStreamReader(vt.path, _cdf_schema(vt), 0, ["k"])
    orig = rd.log.store.read

    def hide(name):
        d = json.loads(orig(name))
        d.pop("cdc", None)
        return json.dumps(d)

    rd.log.store.read = hide
    parts = rd.partitions({"version": v - 1}, {"version": v})
    assert not any(isinstance(p, _CFRecordedPartition) for p in parts)
    rows = []
    for p in parts:
        for b in rd.read(p):
            rows.extend(pa.Table.from_batches([b]).to_pylist())
    return rows


def _norm(rows):
    return sorted(
        (
            r["_change_type"],
            r["k"],
            r["s"],
            None if r["p"] is None else round(r["p"], 6),
        )
        for r in rows
    )


def _assert_recorded_equals_derived(vt, v):
    rec = _rec(vt, v)
    assert rec.get("cdc") is not None, f"v{v} did not record cdc"
    got, want = _recorded_rows(vt, v), _derived_rows(vt, v)
    assert _norm(got) == _norm(want)
    return got


def test_merge_records_and_matches_derived(spark, tmp_path):
    vt = _mk(spark, tmp_path, "m")
    src = spark.range(30, 90).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id") * 2.0).alias("p"),
    )
    v = vt.merge(
        src,
        ["k"],
        matched=[
            ("delete", None, "t.k % 10 = 7"),
            ("update", None, "s.k < 80"),
        ],
        not_matched=[("insert", None, "s.k % 2 = 0")],
        not_matched_by_source=[("update", {"p": "t.p + 0.5"}, "t.k < 5")],
    )
    rows = _assert_recorded_equals_derived(vt, v)
    kinds = {r["_change_type"] for r in rows}
    assert kinds == {"insert", "delete", "update_postimage"}


def test_insert_only_merge_records_nothing(spark, tmp_path):
    vt = _mk(spark, tmp_path, "im")
    src = spark.range(100, 120).select(
        F.col("id").alias("k"), F.lit("N").alias("s"), F.lit(0.0).alias("p")
    )
    v = vt.merge(src, ["k"], not_matched=[("insert", None, None)])
    assert "cdc" not in _rec(vt, v)  # blind-append rule
    # the derived insert path still serves the slice per added file
    rows = _recorded = _derived_rows(vt, v)
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert len(rows) == 20


def test_append_records_nothing(spark, tmp_path):
    vt = _mk(spark, tmp_path, "ap")
    v = vt.write(
        spark.range(200, 210).select(
            F.col("id").alias("k"),
            F.lit("A").alias("s"),
            F.lit(1.0).alias("p"),
        ),
        mode="append",
    )
    assert "cdc" not in _rec(vt, v)


def test_update_where_rewrite_and_pk_rewrite(spark, tmp_path):
    vt = _mk(spark, tmp_path, "uw")
    v = vt.update_where({"p": "p * 2"}, "k % 4 = 1")
    rows = _assert_recorded_equals_derived(vt, v)
    assert {r["_change_type"] for r in rows} == {"update_postimage"}
    # rewriting the CDC key itself: delete(old) + insert(new), exactly
    # how the PK-join derived diff must see it
    v = vt.update_where({"k": "k + 1000"}, "k % 17 = 3")
    rows = _assert_recorded_equals_derived(vt, v)
    assert {r["_change_type"] for r in rows} == {"insert", "delete"}


def test_update_where_dv_strategy(spark, tmp_path):
    vt = _mk(spark, tmp_path, "uwdv")
    v = vt.update_where(
        {"p": "p + 7"}, "k % 5 = 0", use_deletion_vectors=True
    )
    _assert_recorded_equals_derived(vt, v)


def test_noop_update_records_empty_slice(spark, tmp_path):
    vt = _mk(spark, tmp_path, "noop")
    v = vt.update_where({"p": "p"}, "k % 4 = 2")
    assert _rec(vt, v).get("cdc") == []
    assert _recorded_rows(vt, v) == []  # recorded-empty: zero emissions


def test_delete_where_and_overlap(spark, tmp_path):
    vt = _mk(spark, tmp_path, "dw")
    v = vt.delete_where("k % 6 = 2")
    rows = _assert_recorded_equals_derived(vt, v)
    assert {r["_change_type"] for r in rows} == {"delete"}
    # overlapping second delete: only NEWLY-deleted rows may emit
    v = vt.delete_where("k % 3 = 2")
    rows = _assert_recorded_equals_derived(vt, v)
    assert all(r["k"] % 6 != 2 for r in rows)


def test_upsert_both_strategies(spark, tmp_path):
    for dv in (False, True):
        vt = _mk(spark, tmp_path, f"up{dv}")
        b = spark.range(30, 90).select(
            F.col("id").alias("k"),
            F.lit("Z").alias("s"),
            (F.col("id") * 1.5).alias("p"),
        )
        v = vt.upsert(b, ["k"], use_deletion_vectors=dv)
        rows = _assert_recorded_equals_derived(vt, v)
        assert {r["_change_type"] for r in rows} == {
            "insert",
            "update_postimage",
        }


def test_identical_upsert_suppresses(spark, tmp_path):
    vt = _mk(spark, tmp_path, "ident")
    v = vt.upsert(vt.read().filter(F.col("k") < 10), ["k"])
    assert _rec(vt, v).get("cdc") == []


def test_duplicate_key_batch_falls_back_to_derived(spark, tmp_path):
    vt = _mk(spark, tmp_path, "dup")
    b = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0)], "k long, s string, p double"
    )
    v = vt.upsert(b, ["k"])
    assert "cdc" not in _rec(vt, v)  # per-key classification undefined


def test_overwrite_where_records_region_replacement(spark, tmp_path):
    vt = _mk(spark, tmp_path, "ow")
    # replace the k%4==1 region: some rows re-asserted identically
    # (suppressed), some changed (update), some region rows not
    # re-asserted (delete), one brand-new key (insert)
    batch = (
        vt.read()
        .filter("k % 4 = 1 AND k < 40")
        .withColumn(
            "p",
            F.when(F.col("k") < 20, F.col("p") + 9).otherwise(F.col("p")),
        )
        .unionByName(
            spark.createDataFrame(
                [(1001, "N", 0.5)], "k long, s string, p double"
            )
        )
    )
    v = vt.overwrite_where(batch, "k % 4 = 1")
    rows = _assert_recorded_equals_derived(vt, v)
    kinds = {r["_change_type"] for r in rows}
    assert kinds == {"insert", "delete", "update_postimage"}
    # suppressed re-assertions never emit
    assert not any(
        r["_change_type"] == "update_postimage" and r["k"] >= 20
        for r in rows
    )


def test_delete_range_records_dropped_rows(spark, tmp_path):
    vt = _mk(spark, tmp_path, "dr")
    v = vt.delete_range("k", 10, 25)
    rows = _assert_recorded_equals_derived(vt, v)
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["k"] for r in rows) == list(range(10, 26))


def test_restore_records_the_undo_slice(spark, tmp_path):
    vt = _mk(spark, tmp_path, "rs")
    vt.update_where({"p": "p * 3"}, "k % 2 = 0")
    vt.delete_where("k % 9 = 4")
    v = vt.restore(2)
    rows = _assert_recorded_equals_derived(vt, v)
    assert rows, "restore across real changes must emit a slice"


def test_compaction_still_emits_nothing(spark, tmp_path):
    vt = _mk(spark, tmp_path, "cp")
    vt.update_where({"p": "p + 1"}, "k < 5")
    v = vt.compact(target_files=1)
    rd = _VersionedChangeFeedStreamReader(vt.path, _cdf_schema(vt), 0, ["k"])
    assert rd.partitions({"version": v - 1}, {"version": v}) == []


def test_batch_table_changes_prefers_recorded(spark, tmp_path):
    vt = _mk(spark, tmp_path, "tc")
    v = vt.update_where({"p": "p + 1"}, "k < 10")
    got = vt.table_changes(v - 1, v, primary_keys=["k"])
    rows = [r.asDict() for r in got.collect()]
    assert len(rows) == 10
    assert {r["_change_type"] for r in rows} == {"update_postimage"}
    # multi-version range keeps the endpoint-diff semantics
    vt.delete_where("k < 5")
    ep = vt.table_changes(v - 1, primary_keys=["k"]).collect()
    assert {r["_change_type"] for r in ep} == {"delete", "update_postimage"}


def test_read_change_feed_per_version(spark, tmp_path):
    vt = _mk(spark, tmp_path, "rcf")
    v3 = vt.update_where({"p": "p + 1"}, "k < 10")
    v4 = vt.delete_where("k >= 55")
    v5 = vt.write(
        spark.range(300, 305).select(
            F.col("id").alias("k"),
            F.lit("A").alias("s"),
            F.lit(0.0).alias("p"),
        ),
        mode="append",
    )
    feed = [r.asDict() for r in vt.read_change_feed(2).collect()]
    by_v = {}
    for r in feed:
        by_v.setdefault(r["_commit_version"], []).append(r)
    assert set(by_v) == {v3, v4, v5}
    assert len(by_v[v3]) == 10 and len(by_v[v4]) == 5
    assert {r["_change_type"] for r in by_v[v5]} == {"insert"}
    # a row updated in v3 and deleted in v4 appears in BOTH slices —
    # the per-commit semantics table_changes' endpoint diff nets out
    assert all(r["_commit_timestamp"] is not None for r in feed)


def test_vacuum_retention_and_reclaim(spark, tmp_path):
    vt = _mk(spark, tmp_path, "vac")
    vt.update_where({"p": "p + 1"}, "k < 10")
    v4 = vt.delete_where("k >= 55")
    pat = os.path.join(vt.path, _CDC_DIR, "*", "*.parquet")
    before = set(glob.glob(pat))
    assert before
    vt.vacuum(keep_last=1, file_retention_seconds=0)
    after = set(glob.glob(pat))
    assert after < before  # truncated versions' cdc reclaimed
    for e in _rec(vt, v4)["cdc"]:
        assert os.path.exists(e["path"])  # retained version's cdc kept


def test_mirror_forwards_recorded_cdc(spark, tmp_path, monkeypatch):
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import delta_foreign_reader as fr
    from modular_etl_data_platform_spark.operators.delta_export import (
        export_delta_incremental,
    )

    vt = _mk(spark, tmp_path, "mir")
    dest = os.path.join(str(tmp_path), "mir_delta")
    export_delta_incremental(vt, dest, primary_keys=["k"])
    v = vt.update_where({"p": "p * 2"}, "k % 4 = 1")
    recorded = _recorded_rows(vt, v)

    # poison the derive path: with recorded cdc present the mirror must
    # never construct the stream classifier
    import modular_etl_data_platform_spark.streaming.versioned_source as vs

    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError(
            "mirror derived the slice despite recorded cdc"
        )

    monkeypatch.setattr(vs, "_VersionedChangeFeedStreamReader", boom)
    export_delta_incremental(vt, dest, primary_keys=["k"])
    monkeypatch.undo()

    rows = []
    for tbl in fr.iter_change_feed(dest, starting_version=1):
        rows.extend(tbl.to_pylist())
    got = sorted(
        (r["_change_type"], r["k"], r["s"], round(r["p"], 6))
        for r in rows
    )
    want = sorted(
        (r["_change_type"], r["k"], r["s"], round(r["p"], 6))
        for r in recorded
    )
    assert got == want


def test_merge_cdc_recomputes_generated_columns(spark, tmp_path):
    """The combined data+CDC merge path recomputes GENERATED columns on
    the new image exactly like the plain path: postimages and inserts
    carry the recomputed value, delete preimages keep the historical
    one, and recorded == derived."""
    df = spark.range(0, 30).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("s"),
        (F.col("id") * 1.5).alias("p"),
        (F.col("id") * 3.0).alias("p2"),
    )
    vt = VersionedTable(
        spark,
        os.path.join(str(tmp_path), "gen"),
        stats_columns=["k"],
        generated_columns={"p2": "p * 2"},
    )
    vt.write(df.coalesce(1))
    vt.enable_change_data_feed(["k"])
    src = spark.range(10, 40).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id") * 5.0).alias("p"),
    )
    v = vt.merge(
        src,
        ["k"],
        matched=[("update", {"p": "s.p", "s": "s.s"}, None)],
        not_matched=[("insert", {"k": "s.k", "s": "s.s", "p": "s.p"}, None)],
    )
    rows = _assert_recorded_equals_derived(vt, v)
    for r in rows:
        if r["_change_type"] in ("insert", "update_postimage"):
            assert r["p2"] == r["p"] * 2  # recomputed on the new image
        else:
            assert r["p2"] == r["p"] * 2  # preimages satisfied it too


def test_recorded_cdc_under_column_mapping(spark, tmp_path):
    """Recorded cdc files carry PHYSICAL column names like data files:
    after a metadata-only RENAME, update-class DML still records, the
    stream still serves logical names, and recorded == derived."""
    vt = _mk(spark, tmp_path, "cm")
    vt.rename_column("s", "status")
    v = vt.update_where({"p": "p + 1"}, "k % 3 = 0")
    rec = _rec(vt, v)
    assert rec.get("cdc")
    rd = _VersionedChangeFeedStreamReader(vt.path, _cdf_schema(vt), 0, ["k"])
    parts = rd.partitions({"version": v - 1}, {"version": v})
    rows = []
    for p in parts:
        assert isinstance(p, _CFRecordedPartition)
        for b in rd.read(p):
            rows.extend(pa.Table.from_batches([b]).to_pylist())
    assert rows and all("status" in r for r in rows)
    want = _derived_rows(vt, v)
    key = lambda r: (r["_change_type"], r["k"], r["status"], round(r["p"], 6))  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, want))


def test_disable_stops_recording(spark, tmp_path):
    vt = _mk(spark, tmp_path, "dis")
    v = vt.update_where({"p": "p + 1"}, "k < 5")
    assert _rec(vt, v).get("cdc") is not None
    vt.disable_change_data_feed()
    v = vt.update_where({"p": "p + 1"}, "k < 5")
    assert "cdc" not in _rec(vt, v)


def test_constraints_enforced_on_combined_landing(spark, tmp_path):
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )

    vt = _mk(spark, tmp_path, "cons")
    vt.add_constraint("p_nonneg", "p >= 0")
    head = vt.current_version()
    with pytest.raises(ConstraintViolationError):
        vt.update_where({"p": "p - 1000"}, "k < 5")
    assert vt.current_version() == head  # nothing published
    # and the DELETE slice's change rows (old images) never trip a
    # constraint added after the fact
    vt.update_where({"p": "p + 1"}, "k < 5")


def test_batch_format_api_change_feed(spark, tmp_path):
    """Batch readChangeFeed through the standard reader API
    (`spark.read.format("versioned_table").option("read_changes",...)`):
    per-commit slices equal to VersionedTable.read_change_feed, served
    from recorded files and insert derivation without primary keys;
    a derived-fallback range without keys fails loudly at planning."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    vt = _mk(spark, tmp_path, "bf")
    v3 = vt.update_where({"p": "p + 1"}, "k < 10")
    v4 = vt.write(
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            F.lit("A").alias("s"),
            F.lit(0.0).alias("p"),
        ),
        mode="append",
    )
    got = (
        spark.read.format("versioned_table")
        .option("path", vt.path)
        .option("read_changes", "true")
        .option("starting_version", "2")
        .load()
    )
    rows = [r.asDict() for r in got.collect()]  # no primary_keys needed:
    # v3 recorded, v4 derives from its add actions
    want = [
        r.asDict()
        for r in vt.read_change_feed(2).collect()
    ]
    key = lambda r: (  # noqa: E731
        r["_commit_version"], r["_change_type"], r["k"], r["s"],
        None if r["p"] is None else round(r["p"], 6),
    )
    assert sorted(map(key, rows)) == sorted(map(key, want))
    assert {r["_commit_version"] for r in rows} == {v3, v4}
    # ending_version bounds the range
    only3 = (
        spark.read.format("versioned_table")
        .option("path", vt.path)
        .option("read_changes", "true")
        .option("starting_version", "2")
        .option("ending_version", str(v3))
        .load()
        .collect()
    )
    assert {r["_commit_version"] for r in only3} == {v3}
    # a CDC-less update-class version needs keys: loud planning error
    vt2 = VersionedTable(
        spark, os.path.join(str(tmp_path), "bf2"), stats_columns=["k"]
    )
    vt2.write(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("s"),
            F.lit(1.0).alias("p"),
        )
    )
    vt2.update_where({"p": "p + 1"}, "k < 5")
    nokeys = (
        spark.read.format("versioned_table")
        .option("path", vt2.path)
        .option("read_changes", "true")
        .option("starting_version", "1")
        .load()
    )
    with pytest.raises(Exception, match="primary_keys"):
        nokeys.collect()
    # with keys the derived fallback serves it
    withkeys = (
        spark.read.format("versioned_table")
        .option("path", vt2.path)
        .option("read_changes", "true")
        .option("starting_version", "1")
        .option("primary_keys", "k")
        .load()
        .collect()
    )
    assert {r["_change_type"] for r in withkeys} == {"update_postimage"}
