"""Versioned parquet tables (operators/versioned.py): snapshot
isolation + time travel without Delta — manifest-log semantics."""

from __future__ import annotations

import os

import pytest

from modular_etl_data_platform_spark.operators.versioned import VersionedTable


def _rows(df):
    return {tuple(r) for r in df.select("id", "v").collect()}


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "t"))


def test_time_travel_reproduces_every_snapshot(spark, vt):
    vt.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    vt.upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"), ["id"]
    )
    vt.write(
        spark.createDataFrame([(9, "z")], "id long, v string"), mode="append"
    )
    assert vt.versions() == [1, 2, 3]
    assert _rows(vt.read(1)) == {(1, "a"), (2, "b")}
    assert _rows(vt.read(2)) == {(1, "a"), (2, "B"), (3, "c")}
    assert _rows(vt.read(3)) == {(1, "a"), (2, "B"), (3, "c"), (9, "z")}
    assert _rows(vt.read()) == _rows(vt.read(3))


def test_append_reuses_prior_files(spark, vt):
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    files_v1 = set(vt.history()[0]["files"])
    vt.write(spark.createDataFrame([(2, "b")], "id long, v string"), mode="append")
    files_v2 = set(vt.history()[1]["files"])
    assert files_v1 < files_v2  # strict superset: old files reused, not rewritten


def test_reader_snapshot_is_immune_to_later_writes(spark, vt):
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    snapshot = vt.read()  # resolves the v1 file list NOW
    vt.upsert(spark.createDataFrame([(1, "A")], "id long, v string"), ["id"])
    # the already-resolved frame still reads v1's files
    assert _rows(snapshot) == {(1, "a")}
    assert _rows(vt.read()) == {(1, "A")}


def test_unpublished_files_are_invisible_and_vacuumable(spark, vt):
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    # simulate a write that crashed after landing files, before publish
    orphans = vt._land_files(
        spark.createDataFrame([(666, "junk")], "id long, v string")
    )
    assert _rows(vt.read()) == {(1, "a")}  # never visible
    deleted = vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert deleted >= len(orphans)
    assert all(not os.path.exists(f) for f in orphans)
    assert _rows(vt.read()) == {(1, "a")}  # retained snapshot intact


def test_vacuum_retention(spark, vt):
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    vt.upsert(spark.createDataFrame([(1, "A")], "id long, v string"), ["id"])
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert vt.versions() == [2]
    assert _rows(vt.read()) == {(1, "A")}
    with pytest.raises(FileNotFoundError):
        vt.read(1)


def test_torn_manifest_never_published(spark, vt, monkeypatch):
    """A crash between temp-manifest write and the exclusive-link claim
    leaves the log untouched: the version is simply absent, never
    half-readable."""
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))

    real_link = os.link

    def killed(src, dst):
        if dst.endswith(".json"):
            raise OSError("simulated kill before manifest publish")
        real_link(src, dst)

    monkeypatch.setattr(os, "link", killed)
    with pytest.raises(OSError, match="simulated kill"):
        vt.upsert(spark.createDataFrame([(1, "A")], "id long, v string"), ["id"])
    monkeypatch.setattr(os, "link", real_link)
    assert vt.versions() == [1]
    assert _rows(vt.read()) == {(1, "a")}
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)  # cleans the crashed write's landed files
    assert _rows(vt.read()) == {(1, "a")}


def test_empty_snapshot_is_readable_not_bricking(spark, vt):
    """An all-filtered incremental batch is a legitimate version: it must
    read back as 0 rows with the recorded schema, and later upserts must
    keep working."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    vt.write(df.filter(F.lit(False)))  # v1: empty
    empty = vt.read()
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "v"]
    vt.upsert(spark.createDataFrame([(2, "b")], "id long, v string"), ["id"])
    assert _rows(vt.read()) == {(2, "b")}
    assert _rows(vt.read(2)) == {(2, "b")} and vt.read(1).count() == 0


def test_restore_publishes_old_snapshot_as_new_head(spark, vt):
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    vt.upsert(spark.createDataFrame([(1, "BAD")], "id long, v string"), ["id"])
    v = vt.restore(1)
    assert v == 3
    assert _rows(vt.read()) == {(1, "a")}
    assert _rows(vt.read(2)) == {(1, "BAD")}  # history preserved
    h = vt.history()[-1]
    assert h["mode"] == "restore" and h["restored_from"] == 1


def test_stream_upsert_versioned_one_version_per_batch(spark, tmp_path):
    import json as _json

    from modular_etl_data_platform_spark.streaming.incremental import (
        stream_upsert_versioned,
    )
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "vt")

    def run_batch(name, rows):
        (src / name).write_text(
            "\n".join(_json.dumps({"id": i, "v": v}) for i, v in rows)
        )
        stream = spark.readStream.schema("id long, v string").json(str(src))
        q = stream_upsert_versioned(
            stream, table, ["id"], str(tmp_path / "ckpt")
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_batch("b1.json", [(1, "a"), (2, "b")])
    run_batch("b2.json", [(2, "B"), (3, "c")])
    vt = VersionedTable(spark, table)
    assert len(vt.versions()) == 2
    assert _rows(vt.read()) == {(1, "a"), (2, "B"), (3, "c")}
    assert _rows(vt.read(vt.versions()[0])) == {(1, "a"), (2, "b")}


def test_read_pruned_skips_files_by_manifest_stats(spark, tmp_path):
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    # three appends with disjoint id ranges -> >= 3 files with disjoint
    # footer min/max
    for base in (0, 100, 200):
        vt.write(
            spark.createDataFrame(
                [(base + i, f"v{base + i}") for i in range(10)], "id long, v string"
            ).coalesce(1),
            mode="append" if base else "overwrite",
        )
    full = vt.read()
    pruned = vt.read_pruned("id", 100, 109)
    assert {r.id for r in pruned.collect()} == set(range(100, 110))
    # identical answer to the unpruned filtered read...
    expect = {tuple(r) for r in full.filter("id between 100 and 109").collect()}
    assert {tuple(r) for r in pruned.collect()} == expect
    # ...but opening strictly fewer files
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # a range outside every file opens nothing and returns empty
    assert vt.read_pruned("id", 10_000, 20_000).count() == 0


def test_compact_publishes_fewer_files_preserving_history(spark, vt):
    for i in range(3):
        vt.write(
            spark.createDataFrame([(i, f"v{i}")], "id long, v string").coalesce(1),
            mode="append" if i else "overwrite",
        )
    before = len(vt.history()[-1]["files"])
    v = vt.compact(target_files=1)
    assert len(vt._read_manifest(v)["files"]) == 1 < before
    assert _rows(vt.read()) == {(0, "v0"), (1, "v1"), (2, "v2")}
    # pre-compaction snapshot still time-travelable
    assert _rows(vt.read(v - 1)) == {(0, "v0"), (1, "v1"), (2, "v2")}


def test_clustered_compact_maximizes_pruning(spark, tmp_path):
    """compact(order_by=...) range-clusters the rewrite, so each output
    file covers a narrow disjoint key range and a point-range
    read_pruned opens exactly one file."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    import random

    rng = random.Random(7)
    ids = list(range(300))
    rng.shuffle(ids)
    vt.write(
        spark.createDataFrame([(i, f"v{i}") for i in ids], "id long, v string")
        .repartition(6)  # ids scattered across files -> no pruning power
    )
    scattered = vt.read_pruned("id", 10, 19)
    vt.compact(target_files=6, order_by=["id"])
    clustered = vt.read_pruned("id", 10, 19)
    assert {r.id for r in clustered.collect()} == set(range(10, 20))
    assert len(clustered.inputFiles()) == 1
    assert len(clustered.inputFiles()) < len(scattered.inputFiles())


def test_zorder_compact_prunes_on_every_stats_column(spark, tmp_path):
    """compact(zorder_by=[a, b]) Morton-clusters the rewrite: read_pruned
    then skips files on the TRAILING column too, where a linear
    order_by=[a, b] compaction leaves every file spanning b's full
    range (no pruning power on b)."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from pyspark.sql import functions as F

    def fresh(path):
        vt = VersionedTable(spark, path, stats_columns=["a", "b"])
        df = spark.range(2000).select(
            (F.col("id") % 50).alias("a"),
            F.floor(F.col("id") / 50).alias("b"),
            F.col("id").alias("payload"),
        )
        vt.write(df.repartition(8))
        return vt

    linear = fresh(str(tmp_path / "lin"))
    linear.compact(target_files=8, order_by=["a", "b"])
    zord = fresh(str(tmp_path / "zo"))
    zord.compact(target_files=8, zorder_by=["a", "b"])

    lin_read = linear.read_pruned("b", 10, 12)
    zo_read = zord.read_pruned("b", 10, 12)
    # same answer either way
    assert sorted(r.payload for r in zo_read.collect()) == sorted(
        r.payload for r in lin_read.collect()
    )
    # linear layout: b spans ~everything in each file; z-order: b prunes
    assert len(lin_read.inputFiles()) == 8
    assert len(zo_read.inputFiles()) <= 4
    # and the leading column still prunes on the z-ordered layout
    assert len(zord.read_pruned("a", 3, 5).inputFiles()) < 8
    with pytest.raises(ValueError, match="not both"):
        zord.compact(order_by=["a"], zorder_by=["b"])


def test_compact_where_rewrites_only_intersecting_files(spark, tmp_path):
    """Incremental OPTIMIZE: only files whose stats range intersects the
    predicate are rewritten; every other file is carried into the new
    manifest byte-identical (same path — immutable reuse), and the
    table's contents are unchanged."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    # 4 range-disjoint single-file batches: [0,100) [100,200) ...
    for lo in range(0, 400, 100):
        batch = spark.range(lo, lo + 100).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
        vt.write(batch, mode="append" if lo else "overwrite")
    before = set(vt._read_manifest(vt.current_version())["files"])
    assert len(before) == 4
    total_before = vt.read().count()

    # compact the [0, 199] half: 2 files in, 1 file out, 2 reused
    v = vt.compact_where("id", 0, 199, target_files=1)
    after = vt._read_manifest(v)["files"]
    reused = set(after) & before
    assert len(after) == 3
    assert len(reused) == 2
    for f in reused:
        st = vt._read_manifest(v)["stats"][f]["id"]
        assert st[0] >= 200  # only the high-range files were untouched
    assert vt.read().count() == total_before
    assert vt.read().agg(F.sum("v")).first()[0] == sum(2 * i for i in range(400))
    # prior version still reads the old layout (time travel intact)
    assert vt.read(version=v - 1).count() == total_before

    # nothing to do when <=1 file intersects: version unchanged
    assert vt.compact_where("id", 0, 50) == v


def test_append_commit_opens_no_prior_footers(spark, tmp_path, monkeypatch):
    """Commit cost is O(batch), not O(table): stats for files the prior
    manifest lists are carried forward verbatim (immutable files ⇒
    identical stats); only newly landed files have their footers read.
    At 10^5 historical files this is the difference between an O(1)
    append and a minutes-long driver-side footer sweep."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    for base in (0, 100, 200):
        vt.write(
            spark.range(base, base + 100)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            mode="append" if base else "overwrite",
        )
    prior = vt._read_manifest(vt.current_version())
    prior_files = set(prior["files"])
    prior_stats = dict(prior["stats"])

    opened: list[str] = []
    real = pq.ParquetFile

    def counting(path, *a, **k):
        opened.append(str(path))
        return real(path, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", counting)
    v = vt.write(
        spark.range(300, 400)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1),
        mode="append",
    )
    assert opened, "new files must still have footers measured"
    assert prior_files.isdisjoint(opened), "no prior footer may be re-read"
    after = vt._read_manifest(v)
    for f in prior_files:  # carried forward bit-identical
        assert after["stats"][f] == prior_stats[f]
    new_files = set(after["files"]) - prior_files
    assert all(f in after["stats"] for f in new_files)


def test_upsert_rewrites_only_key_range_intersecting_files(spark, tmp_path):
    """Delta-style MERGE file pruning: an upsert whose batch key range
    covers one of four range-disjoint files rewrites that file only;
    the other three are carried into the new manifest at the SAME path
    (byte-identical reuse), and the merged contents equal a full merge."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    for lo in range(0, 400, 100):
        vt.write(
            spark.range(lo, lo + 100)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            mode="append" if lo else "overwrite",
        )
    before = set(vt._read_manifest(vt.current_version())["files"])
    assert len(before) == 4

    batch = spark.createDataFrame([(150, -1), (199, -2)], "id long, v long")
    v = vt.upsert(batch, ["id"])
    after = vt._read_manifest(v)["files"]
    reused = set(after) & before
    assert len(reused) == 3  # only the [100,200) file was rewritten
    for f in reused:
        st = vt._read_manifest(v)["stats"][f]["id"]
        assert st[1] < 150 or st[0] > 199

    got = {r.id: r.v for r in vt.read().collect()}
    expect = {i: 2 * i for i in range(400)} | {150: -1, 199: -2}
    assert got == expect
    assert vt.read(v - 1).count() == 400  # time travel intact

    # insert-only batch outside every file range: ZERO files rewritten,
    # all four carried forward, the new keys land in fresh files
    v2 = vt.upsert(
        spark.createDataFrame([(500, -5)], "id long, v long"), ["id"]
    )
    after2 = vt._read_manifest(v2)["files"]
    assert set(after) <= set(after2)
    got2 = {r.id: r.v for r in vt.read().collect()}
    assert got2 == expect | {500: -5}


def test_upsert_pruned_schema_evolution_null_fills_carried_files(spark, tmp_path):
    """evolve_schema composes with file pruning: the widened manifest
    schema is authoritative, so carried-forward old-schema files
    null-fill the new column on read (the Delta log-schema behavior)."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    for lo in (0, 100):
        vt.write(
            spark.range(lo, lo + 100)
            # nullable id (nullif is not constant-folded): a later
            # append carries a NULL row, which the table schema must
            # allow — NOT NULL is now writer-enforced
            .select(F.nullif(F.col("id"), F.lit(-1)).alias("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            mode="append" if lo else "overwrite",
        )
    before = set(vt._read_manifest(vt.current_version())["files"])
    batch = spark.createDataFrame(
        [(150, -1, "x")], "id long, v long, tag string"
    )
    v = vt.upsert(batch, ["id"], evolve_schema=True)
    assert set(vt._read_manifest(v)["files"]) & before  # low file carried
    out = vt.read()
    assert out.columns == ["id", "v", "tag"]
    rows = {r.id: (r.v, r.tag) for r in out.collect()}
    assert rows[150] == (-1, "x")
    assert rows[0] == (0, None)  # carried old-schema file null-fills
    assert rows[120] == (240, None)  # rewritten rows null-fill too
    assert len(rows) == 200


def test_compact_where_reclusters_single_hot_file(spark, tmp_path):
    """A requested re-clustering is never silently skipped: even when
    only ONE file intersects, order_by/zorder_by rewrites it (the
    single-hot-file layout fix); without clustering the single-file
    case stays a no-op, detectable by the unchanged version."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(100)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .coalesce(1)
    )
    v0 = vt.current_version()
    assert vt.compact_where("id", 0, 99) == v0  # no clustering: no-op
    v1 = vt.compact_where("id", 0, 99, target_files=4, order_by=["id"])
    assert v1 == v0 + 1  # clustering requested: rewritten
    assert len(vt._read_manifest(v1)["files"]) == 4
    assert vt.read().count() == 100
    assert len(vt.read_pruned("id", 10, 19).inputFiles()) == 1
    # a range hitting nothing is still a no-op either way
    assert vt.compact_where("id", 5000, 6000, order_by=["id"]) == v1


# -- multi-writer optimistic concurrency ------------------------------------


def test_concurrent_appends_all_serialize(spark, tmp_path):
    """Delta's blind-append guarantee on the filesystem log: N writers
    appending concurrently all win — every batch lands in the final
    snapshot, versions are contiguous, and no commit overwrites
    another's manifest (the exclusive-link claim + append rebase)."""
    from concurrent.futures import ThreadPoolExecutor

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    VersionedTable(spark, path).write(
        spark.createDataFrame([(-1, "seed")], "id long, v string")
    )

    def append(w: int) -> int:
        vt = VersionedTable(spark, path)  # own handle, like a separate job
        return vt.write(
            spark.createDataFrame(
                [(w * 10 + i, f"w{w}_{i}") for i in range(3)], "id long, v string"
            ).coalesce(1),
            mode="append",
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        got = sorted(ex.map(append, range(4)))
    vt = VersionedTable(spark, path)
    assert vt.versions() == [1, 2, 3, 4, 5]  # contiguous, none lost
    assert got == [2, 3, 4, 5]  # each writer won exactly one version
    rows = {r.id for r in vt.read().collect()}
    assert rows == {-1} | {w * 10 + i for w in range(4) for i in range(3)}


def test_upsert_rebases_merge_over_interleaved_commit(spark, tmp_path, monkeypatch):
    """The lost-update race: writer B commits an append BETWEEN writer
    A's snapshot read and A's commit claim. A's first claim must FAIL
    (expected-base pin) and the retry must re-merge against the new head
    — B's rows survive alongside A's updates. A rebase that reused A's
    stale merge would silently drop B's commit."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path)
    vt.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    sneak = {"done": False}
    real_land = VersionedTable._land_files

    def landing_with_race(self, df, **kw):
        files = real_land(self, df, **kw)
        if not sneak["done"]:
            sneak["done"] = True
            # a second writer wins a commit after A landed but before
            # A's claim — the classic read-modify-write interleaving
            VersionedTable(spark, path).write(
                spark.createDataFrame([(9, "sneak")], "id long, v string"),
                mode="append",
            )
        return files

    monkeypatch.setattr(VersionedTable, "_land_files", landing_with_race)
    vt.upsert(spark.createDataFrame([(2, "B")], "id long, v string"), ["id"])
    monkeypatch.setattr(VersionedTable, "_land_files", real_land)

    rows = {r.id: r.v for r in vt.read().collect()}
    assert rows == {1: "a", 2: "B", 9: "sneak"}  # both writers' effects
    # history: v1 seed, v2 sneak append, v3 the rebased upsert
    assert vt.versions() == [1, 2, 3]
    assert {r.id for r in vt.read(2).collect()} == {1, 2, 9}


# -- property: random op sequences vs a python model ------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.sets(st.integers(0, 5), min_size=1)),
        st.tuples(st.just("append"), st.sets(st.integers(6, 9), min_size=1)),
        st.tuples(st.just("upsert"), st.sets(st.integers(0, 9), min_size=1)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("restore_first"), st.just(None)),
        st.tuples(st.just("delete_mod3"), st.just(None)),
        st.tuples(st.just("update_mod2"), st.booleans()),  # payload: use_dv
        st.tuples(st.just("replace_band"), st.sets(st.integers(3, 6), min_size=1)),
        st.tuples(st.just("merge_cl"), st.sets(st.integers(0, 9), min_size=1)),
    ),
    min_size=1,
    max_size=5,
)


@given(
    ops=_OPS,
    checkpoint_interval=st.sampled_from([1, 2, 100]),
    store_kind=st.sampled_from(["fs", "cput", "cput_ambiguous"]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_versioned_random_op_sequences_match_model(
    spark, tmp_path_factory, ops, checkpoint_interval, store_kind
):
    """Replay any write/append/upsert/compact/restore/vector-delete
    sequence against a plain python dict model: every head snapshot AND
    every historical version must match what the model said at that
    point. The
    checkpoint interval varies down to 1 (every commit checkpoints) and
    2 (every sequence straddles boundaries), so the delta-fold +
    checkpoint-base resolution paths are both exercised by every
    generated sequence — a fold that drops/doubles a file under any op
    interleaving shows up as a model mismatch."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConditionalPutLogStore,
        VersionedTable,
    )

    # the same sequences replay against the OBJECT-STORE commit path
    # (conditional PUT), optionally with an ambiguous durable-write
    # failure injected before every op — the disambiguating retry must
    # be invisible to the whole DML surface (no skipped/doubled commit)
    store = ConditionalPutLogStore() if store_kind.startswith("cput") else None
    vt = VersionedTable(
        spark,
        str(tmp_path_factory.mktemp("vtp") / "t"),
        checkpoint_interval=checkpoint_interval,
        log_store=store,
    )

    def frame(keys, tag):
        return spark.createDataFrame(
            [(k, f"{tag}{k}") for k in sorted(keys)], "id long, v string"
        )

    model: dict[int, str] = {}
    snapshots: list[dict[int, str]] = []
    for i, (op, keys) in enumerate(ops):
        tag = f"o{i}_"
        if store_kind == "cput_ambiguous":
            store.inject("ambiguous")  # next claim lands, then reports 5xx
        if op == "overwrite":
            vt.write(frame(keys, tag))
            model = {k: f"{tag}{k}" for k in keys}
        elif op == "append":
            if not snapshots:
                vt.write(frame(keys, tag))
                model = {k: f"{tag}{k}" for k in keys}
            else:
                vt.write(frame(keys, tag), mode="append")
                # append does not dedupe keys; restrict to fresh keys (6-9
                # never overlap overwrite's 0-5, but may repeat appends) —
                # model as multiset is overkill; skip duplicate-append
                for k in keys:
                    if k in model:
                        return  # sequence would need multiset semantics
                    model[k] = f"{tag}{k}"
        elif op == "upsert":
            if not snapshots:
                vt.write(frame(keys, tag))
                model = {k: f"{tag}{k}" for k in keys}
            else:
                vt.upsert(frame(keys, tag), ["id"])
                model = {**model, **{k: f"{tag}{k}" for k in keys}}
        elif op == "compact":
            if not snapshots:
                return
            vt.compact(target_files=1)
            model = dict(model)
        elif op == "restore_first":
            if not snapshots:
                return
            vt.restore(1)
            model = dict(snapshots[0])
        elif op == "delete_mod3":
            if not snapshots:
                return
            before = vt.current_version()
            after = vt.delete_where("id % 3 = 0")
            model = {k: val for k, val in model.items() if k % 3 != 0}
            if after == before:
                # nothing matched: no commit published, no new snapshot
                continue
        elif op == "update_mod2":
            if not snapshots:
                return
            before = vt.current_version()
            after = vt.update_where(
                {"v": "concat(v, '!')"},
                "id % 2 = 0",
                use_deletion_vectors=bool(keys),
            )
            model = {
                k: (val + "!" if k % 2 == 0 else val)
                for k, val in model.items()
            }
            if after == before:
                continue  # nothing matched
        elif op == "replace_band":
            if not snapshots:
                return
            vt.overwrite_where(frame(keys, tag), "id >= 3 AND id < 7")
            model = {k: val for k, val in model.items() if not 3 <= k < 7}
            model.update({k: f"{tag}{k}" for k in keys})
        elif op == "merge_cl":
            # full clause surface in one op: matched delete (id%5=0) /
            # update-from-source (even) / unclaimed carry (odd),
            # conditional insert (id>=2), notMatchedBySource flag (id%4=1)
            if not snapshots:
                return
            vt.merge(
                frame(keys, tag),
                on=["id"],
                matched=[
                    ("delete", None, "t.id % 5 = 0"),
                    ("update", {"v": "s.v"}, "s.id % 2 = 0"),
                ],
                not_matched=[("insert", None, "s.id >= 2")],
                not_matched_by_source=[
                    ("update", {"v": "concat(t.v, '?')"}, "t.id % 4 = 1")
                ],
            )
            new = {}
            for k, val in model.items():
                if k in keys:
                    if k % 5 == 0:
                        continue
                    new[k] = f"{tag}{k}" if k % 2 == 0 else val
                else:
                    new[k] = val + "?" if k % 4 == 1 else val
            for k in keys:
                if k not in model and k >= 2:
                    new[k] = f"{tag}{k}"
            model = new
        snapshots.append(dict(model))

    assert len(vt.versions()) == len(snapshots)
    for v, want in zip(vt.versions(), snapshots):
        got = {r.id: r.v for r in vt.read(v).collect()}
        assert got == want, (v, ops)


def test_read_incremental_change_feed(spark, tmp_path):
    """Append-only: the feed since version N is exactly the rows of the
    appends after N. After an upsert, the feed is the rewritten files'
    rows — a superset of the logical changes, never missing one."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(3):
        vt.write(
            spark.range(i * 10, i * 10 + 10)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            mode="append" if i else "overwrite",
        )
    feed = vt.read_incremental(since_version=1)
    assert {r.id for r in feed.collect()} == set(range(10, 30))
    # bounded upper version
    assert {r.id for r in vt.read_incremental(1, version=2).collect()} == set(
        range(10, 20)
    )
    assert vt.read_incremental(since_version=3).count() == 0

    vt.upsert(spark.createDataFrame([(5, -1)], "id long, v long"), ["id"])
    changed = {r.id: r.v for r in vt.read_incremental(since_version=3).collect()}
    assert changed[5] == -1  # the logical change is present
    assert set(changed) <= set(range(30))  # superset of changes, no inventions

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        vt.read_incremental(since_version=99)


def test_delete_range_prunes_and_keeps_nulls(spark, tmp_path):
    """DELETE with data skipping: only stats-intersecting files are
    rewritten (others reused path-identical), rows with a NULL in the
    predicate column survive (three-valued logic), and prior snapshots
    retain the deleted rows until vacuum."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    for lo in (0, 100):
        vt.write(
            spark.range(lo, lo + 100)
            # nullable id (nullif is not constant-folded): a later
            # append carries a NULL row, which the table schema must
            # allow — NOT NULL is now writer-enforced
            .select(F.nullif(F.col("id"), F.lit(-1)).alias("id"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            mode="append" if lo else "overwrite",
        )
    vt.write(
        spark.createDataFrame([(None, 999)], "id long, v long"), mode="append"
    )
    before = set(vt._read_manifest(vt.current_version())["files"])
    v = vt.delete_range("id", 120, 129)
    after = vt._read_manifest(v)["files"]
    reused = set(after) & before
    assert len(reused) >= 1  # the [0,100) file was carried forward
    ids = [r.id for r in vt.read().collect()]
    assert None in ids  # null row survived
    assert set(i for i in ids if i is not None) == set(range(200)) - set(
        range(120, 130)
    )
    assert vt.read(v - 1).count() == 201  # pre-delete snapshot intact
    # a range hitting nothing deletes nothing (the stat-less null file
    # is conservatively rewritten, so the version may advance — content
    # is what must not change)
    before_rows = {tuple(r) for r in vt.read().collect()}
    vt.delete_range("id", 5000, 6000)
    assert {tuple(r) for r in vt.read().collect()} == before_rows


def test_table_changes_classifies_and_ignores_rewrites(spark, tmp_path):
    """CDF-on-read: update/insert/delete classified, unchanged neighbors
    in rewritten files excluded, and a pure compaction reports ZERO
    changes."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        )
    )
    vt.upsert(
        spark.createDataFrame([(2, "B"), (9, "new")], "id long, v string"), ["id"]
    )
    vt.delete_range("id", 3, 3)
    ch = {
        r.id: (r.v, r._change_type)
        for r in vt.table_changes(1, primary_keys=["id"]).collect()
    }
    assert ch == {
        2: ("B", "update_postimage"),
        9: ("new", "insert"),
        3: ("c", "delete"),
    }
    # intermediate window: v1 -> v2 has no delete yet
    ch12 = {
        r.id: r._change_type
        for r in vt.table_changes(1, to_version=2, primary_keys=["id"]).collect()
    }
    assert ch12 == {2: "update_postimage", 9: "insert"}
    # a compaction rewrites every file but changes nothing
    v = vt.compact(target_files=1)
    assert vt.table_changes(v - 1, primary_keys=["id"]).count() == 0
    with pytest.raises(ValueError, match="primary_keys"):
        vt.table_changes(1, primary_keys=[])


def test_check_constraints_enforced_transactionally(spark, tmp_path):
    """Delta-style CHECK constraints: recorded in the manifest, carried
    through every write mode, enforced on landed rows via an
    Observation riding the write (no extra scan). A violation aborts
    BEFORE publish — the version never exists; NULL evaluations pass
    (SQL CHECK three-valued logic)."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"))
    vt.add_constraint("v_nonneg", "v >= 0")
    assert vt.constraints() == {"v_nonneg": "v >= 0"}

    # adding a constraint the data violates must fail
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        vt.add_constraint("impossible", "v > 15")

    vt.write(spark.createDataFrame([(3, 30)], "id long, v long"), mode="append")
    head = vt.current_version()
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        vt.write(
            spark.createDataFrame([(4, -1)], "id long, v long"), mode="append"
        )
    assert vt.current_version() == head  # nothing published
    assert {r.id for r in vt.read().collect()} == {1, 2, 3}
    assert vt.vacuum(keep_last=len(vt.versions()), file_retention_seconds=0.0) > 0  # orphans collected

    # NULL passes; constraint survives an overwrite and gates upsert too
    vt.write(
        spark.createDataFrame([(5, None)], "id long, v long"), mode="append"
    )
    vt.write(spark.createDataFrame([(9, 90)], "id long, v long"))  # overwrite
    assert vt.constraints() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        vt.upsert(spark.createDataFrame([(9, -5)], "id long, v long"), ["id"])

    vt.drop_constraint("v_nonneg")
    vt.write(spark.createDataFrame([(10, -7)], "id long, v long"), mode="append")
    assert {r.v for r in vt.read().collect()} == {90, -7}


# -- deletion vectors (merge-on-read DELETE) ---------------------------------


def test_delete_where_is_merge_on_read(spark, tmp_path):
    """delete_where rewrites NO data file: the snapshot's file list is
    unchanged, matching rows disappear from reads via the sidecar
    anti-join, NULL predicate evaluations keep their rows (SQL DELETE
    3VL), and the pre-delete snapshot stays readable."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(200)
        .select(F.nullif(F.col("id"), F.lit(-1)).alias("id"), (F.col("id") % 5).alias("grp"))
        .coalesce(4),
        mode="overwrite",
    )
    vt.write(
        spark.createDataFrame([(None, 3)], "id long, grp long"), mode="append"
    )
    files_before = vt._read_manifest(vt.current_version())["files"]
    v = vt.delete_where("grp = 3 AND id IS NOT NULL")
    m = vt._read_manifest(v)
    assert m["files"] == files_before  # no rewrite, no new data files
    assert set(m["dv"]) <= set(files_before)
    ids = [r.id for r in vt.read().collect()]
    assert None in ids  # NULL row survived (predicate was not TRUE)
    assert {i for i in ids if i is not None} == {
        i for i in range(200) if i % 5 != 3
    }
    assert vt.read(v - 1).count() == 201  # time travel: rows retained
    # protocol floor recorded: a pre-DV reader must fail loudly
    assert m["protocol"]["min_reader"] == 2


def test_delete_where_accumulates_and_noops(spark, tmp_path):
    """A second delete on already-DV'd files unions positions into a
    fresh sidecar (the pointer is replaced, never mutated); a delete
    matching nothing publishes nothing and leaves no sidecar orphan."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(100).select("id").coalesce(2), mode="overwrite")
    v2 = vt.delete_where("id % 10 = 0")
    dv_v2 = vt._read_manifest(v2)["dv"]
    v3 = vt.delete_where("id < 25")
    dv_v3 = vt._read_manifest(v3)["dv"]
    # files the second delete touched point at a FRESH sidecar
    # (replaced, never mutated); untouched files keep their old pointer
    changed = {f for f in dv_v3 if dv_v2.get(f) != dv_v3[f]}
    assert changed and all(dv_v3[f] not in set(dv_v2.values()) for f in changed)
    live = {r.id for r in vt.read().collect()}
    assert live == {i for i in range(25, 100) if i % 10 != 0}
    # v2's snapshot still applies ONLY its own vector
    assert {r.id for r in vt.read(v2).collect()} == {
        i for i in range(100) if i % 10 != 0
    }
    # no-op: version unchanged and the _dv dir gained nothing
    import os as _os

    dv_root = str(tmp_path / "t" / "_dv")
    n_before = sum(len(fs) for _, _, fs in _os.walk(dv_root))
    assert vt.delete_where("id > 10000") == v3
    assert sum(len(fs) for _, _, fs in _os.walk(dv_root)) == n_before


def test_rewrites_materialize_deletion_vectors(spark, tmp_path):
    """Any rewrite of a DV'd file reads it merge-on-read and lands it
    clean: the new version's dv map drops the entry and the deleted
    rows stay deleted — Delta's REORG/PURGE semantics for free."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(100).select("id", (F.col("id") * 2).alias("v")).coalesce(2),
        mode="overwrite",
    )
    vt.delete_where("id BETWEEN 10 AND 19")
    # upsert rewrites the intersecting file: its vector materializes
    vt.upsert(
        spark.createDataFrame([(5, -1)], "id long, v long"), ["id"]
    )
    live = {r.id for r in vt.read().collect()}
    assert live == set(range(100)) - set(range(10, 20))
    # full compaction clears every vector
    v = vt.compact(target_files=1)
    m = vt._read_manifest(v)
    assert m["dv"] == {}
    assert vt.read().count() == 90


def test_restore_restores_deletion_vectors_both_ways(spark, tmp_path):
    """RESTORE must reset the DV map exactly: restoring to a pre-delete
    snapshot resurrects the rows (clears the head's vector on shared
    files); restoring back to the DV'd snapshot re-deletes them."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(50).select("id").coalesce(1), mode="overwrite")  # v1
    v2 = vt.delete_where("id >= 40")
    assert vt.read().count() == 40
    vt.restore(1)  # v3: same files, vector must CLEAR
    assert vt.read().count() == 50
    vt.restore(v2)  # v4: vector must come back
    assert vt.read().count() == 40
    assert {r.id for r in vt.read().collect()} == set(range(40))


def test_table_changes_reports_dv_only_deletes(spark, tmp_path):
    """CDF-on-read over a deletion-vector commit: no file moved, yet
    the diff must surface exactly the vector-deleted rows as 'delete'
    (carried files with a changed DV pointer are read on both sides)."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(
        spark.range(100).select("id", (F.col("id") % 7).alias("v")).coalesce(3),
        mode="overwrite",
    )
    v2 = vt.delete_where("v = 2")
    ch = vt.table_changes(1, v2, primary_keys=["id"]).collect()
    assert {r._change_type for r in ch} == {"delete"}
    assert {r.id for r in ch} == {i for i in range(100) if i % 7 == 2}
    # and a pure no-change window reports nothing
    assert vt.table_changes(v2, v2, primary_keys=["id"]).count() == 0


def test_vacuum_sweeps_orphaned_dv_sidecars(spark, tmp_path):
    """Retention: sidecars referenced by retained versions survive,
    superseded/orphaned ones go, and the retained snapshot still
    applies its vector afterwards."""
    import os as _os

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(60).select("id").coalesce(1), mode="overwrite")
    vt.delete_where("id < 10")
    vt.delete_where("id >= 50")  # same file: supersedes the first sidecar
    live_sidecars = set(
        vt._read_manifest(vt.current_version())["dv"].values()
    )
    assert vt.vacuum(keep_last=1, file_retention_seconds=0.0) > 0
    dv_root = str(tmp_path / "t" / "_dv")
    remaining_dirs = {
        d
        for d, _, fs in _os.walk(dv_root)
        if any(f.endswith(".parquet") for f in fs)
    }
    assert remaining_dirs == live_sidecars
    assert len(live_sidecars) == 1  # the union sidecar superseded S1
    assert {r.id for r in vt.read().collect()} == set(range(10, 50))


def test_protocol_gates_unknown_future_features(spark, tmp_path):
    """A table whose log demands a newer reader/writer protocol than
    this engine supports must fail LOUDLY at resolve/commit time —
    never silently mis-read (Delta's min-protocol contract)."""
    import json as _json

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(5).select("id").coalesce(1), mode="overwrite")
    rec = _json.loads(vt.log.store.read("v00000001.json"))
    rec["protocol"] = {"min_reader": 99, "min_writer": 99}
    vt.log.store.delete("v00000001.json")
    vt.log.store.put_if_absent("v00000001.json", _json.dumps(rec))
    vt.log._cache.clear()
    with pytest.raises(RuntimeError, match="reader protocol 99"):
        vt.read().collect()


def test_delete_where_rebases_over_interleaved_commit(spark, tmp_path):
    """delete_where racing an append: the expected-base pin makes the
    first claim fail and the retry re-matches against the new head —
    the racer's rows are visible to the delete's predicate (re-scan),
    and nothing committed is lost."""
    from modular_etl_data_platform_spark.operators import versioned as V

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path)
    vt.write(spark.range(20).select("id").coalesce(1), mode="overwrite")

    sneak = {"done": False}
    real_publish = V.CommitLog.publish

    def publish_with_race(self, *a, **kw):
        if not sneak["done"]:
            sneak["done"] = True
            VersionedTable(spark, path).write(
                spark.range(100, 110).select("id").coalesce(1), mode="append"
            )
        return real_publish(self, *a, **kw)

    try:
        V.CommitLog.publish = publish_with_race
        vt.delete_where("id % 2 = 1")
    finally:
        V.CommitLog.publish = real_publish
    live = {r.id for r in vt.read().collect()}
    # the racer's odd ids were re-matched by the rebase and deleted too
    assert live == {i for i in list(range(20)) + list(range(100, 110)) if i % 2 == 0}
    assert vt.versions() == [1, 2, 3]


def test_dv_upsert_equals_rewrite_upsert(spark, tmp_path):
    """The DV-backed MERGE strategy must be row-for-row equivalent to
    the rewrite MERGE (whole-row replace, unmatched survive, inserts
    land) while carrying EVERY prior data file untouched — cost is the
    PK-column scan plus the batch, never the touched files' bytes."""
    from pyspark.sql import functions as F

    def build(path):
        vt = VersionedTable(spark, path, stats_columns=["id"])
        vt.write(
            spark.range(500)
            .select("id", (F.col("id") * 3).alias("v"))
            .repartitionByRange(4, "id")
            .sortWithinPartitions("id"),
            mode="overwrite",
        )
        return vt

    batch = spark.range(100, 160).select(
        "id", F.lit(-1).cast("long").alias("v")
    ).union(
        spark.range(900, 910).select("id", F.lit(-2).cast("long").alias("v"))
    )
    a = build(str(tmp_path / "rewrite"))
    b = build(str(tmp_path / "dv"))
    a.upsert(batch, ["id"])
    files_before = b._read_manifest(1)["files"]
    v = b.upsert(batch, ["id"], use_deletion_vectors=True)
    m = b._read_manifest(v)
    assert set(files_before) <= set(m["files"])  # zero rewrites
    assert m["dv"]  # matched rows vector-deleted
    assert m["protocol"]["min_reader"] == 2
    rows_a = {(r.id, r.v) for r in a.read().collect()}
    rows_b = {(r.id, r.v) for r in b.read().collect()}
    assert rows_a == rows_b
    # only the stats-intersecting file(s) carry a vector
    stats = m["stats"]
    for f in m["dv"]:
        lo, hi = stats[f]["id"]
        assert lo <= 159 and hi >= 100  # intersects the matched range


def test_dv_upsert_insert_only_and_accumulation(spark, tmp_path):
    """An insert-only DV merge publishes no vector at all; repeated
    DV merges over the same hot file accumulate through union sidecars
    and a compaction materializes everything away."""
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(spark.range(100).selectExpr("id", "id as v").coalesce(1))
    v2 = vt.upsert(
        spark.range(1000, 1010).selectExpr("id", "id as v"),
        ["id"],
        use_deletion_vectors=True,
    )
    assert vt._read_manifest(v2)["dv"] == {}  # nothing matched
    assert vt.read().count() == 110
    for lo in (0, 5, 50):  # overlapping hot-range merges
        vt.upsert(
            spark.range(lo, lo + 10).selectExpr("id", "id * 100 as v"),
            ["id"],
            use_deletion_vectors=True,
        )
    got = {r.id: r.v for r in vt.read().collect()}
    assert len(got) == 110
    assert got[7] == 700 and got[55] == 5500 and got[20] == 20
    v = vt.compact(target_files=1)
    assert vt._read_manifest(v)["dv"] == {}
    assert {r.id: r.v for r in vt.read().collect()} == got


def test_concurrent_vector_deletes_union_not_lose(spark, tmp_path):
    """Two vector deletes racing on the SAME file: the loser's pointer
    replacement would drop the winner's positions if it rebased from a
    stale dv map — the expected-base pin forces a re-match against the
    new head, whose sidecar union must carry BOTH deletes' positions."""
    from modular_etl_data_platform_spark.operators import versioned as V

    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path)
    vt.write(spark.range(100).selectExpr("id").coalesce(1))

    sneak = {"done": False}
    real_publish = V.CommitLog.publish

    def publish_with_race(self, *a, **kw):
        if not sneak["done"]:
            sneak["done"] = True
            VersionedTable(spark, path).delete_where("id >= 90")
        return real_publish(self, *a, **kw)

    try:
        V.CommitLog.publish = publish_with_race
        vt.delete_where("id < 10")
    finally:
        V.CommitLog.publish = real_publish
    assert vt.versions() == [1, 2, 3]
    assert {r.id for r in vt.read().collect()} == set(range(10, 90))
    # v2 (the sneak) applied only its own delete
    assert {r.id for r in vt.read(2).collect()} == set(range(90))


def test_operation_metrics_ride_every_commit(spark, tmp_path):
    """DESCRIBE HISTORY-style operation metrics: every commit records
    files added/removed and row counts derived from data already in
    hand (added rows from the landed footers, removed rows from the
    carried stats) — zero extra I/O, no table re-stat."""
    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(spark.range(100).selectExpr("id").coalesce(2))
    vt.write(spark.range(100, 150).selectExpr("id").coalesce(1), mode="append")
    h = {m["version"]: m["metrics"] for m in vt.history()}
    assert h[1]["num_added_rows"] == 100 and h[1]["num_removed_files"] == 0
    assert h[2]["num_added_rows"] == 50 and h[2]["num_added_files"] == 1
    v3 = vt.delete_range("id", 0, 49)
    m3 = vt._read_manifest(v3)["metrics"]
    # the hot file (0..49) was rewritten empty-of-range: removed rows
    # counted from carried stats, added from the rewrite's footers
    assert m3["num_removed_rows"] - m3["num_added_rows"] == 50
    # a dv delete moves no files at all
    v4 = vt.delete_where("id = 70")
    m4 = vt._read_manifest(v4)["metrics"]
    assert m4 == {"num_added_files": 0, "num_removed_files": 0, "num_added_rows": 0}


def test_vacuum_time_based_retention(spark, tmp_path):
    """retention_hours widens retention by commit time: versions inside
    the window survive beyond keep_last (a guaranteed time-travel
    horizon); retention_hours=0 degrades to pure keep_last."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):
        vt.write(
            spark.range(i * 10, i * 10 + 10).selectExpr("id").coalesce(1),
            mode="append" if i else "overwrite",
        )
    # all four commits are seconds old: a 1h window keeps everything
    vt.vacuum(keep_last=1, retention_hours=1.0, file_retention_seconds=0.0)
    assert vt.versions() == [1, 2, 3, 4]
    assert vt.read(1).count() == 10  # oldest snapshot still readable
    # a zero-hour window keeps only keep_last
    vt.vacuum(keep_last=2, retention_hours=0.0, file_retention_seconds=0.0)
    assert vt.versions() == [3, 4]
    assert vt.read(3).count() == 30


def test_convert_to_versioned_in_place(spark, tmp_path):
    """CONVERT TO DELTA analogue: an existing plain-parquet dir becomes
    v1 without moving a byte (paths referenced verbatim), footer stats
    make pruned reads work immediately, subsequent writes stack
    versions on top, and hive-partitioned layouts are refused (bare
    files would drop the partition columns)."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.versioned import (
        convert_to_versioned,
        is_versioned_table,
    )

    path = str(tmp_path / "plain")
    spark.range(100).select("id", (F.col("id") * 2).alias("v")).coalesce(
        2
    ).write.parquet(path)
    assert not is_versioned_table(path)
    vt = convert_to_versioned(spark, path, stats_columns=["id"])
    assert is_versioned_table(path) and vt.current_version() == 1
    m = vt._read_manifest(1)
    assert all(os.path.dirname(f) == path for f in m["files"])  # in place
    assert m["mode"] == "convert"
    assert {r.id for r in vt.read().collect()} == set(range(100))
    # stats from the imported footers drive pruning immediately
    pruned = vt.read_pruned("id", 0, 10)
    assert len(pruned.inputFiles()) < len(vt.read().inputFiles())
    # life continues as a versioned table: merge + time travel
    vt.upsert(spark.createDataFrame([(5, -1)], "id long, v long"), ["id"])
    assert vt.read(1).count() == 100
    assert {r.v for r in vt.read().filter("id = 5").collect()} == {-1}
    # double conversion refused
    with pytest.raises(FileExistsError):
        convert_to_versioned(spark, path)
    # hive-partitioned dirs refused
    part = str(tmp_path / "part")
    spark.range(10).select("id", (F.col("id") % 2).alias("p")).write.partitionBy(
        "p"
    ).parquet(part)
    with pytest.raises(ValueError, match="hive-partitioned"):
        convert_to_versioned(spark, part)


def test_delete_where_crash_before_publish_leaves_table_intact(
    spark, tmp_path, monkeypatch
):
    """A crash between the sidecar landing and the commit claim must
    leave the table untouched: no version appears, reads see every row,
    and vacuum sweeps the orphaned sidecar directory."""
    import os as _os

    from modular_etl_data_platform_spark.operators import versioned as V

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(50).selectExpr("id").coalesce(1))

    real_publish = V.CommitLog.publish

    def killed(self, *a, **kw):
        raise OSError("simulated kill before dv commit")

    monkeypatch.setattr(V.CommitLog, "publish", killed)
    with pytest.raises(OSError, match="simulated kill"):
        vt.delete_where("id < 10")
    monkeypatch.setattr(V.CommitLog, "publish", real_publish)
    assert vt.versions() == [1]
    assert vt.read().count() == 50
    dv_root = str(tmp_path / "t" / "_dv")
    orphan_parts = sum(
        1 for _, _, fs in _os.walk(dv_root) for f in fs if f.endswith(".parquet")
    )
    assert orphan_parts > 0  # the crash left a landed sidecar behind
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert not any(
        f.endswith(".parquet") for _, _, fs in _os.walk(dv_root) for f in fs
    )
    assert vt.read().count() == 50


def test_update_where_rewrite_semantics(spark, tmp_path):
    """UPDATE ... SET (rewrite strategy): assignments evaluate against
    the PRE-update row (a={b}, b={a} swaps), results cast back to the
    declared column type, NULL predicate evaluations leave their rows
    unchanged (SQL UPDATE 3VL), and only files holding matched rows are
    rewritten — disjoint files carry forward path-identical."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(100)
        .select(F.nullif(F.col("id"), F.lit(-1)).alias("id"), (F.col("id") * 2).alias("a"), F.lit(7).cast("long").alias("b"))
        .coalesce(1),
        mode="overwrite",
    )
    vt.write(
        spark.range(100, 200)
        .select(F.col("id"), (F.col("id") * 2).alias("a"), F.lit(7).cast("long").alias("b"))
        .coalesce(1),
        mode="append",
    )
    vt.write(
        spark.createDataFrame([(None, 5, 5)], "id long, a long, b long"),
        mode="append",
    )
    files_before = vt._read_manifest(vt.current_version())["files"]
    v = vt.update_where({"a": "b", "b": "a"}, "id < 50")
    m = vt._read_manifest(v)
    # phase 1 finds matches only in the first file (id < 50): the
    # 100-199 file and the NULL-id row's file(s) carry path-identical
    # (a NULL id evaluates the predicate to NULL -> row kept, file
    # never touched)
    untouched = set(files_before) & set(m["files"])
    assert len(set(files_before) - set(m["files"])) == 1  # one file rewritten
    assert len(untouched) == len(files_before) - 1
    rows = {r.id: (r.a, r.b) for r in vt.read().collect()}
    for i in range(50):
        assert rows[i] == (7, i * 2)  # swapped
    for i in range(50, 200):
        assert rows[i] == (i * 2, 7)  # untouched
    assert rows[None] == (5, 5)  # NULL predicate -> unchanged
    # pre-update snapshot intact
    old = {r.id: (r.a, r.b) for r in vt.read(version=v - 1).collect()}
    assert old[10] == (20, 7)
    # type preserved: an expression that would widen casts back
    v2 = vt.update_where({"b": "b * 1.9"}, "id = 60")
    schema = dict(vt.read().dtypes)
    assert schema["b"] == "bigint"
    assert {r.b for r in vt.read().filter("id = 60").collect()} == {13}


def test_update_where_dv_no_rewrite_no_resurrection(spark, tmp_path):
    """DV-backed UPDATE: zero data files rewritten (images land as new
    files, old positions vector-delete), already-vector-deleted rows
    are never updated back to life, and the streaming source classifies
    the commit as an update (ignore_changes required)."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(100).select(F.col("id"), F.lit(1.0).alias("p")).coalesce(2),
        mode="overwrite",
    )
    vt.delete_where("id >= 90")  # vector-deleted rows
    files_before = vt._read_manifest(vt.current_version())["files"]
    v = vt.update_where(
        {"p": "p + 10"}, "id >= 80", use_deletion_vectors=True
    )
    m = vt._read_manifest(v)
    assert set(files_before) <= set(m["files"])  # no rewrite
    got = {r.id: r.p for r in vt.read().collect()}
    assert len(got) == 90  # deleted rows NOT resurrected by the update
    for i in range(80, 90):
        assert got[i] == 11.0
    assert got[5] == 1.0
    # update commit gates an append-mode stream
    rec_mode = m["mode"]
    assert rec_mode == "update_where"
    # a second DV update accumulates onto the same files
    v2 = vt.update_where({"p": "p * 2"}, "id = 85", use_deletion_vectors=True)
    assert vt.read().filter("id = 85").first().p == 22.0
    assert set(files_before) <= set(vt._read_manifest(v2)["files"])


def test_update_where_validates_and_noops(spark, tmp_path):
    """Unknown assignment columns raise; a predicate matching nothing
    publishes no version; constraints validate the updated rows
    transactionally (a violating update publishes NOTHING)."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.range(10).selectExpr("id", "id * 2 AS a").coalesce(1))
    with pytest.raises(ValueError, match="unknown column"):
        vt.update_where({"zz": "1"}, "id = 1")
    v = vt.current_version()
    assert vt.update_where({"a": "0"}, "id > 999") == v
    vt.add_constraint("a_nonneg", "a >= 0")
    with pytest.raises(ConstraintViolationError):
        vt.update_where({"a": "-5"}, "id < 3")
    assert vt.read().filter("a < 0").count() == 0
    assert vt.current_version() == v + 1  # only the constraint commit


def test_overwrite_where_replaces_atomically(spark, tmp_path):
    """replaceWhere: matched live rows are replaced by the batch in one
    commit, NULL predicate evaluations keep their rows, files disjoint
    from the predicate carry forward path-identical, and a batch row
    that does not satisfy the predicate is rejected up front."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(100)
        .select(F.nullif(F.col("id"), F.lit(-1)).alias("id"), F.lit("old").alias("v"))
        .coalesce(1),
        mode="overwrite",
    )
    vt.write(
        spark.range(100, 200)
        .select(F.col("id"), F.lit("old").alias("v"))
        .coalesce(1),
        mode="append",
    )
    vt.write(
        spark.createDataFrame([(None, "keepme")], "id long, v string"),
        mode="append",
    )
    files_before = vt._read_manifest(vt.current_version())["files"]
    batch = spark.range(20, 30).select(
        F.col("id"), F.lit("new").alias("v")
    )
    v = vt.overwrite_where(batch, "id >= 20 AND id < 40", prune=("id", 20, 39))
    m = vt._read_manifest(v)
    # only the 0-99 file is rewritten; the 100-199 file and the
    # NULL-id row's file(s) carry path-identical
    assert len(set(files_before) - set(m["files"])) == 1
    assert len(set(files_before) & set(m["files"])) == len(files_before) - 1
    rows = {r.id: r.v for r in vt.read().collect()}
    assert len(rows) == 191  # 200 - 20 replaced + 10 new + null row
    assert all(rows[i] == "new" for i in range(20, 30))
    assert all(i not in rows for i in range(30, 40))  # replaced away
    assert rows[None] == "keepme"  # NULL predicate keeps
    assert rows[50] == "old"
    with pytest.raises(ValueError, match="not matching"):
        vt.overwrite_where(batch, "id >= 25")
    # schema contract: a batch missing a column is rejected
    with pytest.raises(ValueError, match="lacks table column"):
        vt.overwrite_where(spark.range(5).select("id"), "id < 5")


def test_clone_is_shallow_and_divergent(spark, tmp_path):
    """Shallow clone: v1 of the clone references the source's files
    verbatim (zero data copy, stats + constraints + deletion vectors
    carried through the log — read_pruned works without a footer
    pass), writes diverge, and the clone's vacuum never deletes source
    data."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "s"), stats_columns=["id"])
    vt.write(
        spark.range(100).select(F.col("id"), F.lit(1.0).alias("p")).coalesce(2),
        mode="overwrite",
    )
    vt.add_constraint("id_nonneg", "id >= 0")
    vt.delete_where("id % 10 = 9")
    src_head = vt.current_version()
    src_manifest = vt._read_manifest(src_head)
    c = vt.clone(str(tmp_path / "c"))
    cm = c._read_manifest(1)
    assert cm["files"] == src_manifest["files"]  # verbatim references
    assert cm["mode"] == "clone" and cm["source_version"] == src_head
    assert {r.id for r in c.read().collect()} == {
        i for i in range(100) if i % 10 != 9
    }  # dv carried
    assert c.constraints() == {"id_nonneg": "id >= 0"}
    # stats carried: pruned read resolves from the clone's own log
    assert c.read_pruned("id", 0, 10).count() > 0
    # divergence: a clone write/update never touches the source
    c.update_where({"p": "p + 1"}, "id < 5")
    assert vt.read().filter("id < 5").agg(F.sum("p")).first()[0] == 5.0
    assert c.read().filter("id < 5").agg(F.sum("p")).first()[0] == 10.0
    # clone vacuum walks only its own landing dirs: source data intact
    c.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert vt.read().count() == 90
    assert vt.read(version=src_head).count() == 90
    # cloning at an old version works; cloning onto a table refuses
    c2 = vt.clone(str(tmp_path / "c2"), version=1)
    assert c2.read().count() == 100
    with pytest.raises(FileExistsError):
        vt.clone(str(tmp_path / "c"))


def test_idempotent_txn_writes_and_upserts(spark, tmp_path):
    """Delta's txnAppId/txnVersion contract on batch writes: a retried
    commit whose (app, version) already landed is a no-op, even with
    unrelated commits in between; a NEWER app version lands normally."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    v1 = vt.write(df1, txn_app_id="job", txn_version=1)
    # retry of the same logical commit: no-op, no new version
    assert vt.write(df1, mode="append", txn_app_id="job", txn_version=1) == v1
    assert vt.current_version() == v1
    assert vt.read().count() == 1
    # an unrelated writer commits; the retry is STILL recognized
    vt.write(spark.createDataFrame([(2, "b")], "id long, v string"), mode="append")
    assert (
        vt.write(df1, mode="append", txn_app_id="job", txn_version=1)
        == vt.current_version()
    )
    assert vt.read().count() == 2
    # a newer app version lands
    vt.write(
        spark.createDataFrame([(3, "c")], "id long, v string"),
        mode="append",
        txn_app_id="job",
        txn_version=2,
    )
    assert vt.read().count() == 3
    # upserts ride the same contract (both strategies)
    batch = spark.createDataFrame([(3, "C")], "id long, v string")
    v = vt.upsert(batch, ["id"], txn_app_id="merge-job", txn_version=10)
    assert vt.upsert(batch, ["id"], txn_app_id="merge-job", txn_version=10) == v
    assert vt.upsert(
        batch, ["id"], use_deletion_vectors=True,
        txn_app_id="merge-job", txn_version=9,
    ) == v  # older version: skipped
    assert {tuple(r) for r in vt.read().filter("id = 3").collect()} == {(3, "C")}
    with pytest.raises(ValueError, match="go together"):
        vt.write(df1, txn_app_id="job")
    with pytest.raises(ValueError, match="go together"):
        vt.upsert(batch, ["id"], txn_version=5)


def test_not_null_enforced_on_append(spark, tmp_path):
    """Columns the table schema declares non-nullable reject NULL values
    writer-side (Delta's nullability enforcement); an overwrite's batch
    REDEFINES the schema and is exempt."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("v", T.StringType(), nullable=True),
        ]
    )
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.createDataFrame([(1, "a")], schema))
    with pytest.raises(ConstraintViolationError, match="NOT NULL id"):
        vt.write(
            spark.createDataFrame([(None, "b")], "id long, v string"),
            mode="append",
        )
    assert vt.current_version() == 1  # nothing published
    # NULL in a nullable column is fine
    vt.write(
        spark.createDataFrame([(2, None)], "id long, v string"), mode="append"
    )
    # an upsert with a NULL key value is rejected the same way
    with pytest.raises(ConstraintViolationError, match="NOT NULL id"):
        vt.upsert(
            spark.createDataFrame([(None, "x")], "id long, v string"), ["id"]
        )
    # overwrite redefines the schema: a nullable batch is accepted
    vt.write(spark.createDataFrame([(None, "z")], "id long, v string"))
    assert vt.read().count() == 1


def test_table_changes_accepts_timestamp_bounds(spark, tmp_path):
    """Delta CDF's timestamp bounds: a datetime/ISO bound resolves to
    the last version committed at or before the instant, equal to the
    version-number form."""
    from datetime import datetime, timezone

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    vt.upsert(spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"), ["id"])
    v1_ts = vt.history()[0]["ts"]
    by_version = {
        (r.id, r._change_type)
        for r in vt.table_changes(1, primary_keys=["id"]).collect()
    }
    iso = datetime.fromtimestamp(v1_ts / 1000, tz=timezone.utc).isoformat()
    by_ts = {
        (r.id, r._change_type)
        for r in vt.table_changes(iso, primary_keys=["id"]).collect()
    }
    assert by_version == by_ts == {(2, "update_postimage"), (3, "insert")}
    # naive datetime = UTC; end bound accepted too
    naive = datetime.utcfromtimestamp(v1_ts / 1000)
    assert vt.table_changes(
        naive, datetime.utcnow(), primary_keys=["id"]
    ).count() == 2


def test_describe_detail_summarizes_from_log_state_only(spark, tmp_path):
    """DESCRIBE DETAIL (detail()): file/row/byte totals, properties and
    protocol come from the RESOLVED LOG STATE — sizes and row counts
    ride every commit record, so the summary opens zero parquet
    footers at any table size."""
    import os as _os

    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    def frame(lo, hi):
        return spark.range(lo, hi).selectExpr("id", "cast(id as string) as v")

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(frame(0, 10).coalesce(2))
    vt.write(frame(10, 15).coalesce(1), mode="append")
    vt.add_constraint("id_nonneg", "id >= 0")
    vt.delete_where("id = 3")

    import pyarrow.parquet as pq

    opened = []
    orig = pq.ParquetFile
    try:
        pq.ParquetFile = lambda *a, **k: opened.append(a) or orig(*a, **k)
        d = vt.detail()
    finally:
        pq.ParquetFile = orig
    assert opened == []  # log state only, no footer reads
    assert d["version"] == 4 and d["num_files"] == 3
    assert d["num_rows"] == 15  # PHYSICAL rows (DV not netted)
    assert d["num_deletion_vectors"] == 1
    assert d["size_in_bytes"] == sum(
        _os.path.getsize(f) for f in vt._read_manifest(4)["files"]
    )
    assert d["constraints"] == {"id_nonneg": "id >= 0"}
    assert d["protocol"]["min_reader"] == 2  # the DV commit bumped it
    assert d["column_mapping_mode"] == "none"
    # time travel: the pre-delete snapshot has no vectors
    d1 = vt.detail(version=2)
    assert d1["num_deletion_vectors"] == 0 and d1["num_files"] == 3


def test_describe_detail_degrades_num_rows_on_partial_stats(spark, tmp_path):
    """A stats entry that is a dict but lacks the row-count marker (a
    pre-row-count commit, a foreign/CONVERTed file) must degrade
    ``num_rows`` to None as documented — not raise TypeError from
    summing a None."""
    import json as _json

    from modular_etl_data_platform_spark.operators.versioned import (
        _ROWS_MARK,
        VersionedTable,
        _commit_name,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(spark.range(0, 10).coalesce(1))
    # simulate a legacy/foreign commit: strip the row-count marker from
    # one file's stats entry in the commit record itself
    rec = _json.loads(vt.log.store.read(_commit_name(1)))
    f0 = rec["add"][0]
    assert _ROWS_MARK in rec["stats"][f0]
    del rec["stats"][f0][_ROWS_MARK]
    vt.log.store.delete(_commit_name(1))
    vt.log.store.put(_commit_name(1), _json.dumps(rec))
    vt.log._cache.clear()
    d = vt.detail()
    assert d["num_rows"] is None  # documented fallback, not TypeError
    assert d["num_files"] == 1
