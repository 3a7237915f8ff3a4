"""Round-8 commit-log contracts (operators/versioned.py): delta-encoded
commit records + periodic checkpoints + ``_last_checkpoint`` pointer
(Delta's log design), the LogStore I/O seam, and the multi-writer race
paths exercised DETERMINISTICALLY through InMemoryLogStore."""

from __future__ import annotations

import json
import os
import time

import pytest

from modular_etl_data_platform_spark.operators import versioned as V
from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog,
    ConcurrentWriteError,
    ConditionalPutLogStore,
    FileSystemLogStore,
    InMemoryLogStore,
    VersionedTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "cast(id as string) as v")


def _rows(df):
    return {tuple(r) for r in df.select("id", "v").collect()}


# -- O(batch) commit bytes ----------------------------------------------------
def test_commit_record_bytes_independent_of_table_file_count(spark, tmp_path):
    """The round-7 log wrote a FULL file inventory per commit —
    O(table-file-count) bytes. The delta log writes only add/remove:
    an identical append must produce a same-sized record whether the
    table holds 2 prior files or 20."""
    small = VersionedTable(spark, str(tmp_path / "small"))
    big = VersionedTable(spark, str(tmp_path / "big"))
    small.write(_df(spark, 0, 10).coalesce(2))
    big.write(_df(spark, 0, 10).repartition(20))
    for i in range(3):  # widen the gap: big accumulates more files
        big.write(_df(spark, 100 * (i + 1), 100 * (i + 1) + 10).coalesce(2), mode="append")
    batch = _df(spark, 1000, 1010).coalesce(1)
    vs = small.write(batch, mode="append")
    vb = big.write(batch, mode="append")
    rec_s = json.loads(small.log.store.read(V._commit_name(vs)))
    rec_b = json.loads(big.log.store.read(V._commit_name(vb)))
    assert "files" not in rec_s and "files" not in rec_b  # delta format
    assert len(rec_s["add"]) == len(rec_b["add"]) == 1
    assert rec_s["remove"] == rec_b["remove"] == []
    size_s = len(json.dumps(rec_s))
    size_b = len(json.dumps(rec_b))
    # identical modulo path-name noise — NOT proportional to 26-vs-3 files
    assert abs(size_b - size_s) < 200


class _CountingStore(FileSystemLogStore):
    def __init__(self, root):
        super().__init__(root)
        self.reads = 0
        self.lists = 0

    def read(self, name):
        self.reads += 1
        return super().read(name)

    def list(self):
        self.lists += 1
        return super().list()


def test_head_and_snapshot_resolution_bounded_by_checkpoint_interval(
    spark, tmp_path
):
    """current_version() must NOT list the whole log directory when the
    ``_last_checkpoint`` pointer exists, and resolve(head) must open at
    most checkpoint_interval + 1 log entries — a year of minute-cadence
    commits costs the same as a day."""
    path = str(tmp_path / "t")
    store = _CountingStore(os.path.join(path, V._MANIFEST_DIR))
    vt = VersionedTable(spark, path, log_store=store, checkpoint_interval=5)
    for i in range(13):
        vt.write(_df(spark, 10 * i, 10 * i + 5).coalesce(1), mode="append" if i else "overwrite")
    assert vt.current_version() == 13
    assert CommitLog(path=path).checkpoints() == [5, 10]

    # a FRESH log instance (no warm cache) — e.g. a new reader process
    cold_store = _CountingStore(os.path.join(path, V._MANIFEST_DIR))
    cold = CommitLog(store=cold_store, checkpoint_interval=5)
    assert cold.current_version() == 13
    assert cold_store.lists == 0  # hint + forward probes, no listing
    cold_store.reads = 0
    state = cold.resolve(13)
    # checkpoint at 10 + deltas 11..13 = 4 content reads, never 13
    assert cold_store.reads <= 5 + 1
    assert len(state["files"]) == 13


def test_time_travel_across_checkpoint_and_delta_boundaries(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    for i in range(9):
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1), mode="append" if i else "overwrite")
    for v in [1, 3, 4, 5, 8, 9]:  # below, at, and above checkpoints
        got = _rows(vt.read(version=v))
        want = {
            (i, str(i)) for b in range(v) for i in range(10 * b, 10 * b + 2)
        }
        assert got == want, f"version {v}"


def test_legacy_full_manifest_tables_stay_readable(spark, tmp_path):
    """Round-7 logs wrote full ``files`` manifests; the delta reader
    must treat them as their own base and keep committing on top."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 5).coalesce(1))
    # rewrite v1's record into the legacy full format in place
    rec = json.loads(vt.log.store.read(V._commit_name(1)))
    legacy = {
        "version": 1,
        "files": rec["add"],
        "schema": rec["schema"],
        "stats": rec["stats"],
        "mode": "overwrite",
    }
    vt.log.store.delete(V._commit_name(1))
    vt.log.store.put(V._commit_name(1), json.dumps(legacy))
    vt.log._cache.clear()
    vt.write(_df(spark, 5, 8).coalesce(1), mode="append")
    assert _rows(vt.read()) == {(i, str(i)) for i in range(8)}
    assert _rows(vt.read(version=1)) == {(i, str(i)) for i in range(5)}


# -- vacuum & retention -------------------------------------------------------
def test_vacuum_checkpoints_oldest_retained_version(spark, tmp_path):
    """Deleting the delta chain beneath the oldest retained version
    would make it unresolvable — vacuum must materialize it as a
    checkpoint first, and the ``_last_checkpoint`` pointer must land on
    a checkpoint that still exists."""
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=100)
    for i in range(7):  # interval 100 -> no organic checkpoints at all
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1), mode="append" if i else "overwrite")
    vt.vacuum(keep_last=3, file_retention_seconds=0.0)
    assert vt.versions() == [5, 6, 7]
    log = CommitLog(path=str(tmp_path / "t"))  # cold reader
    assert 5 in log.checkpoints()
    hint = json.loads(log.store.read(V._HINT_NAME))["version"]
    assert log.store.exists(V._checkpoint_name(hint))
    for v in (5, 6, 7):
        assert len(log.resolve(v)["files"]) == v
    with pytest.raises(FileNotFoundError):
        log.resolve(4)
    assert _rows(vt.read(version=5)) == {
        (i, str(i)) for b in range(5) for i in (10 * b, 10 * b + 1)
    }


def test_vacuum_tmp_sweep_age_gate(spark, tmp_path):
    """A tmp claim file younger than the retention window may belong to
    a LIVE writer between record-write and os.link — vacuum must leave
    it; only stale orphans (dead writers) are swept."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 3).coalesce(1))
    mdir = os.path.join(str(tmp_path / "t"), V._MANIFEST_DIR)
    fresh = os.path.join(mdir, "v00000002.json.tmp999_live")
    stale = os.path.join(mdir, "v00000002.json.tmp999_dead")
    for p in (fresh, stale):
        with open(p, "w") as f:
            f.write("{}")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert os.path.exists(fresh)
    assert not os.path.exists(stale)


def test_swept_tmp_surfaces_as_concurrent_write_error(tmp_path, monkeypatch):
    """If a racer's sweep (or any crash) removes the tmp file between
    write and link, the claim must surface as ConcurrentWriteError —
    the retriable conflict signal — not a raw FileNotFoundError that
    crashes the commit with no rebase."""
    store = FileSystemLogStore(str(tmp_path / "log"))
    real_link = os.link

    def steal_then_link(src, dst):
        os.remove(src)  # the racing sweep
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", steal_then_link)
    with pytest.raises(ConcurrentWriteError):
        store.put_if_absent("v00000001.json", "{}")


# -- deterministic multi-writer races (InMemoryLogStore) ----------------------
@pytest.mark.parametrize(
    "store_cls", [InMemoryLogStore, ConditionalPutLogStore]
)
def test_compact_pins_base_and_keeps_racing_append(spark, tmp_path, store_cls):
    """The round-7 bug: compact() evaluated expected_base at PUBLISH
    time, so an append committed during the rewrite was silently
    dropped from the compacted snapshot. With the base pinned before
    the snapshot read, the interleaved commit triggers a conflict and
    the compaction re-derives from the new head — the appended rows
    must survive. The in-process stores make the interleaving exact;
    the conditional-PUT store additionally proves the S3 mapping."""
    store = store_cls()
    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path, log_store=store)
    racer = VersionedTable(spark, path, log_store=store)
    vt.write(_df(spark, 0, 10).coalesce(2))

    real_land = VersionedTable._land_files
    fired = {"done": False}

    def land_with_interleaved_append(self, df, **kw):
        files = real_land(self, df, **kw)
        if not fired["done"]:
            fired["done"] = True
            racer.write(_df(spark, 100, 105).coalesce(1), mode="append")
        return files

    try:
        VersionedTable._land_files = land_with_interleaved_append
        vt.compact(target_files=1)
    finally:
        VersionedTable._land_files = real_land
    assert _rows(vt.read()) == {(i, str(i)) for i in range(10)} | {
        (i, str(i)) for i in range(100, 105)
    }
    # every committed version survives in the log: base, racer, compact(s)
    assert vt.current_version() >= 3


def test_rebase_retries_are_bounded_not_recursive(spark, tmp_path, monkeypatch):
    """delete_range/compact/compact_where under SUSTAINED contention
    must exhaust a bounded retry budget and raise ConcurrentWriteError
    — never recurse unboundedly re-landing data files."""
    monkeypatch.setattr(V, "_MAX_COMMIT_RETRIES", 3)
    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["id"]
    )
    vt.write(_df(spark, 0, 10).coalesce(1))

    def always_taken(name, data):
        raise ConcurrentWriteError(f"{name} taken")

    monkeypatch.setattr(vt.log.store, "put_if_absent", always_taken)
    with pytest.raises(ConcurrentWriteError, match="lost"):
        vt.delete_range("id", 2, 4)
    with pytest.raises(ConcurrentWriteError, match="lost"):
        vt.compact(target_files=1)
    with pytest.raises(ConcurrentWriteError, match="lost"):
        vt.compact_where("id", 0, 100, order_by=["id"])


@pytest.mark.parametrize(
    "store_cls", [InMemoryLogStore, ConditionalPutLogStore]
)
def test_inmemory_store_serializes_concurrent_appends(
    spark, tmp_path, store_cls
):
    """The OCC protocol through the seam: two writers on the SAME
    in-process store interleave appends; both commits land, neither is
    lost, versions are contiguous."""
    store = store_cls()
    path = str(tmp_path / "t")
    a = VersionedTable(spark, path, log_store=store)
    b = VersionedTable(spark, path, log_store=store)
    a.write(_df(spark, 0, 5).coalesce(1))
    b.write(_df(spark, 10, 15).coalesce(1), mode="append")
    a.write(_df(spark, 20, 25).coalesce(1), mode="append")
    assert a.versions() == [1, 2, 3]
    assert _rows(a.read()) == {
        (i, str(i)) for i in [*range(0, 5), *range(10, 15), *range(20, 25)]
    }


def test_timestamp_stats_prune_files_and_accept_watermark_strings(
    spark, tmp_path
):
    """Round-8: footer stats now record timestamp columns (UTC-naive
    ISO-8601 bounds — fixed-width fields make string order = time
    order), so the medallion's ingestion_timestamp watermark prunes
    versioned bronze files. Bounds arrive as datetimes OR as the
    watermark store's stringified form ('YYYY-MM-DD HH:MM:SS') — both
    must prune identically, and the pruned read must equal the full
    filter exactly."""
    from datetime import datetime

    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["ts"])
    for day in (1, 5, 9):
        batch = spark.range(0, 24).select(
            F.col("id"),
            F.to_timestamp(
                F.format_string("2024-03-%02d %02d:00:00", F.lit(day), F.col("id"))
            ).alias("ts"),
        ).coalesce(1)
        vt.write(batch, mode="append" if day > 1 else "overwrite")
    state = vt._read_manifest(vt.current_version())
    assert len(state["files"]) == 3
    rec = next(iter(state["stats"].values()))["ts"]
    assert rec["k"] == "ts" and rec["lo"].startswith("2024-03-")

    lo_dt, hi_dt = datetime(2024, 3, 5), datetime(2024, 3, 6)
    pruned = vt.read_pruned("ts", lo_dt, hi_dt)
    assert len(pruned.inputFiles()) == 1  # only the day-5 file opened
    full = vt.read().filter(F.col("ts").between(lo_dt, hi_dt))
    assert pruned.count() == full.count() == 24

    # the watermark store's string form: strictly-greater scan past the
    # day-5 file's max must skip days 1 and 5 entirely
    wm_scan = vt.read_pruned(
        "ts", "2024-03-05 23:00:00", None, residual=False, lo_inclusive=False
    )
    assert len(wm_scan.inputFiles()) == 1  # the day-9 file only


def test_read_pruned_multi_skips_on_every_zordered_column(spark, tmp_path):
    """Multi-predicate file skipping over a Z-ordered compaction: with
    files Morton-clustered on (a, b), a conjunctive range on BOTH
    columns must open fewer files than either single-column prune, and
    the result must equal the full filter exactly."""
    from pyspark.sql import functions as F

    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["a", "b"]
    )
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    vt.write(df)
    vt.compact(target_files=16, zorder_by=["a", "b"])
    both = vt.read_pruned_multi([("a", 5, 10), ("b", 5, 10)])
    only_a = vt.read_pruned("a", 5, 10)
    full = vt.read().filter(
        F.col("a").between(5, 10) & F.col("b").between(5, 10)
    )
    n_both = len(both.inputFiles())
    assert n_both < len(only_a.inputFiles())
    assert n_both < 16
    assert {r.payload for r in both.collect()} == {
        r.payload for r in full.collect()
    }


def test_vacuum_dry_run_counts_without_deleting(spark, tmp_path):
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 5).coalesce(1))
    vt.write(_df(spark, 0, 3).coalesce(1))  # overwrite: v1's file orphans
    before_versions = vt.versions()
    n = vt.vacuum(keep_last=1, dry_run=True, file_retention_seconds=0.0)
    assert n == 1
    assert vt.versions() == before_versions  # nothing touched
    assert _rows(vt.read(version=1)) == {(i, str(i)) for i in range(5)}
    assert vt.vacuum(keep_last=1, file_retention_seconds=0.0) == 1  # the real pass deletes exactly that


def test_maybe_compact_consolidates_only_small_files(spark, tmp_path):
    """Size-based auto-compaction (Delta autoCompact analogue): with
    many sub-threshold files, the policy rewrites THEM into one file
    and carries adequately-sized files forward untouched; below the
    count threshold it is a no-op (returns None, publishes nothing)."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 50_000).coalesce(1))  # one "big" file
    for i in range(6):
        vt.write(_df(spark, 10 * i, 10 * i + 5).coalesce(1), mode="append")
    before = vt._read_manifest(vt.current_version())
    big = max(before["files"], key=lambda f: os.path.getsize(f))
    assert vt.maybe_compact(max_small_files=10) is None  # under threshold
    v = vt.maybe_compact(max_small_files=3, small_file_bytes=100_000)
    assert v is not None
    after = vt._read_manifest(v)
    assert big in after["files"]  # the big file was never rewritten
    assert len(after["files"]) == 2  # big + one consolidated file
    assert vt.read().count() == 50_000 + 30  # nothing lost or doubled


def test_string_stats_prune_files_and_pruned_upsert_stays_exact(
    spark, tmp_path
):
    """Round-8: string columns record footer bounds (safe: this
    engine's Spark writer produces valid widened bounds under
    truncation), so categorical partition/key columns prune files
    where hive layout would have. Point read on a segment opens one
    file; a string-keyed pruned MERGE rewrites only the intersecting
    file and the merged table equals the unpruned merge exactly."""
    from pyspark.sql import functions as F

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["seg", "k"])
    for seg in ("ASIA", "EUROPE", "MACHINERY"):
        batch = spark.range(0, 100).select(
            F.lit(seg).alias("seg"),
            F.concat(F.lit(seg + "#"), F.col("id")).alias("k"),
            F.col("id").alias("val"),
        ).coalesce(1)
        vt.write(batch, mode="append" if seg != "ASIA" else "overwrite")
    state = vt._read_manifest(vt.current_version())
    rec = next(iter(state["stats"].values()))["seg"]
    assert rec["k"] == "str"
    point = vt.read_pruned("seg", "EUROPE", "EUROPE")
    assert len(point.inputFiles()) == 1
    assert point.count() == 100

    # string-PK pruned upsert: batch keys all inside EUROPE's range
    before = set(state["files"])
    batch = spark.range(0, 50).select(
        F.lit("EUROPE").alias("seg"),
        F.concat(F.lit("EUROPE#"), F.col("id")).alias("k"),
        (F.col("id") + 1000).alias("val"),
    )
    v = vt.upsert(batch, ["k"])
    after = vt._read_manifest(v)
    assert len(set(after["files"]) & before) == 2  # ASIA + MACHINERY reused
    got = {
        (r.k, r.val)
        for r in vt.read().filter(F.col("seg") == "EUROPE").collect()
    }
    want = {(f"EUROPE#{i}", i + 1000) for i in range(50)} | {
        (f"EUROPE#{i}", i) for i in range(50, 100)
    }
    assert got == want


def test_append_enforces_table_schema(spark, tmp_path):
    """Writer-side schema enforcement on append (Delta's contract): a
    batch MISSING a table column must be rejected — publishing its
    schema unchecked would silently drop that column from every read of
    the carried files; type changes are rejected; NEW columns require
    the explicit evolve_schema=True (mergeSchema), which widens the
    schema and null-fills history."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 5).coalesce(1))
    with pytest.raises(ValueError, match="lacks table column"):
        vt.write(spark.range(5, 8).selectExpr("id"), mode="append")
    with pytest.raises(ValueError, match="changes column type"):
        vt.write(
            spark.range(5, 8).selectExpr("id", "cast(id as int) as v"),
            mode="append",
        )
    with pytest.raises(ValueError, match="adds column"):
        vt.write(
            spark.range(5, 8).selectExpr(
                "id", "cast(id as string) as v", "id * 2 as w"
            ),
            mode="append",
        )
    assert vt.current_version() == 1  # nothing published
    v = vt.write(
        spark.range(5, 8).selectExpr(
            "id", "cast(id as string) as v", "id * 2 as w"
        ),
        mode="append",
        evolve_schema=True,
    )
    got = {(r.id, r.v, r.w) for r in vt.read(v).collect()}
    assert got == {(i, str(i), None) for i in range(5)} | {
        (i, str(i), 2 * i) for i in range(5, 8)
    }


def test_timestamp_as_of_resolves_the_right_snapshot(spark, tmp_path):
    """TIMESTAMP AS OF: commit records carry their commit time; a read
    at time T returns the latest version committed at-or-before T, a
    pre-history timestamp raises, and 'now' resolves to head."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(_df(spark, 0, 3).coalesce(1))
    time.sleep(0.05)
    between = int(time.time() * 1000)
    time.sleep(0.05)
    vt.write(_df(spark, 3, 6).coalesce(1), mode="append")
    assert _rows(vt.read(timestamp=between)) == {(i, str(i)) for i in range(3)}
    assert _rows(vt.read(timestamp=int(time.time() * 1000) + 10)) == {
        (i, str(i)) for i in range(6)
    }
    first_ts = json.loads(vt.log.store.read(V._commit_name(1)))["ts"]
    with pytest.raises(ValueError, match="predates"):
        vt.read(timestamp=first_ts - 1000)
    # datetime form (UTC) hits the same resolution
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(between / 1000, tz=timezone.utc)
    assert _rows(vt.read(timestamp=dt)) == {(i, str(i)) for i in range(3)}


@pytest.mark.parametrize(
    "store_cls", [InMemoryLogStore, ConditionalPutLogStore]
)
def test_append_revalidates_constraints_added_during_commit_race(
    spark, tmp_path, store_cls
):
    """TOCTOU on the constraint contract: write() validates its rows
    via the landing Observation, but a rebase can land on a head whose
    constraints CHANGED (ADD CONSTRAINT raced the commit) — the
    already-landed files must be revalidated against the new set, and a
    now-violating batch must publish nothing. InMemoryLogStore makes
    the interleaving exact."""
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )

    store = store_cls()
    path = str(tmp_path / "t")
    writer = VersionedTable(spark, path, log_store=store)
    racer = VersionedTable(spark, path, log_store=store)
    writer.write(
        spark.createDataFrame([(1, 5.0)], "id long, amt double")
    )

    bad_batch = spark.createDataFrame([(2, -1.0)], "id long, amt double")
    real_publish = V.CommitLog.publish
    fired = {"done": False}

    def constraint_lands_first(self, *args, **kwargs):
        if not fired["done"] and self is writer.log:
            fired["done"] = True
            racer.add_constraint("amt_pos", "amt > 0")
        return real_publish(self, *args, **kwargs)

    try:
        V.CommitLog.publish = constraint_lands_first
        with pytest.raises(ConstraintViolationError):
            writer.write(bad_batch, mode="append")
    finally:
        V.CommitLog.publish = real_publish
    head = writer.current_version()
    assert writer.log.resolve(head).get("constraints", {})  # racer won
    assert writer.read().count() == 1  # the violating append never landed


# -- round-9 parquet checkpoints ------------------------------------------------
def test_parquet_checkpoint_meta_is_o1_and_parts_are_columnar(spark, tmp_path):
    """The v2 checkpoint splits state: O(1) table metadata in the small
    JSON meta record, per-file state in size-bounded columnar parquet
    parts — the meta must stay constant-size as files accumulate, and
    a consumer that needs only paths can project one column."""
    import io

    import pyarrow.parquet as pq

    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=3,
                        stats_columns=["id"])
    for i in range(7):
        vt.write(_df(spark, 10 * i, 10 * i + 4).coalesce(1),
                 mode="append" if i else "overwrite")
    log = vt.log
    meta = json.loads(log.store.read(V._checkpoint_name(6)))
    assert meta["checkpoint_format"] == 2
    assert meta["parts"] == 1
    assert "files" not in meta and "stats" not in meta  # O(1) record
    assert len(json.dumps(meta)) < 2500
    raw = log.store.read_bytes(V._checkpoint_part_name(6, 0))
    tbl = pq.read_table(io.BytesIO(raw), columns=["path"])  # projection
    assert tbl.num_rows == 6
    # the checkpoint state equals the delta-walk state (ground truth)
    cold = V.CommitLog(path=vt.path, checkpoint_interval=3)
    via_ckpt = cold.resolve(6)
    log.delete_checkpoint(6)
    log.delete_checkpoint(3)
    walked = V.CommitLog(path=vt.path, checkpoint_interval=3).resolve(6)
    for k in ("files", "stats", "sizes", "dv", "schema", "constraints"):
        assert via_ckpt.get(k) == walked.get(k), k


def test_checkpoint_splits_into_bounded_parts(spark, tmp_path, monkeypatch):
    """A table with more add-file rows than ``_CHECKPOINT_PART_ROWS``
    checkpoints as MULTIPLE parts that reassemble exactly."""
    monkeypatch.setattr(V, "_CHECKPOINT_PART_ROWS", 2)
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(5):
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1),
                 mode="append" if i else "overwrite")
    meta = json.loads(vt.log.store.read(V._checkpoint_name(5)))
    assert meta["parts"] == 3  # 5 files / 2 rows per part
    cold = V.CommitLog(path=vt.path, checkpoint_interval=5)
    st = cold.resolve(5)
    assert len(st["files"]) == 5
    assert _rows(vt.read(version=5)) == {
        (i, str(i)) for b in range(5) for i in range(10 * b, 10 * b + 2)
    }


def test_missing_checkpoint_part_degrades_to_delta_walk(spark, tmp_path):
    """A checkpoint whose parts a racing retention sweep removed must
    read as NO checkpoint (resolve falls back to the delta chain) —
    never a silently truncated file set."""
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    for i in range(4):
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1),
                 mode="append" if i else "overwrite")
    vt.log.store.delete(V._checkpoint_part_name(3, 0))  # meta survives
    cold = V.CommitLog(path=vt.path, checkpoint_interval=3)
    st = cold.resolve(4)
    assert len(st["files"]) == 4  # full state via the delta walk
    assert _rows(vt.read(version=4)) == {
        (i, str(i)) for b in range(4) for i in range(10 * b, 10 * b + 2)
    }


def test_legacy_single_json_checkpoints_stay_readable(spark, tmp_path):
    """Pre-round-9 checkpoints were one full-state JSON record (no
    ``checkpoint_format`` field) — they must still resolve."""
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    for i in range(4):
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1),
                 mode="append" if i else "overwrite")
    state = vt.log.resolve(3)
    # rewrite v3's checkpoint into the legacy shape in place
    vt.log.delete_checkpoint(3)
    vt.log.store.put(V._checkpoint_name(3), json.dumps(state))
    cold = V.CommitLog(path=vt.path, checkpoint_interval=3)
    assert len(cold.resolve(4)["files"]) == 4
    assert _rows(vt.read(version=3)) == {
        (i, str(i)) for b in range(3) for i in range(10 * b, 10 * b + 2)
    }


def test_vacuum_drops_checkpoint_parts_with_their_meta(spark, tmp_path):
    """Retention removes the parquet parts of dropped checkpoints, not
    just the meta record — no unreachable part bytes accumulate."""
    vt = VersionedTable(spark, str(tmp_path / "t"), checkpoint_interval=2)
    for i in range(7):
        vt.write(_df(spark, 10 * i, 10 * i + 2).coalesce(1),
                 mode="append" if i else "overwrite")
    assert vt.log.checkpoints() == [2, 4, 6]
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    names = vt.log.store.list()
    for v in (2, 4):
        assert V._checkpoint_name(v) not in names
        assert V._checkpoint_part_name(v, 0) not in names
    # the oldest retained version keeps a resolvable checkpoint
    assert vt.read().count() == 14


# -- conditional-PUT object-store semantics (the S3 plug point) -----------------
def test_conditional_put_ambiguous_failure_does_not_double_commit(
    spark, tmp_path
):
    """An object-store PUT can fail AFTER becoming durable. The store's
    retry must recognize the 412-with-our-own-bytes as its OWN success
    — committing once, never claiming the next version with the same
    batch (which would double-append every row)."""
    store = ConditionalPutLogStore()
    vt = VersionedTable(spark, str(tmp_path / "t"), log_store=store)
    store.inject("ambiguous")  # first claim lands, then reports 5xx
    vt.write(_df(spark, 0, 5).coalesce(1))
    assert vt.versions() == [1]
    assert _rows(vt.read()) == {(i, str(i)) for i in range(5)}
    assert store.conditional_puts == 2  # the PUT + the disambiguating retry


def test_conditional_put_plain_unavailability_retries_through(
    spark, tmp_path
):
    """Pure 5xx (nothing durable) retries transparently inside the
    store; past the budget it surfaces as TransientStoreError — a
    failure the caller must NOT treat as a lost race (rebasing on
    ambiguity is how batches double-land)."""
    from modular_etl_data_platform_spark.operators.versioned import (
        TransientStoreError,
    )

    store = ConditionalPutLogStore(max_put_attempts=3)
    vt = VersionedTable(spark, str(tmp_path / "t"), log_store=store)
    store.inject("unavailable", "unavailable")  # 2 x 5xx, then success
    vt.write(_df(spark, 0, 3).coalesce(1))
    assert vt.versions() == [1]

    store.inject("unavailable", "unavailable", "unavailable")
    with pytest.raises(TransientStoreError):
        vt.write(_df(spark, 10, 13).coalesce(1), mode="append")
    assert vt.current_version() == 1  # nothing published past the budget


def test_conditional_put_race_at_claim_boundary_rebases(spark, tmp_path):
    """A racing writer lands at EXACTLY the claim boundary (after our
    head read, before our conditional PUT): the 412 carries foreign
    bytes -> ConcurrentWriteError -> the commit rebases, and both
    batches survive in serialized versions."""
    store = ConditionalPutLogStore()
    path = str(tmp_path / "t")
    vt = VersionedTable(spark, path, log_store=store)
    racer = VersionedTable(spark, path, log_store=store)
    vt.write(_df(spark, 0, 5).coalesce(1))

    store.inject(
        lambda: racer.write(_df(spark, 100, 103).coalesce(1), mode="append")
    )
    vt.write(_df(spark, 10, 15).coalesce(1), mode="append")
    assert vt.versions() == [1, 2, 3]
    assert _rows(vt.read()) == {
        (i, str(i)) for i in [*range(0, 5), *range(100, 103), *range(10, 15)]
    }


def test_conditional_put_store_carries_checkpoints_and_time_travel(
    spark, tmp_path
):
    """The full log lifecycle under the object-store model: parquet
    checkpoints (binary parts via put_bytes), hint-based head
    resolution, time travel, vacuum retention — no POSIX primitive
    anywhere."""
    store = ConditionalPutLogStore()
    vt = VersionedTable(
        spark,
        str(tmp_path / "t"),
        log_store=store,
        checkpoint_interval=3,
        stats_columns=["id"],
    )
    for i in range(7):
        vt.write(
            _df(spark, 10 * i, 10 * i + 2).coalesce(1),
            mode="append" if i else "overwrite",
        )
    assert vt.log.checkpoints() == [3, 6]
    assert _rows(vt.read(version=4)) == {
        (i, str(i)) for b in range(4) for i in range(10 * b, 10 * b + 2)
    }
    vt.vacuum(keep_last=2, file_retention_seconds=0.0)
    assert vt.read().count() == 14
    names = store.list()
    assert V._checkpoint_name(3) not in names
    assert V._checkpoint_part_name(3, 0) not in names


def test_delta_publish_equals_full_list_publish(tmp_path):
    """The delta form (``add=[...]``) must publish byte-identical
    records and resolve to the same state as the full-list form — and
    its layered fast-path state must materialize equal to a state
    replayed from disk by a fresh instance."""
    schema = '{"type":"struct","fields":[]}'
    roots = [str(tmp_path / "full"), str(tmp_path / "delta")]
    logs = [CommitLog(path=r) for r in roots]
    files: list[str] = []
    for i in range(1, 8):
        new = [f"/data/b{i:03d}/part-{j}.parquet" for j in range(2)]
        stats = {f: {"k": [i, i]} for f in new}
        files = files + new
        logs[0].publish(files, schema, {"mode": "append"}, i - 1, stats)
        logs[1].publish(
            None, schema, {"mode": "append"}, i - 1, stats, add=new
        )
    for i in range(1, 8):
        a = json.loads(logs[0].store.read(V._commit_name(i)))
        b = json.loads(logs[1].store.read(V._commit_name(i)))
        a.pop("ts"), b.pop("ts")
        a["sizes"], b["sizes"] = {}, {}  # synthetic paths have no size
        assert a == b, f"record {i} differs between forms"
    s_full = logs[0].resolve(7)
    s_delta = logs[1].resolve(7)
    assert list(s_full["files"]) == list(s_delta["files"]) == sorted(files)
    assert dict(s_full["stats"]) == dict(s_delta["stats"])
    # a fresh instance replaying from disk agrees with the layered fold
    # (evict the process-wide snapshot cache so this is a REAL replay)
    for key in [k for k in V._PROCESS_STATE_CACHE if k[0].startswith(roots[1])]:
        V._PROCESS_STATE_CACHE.pop(key)
    fresh = CommitLog(path=roots[1])
    fresh._cache.clear()
    s_replayed = fresh.resolve(7)
    assert list(s_replayed["files"]) == list(s_delta["files"])
    assert dict(s_replayed["stats"]) == dict(s_delta["stats"])
    assert dict(s_replayed.get("dv", {})) == dict(s_delta.get("dv", {}))
    # the delta form refuses dv_updates (append-only contract)
    with pytest.raises(ValueError, match="dv_updates"):
        logs[1].publish(
            None, schema, {"mode": "append"}, 7,
            {}, dv_updates={"/x": "/dv"}, add=["/x"],
        )
