"""Crash-safety of the parquet MERGE fallback (operators/upsert.py).

Delta's transaction log is the real answer under concurrent writers
(env-blocked here, see test_delta_merge.py); these tests pin the
single-writer crash contract of the emulation instead: a kill at ANY
point of the staging → rename-aside → rename-in sequence leaves the
table readable (fully old or fully new, per partition for the scoped
path), and ``recover_table`` heals the intermediate states.

Kills are simulated by monkeypatching ``os.rename`` to raise at the
n-th call — the exact failpoints a SIGKILL between syscalls produces.
"""

from __future__ import annotations

import os

import pytest

from modular_etl_data_platform_spark.operators.upsert import (
    recover_table,
    upsert_parquet,
)


def _write_base(spark, path):
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "id long, v string, part string",
    ).write.partitionBy("part").parquet(path)


def _batch(spark):
    # update id=2, insert id=4; touches p1 only
    return spark.createDataFrame(
        [(2, "B", "p1"), (4, "d", "p1")], "id long, v string, part string"
    )


MERGED = {(1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2"), (4, "d", "p1")}
ORIGINAL = {(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")}


def _rows(spark, path):
    return {tuple(r) for r in spark.read.parquet(path).select("id", "v", "part").collect()}


class _KillAfter:
    """Raise from os.rename after ``n`` successful calls."""

    def __init__(self, n):
        self.n, self.calls, self.real = n, 0, os.rename

    def __call__(self, src, dst):
        if self.calls >= self.n:
            raise OSError("simulated kill between renames")
        self.calls += 1
        self.real(src, dst)


def test_scoped_upsert_happy_path_no_leftovers(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_base(spark, path)
    upsert_parquet(spark, _batch(spark), path, ["id", "part"], ["part"])
    assert _rows(spark, path) == MERGED
    siblings = os.listdir(tmp_path)
    assert siblings == ["t"], f"leftover swap dirs: {siblings}"


@pytest.mark.parametrize("kill_at", [0, 1])
def test_scoped_upsert_kill_between_renames(spark, tmp_path, monkeypatch, kill_at):
    """Kill before/at each rename of the partition swap: the table stays
    readable with each partition fully old or fully new; recover_table
    heals; re-running the upsert completes the merge."""
    path = str(tmp_path / "t")
    _write_base(spark, path)
    killer = _KillAfter(kill_at)
    monkeypatch.setattr(os, "rename", killer)
    with pytest.raises(OSError, match="simulated kill"):
        upsert_parquet(spark, _batch(spark), path, ["id", "part"], ["part"])
    monkeypatch.setattr(os, "rename", killer.real)

    recover_table(path)
    got = _rows(spark, path)
    assert got in (ORIGINAL, MERGED), got  # never torn, never a hole
    # no staging/aside siblings survive recovery
    assert os.listdir(tmp_path) == ["t"]

    # idempotent retry lands the merge
    upsert_parquet(spark, _batch(spark), path, ["id", "part"], ["part"])
    assert _rows(spark, path) == MERGED


@pytest.mark.parametrize("kill_at", [0, 1])
def test_unpartitioned_upsert_kill_between_renames(spark, tmp_path, monkeypatch, kill_at):
    """Whole-table swap (no partition scoping): kill after the aside
    rename leaves no table dir — recover_table rolls back to the old
    contents."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(path)
    batch = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    killer = _KillAfter(kill_at)
    monkeypatch.setattr(os, "rename", killer)
    with pytest.raises(OSError, match="simulated kill"):
        upsert_parquet(spark, batch, path, ["id"])
    monkeypatch.setattr(os, "rename", killer.real)

    recover_table(path)
    got = _rows_flat(spark, path)
    assert got in ({(1, "a"), (2, "b")}, {(1, "a"), (2, "B"), (3, "c")})
    assert os.listdir(tmp_path) == ["t"]

    upsert_parquet(spark, batch, path, ["id"])
    assert _rows_flat(spark, path) == {(1, "a"), (2, "B"), (3, "c")}


def _rows_flat(spark, path):
    return {tuple(r) for r in spark.read.parquet(path).select("id", "v").collect()}


def test_kill_during_staging_write_leaves_target_untouched(spark, tmp_path):
    """A crash while Spark is still writing the staging dir (before any
    rename) must not perturb the target; the next upsert clears the
    stale staging sibling."""
    path = str(tmp_path / "t")
    _write_base(spark, path)
    stale = path + f"__staging{os.getpid()}"
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "w") as f:
        f.write("torn")
    assert _rows(spark, path) == ORIGINAL
    upsert_parquet(spark, _batch(spark), path, ["id", "part"], ["part"])
    assert _rows(spark, path) == MERGED
    assert os.listdir(tmp_path) == ["t"]


def test_recover_after_completed_swap_cleanup_interrupted(spark, tmp_path):
    """State: every partition swapped in, crash before the aside tree was
    removed — recovery must keep the NEW contents and just drop the aside."""
    path = str(tmp_path / "t")
    _write_base(spark, path)
    # simulate: p2's old copy renamed aside, new (identical) p2 already in
    # place — i.e. swap finished, rmtree(old_root) pending
    old_root = path + "__old_parts"
    os.makedirs(old_root)
    import shutil

    shutil.copytree(os.path.join(path, "part=p2"), os.path.join(old_root, "part=p2"))
    recover_table(path)
    assert not os.path.exists(old_root)
    assert _rows(spark, path) == ORIGINAL


def test_recover_never_resurrects_partitions_dropped_by_full_overwrite(spark, tmp_path):
    """A whole-table overwrite can legitimately REMOVE a partition (a
    merge that moves the last row out of it). If the swap completed but
    cleanup crashed, recovery must DROP the __old_full aside — restoring
    its partitions would resurrect deleted rows / duplicate PKs. This is
    why the whole-table and per-partition asides use distinct suffixes."""
    path = str(tmp_path / "t")
    # new table: p1 only (p2's rows moved/deleted by the overwrite)
    spark.createDataFrame(
        [(1, "a", "p1"), (3, "c", "p1")], "id long, v string, part string"
    ).write.partitionBy("part").parquet(path)
    # aside: the PRE-overwrite table, which still had p2
    old_full = path + "__old_full"
    spark.createDataFrame(
        [(1, "a", "p1"), (3, "c", "p2")], "id long, v string, part string"
    ).write.partitionBy("part").parquet(old_full)
    recover_table(path)
    assert not os.path.exists(old_full)
    got = _rows(spark, path)
    assert got == {(1, "a", "p1"), (3, "c", "p1")}  # p2 NOT resurrected


def test_recover_table_noop_on_healthy_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_base(spark, path)
    recover_table(path)
    assert _rows(spark, path) == ORIGINAL


def test_first_upsert_into_missing_parent_directory(spark, tmp_path):
    """recover_table must not crash when the table's parent dir doesn't
    exist yet (first-ever upsert into a fresh warehouse area)."""
    path = str(tmp_path / "new_area" / "deeper" / "t")
    batch = spark.createDataFrame([(1, "a")], "id long, v string")
    upsert_parquet(spark, batch, path, ["id"])
    assert _rows_flat(spark, path) == {(1, "a")}


def test_schema_evolution_widens_table_uniformly(spark, tmp_path):
    """evolve_schema=True: new batch columns null-fill history, and the
    widening forces a full rewrite even on a partition-scoped table so
    every file carries the union schema (plain parquet reads resolve
    schema from one footer)."""
    path = str(tmp_path / "t")
    _write_base(spark, path)
    batch = spark.createDataFrame(
        [(2, "B", "p1", 0.9)], "id long, v string, part string, score double"
    )
    upsert_parquet(spark, batch, path, ["id", "part"], ["part"], evolve_schema=True)
    out = spark.read.parquet(path)
    assert "score" in out.columns
    got = {(r.id, r.v, r.score) for r in out.collect()}
    assert got == {(1, "a", None), (2, "B", 0.9), (3, "c", None)}
    # default (no evolve): unknown batch columns are dropped, not errored
    upsert_parquet(
        spark,
        spark.createDataFrame(
            [(5, "e", "p2", 1.0, "x")],
            "id long, v string, part string, score double, extra string",
        ),
        path,
        ["id", "part"],
        ["part"],
    )
    assert "extra" not in spark.read.parquet(path).columns


def test_versioned_upsert_schema_evolution(spark, tmp_path):
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt"))
    vt.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    vt.upsert(
        spark.createDataFrame([(2, "b", 7)], "id long, v string, n long"),
        ["id"],
        evolve_schema=True,
    )
    v2 = vt.read()
    assert {(r.id, r.v, r.n) for r in v2.collect()} == {(1, "a", None), (2, "b", 7)}
    # time travel keeps v1's original (narrow) schema
    assert "n" not in vt.read(1).columns
