"""Round-9 writer/maintenance safety contracts (the r8 advisory items):
overwrite saves validate carried CHECK constraints, format-API paths are
canonicalized like ``VersionedTable``'s, vacuum age-gates unreferenced
data/DV/bloom files, a zombie stream-commit retry stays idempotent
through the rebase loop, and RESTORE travels with the snapshot's table
properties."""

from __future__ import annotations

import os

import pytest

from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog,
    VersionedTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "cast(id as string) as v")


def _register(spark):
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)


# -- format-API overwrite validates carried constraints ------------------------
def test_format_api_overwrite_validates_carried_constraints(spark, tmp_path):
    """CHECK constraints survive an overwrite (publish carries them
    forward), so an overwrite SAVE must validate its batch against them
    — previously ``mode("overwrite")`` through the format API silently
    SKIPPED validation and published rows a still-active constraint
    forbids. Validation logic is exercised through a direct writer call
    (driver-side, session available — the same harness the stream-sink
    constraint test uses); the real ``.save()`` path on a
    constraint-bearing table fails CLOSED (the writer's commit runs in
    a sessionless Python worker) and must publish nothing either way."""
    import pyarrow as pa

    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        _VersionedBatchArrowWriter,
    )

    _register(spark)
    table = str(tmp_path / "t")
    vt = VersionedTable(spark, table)
    vt.write(_df(spark, 0, 5))
    vt.add_constraint("id_small", "id < 100")

    schema = vt.read().schema
    w = _VersionedBatchArrowWriter(
        table, schema, overwrite=True, stats_columns=[]
    )
    bad = w.write(
        iter([pa.RecordBatch.from_pydict({"id": [200], "v": ["x"]})])
    )
    with pytest.raises(ConstraintViolationError) as ei:
        w.commit([bad])
    assert "id_small" in str(ei.value)
    assert vt.current_version() == 2  # nothing published
    w.abort([bad])

    ok = w.write(
        iter([pa.RecordBatch.from_pydict({"id": [10, 11], "v": ["a", "b"]})])
    )
    w.commit([ok])
    assert vt.read().count() == 2
    # ...and the constraint is still active after the overwrite
    assert vt.constraints() == {"id_small": "id < 100"}

    # the real save() path: commit runs in a sessionless worker, so a
    # constraint-bearing table fails CLOSED — and publishes NOTHING
    # (before the fix it silently published the violating overwrite)
    head = vt.current_version()
    viol = spark.range(300, 303).selectExpr("id", "cast(id as string) as v")
    with pytest.raises(Exception) as ei2:
        viol.write.format("versioned_table").mode("overwrite").option(
            "path", table
        ).save()
    assert "constraint" in str(ei2.value).lower()
    assert vt.current_version() == head


# -- format-API path canonicalization ------------------------------------------
def test_format_api_writer_canonicalizes_symlinked_paths(spark, tmp_path):
    """A symlinked (or relative) ``path`` option must log the SAME
    canonical file paths ``VersionedTable`` derives: otherwise vacuum
    (which realpaths) sees the symlink-prefixed live files as
    unreferenced and deletes them, and DV matching against Spark's
    resolved ``_metadata.file_path`` silently misses."""
    _register(spark)
    real = str(tmp_path / "real")
    os.makedirs(real)
    link = str(tmp_path / "link")
    os.symlink(real, link)
    _df(spark, 0, 5).write.format("versioned_table").mode("append").option(
        "path", link
    ).save()
    vt = VersionedTable(spark, real)
    head = vt._read_manifest(vt.current_version())
    assert all(f.startswith(vt.path + os.sep) for f in head["files"])
    # vacuum through the canonical root must see every live file as
    # referenced — zero deletions even with the age gate disabled
    assert vt.vacuum(keep_last=1, file_retention_seconds=0.0) == 0
    assert vt.read().count() == 5
    # and reading through the symlink resolves to the same snapshot
    back = spark.read.format("versioned_table").option("path", link).load()
    assert back.count() == 5


# -- vacuum age gate -------------------------------------------------------------
def test_vacuum_age_gates_unreferenced_data_files(spark, tmp_path):
    """A vacuum racing a live writer between ``_land_files`` and
    ``publish`` must NOT delete the freshly-landed (unreferenced but
    young) files the imminent commit will reference — the same mtime
    gate the tmp claim sweep uses, Delta's VACUUM retention window."""
    table = str(tmp_path / "t")
    vt = VersionedTable(spark, table)
    vt.write(_df(spark, 0, 4).coalesce(1))
    # a concurrent writer has landed but not yet published:
    landed = vt._land_files(_df(spark, 100, 104).coalesce(1))
    assert all(os.path.exists(f) for f in landed)
    # default window: the young files survive (dry run agrees)
    assert vt.vacuum(keep_last=1, dry_run=True) == 0
    assert vt.vacuum(keep_last=1) == 0
    assert all(os.path.exists(f) for f in landed)
    # ...so the in-flight commit can still publish and read back whole
    v = vt._publish(
        vt._read_manifest(vt.current_version())["files"] + landed,
        _df(spark, 0, 1).schema.json(),
        {"mode": "append"},
    )
    assert vt.read(version=v).count() == 8
    # an explicit zero window reclaims immediately (single-writer
    # maintenance); only genuinely unreferenced files go
    vt.write(_df(spark, 0, 2).coalesce(1), mode="overwrite")
    n = vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    assert n > 0
    assert vt.read().count() == 2


def test_vacuum_age_gates_dv_and_bloom_sidecars(spark, tmp_path):
    """The gate covers sidecars too: a freshly-superseded DV or bloom
    file inside the window survives; past it (window 0) it goes."""
    table = str(tmp_path / "t")
    vt = VersionedTable(
        spark, table, stats_columns=["id"], bloom_columns=["id"]
    )
    vt.write(_df(spark, 0, 8).coalesce(1))
    vt.delete_where("id = 1")          # DV sidecar A
    vt.delete_where("id = 2")          # union sidecar B supersedes A
    vt.write(_df(spark, 100, 104).coalesce(1), mode="append")
    vt.compact()                        # orphans old blooms + DVs
    assert vt.vacuum(keep_last=1) == 0  # young: everything survives
    assert vt.read().count() == 10
    assert vt.vacuum(keep_last=1, file_retention_seconds=0.0) > 0
    assert vt.read().count() == 10      # only unreferenced files went


# -- zombie stream-commit retry through the rebase loop -------------------------
def test_stream_sink_zombie_retry_idempotent_through_rebase(
    spark, tmp_path, monkeypatch
):
    """Delta's txnAppId contract under the nastiest interleaving: a
    zombie driver's retry of the SAME micro-batch lands BETWEEN our
    commit attempts. The head check before the loop can't see it — the
    idempotence check must re-run against EACH rebased head, or the
    loser double-appends the batch."""
    import pyarrow as pa

    from modular_etl_data_platform_spark.streaming import (
        versioned_source as VS,
    )

    table = str(tmp_path / "t")
    schema = spark.range(1).selectExpr("id", "cast(id as string) as v").schema
    zombie = VS._VersionedStreamArrowWriter(
        table, schema, overwrite=False, stats_columns=[]
    )
    zmsg = zombie.write(
        iter([pa.RecordBatch.from_pydict({"id": [1], "v": ["a"]})])
    )

    class RacingLog(CommitLog):
        """First publish attempt: the zombie's retry of batch 0 lands
        first, so our claim genuinely loses the race."""

        raced = False

        def publish(self, *a, **k):
            if not RacingLog.raced:
                RacingLog.raced = True
                fresh = CommitLog(path=table)
                fresh.publish(
                    list(zmsg.files),
                    schema.json(),
                    {
                        "mode": "stream_write",
                        "stream_batch_id": 0,
                        "txn": {"stream": 0},
                    },
                    fresh.current_version() or 0,
                    {},
                )
            return super().publish(*a, **k)

    monkeypatch.setattr(VS, "CommitLog", RacingLog)
    ours = VS._VersionedStreamArrowWriter(
        table, schema, overwrite=False, stats_columns=[]
    )
    msg = ours.write(
        iter([pa.RecordBatch.from_pydict({"id": [1], "v": ["a"]})])
    )
    ours.commit([msg], batchId=0)  # loses the claim, then recognizes txn
    vt = VersionedTable(spark, table)
    assert vt.current_version() == 1  # exactly ONE version for batch 0
    assert {tuple(r) for r in vt.read().collect()} == {(1, "a")}


# -- RESTORE travels with table properties --------------------------------------
def test_restore_travels_with_table_properties(spark, tmp_path):
    """RESTORE republishes the snapshot's constraints / clustering
    policy, not the head's (Delta's RESTORE restores metadata): a
    restore to a pre-constraint version must drop the constraint, and
    restoring FORWARD across a DROP CONSTRAINT must bring it back."""
    table = str(tmp_path / "t")
    vt = VersionedTable(spark, table, stats_columns=["id"])
    vt.write(_df(spark, 0, 5))                      # v1: no properties
    vt.add_constraint("id_small", "id < 100")       # v2
    vt.set_clustered_columns(["id"])                # v3
    constrained = vt.current_version()
    vt.drop_constraint("id_small")                  # v4

    vt.restore(1)  # back to the property-free snapshot
    assert vt.constraints() == {}
    assert vt.clustered_columns() == []
    # a batch the old constraint would have rejected now lands fine
    vt.write(
        spark.range(200, 202).selectExpr("id", "cast(id as string) as v"),
        mode="append",
    )

    vt.restore(constrained)  # forward: the properties come back
    assert vt.constraints() == {"id_small": "id < 100"}
    assert vt.clustered_columns() == ["id"]
    from modular_etl_data_platform_spark.operators.versioned import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        vt.write(
            spark.range(300, 301).selectExpr(
                "id", "cast(id as string) as v"
            ),
            mode="append",
        )
