"""Round-9: commit-time stats + bloom collection rides the write job
(``collect_file_metadata``) — the driver merges O(files) results and
never opens landed parquet itself. Instrumented the same way
test_commit_log pins log read counts: the driver process's pyarrow
entry points are wrapped and must count ZERO during a commit (executor
Python workers are separate processes — their reads don't show here,
which is exactly the point)."""

from __future__ import annotations

import pytest

from modular_etl_data_platform_spark.operators import versioned as V
from modular_etl_data_platform_spark.operators.versioned import (
    VersionedTable,
    collect_file_blooms,
    collect_file_stats,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "cast(id as string) as v")


@pytest.fixture()
def driver_pq_counts(monkeypatch):
    """Count driver-process pyarrow.parquet opens/reads (footer AND
    data plane)."""
    import pyarrow.parquet as pq

    counts = {"ParquetFile": 0, "read_table": 0}
    orig_pf, orig_rt = pq.ParquetFile, pq.read_table

    def pf(*a, **k):
        counts["ParquetFile"] += 1
        return orig_pf(*a, **k)

    def rt(*a, **k):
        counts["read_table"] += 1
        return orig_rt(*a, **k)

    monkeypatch.setattr(pq, "ParquetFile", pf)
    monkeypatch.setattr(pq, "read_table", rt)
    return counts


def test_commit_reads_zero_parquet_bytes_on_driver(
    spark, tmp_path, driver_pq_counts, monkeypatch
):
    """Landing a bloom-indexed batch past the size threshold must open
    NO parquet on the driver — neither footers (stats) nor column data
    (blooms); both ride one executor job. This is the 100 TB commit
    contract: a 1,000-file x 1 GB batch ships the driver kilobytes of
    bounds and capped bitmaps, never the key columns. (Threshold
    forced to 0 so a test-sized batch takes the large-batch path; the
    companion test below pins the small-batch policy.)"""
    monkeypatch.setattr(V, "_DISTRIBUTED_METADATA_MIN_BYTES", 0)
    vt = VersionedTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["id"],
        bloom_columns=["id"],
    )
    vt.write(_df(spark, 0, 4000).repartition(12))
    assert driver_pq_counts == {"ParquetFile": 0, "read_table": 0}

    # ...and the executor-computed metadata is REAL, not just absent:
    head = vt._read_manifest(vt.current_version())
    entries = [head["stats"][f] for f in head["files"]]
    assert all("id" in s for s in entries)  # footer bounds recorded
    assert all(V._BLOOM_MARK in s for s in entries)  # blooms recorded
    # byte-identical to the local collector's output on the same files
    local = collect_file_stats(head["files"], ["id"])
    for f in head["files"]:
        expect = dict(local[f])
        got = {k: v for k, v in head["stats"][f].items() if k != V._BLOOM_MARK}
        assert got == expect
    # the bloom index actually prunes: a key present in exactly one
    # file opens at most 2 of the 12 (true file + rare fp), an absent
    # key opens none
    hit = vt.read_pruned("id", 7, 7)
    assert 1 <= len(hit.inputFiles()) <= 2
    assert hit.count() == 1
    miss = vt.read_pruned("id", 10_000_000, 10_000_000)
    assert not miss.inputFiles()


def test_small_commits_skip_the_metadata_job(
    spark, tmp_path, driver_pq_counts
):
    """A batch under ``_DISTRIBUTED_METADATA_MIN_BYTES`` keeps the
    local read — the driver's data-plane exposure is BOUNDED by the
    constant, and a small commit never pays a Spark job's ~1s fixed
    round-trip (measured) for metadata it reads in milliseconds. Both
    footers AND bloom column reads happen driver-side here, and the
    recorded metadata is identical in kind to the executor path's."""
    vt = VersionedTable(
        spark,
        str(tmp_path / "t"),
        stats_columns=["id"],
        bloom_columns=["id"],
    )
    vt.write(_df(spark, 0, 10).coalesce(2))
    assert driver_pq_counts["ParquetFile"] > 0  # local footer reads
    assert driver_pq_counts["read_table"] > 0  # local bloom reads (bounded)
    head = vt._read_manifest(1)
    assert all("id" in s for s in head["stats"].values())
    assert all(V._BLOOM_MARK in s for s in head["stats"].values())


def test_bloom_ndv_cap_checked_before_materialization(tmp_path, monkeypatch):
    """The NDV cap is enforced on the ARROW array's length BEFORE any
    to_pylist materialization — a high-cardinality key column must
    record no bloom via an O(1) length check."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "wide.parquet")
    pq.write_table(
        pa.table({"k": list(range(50)), "v": ["x"] * 50}), f
    )
    monkeypatch.setattr(V, "_BLOOM_MAX_NDV", 10)

    import pyarrow.compute as pc

    materialized: list[int] = []
    orig_unique = pc.unique

    class _Spy:
        """len() passes through; to_pylist records the conversion."""

        def __init__(self, arr):
            self._arr = arr

        def __len__(self):
            return len(self._arr)

        def to_pylist(self):
            materialized.append(len(self._arr))
            return self._arr.to_pylist()

    monkeypatch.setattr(pc, "unique", lambda a: _Spy(orig_unique(a)))
    assert collect_file_blooms([f], ["k"]) == {f: {}}
    # the 50-distinct column was rejected by length alone — nothing
    # crossed into Python objects
    assert materialized == []
    # and under the cap the bloom still builds (one conversion)
    monkeypatch.setattr(V, "_BLOOM_MAX_NDV", 100)
    out = collect_file_blooms([f], ["k"])
    assert "k" in out[f]
    assert materialized == [50]
