"""Property model for the STREAMING row-level change feed
(streaming/versioned_source.py::_VersionedChangeFeedStreamReader):
random DML histories — appends, rewrite and DV-backed MERGEs, DV
deletes, rewrite and DV UPDATEs, compactions, restores (including
DV-only restores that resurrect rows by CLEARING vectors) — drained
through the reader's own offset protocol must equal, version by
version, the batch ``VersionedTable.table_changes(v-1, v)``
classification, with compaction versions emitting exactly zero rows
and ``_commit_timestamp`` matching the log's commit times.

The drain walks initialOffset/latestOffset/partitions/read directly —
the same code a trigger runs (q163 pins the writeStream round trip;
this file pins the classifier over the op space). Half the sequences
run with a tiny ``diff_partition_bytes`` so every update-class version
classifies through the PK-hash-range SHARDED path — stream/batch
equality then also proves shard-union == global classification on
arbitrary histories, not just the handwritten ones.

Derandomized hypothesis (seeded PRNG per example), >= 100 sequences
across the parametrized chunks, per the same fleet pattern as
tests/test_delta_foreign_reader.py.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog,
    VersionedTable,
    _commit_name,
)
from modular_etl_data_platform_spark.streaming.versioned_source import (
    _NO_CHANGE_MODES,
    _VersionedChangeFeedStreamReader,
)


def _cdf_schema(table: str):
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    log = CommitLog(path=table)
    schema = StructType.fromJson(
        json.loads(log.resolve(log.current_version())["schema"])
    )
    return StructType(
        list(schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )


def _drain(reader) -> list[dict]:
    """Walk the reader's own offset protocol to exhaustion and return
    every emitted row as a dict — the classification a trigger would
    hand the sink, without the writeStream machinery."""
    rows: list[dict] = []
    off = reader.initialOffset()
    while True:
        end = reader.latestOffset()
        if end["version"] <= off["version"]:
            break
        for p in reader.partitions(off, end):
            for batch in reader.read(p):
                rows.extend(
                    pa.Table.from_batches([batch]).to_pylist()
                )
        off = end
    return rows


def _norm(rows, cols):
    """Comparable multiset: (version, change_type, *data values)."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append((r["_commit_version"], r["_change_type"], *vals))
    return sorted(out)


def _run_sequence(spark, tmp, seed: int, cdf: bool = False) -> dict:
    """One random DML history; with ``cdf=True`` the table opts into
    WRITE-TIME CDC after its first append, so update-class versions
    serve RECORDED ``_change_data`` files — the drain then proves
    recorded classification equals the derived one (the expected side
    is computed through a store view that HIDES the cdc keys, forcing
    the file-diff path). A restore that lands on the pre-enable
    version clears the property mid-history (the RESTORE-restores-
    metadata rule), so later commits legitimately fall back to
    derived — both sourcings are asserted equal regardless."""
    rng = random.Random(seed)
    table = f"{tmp}/t{seed}{'c' if cdf else ''}"
    vt = VersionedTable(spark, table, stats_columns=["id"])
    next_id = [0]

    def frame(ids, salt):
        rows = [(i, f"s{salt}_{i}", i * 0.25 + salt) for i in ids]
        return spark.createDataFrame(
            rows, "id long, v string, x double"
        ).coalesce(1)

    def append(salt):
        n = rng.randint(2, 10)
        ids = range(next_id[0], next_id[0] + n)
        next_id[0] += n
        vt.write(
            frame(ids, salt),
            mode="append" if vt.current_version() else "overwrite",
        )

    def upsert(salt):
        existing = (
            rng.sample(range(next_id[0]), min(4, next_id[0]))
            if next_id[0]
            else []
        )
        fresh = list(range(next_id[0], next_id[0] + rng.randint(1, 3)))
        next_id[0] += len(fresh)
        vt.upsert(
            frame(existing + fresh, salt),
            ["id"],
            use_deletion_vectors=rng.random() < 0.5,
        )

    def dv_delete(salt):
        mod = rng.randint(2, 5)
        vt.delete_where(f"id % {mod} = {rng.randrange(mod)}")

    def update(salt):
        mod = rng.randint(2, 5)
        vt.update_where(
            {"v": f"concat(v, '_u{salt}')"},
            f"id % {mod} = {rng.randrange(mod)}",
            use_deletion_vectors=rng.random() < 0.5,
        )

    def compact(salt):
        vt.compact(target_files=1)

    def restore(salt):
        head = vt.current_version()
        if head and head > 1:
            vt.restore(rng.randint(1, head - 1))

    def replace(salt):
        # replaceWhere: re-assert a residue class with new values (the
        # batch must satisfy the predicate — pick matching ids only)
        mod = rng.randint(2, 5)
        r = rng.randrange(mod)
        sel = [i for i in range(next_id[0]) if i % mod == r][:4]
        if not sel:
            return
        vt.overwrite_where(frame(sel, salt), f"id % {mod} = {r}")

    def drange(salt):
        if next_id[0] < 2:
            return
        lo = rng.randrange(next_id[0])
        vt.delete_range("id", lo, lo + rng.randint(0, 4))

    ops = [
        (append, 4),
        (upsert, 3),
        (dv_delete, 3),
        (update, 3),
        (compact, 2),
        (restore, 2),
        (replace, 2),
        (drange, 2),
    ]
    pool = [f for f, w in ops for _ in range(w)]
    append(0)
    if cdf:
        vt.enable_change_data_feed(["id"])
    for step in range(rng.randint(3, 6)):
        rng.choice(pool)(step + 1)

    head = vt.current_version()
    schema = _cdf_schema(table)
    # half the fleet forces the sharded diff path (tiny per-task target)
    sharded = seed % 2 == 0
    reader = _VersionedChangeFeedStreamReader(
        table,
        schema,
        0,
        ["id"],
        max_versions_per_batch=rng.choice([None, 1, 2]),
        diff_partition_bytes=2048 if sharded else 1 << 40,
    )
    got = _drain(reader)

    data_cols = [
        f.name
        for f in schema.fields
        if f.name not in ("_change_type", "_commit_version", "_commit_timestamp")
    ]
    log = CommitLog(path=table)
    import json as _json

    from pyspark.sql import functions as F

    # the EXPECTED side must come from the DERIVED classifier even on a
    # cdf table (recorded vs recorded would prove nothing): a twin
    # handle whose store view hides every commit's cdc key
    vt_expected = vt
    recorded_versions: set[int] = set()
    if cdf:
        vt_expected = VersionedTable(spark, table, stats_columns=["id"])
        _orig_read = vt_expected.log.store.read

        def _hide_cdc(name):
            d = _json.loads(_orig_read(name))
            d.pop("cdc", None)
            return _json.dumps(d)

        vt_expected.log.store.read = _hide_cdc

    modes: dict[int, str] = {}
    ts: dict[int, int] = {}
    frames = []
    for v in range(1, head + 1):
        rec = _json.loads(log.store.read(_commit_name(v)))
        modes[v] = rec.get("mode", "")
        ts[v] = int(rec.get("ts") or 0)
        if rec.get("cdc") is not None:
            recorded_versions.add(v)
        if modes[v] in _NO_CHANGE_MODES:
            continue
        if v == 1:
            fr = vt.read(version=1).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            fr = vt_expected.table_changes(v - 1, v, ["id"])
        frames.append(
            fr.withColumn("_commit_version", F.lit(v).cast("long"))
        )
    import functools

    union = functools.reduce(lambda x, y: x.unionByName(y), frames)
    expected = [r.asDict() for r in union.collect()]  # ONE Spark action

    assert _norm(got, data_cols) == _norm(expected, data_cols), (
        f"seed {seed}: stream feed != concatenated batch table_changes "
        f"(modes {modes})"
    )
    # compaction versions emit exactly zero rows
    for v, m in modes.items():
        if m in _NO_CHANGE_MODES:
            assert not any(r["_commit_version"] == v for r in got), (
                f"seed {seed}: compaction v{v} emitted changes"
            )
    # _commit_timestamp rides the log's commit time
    for r in got:
        got_ms = int(r["_commit_timestamp"].timestamp() * 1000)
        assert got_ms == ts[r["_commit_version"]], (
            f"seed {seed}: v{r['_commit_version']} timestamp mismatch"
        )
    if cdf:
        # every recorded version must have been SERVED from recorded
        # partitions (the zero-re-read contract), never the diff join
        from modular_etl_data_platform_spark.streaming.versioned_source import (
            _CFRecordedPartition,
        )

        probe = _VersionedChangeFeedStreamReader(
            table, schema, 0, ["id"],
            diff_partition_bytes=2048 if sharded else 1 << 40,
        )
        for v in sorted(recorded_versions):
            parts = probe.partitions({"version": v - 1}, {"version": v})
            assert parts == [] or all(
                isinstance(p, _CFRecordedPartition) for p in parts
            ), f"seed {seed}: recorded v{v} planned a derived partition"
    return {
        "modes": set(modes.values()),
        "sharded": sharded,
        "n_changes": len(got),
        "n_recorded": len(recorded_versions),
    }


_CHUNKS = 4
_SEEDS_PER_CHUNK = 25  # 4 x 25 = 100 random histories

_coverage: list[dict] = []


@pytest.mark.parametrize("chunk", range(_CHUNKS))
def test_stream_feed_equals_batch_table_changes(spark, tmp_path, chunk):
    for seed in range(
        chunk * _SEEDS_PER_CHUNK, (chunk + 1) * _SEEDS_PER_CHUNK
    ):
        _coverage.append(_run_sequence(spark, str(tmp_path), seed))


_CDF_CHUNKS = 2
_CDF_SEEDS_PER_CHUNK = 15  # 30 histories with write-time CDC enabled

_cdf_coverage: list[dict] = []


@pytest.mark.parametrize("chunk", range(_CDF_CHUNKS))
def test_recorded_cdc_equals_derived_on_random_histories(
    spark, tmp_path, chunk
):
    """The write-time-CDC half of the fleet: identical op space, table
    opted into recorded CDC — the drain (served from _change_data
    files wherever a commit recorded) must still equal the derived
    per-version classification, on arbitrary histories including
    restores that clear the property mid-stream."""
    for seed in range(
        chunk * _CDF_SEEDS_PER_CHUNK, (chunk + 1) * _CDF_SEEDS_PER_CHUNK
    ):
        _cdf_coverage.append(
            _run_sequence(spark, str(tmp_path), seed, cdf=True)
        )


def test_recorded_cdc_fleet_actually_recorded():
    assert len(_cdf_coverage) == _CDF_CHUNKS * _CDF_SEEDS_PER_CHUNK
    seen = set().union(*(c["modes"] for c in _cdf_coverage))
    for mode in ("upsert", "delete_where", "update_where", "restore"):
        assert mode in seen, f"cdf fleet never generated a {mode} commit"
    # the equivalence is vacuous unless a real share of versions was
    # actually SERVED from recorded files
    assert sum(c["n_recorded"] for c in _cdf_coverage) >= 50


def test_stream_feed_fleet_covered_the_hard_paths():
    """The fleet must actually have exercised every classification
    path — MERGE (upsert), pure DV delete (the per-file fast path),
    UPDATE, restore, compaction — and both the sharded and unsharded
    diff variants, or the equivalence proves nothing."""
    assert len(_coverage) == _CHUNKS * _SEEDS_PER_CHUNK
    seen = set().union(*(c["modes"] for c in _coverage))
    for mode in (
        "upsert", "delete_where", "update_where", "compact", "restore",
        "replace_where", "delete",
    ):
        assert mode in seen, f"fleet never generated a {mode} commit"
    assert sum(1 for c in _coverage if c["sharded"]) >= 40
    assert sum(c["n_changes"] for c in _coverage) > 1000
