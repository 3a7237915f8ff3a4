"""Round-trip interop evidence for the Delta export: random DML
sequences against a VersionedTable, exported with
``operators/delta_export.py`` and read back by the deliberately
code-disjoint foreign reader (``tools/delta_foreign_reader.py`` —
public-protocol parser, zero shared code), must reproduce exactly the
rows ``vt.read()`` reports. delta-spark is env-blocked, so this pair of
independent implementations of the public spec is the strongest
available check that the exporter's byte formats (roaring DV
containers, framed DV files, column-mapping schema strings) mean what
the protocol says they mean."""

from __future__ import annotations

import os
import random
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import delta_foreign_reader as fr  # noqa: E402
from modular_etl_data_platform_spark.operators.delta_export import (  # noqa: E402
    export_delta_snapshot,
)
from modular_etl_data_platform_spark.operators.versioned import (  # noqa: E402
    VersionedTable,
)

# ---------------------------------------------------------------------------
# random DML sequence driver
# ---------------------------------------------------------------------------


class _Model:
    """Tracks just enough state to generate VALID ops: the current
    logical data columns (kind: string/double) and the next unused id.
    Values are pure functions of (id, salt) so every op is
    deterministic given the seed."""

    def __init__(self, rng: random.Random):
        self.rng = rng
        self.cols: list[tuple[str, str]] = [("v", "string"), ("x", "double")]
        self.next_id = 0
        self.next_col = 0
        self.versions = 0

    def frame(self, spark, ids, salt):
        rows = []
        for i in ids:
            row = {"id": i}
            for name, kind in self.cols:
                if kind == "string":
                    row[name] = f"s{salt}_{i}"
                else:
                    row[name] = i * 0.25 + salt
            rows.append(row)
        schema = "id long" + "".join(
            f", {n} {k}" for n, k in self.cols
        )
        return spark.createDataFrame(rows, schema).coalesce(1)


def _run_sequence(spark, tmp, seed: int) -> dict:
    """One random DML sequence -> export -> foreign read == vt.read().
    Returns coverage facts (did the exported snapshot carry DVs /
    column mapping) so the caller can assert the fleet exercised the
    interesting byte formats, not just plain parquet."""
    rng = random.Random(seed)
    m = _Model(rng)
    vt = VersionedTable(
        spark, os.path.join(tmp, f"t{seed}"), stats_columns=["id"]
    )

    def append(salt):
        n = rng.randint(2, 12)
        ids = range(m.next_id, m.next_id + n)
        m.next_id += n
        vt.write(
            m.frame(spark, ids, salt),
            mode="append" if m.versions else "overwrite",
        )

    def upsert(salt):
        existing = (
            rng.sample(range(m.next_id), min(4, m.next_id)) if m.next_id else []
        )
        fresh = list(range(m.next_id, m.next_id + rng.randint(1, 4)))
        m.next_id += len(fresh)
        vt.upsert(m.frame(spark, existing + fresh, salt), ["id"])

    def delete(salt):
        mod = rng.randint(2, 5)
        vt.delete_where(f"id % {mod} = {rng.randrange(mod)}")

    def update(salt):
        if not m.cols:
            return
        name, kind = rng.choice(m.cols)
        expr = f"concat({name}, '_u{salt}')" if kind == "string" else f"{name} + 0.5"
        mod = rng.randint(2, 5)
        vt.update_where(
            {name: expr},
            f"id % {mod} = {rng.randrange(mod)}",
            use_deletion_vectors=rng.random() < 0.5,
        )

    def rename(salt):
        if not m.cols:
            return
        ix = rng.randrange(len(m.cols))
        old, kind = m.cols[ix]
        new = f"c{m.next_col}"
        m.next_col += 1
        vt.rename_column(old, new)
        m.cols[ix] = (new, kind)

    def drop(salt):
        if len(m.cols) < 2:
            return  # keep at least one data column in play
        ix = rng.randrange(len(m.cols))
        vt.drop_column(m.cols.pop(ix)[0])

    def compact(salt):
        vt.compact(target_files=1)

    ops = [
        (append, 5),
        (upsert, 3),
        (delete, 4),
        (update, 3),
        (rename, 2),
        (drop, 1),
        (compact, 1),
    ]
    pool = [f for f, w in ops for _ in range(w)]
    append(0)  # every sequence starts with data
    m.versions = 1
    for step in range(rng.randint(2, 5)):
        rng.choice(pool)(step + 1)
        m.versions += 1

    dest = os.path.join(tmp, f"delta{seed}")
    export_delta_snapshot(vt, dest)
    info = fr.snapshot_info(dest)
    got = (
        fr.read_delta_table(dest)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = (
        vt.read().toPandas().sort_values("id").reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns), (
        f"seed {seed}: foreign columns {list(got.columns)} != "
        f"engine columns {list(want.columns)}"
    )
    pd.testing.assert_frame_equal(
        got, want[got.columns], check_dtype=False, obj=f"seed {seed}"
    )
    return info


_CHUNKS = 4
_SEEDS_PER_CHUNK = 25  # 4 x 25 = 100 random sequences

_coverage: list[dict] = []


@pytest.mark.parametrize("chunk", range(_CHUNKS))
def test_foreign_reader_roundtrips_random_dml(spark, tmp_path, chunk):
    for seed in range(
        chunk * _SEEDS_PER_CHUNK, (chunk + 1) * _SEEDS_PER_CHUNK
    ):
        _coverage.append(_run_sequence(spark, str(tmp_path), seed))


def test_foreign_reader_fleet_covered_the_hard_formats():
    """The random fleet must actually have exercised the byte formats
    this pairing exists to validate — DV-bearing snapshots and
    column-mapped (renamed/dropped) schemas — or the round-trip proves
    nothing. Runs after the parametrized chunks (file order)."""
    assert len(_coverage) == _CHUNKS * _SEEDS_PER_CHUNK
    with_dv = sum(1 for c in _coverage if c["num_deletion_vectors"] > 0)
    mapped = sum(1 for c in _coverage if c["column_mapping_mode"] == "name")
    assert with_dv >= 20, f"only {with_dv}/100 sequences exported DVs"
    assert mapped >= 20, f"only {mapped}/100 sequences exported mapping"


# ---------------------------------------------------------------------------
# targeted byte-format cross-validation (exporter serializer vs foreign
# parser — two independent implementations of the public formats)
# ---------------------------------------------------------------------------


def test_bitmap_array_cross_validation():
    """Exporter's RoaringBitmapArray serializer vs the foreign parser
    over adversarial index sets: array containers, BITMAP containers
    (>4096 per 64K chunk — a shape no small test table produces), multi
    key containers, the 64-bit split with EMPTY intermediate bitmaps,
    and container-boundary values."""
    from modular_etl_data_platform_spark.operators.delta_export import (
        _serialize_dv_bitmap,
    )

    rng = random.Random(7)
    cases = [
        [],
        [0],
        [65535, 65536, 65537],  # container key boundary
        list(range(5000)),  # bitmap container (card > 4096)
        list(range(0, 200_000, 3)),  # multiple keys, mixed kinds
        [(1 << 32) + 5, (1 << 33) + 7],  # high bitmaps w/ empty middles
        [(1 << 32) - 1, 1 << 32],  # 32-bit split boundary
        sorted(rng.sample(range(1 << 20), 30_000)),
        sorted(rng.sample(range(1 << 45), 500)),
    ]
    for ix, values in enumerate(cases):
        data = _serialize_dv_bitmap(sorted(values))
        parsed = fr._parse_bitmap_array(data)
        assert parsed == set(values), f"case {ix} diverged"


def test_foreign_reader_refuses_unknown_features(tmp_path):
    """Forward-compat rule: a reader must refuse tables requiring
    features it does not implement rather than mis-read them."""
    import json

    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
            }
        },
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": []}
                ),
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    with open(log / f"{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    with pytest.raises(fr.DeltaReadError, match="v2Checkpoint"):
        fr.read_delta_table(str(tmp_path / "t"))


# ---------------------------------------------------------------------------
# incremental mirror: per-version Delta commits, foreign-read at each step
# ---------------------------------------------------------------------------

from modular_etl_data_platform_spark.operators.delta_export import (  # noqa: E402
    export_delta_incremental,
)


def _run_mirror_sequence(spark, tmp, seed: int) -> dict:
    """Random DML sequence; after EVERY source version the mirror
    syncs incrementally and the foreign reader must reproduce
    vt.read() exactly — the multi-commit replay path (remove actions,
    same-path DV re-adds, metaData re-emission, protocol upgrades)
    that the one-shot snapshot fleet never exercises."""
    rng = random.Random(10_000 + seed)
    m = _Model(rng)
    vt = VersionedTable(
        spark, os.path.join(tmp, f"mt{seed}"), stats_columns=["id"]
    )
    dest = os.path.join(tmp, f"mirror{seed}")

    def sync_check(step):
        export_delta_incremental(vt, dest)
        got = (
            fr.read_delta_table(dest)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = vt.read().toPandas().sort_values("id").reset_index(drop=True)
        assert list(got.columns) == list(want.columns), (
            f"seed {seed} step {step}: {list(got.columns)} != {list(want.columns)}"
        )
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False,
            obj=f"seed {seed} step {step}",
        )

    ops = {
        "delete": lambda salt: vt.delete_where(
            f"id % {rng.randint(2, 5)} = {rng.randrange(2)}"
        ),
        "dv_update": lambda salt: vt.update_where(
            {m.cols[0][0]: f"concat({m.cols[0][0]}, '_{salt}')"},
            f"id % 3 = {rng.randrange(3)}",
            use_deletion_vectors=True,
        ),
        "rename": lambda salt: (
            vt.rename_column(m.cols[0][0], f"c{m.next_col}"),
            m.cols.__setitem__(0, (f"c{m.next_col}", m.cols[0][1])),
            setattr(m, "next_col", m.next_col + 1),
        ),
        "compact": lambda salt: vt.compact(target_files=1),
        "restore": lambda salt: vt.restore(
            rng.randint(1, vt.current_version())
        ),
    }
    names = (
        ["append"] * 4
        + ["upsert"] * 2
        + ["delete"] * 2
        + ["dv_update", "rename", "compact", "restore"]
    )
    # fix the append helper: ids must advance
    def do(name, salt):
        if name == "append":
            n = rng.randint(2, 8)
            ids = range(m.next_id, m.next_id + n)
            m.next_id += n
            vt.write(m.frame(spark, ids, salt), mode="append" if m.versions else "overwrite")
        elif name == "upsert":
            existing = rng.sample(range(m.next_id), min(3, m.next_id))
            fresh = list(range(m.next_id, m.next_id + 2))
            m.next_id += 2
            vt.upsert(m.frame(spark, existing + fresh, salt), ["id"])
        else:
            ops[name](salt)
        m.versions += 1

    do("append", 0)
    sync_check(0)
    dv_steps = 0
    for step in range(1, rng.randint(4, 6)):
        name = rng.choice(names)
        if name == "restore" and vt.current_version() < 2:
            name = "append"
        do(name, step)
        if name in ("delete", "dv_update"):
            dv_steps += 1
        sync_check(step)
    return {"dv_steps": dv_steps, "renamed": m.next_col > 0}


def test_incremental_mirror_foreign_reads_at_every_version(spark, tmp_path):
    facts = [
        _run_mirror_sequence(spark, str(tmp_path), seed) for seed in range(12)
    ]
    assert sum(1 for f in facts if f["dv_steps"]) >= 4


def test_incremental_mirror_refuses_foreign_dest_and_wrong_source(
    spark, tmp_path
):
    vt = VersionedTable(spark, str(tmp_path / "a"), stats_columns=["id"])
    vt.write(spark.range(5).selectExpr("id", "'x' as v").coalesce(1))
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "junk").write_text("x")
    with pytest.raises(FileExistsError, match="refusing to adopt"):
        export_delta_incremental(vt, str(foreign))
    dest = str(tmp_path / "m")
    export_delta_incremental(vt, dest)
    other = VersionedTable(spark, str(tmp_path / "b"), stats_columns=["id"])
    other.write(spark.range(3).selectExpr("id", "'y' as v").coalesce(1))
    with pytest.raises(ValueError, match="mirrors"):
        export_delta_incremental(other, dest)


def test_incremental_mirror_compaction_emits_datachange_false(spark, tmp_path):
    """Compaction mirrors with dataChange=false adds/removes (Delta's
    OPTIMIZE convention) and column-mapping ids stay STABLE across
    metaData re-emissions (the protocol's column-identity rule)."""
    import json

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(spark.range(10).selectExpr("id", "cast(id as string) as v").coalesce(2))
    dest = str(tmp_path / "m")
    export_delta_incremental(vt, dest)
    vt.rename_column("v", "w")
    export_delta_incremental(vt, dest)
    vt.compact(target_files=1)
    vt.rename_column("w", "z")
    export_delta_incremental(vt, dest)

    log = os.path.join(dest, "_delta_log")
    metas, id_maps = [], []
    compaction_adds = []
    for name in sorted(os.listdir(log)):
        with open(os.path.join(log, name)) as f:
            acts = [json.loads(line) for line in f if line.strip()]
        info = next((a["commitInfo"] for a in acts if "commitInfo" in a), {})
        for a in acts:
            if "metaData" in a:
                schema = json.loads(a["metaData"]["schemaString"])
                fields = schema["fields"]
                if any(
                    "delta.columnMapping.id" in (f.get("metadata") or {})
                    for f in fields
                ):
                    id_maps.append(
                        {
                            f["metadata"]["delta.columnMapping.physicalName"]:
                            f["metadata"]["delta.columnMapping.id"]
                            for f in fields
                        }
                    )
            if "add" in a and info.get("sourceMode", "").startswith("compact"):
                compaction_adds.append(a["add"])
    assert compaction_adds and all(
        a["dataChange"] is False for a in compaction_adds
    )
    # mapped metaData re-emissions (rename v->w, then w->z after
    # compact, plus any textual schema-string change re-emit): every
    # physical name keeps its id across ALL of them
    assert len(id_maps) >= 2
    assert all(im == id_maps[0] for im in id_maps)
    # end state still foreign-readable with the final logical names
    tbl = fr.read_delta_table(dest)
    assert tbl.column_names == ["id", "z"]
    assert tbl.num_rows == 10


# ---------------------------------------------------------------------------
# classic checkpoints + log truncation
# ---------------------------------------------------------------------------


def test_mirror_checkpoint_enables_log_truncation(spark, tmp_path):
    """Every 10 mirror commits the writer lands the PUBLIC classic
    checkpoint (one parquet, one row per action) + _last_checkpoint;
    the foreign reader reconstructs state from checkpoint + JSON suffix
    and keeps working after the covered JSONs are DELETED (Delta's
    metadata-cleanup contract) — including DV descriptors and a
    column-mapped schema riding the checkpoint, and syncs continuing
    after cleanup."""
    from modular_etl_data_platform_spark.operators.delta_export import (
        mirror_log_cleanup,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(0, 20).selectExpr("id", "cast(id as string) as v").coalesce(1)
    )
    dest = str(tmp_path / "m")
    export_delta_incremental(vt, dest)
    vt.rename_column("v", "w")  # column mapping crosses the checkpoint
    for i in range(11):
        if i % 4 == 3:
            vt.delete_where(f"id % 11 = {i % 11}")
        else:
            vt.write(
                spark.range(20 + i * 5, 25 + i * 5)
                .selectExpr("id", "cast(id as string) as w")
                .coalesce(1),
                mode="append",
            )
    export_delta_incremental(vt, dest)
    log = os.path.join(dest, "_delta_log")
    assert os.path.exists(
        os.path.join(log, f"{10:020d}.checkpoint.parquet")
    ) and os.path.exists(os.path.join(log, "_last_checkpoint"))

    def check(tag):
        got = (
            fr.read_delta_table(dest)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = vt.read().toPandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, want[got.columns], check_dtype=False, obj=tag
        )

    check("checkpoint + suffix")
    info = fr.snapshot_info(dest)
    assert info["column_mapping_mode"] == "name"
    assert info["num_deletion_vectors"] >= 1  # DV descriptors survived
    removed = mirror_log_cleanup(dest)
    assert removed == 11  # commits 0..10 covered by the checkpoint
    check("after truncation")
    # mirroring continues over the truncated log
    vt.write(
        spark.range(500, 505).selectExpr("id", "cast(id as string) as w").coalesce(1),
        mode="append",
    )
    export_delta_incremental(vt, dest)
    check("post-cleanup sync")
    # cross the NEXT checkpoint boundary: cleanup must also reclaim the
    # superseded checkpoint parquet (each is O(table files) rows — a
    # long-lived mirror would otherwise grow without bound in exactly
    # the artifact cleanup exists to bound), keeping only the newest
    for i in range(7):
        vt.write(
            spark.range(600 + i * 5, 605 + i * 5)
            .selectExpr("id", "cast(id as string) as w")
            .coalesce(1),
            mode="append",
        )
    export_delta_incremental(vt, dest)
    assert os.path.exists(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    mirror_log_cleanup(dest)
    assert not os.path.exists(
        os.path.join(log, f"{10:020d}.checkpoint.parquet")
    )
    assert os.path.exists(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    check("after second cleanup")


def test_foreign_reader_refuses_multipart_checkpoint(tmp_path):
    import json

    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": 10, "size": 5, "parts": 3})
    )
    with pytest.raises(fr.DeltaReadError, match="multi-part"):
        fr.read_delta_table(str(tmp_path / "t"))


def test_mirror_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    """mirror_vacuum deletes data/DV files no surviving log entry
    references: before log cleanup, files removed by mirrored commits
    are still referenced by RETAINED JSON commits (time travel) and
    survive; after mirror_log_cleanup truncates the covered JSONs,
    vacuum reclaims them — and the foreign read is unchanged."""
    from modular_etl_data_platform_spark.operators.delta_export import (
        mirror_log_cleanup,
        mirror_vacuum,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    vt.write(
        spark.range(0, 30).selectExpr("id", "cast(id as string) as v").coalesce(1)
    )
    dest = str(tmp_path / "m")
    export_delta_incremental(vt, dest)
    # churn: upserts rewrite files, deletes add DV sidecars — enough
    # commits to cross the checkpoint cadence
    for i in range(11):
        if i % 3 == 2:
            vt.delete_where(f"id % 13 = {i}")
        else:
            vt.upsert(
                spark.range(i * 3, i * 3 + 6)
                .selectExpr("id", f"concat('u{i}_', id) as v")
                .coalesce(1),
                ["id"],
            )
    export_delta_incremental(vt, dest)

    def rows():
        return (
            fr.read_delta_table(dest)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )

    before = rows()
    # everything on disk is still referenced by some retained version
    assert mirror_vacuum(dest, dry_run=True) == []
    assert mirror_log_cleanup(dest) == 11
    doomed = mirror_vacuum(dest, dry_run=True)
    assert doomed  # checkpoint-covered history left unreferenced files
    assert mirror_vacuum(dest) == doomed
    after = rows()
    pd.testing.assert_frame_equal(before, after)
    want = vt.read().toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(after, want[after.columns], check_dtype=False)


def test_incremental_mirror_resumes_after_torn_run(spark, tmp_path):
    """Crash between 'log commits landed' and 'state file saved': the
    resume re-emits the SAME source transitions over the stale state —
    deterministic diffs, existence-guarded links, overwritten JSONs —
    and the foreign reader still reproduces vt.read(); the superseded
    links from the torn run become unreferenced and mirror_vacuum
    reclaims them without breaking the table. (State/_last_checkpoint
    writes themselves are tmp+rename, so a torn JSON can't exist.)"""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.operators.delta_export import (
        _MIRROR_STATE,
        mirror_vacuum,
    )

    vt = VersionedTable(
        spark, str(tmp_path / "t"), stats_columns=["id"]
    )
    df = spark.range(0, 200).withColumn("v", F.col("id") * 2)
    vt.write(df.coalesce(2))
    dest = str(tmp_path / "mirror")
    export_delta_incremental(vt, dest)

    state_path = os.path.join(dest, _MIRROR_STATE)
    with open(state_path) as f:
        stale = f.read()

    vt.upsert(
        spark.range(150, 260).withColumn("v", F.col("id") * 3), ["id"]
    )
    vt.delete_where("id % 7 = 3")
    export_delta_incremental(vt, dest)

    # the "crash": commits 1..2 are on disk but the state write never
    # happened — roll the bookkeeping back to the post-snapshot state
    with open(state_path, "w") as f:
        f.write(stale)

    assert export_delta_incremental(vt, dest) == vt.current_version()
    got = (
        fr.read_delta_table(dest)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = vt.read().toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)

    # the torn run's superseded links are unreferenced -> reclaimable;
    # the table must read identically after vacuum
    mirror_vacuum(dest)
    got2 = (
        fr.read_delta_table(dest)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want[got2.columns], check_dtype=False)


def test_mirror_change_data_feed_roundtrip(spark, tmp_path):
    """A mirror created with ``primary_keys`` records REAL Delta CDF:
    update-class source versions (MERGE, DV delete, DV update) write
    ``_change_data`` parquet + ``cdc`` actions, insert-only versions
    stay derivable from their add actions (no cdc file — Delta's
    blind-append rule), compactions emit nothing, the metaData declares
    ``delta.enableChangeDataFeed``, and the code-disjoint foreign
    reader's ``read_change_feed`` reproduces exactly the engine's
    ``table_changes`` classification for every version."""
    import json as _json

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    dest = str(tmp_path / "m")
    vt.write(
        spark.range(0, 30)
        .selectExpr("id", "cast(id as string) as v")
        .coalesce(1)
    )  # v1
    export_delta_incremental(vt, dest, primary_keys=["id"])  # delta 0
    vt.write(
        spark.range(30, 40)
        .selectExpr("id", "cast(id as string) as v")
        .coalesce(1),
        mode="append",
    )  # v2: insert-only
    vt.upsert(
        spark.range(35, 45)
        .selectExpr("id", "concat('u', id) as v")
        .coalesce(1),
        ["id"],
    )  # v3: MERGE (rewrite)
    vt.delete_where("id % 5 = 0")  # v4: pure DV delete
    vt.compact(target_files=1)  # v5: dataChange=false
    vt.update_where(
        {"v": "concat(v, '!')"}, "id % 7 = 1", use_deletion_vectors=True
    )  # v6: DV-backed UPDATE
    export_delta_incremental(vt, dest)

    # the mirror's CDF table property + writer requirement are declared
    state = fr.replay_log(dest)
    assert (
        state["metadata"]["configuration"].get("delta.enableChangeDataFeed")
        == "true"
    )
    proto = state["protocol"]
    assert proto.get("minWriterVersion", 0) >= 4 or "changeDataFeed" in set(
        proto.get("writerFeatures", [])
    )

    # cdc actions exactly where update-class source versions landed:
    # delta 2 (v3 MERGE), 3 (v4 DV delete), 5 (v6 DV update); none for
    # the snapshot (0), the append (1) or the compaction (4)
    log_dir = os.path.join(dest, "_delta_log")
    has_cdc = {}
    for dv in range(6):
        with open(os.path.join(log_dir, f"{dv:020d}.json")) as f:
            has_cdc[dv] = any(
                "cdc" in _json.loads(ln) for ln in f if ln.strip()
            )
    assert has_cdc == {0: False, 1: False, 2: True, 3: True, 4: False, 5: True}

    def norm_pd(df):
        return sorted(
            zip(df["id"].tolist(), df["v"].tolist(), df["_change_type"].tolist())
        )

    feed = fr.read_change_feed(dest).to_pandas()
    # delta commit 0 (the snapshot) = v1's rows as inserts
    want0 = vt.read(version=1).toPandas()
    got0 = feed[feed["_commit_version"] == 0]
    assert sorted(got0["id"].tolist()) == sorted(want0["id"].tolist())
    assert set(got0["_change_type"]) == {"insert"}
    # every later delta commit == engine table_changes for its source
    # version (delta_v = source_v - 1); compaction (delta 4) emits zero
    for src_v in range(2, 7):
        got = feed[feed["_commit_version"] == src_v - 1]
        if src_v == 5:
            assert len(got) == 0
            continue
        want = vt.table_changes(src_v - 1, src_v, ["id"]).toPandas()
        assert norm_pd(got) == norm_pd(want), f"source version {src_v}"

    # a resumed mirror must not silently change the CDF contract
    with pytest.raises(ValueError, match="primary_keys"):
        export_delta_incremental(vt, dest, primary_keys=["v"])


def test_mirror_cdc_files_survive_cleanup_until_log_expiry(spark, tmp_path):
    """mirror_log_cleanup + mirror_vacuum handle ``_change_data``: a
    cdc file is retained while its JSON commit survives and reclaimed
    once metadata cleanup truncates past it (CDF retention follows log
    retention, Delta's rule)."""
    from modular_etl_data_platform_spark.operators.delta_export import (
        _write_classic_checkpoint,
        mirror_log_cleanup,
        mirror_vacuum,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"), stats_columns=["id"])
    dest = str(tmp_path / "m")
    vt.write(
        spark.range(0, 20)
        .selectExpr("id", "cast(id as string) as v")
        .coalesce(1)
    )
    export_delta_incremental(vt, dest, primary_keys=["id"])
    vt.upsert(
        spark.range(10, 25)
        .selectExpr("id", "concat('u', id) as v")
        .coalesce(1),
        ["id"],
    )  # update-class -> cdc at delta 1
    vt.write(
        spark.range(25, 30)
        .selectExpr("id", "cast(id as string) as v")
        .coalesce(1),
        mode="append",
    )
    export_delta_incremental(vt, dest)
    cdc_dir = os.path.join(dest, "_change_data")
    cdc_files = os.listdir(cdc_dir)
    assert len(cdc_files) == 1
    # while the covering JSON lives, vacuum must keep the cdc file
    assert mirror_vacuum(dest, dry_run=True) == []
    # checkpoint at the head, truncate the log below it
    _write_classic_checkpoint(os.path.join(dest, "_delta_log"), 2)
    removed = mirror_log_cleanup(dest)
    assert removed >= 1
    # the cdc JSON is gone -> the slice is unreadable -> reclaimable
    # (alongside the rewritten-away data file the truncation orphaned)
    doomed = mirror_vacuum(dest, dry_run=True)
    assert set(cdc_files) <= {os.path.basename(p) for p in doomed}
    mirror_vacuum(dest)
    assert os.listdir(cdc_dir) == []
    # the mirrored TABLE still reads fine after reclamation
    got = fr.read_delta_table(dest).to_pandas().sort_values("id")
    want = vt.read().toPandas().sort_values("id")
    assert got["id"].tolist() == want["id"].tolist()
