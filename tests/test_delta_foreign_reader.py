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
