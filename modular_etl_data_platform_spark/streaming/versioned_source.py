"""Structured-Streaming SOURCE over a versioned table's commit log.

The consumer half of the versioned layer's change feed
(``operators/versioned.py``): a Spark 4 Python Data Source
(``pyspark.sql.datasource`` — public API) whose streaming OFFSETS are
the table's VERSION NUMBERS. Each micro-batch reads exactly the data
files added between two manifest versions — the same file-level diff
as ``read_incremental``, but with Spark's own checkpointing tracking
the last-consumed version, so a restart resumes where it left off
without any bookkeeping in user code:

    spark.dataSource.register(VersionedTableStreamDataSource)
    stream = (spark.readStream.format("versioned_table")
              .option("path", table_path).load())

Semantics: EXACT new-row feed for append-only producers (the streaming
intake case this exists for — ``stream_upsert_versioned`` publishing
one version per micro-batch on the write side). After an upsert or
compaction, rewritten files are re-emitted in full (file-level
granularity; row-level deltas are ``table_changes``'s job, batch-side).

Scale shape: offset resolution reads ONE manifest JSON (no file
listing), planning is a path set-difference, and each added file
becomes one input partition read executor-side as Arrow batches —
per-batch cost is proportional to the new data at any table size.

Options: ``path`` (required), ``starting_version`` (default 0 =
everything; N = only versions > N).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_versions"  # mirrors operators/versioned.py layout


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, f"v{version:08d}.json")


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _current_version(table: str) -> int:
    d = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return 0
    vs = [
        int(n[1:-5])
        for n in os.listdir(d)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(vs) if vs else 0


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class _VersionedStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, schema: StructType, starting_version: int):
        self.table = table
        self.pinned = schema
        self.start_version = starting_version

    # -- offsets (version numbers; JSON-able dicts per the API) -----------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self.table)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        old: set[str] = set()
        if v0 > 0 and os.path.exists(_manifest_path(self.table, v0)):
            old = set(_read_manifest(self.table, v0)["files"])
        cur = _read_manifest(self.table, v1)
        cols = [f.name for f in self.pinned.fields]
        return [
            _FilePartition(f, cols) for f in cur["files"] if f not in old
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        """Executor-side: one added parquet file -> Arrow batches,
        aligned to the pinned schema (evolved-away columns null-fill,
        matching the manifest-schema read contract batch-side)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        arrays, n = [], tbl.num_rows
        for c in partition.columns:
            if c in tbl.column_names:
                arrays.append(tbl.column(c).combine_chunks())
            else:
                arrays.append(pa.nulls(n))
        aligned = pa.table(dict(zip(partition.columns, arrays)))
        yield from aligned.to_batches()

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class VersionedTableStreamDataSource(DataSource):
    """``format("versioned_table")`` — register once per session via
    ``spark.dataSource.register(VersionedTableStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("versioned_table source requires .option('path', ...)")
        return path

    def schema(self) -> StructType:
        v = _current_version(self._table())
        if v == 0:
            raise ValueError(f"no published versions under {self._table()}")
        return StructType.fromJson(
            json.loads(_read_manifest(self._table(), v)["schema"])
        )

    def streamReader(self, schema: StructType) -> _VersionedStreamReader:
        return _VersionedStreamReader(
            self._table(),
            schema,
            int(self.options.get("starting_version", 0)),
        )
