"""Structured-Streaming SOURCE over a versioned table's commit log.

The consumer half of the versioned layer's change feed
(``operators/versioned.py``): a Spark 4 Python Data Source
(``pyspark.sql.datasource`` — public API) whose streaming OFFSETS are
the table's VERSION NUMBERS. Each micro-batch reads exactly the data
files added between two log versions — the same file-level diff as
``read_incremental``, but with Spark's own checkpointing tracking the
last-consumed version, so a restart resumes where it left off without
any bookkeeping in user code:

    spark.dataSource.register(VersionedTableStreamDataSource)
    stream = (spark.readStream.format("versioned_table")
              .option("path", table_path).load())

Semantics: EXACT new-row feed for append-only producers (the streaming
intake case this exists for — ``stream_upsert_versioned`` publishing
one version per micro-batch on the write side). After an upsert or
compaction, rewritten files are re-emitted in full (file-level
granularity; row-level deltas are ``table_changes``'s job, batch-side).

Offset/state resolution rides :class:`CommitLog` — the SAME
checkpoint + delta-replay reader the batch side uses (never a private
re-implementation of the log format), so planning reads one checkpoint
plus a bounded delta suffix at any table age. Each added file becomes
one input partition read executor-side as Arrow batches — per-batch
cost is proportional to the new data at any table size.

A start version that has been VACUUMED out of the log raises instead
of silently re-emitting the whole table (Delta's
startingVersion-out-of-retention behavior): double-processing every
row is the one failure a consumer can't detect downstream, so it must
fail loudly.

Options:

- ``path`` (required)
- ``starting_version`` (default 0 = everything; N = only versions > N)
- ``max_versions_per_batch`` (default unbounded) — caps how many table
  versions one micro-batch may drain (Delta's ``maxFilesPerTrigger``
  analogue, in version units): after downtime, the backlog is consumed
  in bounded batches instead of one unbounded catch-up batch.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from modular_etl_data_platform_spark.operators.versioned import CommitLog


class _FilePartition(InputPartition):
    def __init__(self, path: str, fields: list[tuple[str, str]]):
        self.path = path
        #: (column name, Spark type JSON) pairs — the pinned schema,
        #: shipped per-partition so the executor can build TYPED null
        #: arrays for evolved-away columns (a null-typed Arrow array
        #: would mismatch the declared source schema)
        self.fields = fields


class _VersionedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        schema: StructType,
        starting_version: int,
        max_versions_per_batch: int | None = None,
    ):
        self.table = table
        self.pinned = schema
        self.start_version = starting_version
        self.max_versions = max_versions_per_batch
        self.log = CommitLog(path=table)
        #: highest version already handed out as a batch END — the
        #: rate-limit floor. Re-learned from Spark's checkpointed offsets
        #: via partitions() after a restart, so the cap never re-drains
        #: versions a committed batch already covered.
        self._floor = starting_version

    # -- offsets (version numbers; JSON-able dicts per the API) -----------
    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        head = self.log.current_version() or 0
        if self.max_versions is not None:
            head = min(head, self._floor + self.max_versions)
        head = max(head, self._floor)  # offsets must be monotone
        self._floor = head
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, v1)
        if v1 <= v0:
            return []
        old: set[str] = set()
        if v0 > 0:
            try:
                old = set(self.log.resolve(v0)["files"])
            except FileNotFoundError:
                # the consumer's last-committed version left retention
                # (vacuumed while the stream was down). Re-emitting the
                # whole table would silently duplicate every row
                # downstream — fail loudly instead, like Delta when
                # startingVersion is out of retention.
                raise RuntimeError(
                    f"streaming start version {v0} of {self.table} is no "
                    "longer in the log (vacuumed?) — cannot resume "
                    "exactly-once; restart the stream from a retained "
                    "version or a fresh checkpoint"
                )
        cur = self.log.resolve(v1)
        fields = [
            (f.name, f.dataType.json()) for f in self.pinned.fields
        ]
        return [
            _FilePartition(f, fields) for f in cur["files"] if f not in old
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        """Executor-side: one added parquet file -> Arrow batches,
        aligned to the pinned schema (evolved-away columns null-fill
        with the FIELD'S Arrow type, matching the manifest-schema read
        contract batch-side — a plain null-typed array would fail the
        Arrow-to-Spark conversion on schema-evolved tables)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import _parse_datatype_json_string

        tbl = pq.read_table(partition.path)
        arrays, names, n = [], [], tbl.num_rows
        for name, type_json in partition.fields:
            arrow_t = to_arrow_type(_parse_datatype_json_string(type_json))
            if name in tbl.column_names:
                col = tbl.column(name).combine_chunks()
                if col.type != arrow_t:
                    col = col.cast(arrow_t)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, type=arrow_t))
            names.append(name)
        yield from pa.table(dict(zip(names, arrays))).to_batches()

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
        log = CommitLog(path=self._table())
        v = log.current_version()
        if not v:
            raise ValueError(f"no published versions under {self._table()}")
        return StructType.fromJson(json.loads(log.resolve(v)["schema"]))

    def streamReader(self, schema: StructType) -> _VersionedStreamReader:
        max_v = self.options.get("max_versions_per_batch")
        return _VersionedStreamReader(
            self._table(),
            schema,
            int(self.options.get("starting_version", 0)),
            int(max_v) if max_v is not None else None,
        )
