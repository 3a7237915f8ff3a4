"""Structured-Streaming SOURCE and SINK over a versioned table's
commit log.

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
intake case this exists for — the stream sink publishing one version
per micro-batch on the write side). Emission is per-COMMIT (the Delta
model): compaction commits never re-emit (dataChange=false), update
commits (upsert/delete rewrites/restore) fail loudly unless
``ignore_changes`` opts into re-emission, and deletion-vector deletes
fail loudly unless ``ignore_deletes``/``ignore_changes`` — row-level
deltas are ``table_changes``'s job, batch-side.

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
- ``starting_timestamp`` (ISO-8601; naive = UTC) — Delta's
  ``startingTimestamp``: begin after the last version committed
  at-or-before the instant (mutually exclusive with
  ``starting_version``; an instant predating the log streams
  everything)
- ``max_versions_per_batch`` (default unbounded) — caps how many table
  versions one micro-batch may drain (Delta's ``maxFilesPerTrigger``
  analogue, in version units): after downtime, the backlog is consumed
  in bounded batches instead of one unbounded catch-up batch.
- ``max_bytes_per_batch`` (default unbounded) — Delta's
  ``maxBytesPerTrigger`` analogue: caps each micro-batch by the
  CUMULATIVE added-file bytes of its admitted versions (file sizes
  ride every commit record, so enforcement is metadata-only). Soft
  cap: at least one version always admits. Composes with
  ``max_versions_per_batch`` (the tighter cap wins).

The WRITE side (``writeStream.format("versioned_table").option("path",
...)``, :class:`_VersionedStreamArrowWriter`) publishes one table
version per micro-batch through the same commit protocol as the batch
writers, with ``stream_batch_id`` recorded per commit for Delta
txn-style idempotence (a retried sink commit is a no-op) and CHECK
constraints enforced transactionally per batch. Write option:
``stats_columns`` (comma-separated) records footer min/max for
stream-landed files.

The same format also serves BATCH reads and writes through the
standard DataFrameReader/Writer API: ``spark.read.format(
"versioned_table").option("path", ...)`` with ``version`` /
``timestamp`` options (Delta's versionAsOf / timestampAsOf), and
``df.write.format("versioned_table").mode("append"|"overwrite")`` —
one published version per save, append-time schema enforcement
included. A versioned table is a first-class Spark table without
importing the engine's classes.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from modular_etl_data_platform_spark.operators.versioned import (
    _DATA_DIR,
    _NO_CHANGE_MODES,
    CommitLog,
    _commit_name,
)


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        fields: list[tuple[str, str]],
        dv_path: str | None = None,
        rg_shard: tuple[int, int] | None = None,
    ):
        self.path = path
        #: (logical name, Spark type JSON, physical name) triples — the
        #: pinned schema, shipped per-partition so the executor can
        #: build TYPED null arrays for evolved-away columns (a
        #: null-typed Arrow array would mismatch the declared source
        #: schema) and read column-mapped files under their PHYSICAL
        #: parquet name while emitting the logical one
        self.fields = fields
        #: deletion-vector sidecar for this file (None = no deletes);
        #: the executor filters the vector-deleted row positions out
        self.dv_path = dv_path
        #: (shard, nshards) when a LARGE file splits across tasks by
        #: row-group range (Spark's maxPartitionBytes analogue for the
        #: Python data source): planned from the file size the LOG
        #: already records (zero footer reads at planning time); the
        #: executor maps its shard onto a row-group slice and offsets
        #: deletion-vector positions by the preceding groups' rows
        self.rg_shard = rg_shard


class _VersionedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table: str,
        schema: StructType,
        starting_version: int,
        max_versions_per_batch: int | None = None,
        ignore_deletes: bool = False,
        ignore_changes: bool = False,
        max_bytes_per_batch: int | None = None,
        split_file_bytes: int = 128 * 1024 * 1024,
    ):
        self.table = table
        self.pinned = schema
        self.start_version = starting_version
        self.max_versions = max_versions_per_batch
        #: large-file row-group splitting, same contract as the batch
        #: reader: an emitted file bigger than this fans across
        #: ceil(size/target) row-group-range tasks (sizes ride the
        #: commit records — metadata-only planning), so one giant
        #: coalesced append can't serialize a micro-batch into one task
        self.split_bytes = max(1, int(split_file_bytes))
        #: Delta's maxBytesPerTrigger analogue: cap a micro-batch's
        #: offset advance by the CUMULATIVE added-file bytes of the
        #: admitted versions (sizes ride every commit record — zero
        #: data-plane I/O to enforce). Soft cap, Delta's rule: at least
        #: one version always admits, so a single over-cap commit still
        #: drains instead of wedging the stream.
        self.max_bytes = max_bytes_per_batch
        self.ignore_deletes = ignore_deletes
        #: Delta's ignoreChanges (subsumes ignore_deletes): accept batch
        #: ranges containing UPDATE commits (upsert/delete rewrites),
        #: re-emitting the rewritten files' current rows
        self.ignore_changes = ignore_changes
        self.log = CommitLog(path=table)
        #: highest version already handed out as a batch END — the
        #: rate-limit floor. KNOWN only once Spark has told us a real
        #: offset: initialOffset (fresh stream — no checkpoint exists)
        #: or any partitions(start, end) call. After a RESTART neither
        #: has happened when the first latestOffset fires, and capping
        #: against a stale floor could propose an offset BELOW the
        #: checkpointed start — Spark would then plan (and commit) a
        #: regressed offset and later re-emit already-processed
        #: versions. So an uninformed latestOffset returns the UNCAPPED
        #: head (always safe — it is the un-rate-limited behavior) and
        #: the cap engages from the next trigger on.
        self._floor = starting_version
        self._floor_known = False

    # -- offsets (version numbers; JSON-able dicts per the API) -----------
    def initialOffset(self) -> dict:
        self._floor_known = True  # only called when no checkpoint exists
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        head = self.log.current_version() or 0
        if self.max_versions is not None and self._floor_known:
            head = min(head, self._floor + self.max_versions)
        if (
            self.max_bytes is not None
            and self._floor_known
            and head > self._floor
        ):
            # walk the candidate range's commit RECORDS (small JSON
            # each) summing added bytes; stop BEFORE the version that
            # crosses the cap — but always admit the first one
            chosen, total = self._floor, 0
            for v in range(self._floor + 1, head + 1):
                try:
                    rec = json.loads(self.log.store.read(_commit_name(v)))
                except FileNotFoundError:
                    if chosen == self._floor:
                        # the FIRST candidate is already gone (vacuumed
                        # under a live stream). Capping here would pin
                        # the offset at the floor forever — partitions()
                        # is never invoked on an empty range, so the
                        # stream would wedge SILENTLY. Propose the
                        # uncapped head instead so partitions() sees the
                        # missing range and raises loudly.
                        chosen = head
                    break  # vacuumed under us: partitions() will raise loudly
                vbytes = sum(rec.get("sizes", {}).values())
                if chosen > self._floor and total + vbytes > self.max_bytes:
                    break
                total += vbytes
                chosen = v
                if total >= self.max_bytes:
                    break
            head = chosen
        head = max(head, self._floor)  # offsets must be monotone
        self._floor = head
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, v0, v1)
        self._floor_known = True
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
        cur_files = set(cur["files"])
        cur_dv = cur.get("dv", {})
        # Emission is PER-RECORD, not an endpoint file-set diff (the
        # Delta model: each version's add actions are the stream's
        # content). An endpoint diff silently LOSES rows appended and
        # then compacted away inside one catch-up range — the appended
        # file is absent from the end state and the compacted file is
        # dataChange=false. Walking the records (small JSON each, at
        # most the rate-limit's worth) classifies every commit:
        # - compaction/auto-compaction re-arranges rows the stream
        #   already emitted (Delta's dataChange=false): its adds never
        #   emit; a file it compacts AWAY that was appended earlier in
        #   the same range still emits (data files outlive manifest
        #   membership until vacuum);
        # - any commit carrying a deletion-vector update is a DELETE
        #   (delete_where; needs ignore_deletes) or an UPDATE (the
        #   DV-backed upsert; needs ignore_changes) — record-level
        #   detection catches dv commits even when a later in-range
        #   compaction materialized the vectored file away, which an
        #   endpoint dv diff would miss;
        # - any other commit that removes files — upsert, delete
        #   rewrite, RESTORE (which can re-point at files the stream
        #   never saw; Delta marks restore dataChange=true) — is an
        #   update and requires ignore_changes (Delta's ignoreChanges,
        #   which subsumes ignore_deletes) rather than silently
        #   double-processing.
        no_change_modes = {"compact", "compact_where", "auto_compact"}
        emit: list[str] = []
        emitted: set[str] = set()
        emit_sizes: dict[str, int] = {}
        for v in range(v0 + 1, v1 + 1):
            try:
                rec = json.loads(self.log.store.read(_commit_name(v)))
            except FileNotFoundError:
                # a mid-range record vacuumed under the live stream —
                # and the endpoint resolves may both have been served
                # from snapshot caches, so THIS walk is where the gap
                # surfaces; same loud contract as the endpoint case
                raise RuntimeError(
                    f"streaming range version {v} of {self.table} is no "
                    "longer in the log (vacuumed?) — cannot emit "
                    "exactly-once; restart the stream from a retained "
                    "version or a fresh checkpoint"
                )
            mode = rec.get("mode", "")
            if mode in no_change_modes:
                continue  # dataChange=false: adds never emit
            is_update = bool(rec.get("remove")) or mode == "restore"
            if mode in ("upsert", "update_where") and rec.get("dv"):
                # DV-backed MERGE / DV-backed UPDATE rewrite no file:
                # the only trace is the vector plus the new row images
                is_update = True
            if is_update and not self.ignore_changes:
                raise RuntimeError(
                    f"version {v} of {self.table} is an update commit "
                    f"(mode {mode!r}); its rows would re-emit or "
                    "resurrect already-processed data — set option "
                    "ignore_changes=true to accept re-emission (Delta's "
                    "ignoreChanges) or restart from a snapshot"
                )
            if (
                rec.get("dv")
                and not is_update
                # a clone's v1 carries the SOURCE's vectors, but it is an
                # initial snapshot: no row was ever emitted, so there is
                # no delete to miss — the range-end vector masks them
                and mode != "clone"
                and not (self.ignore_deletes or self.ignore_changes)
            ):
                raise RuntimeError(
                    f"version {v} of {self.table} deletes rows via a "
                    "deletion vector; an append-mode stream cannot "
                    "express deletes — set option ignore_deletes=true "
                    "to skip them (Delta's ignoreDeletes) or restart "
                    "from a snapshot"
                )
            rec_sizes = rec.get("sizes", {})
            for f in rec.get("add", []):
                if f not in emitted and f not in old:
                    emitted.add(f)
                    emit.append(f)
                    if f in rec_sizes:
                        emit_sizes[f] = rec_sizes[f]
        cmap = cur.get("column_mapping") or {}
        fields = [
            (f.name, f.dataType.json(), cmap.get(f.name, f.name))
            for f in self.pinned.fields
        ]
        # emitted files that SURVIVE to the range end apply the
        # range-end vector (rows handed downstream are the rows live at
        # the offset); files compacted/rewritten away mid-range emit as
        # committed (their content is still on disk until vacuum).
        # Files above the split target fan across row-group shards —
        # sizes ride the emitting records, so planning is metadata-only.
        parts: list[_FilePartition] = []
        for f in emit:
            dvp = cur_dv.get(f) if f in cur_files else None
            k = max(1, -(-emit_sizes.get(f, 0) // self.split_bytes))
            if k == 1:
                parts.append(_FilePartition(f, fields, dvp))
            else:
                parts.extend(
                    _FilePartition(f, fields, dvp, rg_shard=(i, k))
                    for i in range(k)
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        """Executor-side: one added parquet file (or one row-group
        shard of it) -> Arrow batches, aligned to the pinned schema
        (evolved-away columns null-fill with the FIELD'S Arrow type,
        matching the manifest-schema read contract batch-side — a
        plain null-typed array would fail the Arrow-to-Spark
        conversion on schema-evolved tables)."""
        yield from _read_parquet_aligned(
            partition.path,
            partition.fields,
            partition.dv_path,
            getattr(partition, "rg_shard", None),
        )

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


def _read_parquet_aligned(
    path: str,
    fields: list[tuple[str, str]],
    dv_path: str | None = None,
    rg_shard: tuple[int, int] | None = None,
) -> Iterator:
    """Executor-side: one parquet file -> Arrow batches aligned to the
    pinned (name, Spark-type-JSON) field list — shared by the streaming
    and batch read paths. ``dv_path`` applies the file's deletion
    vector: the sidecar's row positions for this file are masked out
    before the batches are emitted (merge-on-read, same contract as
    ``VersionedTable._apply_dv``).

    ``rg_shard=(i, k)`` reads only shard ``i`` of the file's row
    groups (contiguous slice; empty when the file has fewer groups
    than shards) — the executor half of large-file splitting. DV row
    positions are FILE-global, so the shard's slice is masked against
    positions offset by the preceding groups' row counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_json_string

    row_offset = 0
    if rg_shard is not None and rg_shard[1] > 1:
        i, k = rg_shard
        pf = pq.ParquetFile(path)
        nrg = pf.metadata.num_row_groups
        lo, hi = (i * nrg) // k, ((i + 1) * nrg) // k
        if lo >= hi:
            return  # fewer row groups than shards: this shard is empty
        row_offset = sum(
            pf.metadata.row_group(g).num_rows for g in range(lo)
        )
        tbl = pf.read_row_groups(list(range(lo, hi)))
    else:
        tbl = pq.read_table(path)
    if dv_path is not None:
        import numpy as np

        from modular_etl_data_platform_spark.operators.versioned import (
            _strip_scheme_py,
        )

        norm = _strip_scheme_py(path)
        dv_tbl = pq.read_table(
            dv_path, filters=[("file_path", "=", norm)]
        )
        pos = [
            p - row_offset
            for p in dv_tbl.column("row_index").to_pylist()
            if row_offset <= p < row_offset + tbl.num_rows
        ]
        if pos:
            mask = np.ones(tbl.num_rows, dtype=bool)
            mask[np.asarray(pos, dtype=np.int64)] = False
            tbl = tbl.filter(pa.array(mask))
    arrays, names, n = [], [], tbl.num_rows
    for entry in fields:
        name, type_json = entry[0], entry[1]
        # column-mapped files carry the PHYSICAL name; emit the logical
        phys = entry[2] if len(entry) > 2 else name
        arrow_t = to_arrow_type(_parse_datatype_json_string(type_json))
        if phys in tbl.column_names:
            col = tbl.column(phys).combine_chunks()
            if col.type != arrow_t:
                col = col.cast(arrow_t)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(n, type=arrow_t))
        names.append(name)
    yield from pa.table(dict(zip(names, arrays))).to_batches()


#: CDF metadata columns (Delta's readChangeFeed column set)
_CDF_COLS = ("_change_type", "_commit_version", "_commit_timestamp")
#: dataChange=false commit modes: the one definition lives with the
#: writers (operators/versioned.py) and is imported at the top


class _CFInsertPartition(InputPartition):
    """One appended file of an insert-only commit (or one row-group
    shard of a large one): every live row is an ``insert``. The
    high-volume streaming case parallelizes per file, and files above
    the split target fan out further by row-group range — insert
    classification is per-row independent, so slicing is exact."""

    def __init__(self, path, fields, dv_path, version, ts_ms, rg_shard=None):
        self.path = path
        self.fields = fields
        self.dv_path = dv_path
        self.version = version
        self.ts_ms = ts_ms
        self.rg_shard = rg_shard


class _CFRecordedPartition(InputPartition):
    """One RECORDED change-data file (write-time CDC — the commit's
    ``cdc`` entries, written by the DML itself under ``_change_data/``):
    every row already IS a classified change of one type, so the read
    is a plain aligned parquet scan plus a constant ``_change_type``
    column — no join, no re-read of any data file, per-cdc-file
    parallelism, and files above the split target fan out further by
    row-group range (classification is per-row independent). This is
    the scale path for giant MERGEs: the derived diff's
    changed²/target read amplification disappears because the feed
    was persisted once, at write time."""

    def __init__(self, path, ctype, fields, version, ts_ms, rg_shard=None):
        self.path = path
        self.ctype = ctype
        self.fields = fields
        self.version = version
        self.ts_ms = ts_ms
        self.rg_shard = rg_shard


class _CFDvDeletePartition(InputPartition):
    """One carried file of a PURE vector-delete commit: the change
    slice is exactly the rows at the positions newly present in the
    new vector (new − old), carrying their OLD values as ``delete``
    rows. One read of the file, no join, per-file parallelism — the
    fast path for the most common update-class commit."""

    def __init__(self, path, fields, old_dv, new_dv, version, ts_ms):
        self.path = path
        self.fields = fields
        self.old_dv = old_dv  # sidecar path or None
        self.new_dv = new_dv
        self.version = version
        self.ts_ms = ts_ms


class _CFDiffPartition(InputPartition):
    """One SHARD of an UPDATE-class commit's diff (rewrite / DV delete /
    restore): the old and new sides of the version's file diff,
    row-matched executor-side on the primary keys — exactly
    ``table_changes(v-1, v)`` computed as an Arrow join. When the
    commit's changed bytes exceed ``diff_partition_bytes`` the version
    fans out into ``nshards`` partitions by PK-hash range: every shard
    reads the same changed files but filters rows to
    ``hash(pk) % nshards == shard`` BEFORE the join, so a giant MERGE
    (10% of a 100 TB table) classifies across many bounded-memory tasks
    instead of OOMing one — the extra reads (each shard scans the
    commit's files once) are the documented price of bounded memory
    without recorded CDC files. Rows with equal PKs always hash to the
    same shard, so per-shard classification equals the global one."""

    def __init__(
        self, old_files, new_files, fields, pks, version, ts_ms,
        shard=0, nshards=1,
    ):
        self.old_files = old_files  # [(path, dv_path|None), ...]
        self.new_files = new_files
        self.fields = fields
        self.pks = pks
        self.version = version
        self.ts_ms = ts_ms
        self.shard = shard
        self.nshards = nshards


def _with_cdf_columns(tbl, change, version, ts_ms):
    """Append the three CDF metadata columns to an Arrow table.
    ``change`` is a string literal or a pyarrow array."""
    import pyarrow as pa

    n = tbl.num_rows
    if isinstance(change, str):
        change = pa.array([change] * n, pa.string())
    return (
        tbl.append_column("_change_type", change)
        .append_column(
            "_commit_version", pa.array([version] * n, pa.int64())
        )
        .append_column(
            "_commit_timestamp",
            pa.array([ts_ms * 1000] * n, pa.timestamp("us", tz="UTC")),
        )
    )


def _pk_shard_filter(tbl, pks, shard, nshards):
    """Keep only the rows whose PK-hash lands in this shard. The hash is
    ``pandas.util.hash_pandas_object`` over the PK columns — vectorized,
    process-independent (fixed default hash key), and a function of the
    VALUES only, so the old and new images of a row always co-shard."""
    if nshards <= 1 or tbl.num_rows == 0:
        return tbl
    import pandas as pd
    import pyarrow as pa

    h = pd.util.hash_pandas_object(
        tbl.select(pks).to_pandas(), index=False
    ).to_numpy()
    return tbl.filter(pa.array((h % nshards) == shard))


def _fields_arrow_schema(fields):
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_json_string

    return pa.schema(
        [
            (name, to_arrow_type(_parse_datatype_json_string(tj)))
            for name, tj, *_ in fields
        ]
    )


def _read_files_concat(file_list, fields, pks=None, shard=0, nshards=1):
    """[(path, dv_path)] -> ONE aligned Arrow table (logical names,
    pinned types, vectors applied). With ``nshards > 1`` each file is
    filtered to the PK-hash shard RIGHT after it is read, so a sharded
    task's peak memory is one file plus its own 1/nshards slice. The
    schema is pinned explicitly — a file whose rows are ALL
    vector-deleted yields zero batches, which must still concat as an
    empty TYPED table, not fail schema inference."""
    import pyarrow as pa

    schema = _fields_arrow_schema(fields)
    tables = [
        _pk_shard_filter(
            pa.Table.from_batches(
                list(_read_parquet_aligned(p, fields, dv)),
                schema=schema,
            ),
            pks,
            shard,
            nshards,
        )
        for p, dv in file_list
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(tables)


class _VersionedChangeFeedStreamReader(_VersionedStreamReader):
    """``readChangeFeed``-analogue STREAMING source: each micro-batch
    emits ROW-level changes — the table's columns plus ``_change_type``
    (insert / update_postimage / delete), ``_commit_version`` and
    ``_commit_timestamp`` — for every version drained, classified with
    the same derived-CDF semantics as the batch
    ``VersionedTable.table_changes`` (the log records no per-commit CDC
    files, so the feed is computed on read from each version's file
    diff; ``primary_keys`` is therefore required, as batch-side).

    Per-version classification (Delta's model — one CDF slice per
    commit, not an endpoint diff):

    - dataChange=false commits (compaction / clustering rewrites) emit
      ZERO changes;
    - insert-only commits parallelize per added file (every live row
      is an ``insert``) — the streaming-intake hot path;
    - update-class commits (MERGE, DV or rewrite DELETE/UPDATE,
      restore) row-match the version's old/new file diff on the
      primary keys executor-side; rewritten-but-unchanged neighbor
      rows are suppressed by a null-safe whole-row comparison, so a
      pure rewrite classifies as zero changes.

    Offsets are table versions (inherited), so ``max_versions_per_batch``
    / ``max_bytes_per_batch`` rate-limit the feed identically to the
    file-level source, and Spark's checkpoint resumes it exactly-once.
    Resolution folds one delta per drained version off the instance's
    cached predecessor — O(changed), never O(table), at any depth.

    ``diff_partition_bytes`` (default 128 MiB) bounds an update-class
    commit's per-task diff: a version whose changed bytes exceed it
    classifies across ``ceil(changed / target)`` PK-hash-range shards
    (see :class:`_CFDiffPartition`) — the knob that keeps a giant MERGE
    from landing its whole diff in one Arrow task."""

    def __init__(
        self,
        table: str,
        cdf_schema: StructType,
        starting_version: int,
        primary_keys: list[str],
        max_versions_per_batch: int | None = None,
        max_bytes_per_batch: int | None = None,
        diff_partition_bytes: int = 128 * 1024 * 1024,
    ):
        data_schema = StructType(
            [f for f in cdf_schema.fields if f.name not in _CDF_COLS]
        )
        if not primary_keys:
            raise ValueError(
                "read_changes requires .option('primary_keys', 'k1,k2') — "
                "the feed is derived from file diffs, so rows must be "
                "matchable (same contract as table_changes batch-side)"
            )
        missing = [k for k in primary_keys if k not in data_schema.names]
        if missing:
            raise ValueError(
                f"primary_keys {missing} not in table schema "
                f"{data_schema.names}"
            )
        super().__init__(
            table,
            data_schema,
            starting_version,
            max_versions_per_batch,
            ignore_deletes=True,  # the feed EXPRESSES deletes/updates,
            ignore_changes=True,  # so nothing needs refusing
            max_bytes_per_batch=max_bytes_per_batch,
        )
        self.pks = list(primary_keys)
        self.diff_partition_bytes = max(1, int(diff_partition_bytes))

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v0, v1 = int(start["version"]), int(end["version"])
        self._floor = max(self._floor, v0, v1)
        self._floor_known = True
        parts: list[InputPartition] = []
        for v in range(max(v0, 0) + 1, v1 + 1):
            try:
                rec = json.loads(self.log.store.read(_commit_name(v)))
            except FileNotFoundError:
                raise RuntimeError(
                    f"change-feed version {v} of {self.table} is no longer "
                    "in the log (vacuumed?) — cannot resume exactly-once; "
                    "restart from a retained version or a fresh checkpoint"
                )
            mode = rec.get("mode", "")
            if mode in _NO_CHANGE_MODES:
                continue  # dataChange=false: zero changes by contract
            cur = self.log.resolve(v)
            prev = (
                self.log.resolve(v - 1)
                if v > 1
                else {"files": [], "dv": {}}
            )
            ts_ms = int(cur.get("ts") or 0)
            cur_dv, prev_dv = cur.get("dv", {}), prev.get("dv", {})
            old_set, new_set = set(prev["files"]), set(cur["files"])
            old_only = [f for f in prev["files"] if f not in new_set]
            new_only = [f for f in cur["files"] if f not in old_set]
            dv_changed = [
                f
                for f in cur["files"]
                if f in old_set and prev_dv.get(f) != cur_dv.get(f)
            ]
            cmap = cur.get("column_mapping") or {}
            fields = [
                (f.name, f.dataType.json(), cmap.get(f.name, f.name))
                for f in self.pinned.fields
            ]
            rec_cdc = rec.get("cdc")
            if rec_cdc is not None:
                # RECORDED CDC (write-time, the enable_change_data_feed
                # contract): the commit persisted its row-level slice,
                # so serve those files directly — per-cdc-file parallel,
                # large files split by row-group range, ZERO re-reads of
                # the version's data files. An explicit empty list means
                # the DML verifiably changed nothing. Derived
                # classification below stays the fallback for commits
                # recorded before the property was enabled.
                for e in rec_cdc:
                    k = max(
                        1,
                        -(-int(e.get("size", 0)) // self.diff_partition_bytes),
                    )
                    if k == 1:
                        parts.append(
                            _CFRecordedPartition(
                                e["path"], e["type"], fields, v, ts_ms
                            )
                        )
                    else:
                        parts.extend(
                            _CFRecordedPartition(
                                e["path"], e["type"], fields, v, ts_ms,
                                rg_shard=(i, k),
                            )
                            for i in range(k)
                        )
                continue
            if not old_only and not dv_changed:
                # insert-only commit: per-file parallel inserts (the
                # file's own vector at THIS version applies — e.g. a
                # clone's initial snapshot carries source vectors);
                # large files additionally split by row-group range
                cur_sizes = cur.get("sizes", {})
                for f in new_only:
                    k = max(
                        1,
                        -(-cur_sizes.get(f, 0) // self.diff_partition_bytes),
                    )
                    if k == 1:
                        parts.append(
                            _CFInsertPartition(f, fields, cur_dv.get(f), v, ts_ms)
                        )
                    else:
                        parts.extend(
                            _CFInsertPartition(
                                f, fields, cur_dv.get(f), v, ts_ms,
                                rg_shard=(i, k),
                            )
                            for i in range(k)
                        )
            elif not old_only and not new_only and mode == "delete_where":
                # PURE vector-delete commit: the change slice per file
                # is the newly-vectored positions — one read, no join,
                # per-file parallel (the common delete). Gated on the
                # MODE: a dv-only restore can CLEAR vectors (rows
                # resurrect as inserts), which only the generic diff
                # classifies; delete_where vectors only ever grow.
                parts.extend(
                    _CFDvDeletePartition(
                        f, fields, prev_dv.get(f), cur_dv.get(f), v, ts_ms
                    )
                    for f in dv_changed
                )
            else:
                old_side = [(f, prev_dv.get(f)) for f in old_only + dv_changed]
                new_side = [(f, cur_dv.get(f)) for f in new_only + dv_changed]
                # fan the diff out by PK-hash range when the commit's
                # changed bytes exceed the per-task target; file sizes
                # ride the log (add.size), so sizing is metadata-only
                prev_sz, cur_sz = prev.get("sizes", {}), cur.get("sizes", {})

                def _sz(f, logged):
                    s = logged.get(f)
                    if s is None:
                        try:
                            s = os.path.getsize(f)
                        except OSError:
                            s = 0
                    return s

                changed = sum(_sz(f, prev_sz) for f, _ in old_side) + sum(
                    _sz(f, cur_sz) for f, _ in new_side
                )
                nshards = max(
                    1, -(-changed // self.diff_partition_bytes)
                )
                parts.extend(
                    _CFDiffPartition(
                        old_side,
                        new_side,
                        fields,
                        self.pks,
                        v,
                        ts_ms,
                        shard=s,
                        nshards=nshards,
                    )
                    for s in range(nshards)
                )
        return parts

    def read(self, partition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(partition, _CFRecordedPartition):
            for batch in _read_parquet_aligned(
                partition.path,
                partition.fields,
                None,
                partition.rg_shard,
            ):
                yield from _with_cdf_columns(
                    pa.Table.from_batches([batch]),
                    partition.ctype,
                    partition.version,
                    partition.ts_ms,
                ).to_batches()
            return
        if isinstance(partition, _CFInsertPartition):
            for batch in _read_parquet_aligned(
                partition.path,
                partition.fields,
                partition.dv_path,
                partition.rg_shard,
            ):
                yield from _with_cdf_columns(
                    pa.Table.from_batches([batch]),
                    "insert",
                    partition.version,
                    partition.ts_ms,
                ).to_batches()
            return
        if isinstance(partition, _CFDvDeletePartition):
            import pyarrow.parquet as pq

            from modular_etl_data_platform_spark.operators.versioned import (
                _strip_scheme_py,
            )

            norm = _strip_scheme_py(partition.path)

            def positions(sidecar):
                if sidecar is None:
                    return set()
                t = pq.read_table(
                    sidecar, filters=[("file_path", "=", norm)]
                )
                return set(t.column("row_index").to_pylist())

            newly = sorted(
                positions(partition.new_dv) - positions(partition.old_dv)
            )
            tbl = pa.Table.from_batches(
                list(
                    _read_parquet_aligned(partition.path, partition.fields)
                ),
                schema=_fields_arrow_schema(partition.fields),
            )
            rows = tbl.take(pa.array(newly, pa.int64()))
            yield from _with_cdf_columns(
                rows, "delete", partition.version, partition.ts_ms
            ).to_batches()
            return
        # diff partition: table_changes(v-1, v) in one Arrow join —
        # restricted to this task's PK-hash shard when the version
        # fanned out (both sides filter per file, so equal keys meet)
        p = partition
        shard = getattr(p, "shard", 0)
        nshards = getattr(p, "nshards", 1)
        old = _read_files_concat(p.old_files, p.fields, p.pks, shard, nshards)
        new = _read_files_concat(p.new_files, p.fields, p.pks, shard, nshards)
        val_cols = [n for n in old.column_names if n not in p.pks]
        # markers are explicitly bool-typed: an EMPTY side (a shard with
        # no rows on one side, or a delete-everything rewrite) would
        # otherwise infer Arrow type null, which the join refuses
        o = old.rename_columns(
            [c if c in p.pks else f"__ov_{c}" for c in old.column_names]
        ).append_column("__o", pa.array([True] * old.num_rows, pa.bool_()))
        n_ = new.rename_columns(
            [c if c in p.pks else f"__nv_{c}" for c in new.column_names]
        ).append_column("__n", pa.array([True] * new.num_rows, pa.bool_()))
        j = o.join(n_, keys=p.pks, join_type="full outer")
        o_present = pc.is_valid(j.column("__o"))
        n_present = pc.is_valid(j.column("__n"))

        def null_safe_eq(a, b):
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            return pc.or_(both_null, pc.coalesce(pc.equal(a, b), pa.scalar(False)))

        same = pa.array([True] * j.num_rows, pa.bool_())
        for c in val_cols:
            same = pc.and_(
                same, null_safe_eq(j.column(f"__ov_{c}"), j.column(f"__nv_{c}"))
            )
        change = pc.if_else(
            pc.invert(o_present),
            pa.scalar("insert"),
            pc.if_else(
                pc.invert(n_present),
                pa.scalar("delete"),
                pc.if_else(
                    same,
                    pa.scalar(None, pa.string()),
                    pa.scalar("update_postimage"),
                ),
            ),
        )
        keep = pc.is_valid(change)
        out_cols, out_names = [], []
        for name, *_ in p.fields:
            if name in p.pks:
                out_cols.append(j.column(name))
            else:
                # postimage for insert/update; old values for delete
                out_cols.append(
                    pc.if_else(
                        n_present,
                        j.column(f"__nv_{name}"),
                        j.column(f"__ov_{name}"),
                    )
                )
            out_names.append(name)
        result = pa.table(dict(zip(out_names, out_cols))).append_column(
            "__change", change
        )
        result = result.filter(keep)
        change_col = result.column("__change")
        result = result.drop_columns(["__change"])
        yield from _with_cdf_columns(
            result, change_col.combine_chunks(), p.version, p.ts_ms
        ).to_batches()


def _filter_to_range(f):
    """Map a pushed Spark filter onto a stats-pruning range
    ``(column, lo, hi, lo_inclusive)`` — None when the filter shape
    can't prune (nested column, disjunction-derived, etc.). Exclusive
    upper bounds fall back to inclusive (conservative: a file is only
    ever KEPT extra, never wrongly skipped)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return None
    col = attr[0]
    if isinstance(f, EqualTo):
        return (col, f.value, f.value, True)
    if isinstance(f, GreaterThan):
        return (col, f.value, None, False)
    if isinstance(f, GreaterThanOrEqual):
        return (col, f.value, None, True)
    if isinstance(f, (LessThan, LessThanOrEqual)):
        return (col, None, f.value, True)
    if isinstance(f, In) and f.value:
        try:
            return (col, min(f.value), max(f.value), True)
        except TypeError:
            return None
    return None


class _VersionedBatchReaderBase(DataSourceReader):
    """``spark.read.format("versioned_table")`` — a BATCH snapshot read
    through the standard reader API: the ``version`` / ``timestamp``
    options give DataFrameReader users the same time travel as
    ``VersionedTable.read`` (Delta's versionAsOf / timestampAsOf),
    one input partition per snapshot file, Arrow-aligned to the
    snapshot's recorded schema."""

    def __init__(
        self,
        table: str,
        schema: StructType,
        version: int | None,
        split_bytes: int = 128 * 1024 * 1024,
    ):
        self.log = CommitLog(path=table)
        v = self.log.current_version() if version is None else version
        if v is None:
            raise ValueError(f"no published versions under {table}")
        self.version = v
        self.pinned = schema
        #: Spark's maxPartitionBytes analogue: a file larger than this
        #: splits across ceil(size / split_bytes) row-group-range tasks
        #: (sized from the LOG's recorded file sizes — no footer reads
        #: at planning time), so one huge compacted file can't
        #: serialize a whole scan into a single task
        self.split_bytes = max(1, int(split_bytes))
        self._ranges: list[tuple] = []
        self._in_lists: list[tuple] = []

    def partitions(self) -> list[InputPartition]:
        from modular_etl_data_platform_spark.operators.versioned import (
            VersionedTable,
        )

        state = self.log.resolve(self.version)
        stats = state.get("stats", {})
        dv = state.get("dv", {})
        cmap = state.get("column_mapping") or {}
        files = [
            f
            for f in state["files"]
            if all(
                VersionedTable._may_intersect(
                    stats.get(f),
                    cmap.get(col, col),
                    lo,
                    hi,
                    lo_inclusive=lo_inc,
                )
                for col, lo, hi, lo_inc in self._ranges
            )
        ]
        # pushed EQUALITY predicates additionally probe the bloom index
        # (tables with bloom_columns) — the point-lookup case min/max
        # can't prune on hash-distributed keys
        from modular_etl_data_platform_spark.operators.versioned import (
            bloom_prune_files,
        )

        for col, lo, hi, lo_inc in self._ranges:
            if lo is not None and lo == hi and lo_inc:
                files = bloom_prune_files(stats, files, cmap.get(col, col), lo)
        # pushed IN lists probe PER VALUE (range + bloom, unioned): the
        # list's overall [min, max] spans the domain on hash-distributed
        # keys, but each value individually prunes
        for col, vals in self._in_lists:
            phys = cmap.get(col, col)
            keep: set[str] = set()
            remaining = list(files)
            for val in vals:
                hit = [
                    f
                    for f in remaining
                    if VersionedTable._may_intersect(stats.get(f), phys, val, val)
                ]
                hit = bloom_prune_files(stats, hit, phys, val)
                if hit:
                    keep.update(hit)
                    remaining = [f for f in remaining if f not in keep]
            files = [f for f in files if f in keep]
        fields = [
            (f.name, f.dataType.json(), cmap.get(f.name, f.name))
            for f in self.pinned.fields
        ]
        sizes = state.get("sizes", {})
        parts: list[_FilePartition] = []
        for f in files:
            size = sizes.get(f)
            if size is None:
                try:
                    size = os.path.getsize(f)
                except OSError:
                    size = 0
            k = max(1, -(-size // self.split_bytes))
            if k == 1:
                parts.append(_FilePartition(f, fields, dv.get(f)))
            else:
                parts.extend(
                    _FilePartition(f, fields, dv.get(f), rg_shard=(i, k))
                    for i in range(k)
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_parquet_aligned(
            partition.path,
            partition.fields,
            partition.dv_path,
            getattr(partition, "rg_shard", None),
        )


class _VersionedChangeFeedBatchReader(DataSourceReader):
    """``spark.read.format("versioned_table").option("read_changes",
    "true")`` — BATCH readChangeFeed through the standard reader API
    (Delta's ``startingVersion``/``endingVersion`` batch CDF): emits
    one row-level slice per version in ``(starting_version,
    ending_version]`` with ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp``, planned and read by the SAME classifier the
    streaming source runs (recorded ``_change_data`` files first,
    per-added-file inserts for blind appends, PK-hash-sharded diffs as
    the fallback) — so the batch and streaming feeds can never
    disagree. ``primary_keys`` is required only when some version in
    range actually needs the derived fallback (same contract as
    ``VersionedTable.read_change_feed``)."""

    def __init__(
        self,
        table: str,
        cdf_schema: StructType,
        since_version: int,
        end_version: int | None,
        primary_keys: list[str],
        diff_partition_bytes: int,
    ):
        # primary keys may be legitimately absent when every version in
        # range is recorded or insert-only; the inner reader requires
        # SOME key list, so default to the first table column — it is
        # only consulted on the derived-diff path, which we refuse
        # below when no keys were given
        data_cols = [
            f.name for f in cdf_schema.fields if f.name not in _CDF_COLS
        ]
        self._explicit_pks = bool(primary_keys)
        self.inner = _VersionedChangeFeedStreamReader(
            table,
            cdf_schema,
            since_version,
            primary_keys or data_cols[:1],
            diff_partition_bytes=diff_partition_bytes,
        )
        self.v0 = since_version
        head = self.inner.log.current_version() or 0
        self.v1 = head if end_version is None else end_version

    def partitions(self) -> list[InputPartition]:
        parts = self.inner.partitions(
            {"version": self.v0}, {"version": self.v1}
        )
        if not self._explicit_pks and any(
            isinstance(p, _CFDiffPartition) for p in parts
        ):
            bad = sorted(
                {
                    p.version
                    for p in parts
                    if isinstance(p, _CFDiffPartition)
                }
            )
            raise ValueError(
                f"version(s) {bad} have no recorded CDC and are not "
                "insert-only — deriving their slices requires "
                ".option('primary_keys', 'k1,k2')"
            )
        return parts

    def read(self, partition) -> Iterator:
        return self.inner.read(partition)


class _VersionedBatchReader(_VersionedBatchReaderBase):
    """The pushdown-capable variant: ``pushFilters`` turns Spark's
    pushed predicates into FILE skipping against the log's recorded
    stats (the Delta read path) — a range or equality predicate on a
    stats column opens only intersecting files. Every filter is handed
    back to Spark for row-level evaluation, so pruning here is
    partition elimination, never filtering — conservative by
    construction. Only instantiated when
    ``spark.sql.python.filterPushdown.enabled`` is true (Spark REFUSES
    readers that implement pushFilters while the conf is off, so the
    base class serves vanilla sessions unchanged)."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import In

        for f in filters:
            rng = _filter_to_range(f)
            if rng is not None:
                self._ranges.append(rng)
            attr = getattr(f, "attribute", None)
            if isinstance(f, In) and f.value and attr and len(attr) == 1:
                self._in_lists.append((attr[0], list(f.value)))
            yield f  # Spark still evaluates every filter row-level


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
        # canonicalize exactly like VersionedTable.__init__: manifest
        # paths derive from this root and the DV machinery matches them
        # against Spark's RESOLVED `_metadata.file_path` — a relative or
        # symlinked option would log paths that never match the scan's
        # (silent DV mismatch), and the table's own vacuum (which
        # realpaths) would see the relatively-logged live files as
        # unreferenced and delete them
        return os.path.realpath(path)

    def _requested_version(self, log: CommitLog) -> int | None:
        """The batch-read ``version`` / ``timestamp`` options (Delta's
        versionAsOf / timestampAsOf; timestamp accepts epoch millis or
        an ISO-8601 instant, naive = UTC)."""
        v = self.options.get("version")
        ts = self.options.get("timestamp")
        if v is not None and ts is not None:
            raise ValueError("pass option version OR timestamp, not both")
        if v is not None:
            return int(v)
        if ts is not None:
            try:
                ms = int(ts)
            except ValueError:
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(ts)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                ms = int(dt.timestamp() * 1000)
            return log.version_at_timestamp(ms)
        return None

    def _read_changes(self) -> bool:
        return str(self.options.get("read_changes", "false")).lower() == "true"

    def schema(self) -> StructType:
        log = CommitLog(path=self._table())
        v = self._requested_version(log)
        if v is None:
            v = log.current_version()
        if not v:
            raise ValueError(f"no published versions under {self._table()}")
        schema = StructType.fromJson(json.loads(log.resolve(v)["schema"]))
        if self._read_changes():
            # Delta's readChangeFeed column set rides the table schema
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                TimestampType,
            )

            return StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
        return schema

    def reader(self, schema: StructType) -> DataSourceReader:
        from pyspark.sql import SparkSession

        log = CommitLog(path=self._table())
        if self._read_changes():
            # batch CDF: Delta's startingVersion/endingVersion read
            pks = self.options.get("primary_keys", "")
            end = self.options.get("ending_version")
            return _VersionedChangeFeedBatchReader(
                self._table(),
                schema,
                int(self.options.get("starting_version", 0)),
                int(end) if end is not None else None,
                [k.strip() for k in pks.split(",") if k.strip()],
                int(
                    self.options.get(
                        "diff_partition_bytes", 128 * 1024 * 1024
                    )
                ),
            )
        sess = SparkSession.getActiveSession()
        pushdown = (
            sess is not None
            and str(
                sess.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            ).lower() == "true"
        )
        cls = _VersionedBatchReader if pushdown else _VersionedBatchReaderBase
        return cls(
            self._table(),
            schema,
            self._requested_version(log),
            split_bytes=int(
                self.options.get("split_file_bytes", 128 * 1024 * 1024)
            ),
        )

    def writer(self, schema: StructType, overwrite: bool):
        """Batch writes through the standard writer API:
        ``df.write.format("versioned_table").mode("append"|"overwrite")
        .option("path", ...).save()`` — one published version per save,
        with the same append-time schema enforcement and CHECK
        constraint checks as ``VersionedTable.write``."""
        stats = self.options.get("stats_columns")
        return _VersionedBatchArrowWriter(
            self._table(),
            schema,
            overwrite,
            [c.strip() for c in stats.split(",") if c.strip()] if stats else [],
            merge_schema=str(
                self.options.get("merge_schema", "false")
            ).lower() == "true",
        )

    def streamReader(self, schema: StructType) -> _VersionedStreamReader:
        max_v = self.options.get("max_versions_per_batch")
        start = int(self.options.get("starting_version", 0))
        start_ts = self.options.get("starting_timestamp")
        if start_ts is not None:
            # Delta's startingTimestamp: begin AFTER the last version
            # committed at-or-before the instant — i.e. the first batch
            # emits versions committed strictly later. Resolved once at
            # stream construction against the commit times in the log;
            # mutually exclusive with starting_version (two different
            # answers to the same question must not race).
            if "starting_version" in self.options:
                raise ValueError(
                    "starting_version and starting_timestamp are "
                    "mutually exclusive"
                )
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(str(start_ts))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            from modular_etl_data_platform_spark.operators.versioned import (
                CommitLog,
            )

            log = CommitLog(path=self._table())
            try:
                start = log.version_at_timestamp(int(dt.timestamp() * 1000))
            except ValueError:
                start = 0  # predates the oldest commit: stream everything
        max_b = self.options.get("max_bytes_per_batch")
        if self._read_changes():
            pks = self.options.get("primary_keys", "")
            return _VersionedChangeFeedStreamReader(
                self._table(),
                schema,
                start,
                [k.strip() for k in pks.split(",") if k.strip()],
                int(max_v) if max_v is not None else None,
                int(max_b) if max_b is not None else None,
                diff_partition_bytes=int(
                    self.options.get(
                        "diff_partition_bytes", 128 * 1024 * 1024
                    )
                ),
            )
        return _VersionedStreamReader(
            self._table(),
            schema,
            start,
            int(max_v) if max_v is not None else None,
            ignore_deletes=str(
                self.options.get("ignore_deletes", "false")
            ).lower() == "true",
            ignore_changes=str(
                self.options.get("ignore_changes", "false")
            ).lower() == "true",
            max_bytes_per_batch=int(max_b) if max_b is not None else None,
            split_file_bytes=int(
                self.options.get("split_file_bytes", 128 * 1024 * 1024)
            ),
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        """The WRITE side: ``writeStream.format("versioned_table")
        .option("path", ...)`` — one published version per micro-batch
        (see :class:`_VersionedStreamArrowWriter`). ``stats_columns``
        (comma-separated option) records footer min/max per landed file
        so downstream pruned reads skip stream-landed files too."""
        stats = self.options.get("stats_columns")
        return _VersionedStreamArrowWriter(
            self._table(),
            schema,
            overwrite,
            [c.strip() for c in stats.split(",") if c.strip()] if stats else [],
            txn_app_id=self.options.get("txn_app_id", "stream"),
            auto_compact_small_files=(
                int(self.options["auto_compact_small_files"])
                if "auto_compact_small_files" in self.options
                else None
            ),
            merge_schema=str(
                self.options.get("merge_schema", "false")
            ).lower() == "true",
        )


# -- the write side: versioned table as a streaming SINK ----------------------
class _FilesCommitMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class _ArrowFileLander:
    """Shared landing machinery for the streaming and batch writers:
    executors write one immutable parquet file per non-empty task
    straight from Arrow RecordBatches; ``abort`` removes the orphans;
    CHECK constraints are validated driver-side with one scan of the
    landed files before anything publishes."""

    table: str
    pinned: StructType

    def write(self, iterator) -> _FilesCommitMessage:
        """Executor-side: Arrow RecordBatches -> one parquet file."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _FilesCommitMessage([])
        sub = os.path.join(
            self.table, _DATA_DIR, f"stream-{uuid.uuid4().hex}"
        )
        os.makedirs(sub, exist_ok=True)
        path = os.path.join(sub, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_batches(batches), path)
        return _FilesCommitMessage([path])

    def _check_constraints(self, files: list[str], constraints: dict) -> None:
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        from modular_etl_data_platform_spark.operators.versioned import (
            ConstraintViolationError,
        )

        if not constraints or not files:
            return
        spark = SparkSession.getActiveSession()
        if spark is None:  # fail CLOSED: never skip a declared constraint
            raise RuntimeError(
                "cannot validate CHECK constraints: no active SparkSession"
            )
        batch = spark.read.schema(self.pinned).parquet(*files)
        aggs = [
            F.sum((~F.coalesce(F.expr(e), F.lit(True))).cast("long")).alias(n)
            for n, e in constraints.items()
        ]
        row = batch.agg(*aggs).first()
        violated = {n: row[n] for n in constraints if row[n]}
        if violated:
            raise ConstraintViolationError(
                f"CHECK constraint(s) violated by write into "
                f"{self.table}: "
                + ", ".join(
                    f"{n} ({constraints[n]}): {c} row(s)"
                    for n, c in violated.items()
                )
            )

    def abort(self, messages, batchId: int | None = None) -> None:
        for m in messages or []:
            if m is None:
                continue
            for f in getattr(m, "files", []):
                try:
                    os.remove(f)
                except FileNotFoundError:
                    continue


class _VersionedBatchArrowWriter(_ArrowFileLander, DataSourceArrowWriter):
    """``df.write.format("versioned_table")`` — one published version
    per save. Append mode enforces the table schema writer-side and
    rebases over racing commits exactly like ``VersionedTable.write``;
    overwrite replaces the logical contents. All tasks' files land in
    one commit — a torn save is impossible."""

    def __init__(
        self,
        table: str,
        schema: StructType,
        overwrite: bool,
        stats_columns: list[str],
        merge_schema: bool = False,
    ):
        self.table = table
        self.pinned = schema
        self.schema_json = schema.json()
        self.overwrite = overwrite
        self.stats_columns = stats_columns
        self.merge_schema = merge_schema
        os.makedirs(os.path.join(table, _DATA_DIR), exist_ok=True)

    def commit(self, messages) -> None:
        from pyspark.sql import SparkSession

        from modular_etl_data_platform_spark.operators.versioned import (
            ConcurrentWriteError,
            VersionedTable,
            collect_file_metadata,
        )

        files = [
            f
            for m in messages
            if m is not None
            for f in getattr(m, "files", [])
        ]
        log = CommitLog(path=self.table)
        # executor-side when a session is reachable (driver-invoked
        # writers, tests); the real save() path commits inside a
        # sessionless Python worker and falls back to local footer
        # reads — metadata-only either way (no bloom columns here)
        fresh, _ = collect_file_metadata(
            SparkSession.getActiveSession(), files, self.stats_columns, []
        )
        mode = "overwrite" if self.overwrite else "append"
        checked_cons: dict | None = None
        for _ in range(20):
            base = log.current_version() or 0
            schema_json = self.schema_json
            prior = log.resolve(base) if base else None
            if (prior or {}).get("column_mapping"):
                raise RuntimeError(
                    f"{self.table} uses column mapping (renamed/dropped "
                    "columns); the format-API writers land files under "
                    "logical names and would corrupt the physical-name "
                    "contract — write through VersionedTable instead"
                )
            if (prior or {}).get("generated"):
                raise RuntimeError(
                    f"{self.table} declares generated columns; the "
                    "format-API writers cannot compute or validate "
                    "generation expressions executor-side — write "
                    "through VersionedTable instead"
                )
            append = not (self.overwrite or prior is None)
            if append:
                schema_json = VersionedTable._append_schema(
                    self.pinned, prior["schema"], self.merge_schema
                )
            # constraints are validated against THIS attempt's base —
            # a rebase onto a head whose constraint set changed (ADD
            # CONSTRAINT raced the save) revalidates before publishing.
            # OVERWRITE saves validate too: publish CARRIES the prior
            # constraints into the new version (they survive overwrite
            # unless explicitly replaced, and the format API has no way
            # to replace them), so an unchecked overwrite could publish
            # rows that violate a still-active constraint
            cur_cons = (prior or {}).get("constraints", {})
            if cur_cons != checked_cons:
                self._check_constraints(files, cur_cons)
                checked_cons = cur_cons
            try:
                if append:  # delta form: O(batch) at any table size
                    log.publish(
                        None, schema_json, {"mode": mode}, base, fresh,
                        add=files,
                    )
                else:
                    log.publish(
                        list(files), schema_json, {"mode": mode}, base, fresh
                    )
                return
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"batch save lost every commit race on {self.table}"
        )


class _VersionedStreamArrowWriter(_ArrowFileLander, DataSourceStreamArrowWriter):
    """``writeStream.format("versioned_table")`` — one table VERSION per
    micro-batch, published through the same commit protocol as every
    batch writer (so concurrent batch appends and the stream serialize
    together), with Delta's txn-style idempotence: each commit records
    its ``stream_batch_id``, and a RETRIED commit of an
    already-published batch is a no-op — a crash between Spark's sink
    commit and checkpoint advance cannot double-append.

    Executors land one immutable parquet file per non-empty task
    directly from Arrow RecordBatches (no Row materialization); the
    driver-side ``commit`` claims the next version with the files from
    ALL tasks — all-or-nothing, torn batches impossible. ``abort``
    removes the landed orphans (vacuum would also collect them).

    Active CHECK constraints are enforced at commit time with one scan
    of the batch's landed files — the same transactional contract as
    the batch path: a violating micro-batch publishes NOTHING and fails
    the stream loudly."""

    def __init__(
        self,
        table: str,
        schema: StructType,
        overwrite: bool,
        stats_columns: list[str],
        txn_app_id: str = "stream",
        auto_compact_small_files: int | None = None,
        merge_schema: bool = False,
    ):
        self.table = table
        self.pinned = schema
        self.schema_json = schema.json()
        self.overwrite = overwrite
        self.stats_columns = stats_columns
        #: Delta's public txnAppId contract: the (app id, batch id) pair
        #: rides the table state, so a retried commit is recognized even
        #: if unrelated BATCH writers committed in between (a head-only
        #: check would miss that interleaving and double-append). Two
        #: independent streams into one table must use distinct app ids
        #: (option ``txn_app_id``), and a stream restarted from a FRESH
        #: checkpoint (batch ids reset to 0) needs a new app id — the
        #: same rule Delta documents for foreachBatch txnAppId writes.
        self.txn_app_id = txn_app_id
        #: when set, each committed micro-batch triggers the table's
        #: size-based auto-compaction policy (Delta autoCompact): a
        #: stream that lands one small file per batch stays read-
        #: efficient without an external OPTIMIZE job
        self.auto_compact_small_files = auto_compact_small_files
        #: mergeSchema for the stream: new columns widen the table;
        #: missing/type-changed columns always fail the batch
        self.merge_schema = merge_schema
        os.makedirs(os.path.join(table, _DATA_DIR), exist_ok=True)

    def commit(self, messages, batchId: int) -> None:
        from modular_etl_data_platform_spark.operators.versioned import (
            ConcurrentWriteError,
            collect_file_metadata,
        )

        files = [
            f
            for m in messages
            if m is not None
            for f in getattr(m, "files", [])
        ]
        log = CommitLog(path=self.table)
        head = log.current_version()
        if head:
            st = log.resolve(head)
            done = st.get("txn", {}).get(self.txn_app_id)
            if done is not None and done >= batchId:
                # retried commit of an already-published batch — and
                # because the txn map is TABLE state (carried through
                # every commit), this holds even when unrelated batch
                # writers committed between the publish and the retry
                return
        from modular_etl_data_platform_spark.operators.versioned import (
            VersionedTable,
        )

        from pyspark.sql import SparkSession

        # executor-side stats when the session is reachable (the real
        # streaming sink commit runs on the driver with an active
        # session); sessionless fallback reads footers locally
        fresh, _ = collect_file_metadata(
            SparkSession.getActiveSession(), files, self.stats_columns, []
        )
        checked_cons: dict | None = None
        for _ in range(20):
            base = log.current_version() or 0
            schema_json = self.schema_json
            prior = log.resolve(base) if base else None
            # idempotence re-check against EACH rebased head, not just
            # the one observed before the loop (VersionedTable.write's
            # rule): a zombie driver retrying this same batch can land
            # its publish between our attempts, and a head-only check
            # done once would let the loser double-append the batch
            if (prior or {}).get("txn", {}).get(self.txn_app_id, -1) >= batchId:
                return
            if (prior or {}).get("column_mapping"):
                raise RuntimeError(
                    f"{self.table} uses column mapping (renamed/dropped "
                    "columns); the format-API writers land files under "
                    "logical names and would corrupt the physical-name "
                    "contract — write through VersionedTable instead"
                )
            if (prior or {}).get("generated"):
                raise RuntimeError(
                    f"{self.table} declares generated columns; the "
                    "format-API writers cannot compute or validate "
                    "generation expressions executor-side — write "
                    "through VersionedTable instead"
                )
            append = not (self.overwrite or prior is None)
            if append:
                # writer-side schema enforcement, same rule as batch
                # appends: a drifting stream must FAIL the batch, never
                # silently drop table columns from carried files
                schema_json = VersionedTable._append_schema(
                    self.pinned, prior["schema"], self.merge_schema
                )
            # validate against THIS attempt's base constraints (an ADD
            # CONSTRAINT racing the micro-batch revalidates on rebase)
            cur_cons = (prior or {}).get("constraints", {})
            if cur_cons != checked_cons:
                self._check_constraints(files, cur_cons)
                checked_cons = cur_cons
            stream_meta = {
                "mode": "stream_write",
                "stream_batch_id": batchId,
                "txn": {self.txn_app_id: batchId},
            }
            try:
                if append:
                    # delta form: the micro-batch commit is O(batch) at
                    # any table size — the contract that keeps a
                    # long-lived high-frequency sink's commit cost flat
                    log.publish(
                        None, schema_json, stream_meta, base, fresh,
                        add=files,
                    )
                else:
                    log.publish(
                        list(files), schema_json, stream_meta, base, fresh
                    )
                if self.auto_compact_small_files is not None:
                    self._auto_compact()
                return
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"stream batch {batchId} lost every commit race on {self.table}"
        )

    def _auto_compact(self) -> None:
        from pyspark.sql import SparkSession

        from modular_etl_data_platform_spark.operators.versioned import (
            VersionedTable,
        )

        spark = SparkSession.getActiveSession()
        if spark is None:  # compaction is hygiene, never worth failing a batch
            return
        VersionedTable(
            spark, self.table, stats_columns=self.stats_columns
        ).maybe_compact(max_small_files=self.auto_compact_small_files)
