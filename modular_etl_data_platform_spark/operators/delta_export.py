"""Export a VersionedTable snapshot as a Delta Lake table.

The reference's declared storage is Delta (reference: requirements.txt:2
delta-spark; config/bronze/schema/README.md:83-87) — the engine's
versioned layer re-creates Delta's semantics on a plain-parquet commit
log, and THIS module closes the interop loop: any retained snapshot can
be materialized as a table every Delta reader (delta-spark, Trino,
DuckDB's delta extension, polars) opens natively.

Format per the PUBLIC Delta transaction-protocol spec
(delta-io/delta PROTOCOL.md): a ``_delta_log/`` directory whose first
commit file ``00000000000000000000.json`` holds newline-delimited
actions —

- ``protocol``: minReaderVersion 1 / minWriterVersion 2 for plain
  snapshots; snapshots carrying DELETION VECTORS or COLUMN MAPPING
  export at reader 3 / writer 7 with the corresponding
  ``readerFeatures``/``writerFeatures`` (the table-features form the
  protocol spec requires for those features),
- ``metaData``: table id, parquet format, the Spark ``schemaString``
  (the engine's commit log already stores schemas in exactly this
  form), empty ``partitionColumns`` (snapshot files are not
  hive-partitioned). Column-mapped snapshots add
  ``delta.columnMapping.mode=name`` + ``maxColumnId`` to the
  configuration and stamp every schema field with
  ``delta.columnMapping.id`` / ``physicalName`` metadata — the files
  already carry physical parquet names, which is precisely what
  mapping mode ``name`` instructs a Delta reader to resolve,
- one ``add`` per data file: URL-encoded RELATIVE path,
  ``partitionValues`` {}, size, modificationTime, ``dataChange`` true,
  a ``stats`` JSON string with ``numRecords`` (PHYSICAL rows) plus
  min/maxValues for the numeric stats columns the commit log recorded
  (keys are physical column names, the protocol's rule under column
  mapping), and — for vector-deleted files — a ``deletionVector``
  descriptor (``tightBounds`` false, per the spec),
- deletion vectors re-encode from the engine's (file_path, row_index)
  sidecar parquet into Delta's ON-DISK DV format: a ``u``-storage
  ``deletion_vector_<uuid>.bin`` per file (format version byte 1, then
  big-endian size + portable-serialized RoaringBitmapArray + CRC32),
  where the bitmap array is the spec's 64-bit splitting of row indexes
  into standard-format (RoaringFormatSpec) 32-bit roaring bitmaps.

Data files are HARD-LINKED into the destination (falling back to copy
across devices): zero bytes move for a same-filesystem export, and the
source snapshot stays immutable — the export is a new root, so later
writes to the versioned table never disturb the exported Delta table
(it is a SNAPSHOT export, not a live mirror; re-export for a newer
version).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import struct
import time
import urllib.parse
import uuid
import zlib

from modular_etl_data_platform_spark.operators.versioned import (
    VersionedTable,
    _commit_name,
    _strip_scheme_py,
)

#: delta-io RoaringBitmapArray "portable" serialization magic
_RBM_ARRAY_MAGIC = 1681511377
#: RoaringFormatSpec cookie for a bitmap without run containers
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
#: array-container cardinality ceiling (above it: bitmap container)
_ARRAY_CONTAINER_MAX = 4096


def _serialize_roaring32(values: list[int]) -> bytes:
    """ONE 32-bit roaring bitmap in the standard interchange format
    (RoaringFormatSpec, no-run form): cookie + container count,
    (key, cardinality-1) descriptors, per-container byte offsets, then
    container data — sorted-uint16 arrays up to 4096 values, 8 KiB
    bitsets beyond. This is the format every roaring implementation
    (and therefore every Delta DV reader) parses."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUNCONTAINER, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    off = 8 + 8 * len(keys)  # cookie+count, descriptors, offsets
    offsets = []
    for k in keys:
        offsets.append(off)
        card = len(containers[k])
        off += card * 2 if card <= _ARRAY_CONTAINER_MAX else 8192
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_CONTAINER_MAX:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bits
    return bytes(out)


def _serialize_dv_bitmap(row_indexes: list[int]) -> bytes:
    """Delta's RoaringBitmapArray portable serialization (all fields
    little-endian): magic, number of 32-bit bitmaps, then each bitmap
    in the standard format — bitmap ``i`` holds the low 32 bits of
    every row index whose high 32 bits equal ``i`` (the spec's 64-bit
    splitting; empty intermediate bitmaps serialize as zero-container
    bitmaps so indexing stays positional)."""
    by_high: dict[int, list[int]] = {}
    for ix in row_indexes:
        by_high.setdefault(ix >> 32, []).append(ix & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = bytearray()
    out += struct.pack("<iq", _RBM_ARRAY_MAGIC, n)
    for i in range(n):
        out += _serialize_roaring32(by_high.get(i, []))
    return bytes(out)


def _write_dv_file(dest: str, row_indexes: list[int]) -> dict:
    """Write ONE ``u``-storage deletion-vector file under ``dest`` and
    return its ``deletionVector`` descriptor. On-disk framing per the
    protocol's DV file storage format: 1-byte format version, then at
    ``offset`` a big-endian int32 data size, the serialized bitmap, and
    a big-endian CRC32 of the data. ``pathOrInlineDv`` is the RFC
    1924 base85 of the 16 UUID bytes (no random prefix), from which a
    reader derives ``deletion_vector_<uuid>.bin``."""
    data = _serialize_dv_bitmap(row_indexes)
    dv_uuid = uuid.uuid4()
    name = f"deletion_vector_{dv_uuid}.bin"
    with open(os.path.join(dest, name), "wb") as f:
        f.write(b"\x01")
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data)))
    return {
        "storageType": "u",
        "pathOrInlineDv": base64.b85encode(dv_uuid.bytes).decode("ascii"),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(row_indexes),
    }


def _dv_rows_by_sidecar(sidecars: set[str]) -> dict[str, dict[str, list[int]]]:
    """Load the engine's DV sidecar parquet(s) — (file_path, row_index)
    pairs, scheme-stripped paths — grouped per SIDECAR, then per data
    file. A file's current vector lives ONLY in the sidecar its own DV
    pointer names (sidecars are cumulative per file); an older sidecar
    kept live by another file's pointer can carry a STALE row set for
    this file, so flattening all sidecars per file double-counts —
    caught by the foreign-reader property fleet as a cardinality/bitmap
    mismatch (seed 79: two delete_where commits, one file still on the
    older sidecar). Sidecars are row-level indexes but bounded by the
    snapshot's deleted-row count; an export is a one-shot
    materialization tool, so a local pyarrow read (not a Spark job)
    keeps it dependency-light."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list[int]]] = {}
    for sc in sorted(sidecars):
        per: dict[str, list[int]] = {}
        tbl = pq.read_table(sc, columns=["file_path", "row_index"])
        for path, ix in zip(
            tbl.column("file_path").to_pylist(),
            tbl.column("row_index").to_pylist(),
        ):
            per.setdefault(path, []).append(ix)
        out[sc] = per
    return out


def _mapped_schema_string(schema_json: str, mapping: dict[str, str]) -> tuple[str, int]:
    """Annotate a Spark StructType JSON with Delta column-mapping
    metadata: every field gets a unique ``delta.columnMapping.id`` and
    its ``physicalName`` (the engine's mapping for top-level fields —
    those are the only ones the engine renames — identity for nested
    fields). Returns (schemaString, maxColumnId)."""
    schema = json.loads(schema_json)
    next_id = [0]

    def annotate_type(t):
        """Recurse into nested structs wherever they appear (struct
        fields, array elements, map keys/values) — the protocol
        requires EVERY nested field to carry an id/physicalName."""
        if not isinstance(t, dict):
            return t
        if t.get("type") == "struct":
            return {
                **t,
                "fields": [annotate(f, f["name"]) for f in t["fields"]],
            }
        if t.get("type") == "array":
            return {**t, "elementType": annotate_type(t["elementType"])}
        if t.get("type") == "map":
            return {
                **t,
                "keyType": annotate_type(t["keyType"]),
                "valueType": annotate_type(t["valueType"]),
            }
        return t

    def annotate(field: dict, physical: str) -> dict:
        next_id[0] += 1
        meta = dict(field.get("metadata") or {})
        meta["delta.columnMapping.id"] = next_id[0]
        meta["delta.columnMapping.physicalName"] = physical
        return {
            **field,
            "metadata": meta,
            "type": annotate_type(field.get("type")),
        }

    schema["fields"] = [
        annotate(f, mapping.get(f["name"], f["name"]))
        for f in schema["fields"]
    ]
    return json.dumps(schema), next_id[0]


def _protocol_action(dv_map, mapping, cdf: bool = False) -> dict:
    """Table features only where the snapshot needs them — maximal
    reader compatibility for plain snapshots. ``changeDataFeed`` is a
    WRITER feature (the public protocol: CDF reading is client-side
    derivation, so readers need no gate): legacy minWriterVersion 4
    when no table features are active, a writerFeatures entry when the
    commit already rides the features protocol."""
    features = []
    if dv_map:
        features.append("deletionVectors")
    if mapping is not None:
        features.append("columnMapping")
    if features:
        out = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": list(features),
            "writerFeatures": list(features),
        }
        if cdf:
            out["writerFeatures"] = sorted(
                set(out["writerFeatures"]) | {"changeDataFeed"}
            )
        return out
    if cdf:
        return {"minReaderVersion": 1, "minWriterVersion": 4}
    return {"minReaderVersion": 1, "minWriterVersion": 2}


def _link_and_add(
    dest: str,
    src: str,
    rel: str,
    stats_entry: dict | None,
    deleted_rows: list[int] | None,
    data_change: bool = True,
) -> dict:
    """Hard-link (or copy) ``src`` to ``dest/rel`` if not already
    there, and build its ``add`` action: URL-encoded relative path,
    size, numRecords + min/max stats, and a ``deletionVector``
    descriptor when ``deleted_rows`` is non-empty."""
    import pyarrow.parquet as pq

    out = os.path.join(dest, rel)
    if not os.path.exists(out):
        try:
            os.link(src, out)  # zero-copy on the same filesystem
        except OSError:
            shutil.copy2(src, out)
    file_stats: dict = {}
    mins, maxs = {}, {}
    for col, rec in (stats_entry or {}).items():
        # numeric [lo, hi] ranges map 1:1 onto Delta's min/maxValues
        # (keys are PHYSICAL names — the protocol's rule, and what
        # the engine's footer stats already record); the ts/date ISO
        # encodings and the empty-file marker stay engine-internal
        # (Delta readers treat absent stats as unprunable —
        # conservative, never wrong)
        if isinstance(rec, list):
            mins[col], maxs[col] = rec[0], rec[1]
    if mins:
        file_stats["minValues"], file_stats["maxValues"] = mins, maxs
    file_stats = {
        "numRecords": pq.ParquetFile(out).metadata.num_rows,
        **file_stats,
    }
    add: dict = {
        "path": urllib.parse.quote(rel),
        "partitionValues": {},
        "size": os.path.getsize(out),
        "modificationTime": int(os.path.getmtime(out) * 1000),
        "dataChange": data_change,
    }
    if deleted_rows:
        add["deletionVector"] = _write_dv_file(dest, sorted(set(deleted_rows)))
        # bounds may be loose once rows are vector-deleted
        file_stats["tightBounds"] = False
    add["stats"] = json.dumps(file_stats)
    return add


def export_delta_snapshot(
    table: VersionedTable, dest: str, version: int | None = None
) -> str:
    """Materialize ``table``'s snapshot at ``version`` (default head)
    under ``dest`` as a Delta table; returns ``dest``. Fails if ``dest``
    already holds files — an export never silently overwrites. For a
    LIVE mirror that follows later source versions, see
    :func:`export_delta_incremental`."""
    v = table.current_version() if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versions in {table.path}")
    state = table.log.resolve(v)
    dv_map = state.get("dv", {})
    mapping = state.get("column_mapping")
    if os.path.isdir(dest) and os.listdir(dest):
        raise FileExistsError(f"export destination {dest} is not empty")
    log_dir = os.path.join(dest, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)

    protocol = _protocol_action(dv_map, mapping)
    schema_string = state["schema"]
    configuration: dict[str, str] = {}
    if mapping is not None:
        schema_string, max_id = _mapped_schema_string(schema_string, mapping)
        configuration = {
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": str(max_id),
        }
    actions: list[dict] = [
        {"protocol": protocol},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": configuration,
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    dv_rows = (
        _dv_rows_by_sidecar(set(dv_map.values())) if dv_map else {}
    )
    stats = state.get("stats", {})
    for i, src in enumerate(sorted(state["files"])):
        rel = f"part-{i:05d}-{uuid.uuid4().hex}.parquet"
        deleted = (
            dv_rows.get(dv_map[src], {}).get(_strip_scheme_py(src), [])
            if src in dv_map
            else None
        )
        actions.append(
            {"add": _link_and_add(dest, src, rel, stats.get(src), deleted)}
        )
    commit = os.path.join(log_dir, f"{0:020d}.json")
    with open(commit, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return dest




# ---------------------------------------------------------------------------
# incremental export: a LIVE Delta mirror that follows source versions
# ---------------------------------------------------------------------------

_MIRROR_STATE = "_vt_mirror_state.json"
#: dataChange=false source commit modes (Delta's OPTIMIZE convention)
_NO_CHANGE_MODES = {"compact", "compact_where", "auto_compact"}


def _mapped_schema_string_stable(
    schema_json: str, mapping: dict[str, str], ids: dict[str, int]
) -> tuple[str, int]:
    """Like :func:`_mapped_schema_string` but with PERSISTENT ids: a
    (path-qualified) physical name keeps its ``delta.columnMapping.id``
    across metaData re-emissions — the protocol's column-identity rule
    (an id IS the column; reassigning one would alias old data to a
    new column). ``ids`` mutates; the mirror state persists it."""
    schema = json.loads(schema_json)

    def assign(key: str) -> int:
        if key not in ids:
            ids[key] = (max(ids.values()) + 1) if ids else 1
        return ids[key]

    def annotate_type(t, prefix):
        if not isinstance(t, dict):
            return t
        if t.get("type") == "struct":
            return {
                **t,
                "fields": [annotate(f, f["name"], prefix) for f in t["fields"]],
            }
        if t.get("type") == "array":
            return {
                **t,
                "elementType": annotate_type(t["elementType"], prefix + ".element"),
            }
        if t.get("type") == "map":
            return {
                **t,
                "keyType": annotate_type(t["keyType"], prefix + ".key"),
                "valueType": annotate_type(t["valueType"], prefix + ".value"),
            }
        return t

    def annotate(field: dict, physical: str, prefix: str) -> dict:
        key = f"{prefix}.{physical}" if prefix else physical
        meta = dict(field.get("metadata") or {})
        meta["delta.columnMapping.id"] = assign(key)
        meta["delta.columnMapping.physicalName"] = physical
        return {
            **field,
            "metadata": meta,
            "type": annotate_type(field.get("type"), key),
        }

    schema["fields"] = [
        annotate(f, mapping.get(f["name"], f["name"]), "")
        for f in schema["fields"]
    ]
    return json.dumps(schema), (max(ids.values()) if ids else 0)


def _atomic_json_dump(obj, path: str) -> None:
    """Write JSON via tmp + rename: a crash mid-write must never leave a
    TORN bookkeeping file (a torn ``_vt_mirror_state.json`` would brick
    the mirror's resume; a torn ``_last_checkpoint`` would brick every
    reader) — the log commits themselves are already safe to re-emit
    (deterministic transitions, existence-guarded links)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _emit_mirror_commit(
    dest: str,
    log_dir: str,
    mirror: dict,
    prev: dict,
    cur: dict,
    source_version: int,
    cdc_table=None,
) -> None:
    """ONE Delta commit mirroring the ``prev`` → ``cur`` source
    transition: protocol upgrade when features appear, metaData when
    schema/mapping changed, remove/add/re-add actions for the file
    diff, a free-form ``commitInfo`` recording the source version.
    Mutates ``mirror`` (delta_version, files map, protocol/schema
    memos).

    ``cdc_table`` (an Arrow table of PHYSICAL-named data columns plus
    ``_change_type``, possibly empty) records this transition's
    row-level changes as a real Delta ``_change_data`` parquet + a
    ``cdc`` action — the public CDF write shape. Per the protocol,
    a commit carrying ANY cdc action is read exclusively from its cdc
    files, so an empty slice (a rewrite whose every row survived
    unchanged) still writes one to keep the commit classified."""
    data_change = cur.get("mode", "") not in _NO_CHANGE_MODES
    prev_dv, cur_dv = prev.get("dv", {}), cur.get("dv", {})
    prev_set, cur_set = set(prev["files"]), set(cur["files"])
    files: dict = mirror["files"]
    delta_v = mirror["delta_version"] + 1
    actions: list[dict] = []

    cdf = bool(mirror.get("primary_keys"))
    proto = _protocol_action(cur_dv, cur.get("column_mapping"), cdf=cdf)
    if proto != mirror.get("protocol"):
        old = mirror.get("protocol") or {}
        merged = {
            "minReaderVersion": max(
                proto["minReaderVersion"], old.get("minReaderVersion", 1)
            ),
            "minWriterVersion": max(
                proto["minWriterVersion"], old.get("minWriterVersion", 1)
            ),
        }
        feats = sorted(
            set(proto.get("readerFeatures", []))
            | set(old.get("readerFeatures", []))
        )
        wfeats = sorted(
            set(proto.get("writerFeatures", []))
            | set(old.get("writerFeatures", []))
        )
        if feats or wfeats:
            merged["readerFeatures"] = feats
            merged["writerFeatures"] = wfeats
        if merged != old:  # floors are monotone: emit only upgrades
            actions.append({"protocol": merged})
            mirror["protocol"] = merged

    if (
        cur["schema"] != mirror.get("schema")
        or cur.get("column_mapping") != mirror.get("mapping", "__unset__")
    ):
        schema_string = cur["schema"]
        configuration: dict[str, str] = {}
        if cur.get("column_mapping") is not None:
            schema_string, max_id = _mapped_schema_string_stable(
                schema_string,
                cur["column_mapping"],
                mirror.setdefault("column_ids", {}),
            )
            configuration = {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(max_id),
            }
        if cdf:
            # the public CDF table property: downstream Delta readers
            # discover that this table records row-level changes
            configuration["delta.enableChangeDataFeed"] = "true"
        actions.append(
            {
                "metaData": {
                    "id": mirror.setdefault("table_id", str(uuid.uuid4())),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": configuration,
                    "createdTime": int(time.time() * 1000),
                }
            }
        )
        mirror["schema"] = cur["schema"]
        mirror["mapping"] = cur.get("column_mapping")

    removed = [f for f in prev["files"] if f not in cur_set]
    added = [f for f in cur["files"] if f not in prev_set]
    dv_changed = [
        f
        for f in cur["files"]
        if f in prev_set and prev_dv.get(f) != cur_dv.get(f)
    ]
    ts = int(cur.get("ts") or time.time() * 1000)
    for src in sorted(removed):
        rel = files.pop(src, None)
        if rel is None:
            raise RuntimeError(f"mirror state lost track of {src} — re-snapshot")
        actions.append(
            {
                "remove": {
                    "path": urllib.parse.quote(rel),
                    "deletionTimestamp": ts,
                    "dataChange": data_change,
                }
            }
        )
    touched = {cur_dv[f] for f in added + dv_changed if f in cur_dv}
    dv_rows = _dv_rows_by_sidecar(touched) if touched else {}
    stats = cur.get("stats", {})

    def deleted_rows(src):
        if src not in cur_dv:
            return None
        return dv_rows.get(cur_dv[src], {}).get(_strip_scheme_py(src), [])

    for i, src in enumerate(sorted(added)):
        rel = f"part-{delta_v:05d}-{i:05d}-{uuid.uuid4().hex}.parquet"
        files[src] = rel
        actions.append(
            {
                "add": _link_and_add(
                    dest, src, rel, stats.get(src), deleted_rows(src), data_change
                )
            }
        )
    for src in sorted(dv_changed):
        # Delta expresses a vector update as a re-add of the SAME path
        # carrying the new descriptor (or none, when a restore cleared it)
        actions.append(
            {
                "add": _link_and_add(
                    dest,
                    src,
                    files[src],
                    stats.get(src),
                    deleted_rows(src),
                    data_change,
                )
            }
        )
    if cdc_table is not None:
        import pyarrow.parquet as pq

        cdc_dir = os.path.join(dest, "_change_data")
        os.makedirs(cdc_dir, exist_ok=True)
        rel = f"_change_data/cdc-{delta_v:05d}-{uuid.uuid4().hex}.parquet"
        pq.write_table(cdc_table, os.path.join(dest, rel))
        actions.append(
            {
                "cdc": {
                    "path": urllib.parse.quote(rel),
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(dest, rel)),
                    "dataChange": False,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "operation": "VT-MIRROR",
                "sourceVersion": source_version,
                "sourceMode": cur.get("mode", ""),
                "timestamp": ts,
            }
        }
    )
    with open(os.path.join(log_dir, f"{delta_v:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    mirror["delta_version"] = delta_v


def _mirror_cdc_table(table: VersionedTable, v: int, pks: list[str]):
    """The row-level change slice of source version ``v`` as an Arrow
    table of PHYSICAL-named data columns + ``_change_type`` — or None
    when the commit needs no recorded CDC: dataChange=false commits
    emit nothing, and insert-only commits are derivable from their add
    actions (Delta's own design: blind appends write no change data;
    the CDF reader synthesizes the inserts).

    Classification reuses the SAME engine code the streaming change
    feed runs (_VersionedChangeFeedStreamReader.partitions/read), so
    the mirror's recorded CDC, the engine's table_changes and the
    stream can never disagree."""
    import pyarrow as pa

    from modular_etl_data_platform_spark.streaming.versioned_source import (
        _CFInsertPartition,
        _VersionedChangeFeedStreamReader,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    cur = table.log.resolve(v)
    if cur.get("mode", "") in _NO_CHANGE_MODES:
        return None
    schema = StructType.fromJson(json.loads(cur["schema"]))
    data_fields = [
        (f.name, f.dataType.json()) for f in schema.fields
    ] + [("_change_type", '"string"')]
    arrow_schema = pa.schema(
        [
            (name, _cdc_arrow_type(tj))
            for name, tj in data_fields
        ]
    )
    try:
        rec = json.loads(table.log.store.read(_commit_name(v)))
    except FileNotFoundError:
        rec = {}
    if rec.get("cdc") is not None:
        # the source commit RECORDED its change slice at write time
        # (enable_change_data_feed): forward those files' rows verbatim
        # — zero re-classification, zero reads of the version's data
        # files. The recorded files already carry physical column names
        # under any active mapping, exactly what the mirror writes.
        from modular_etl_data_platform_spark.streaming.versioned_source import (
            _read_parquet_aligned,
        )

        cmap = cur.get("column_mapping") or {}
        fields = [
            (f.name, f.dataType.json(), cmap.get(f.name, f.name))
            for f in schema.fields
        ]
        parts_rows = []
        for e in rec["cdc"]:
            batches = list(_read_parquet_aligned(e["path"], fields))
            t = pa.Table.from_batches(
                batches,
                schema=pa.schema(
                    [(n, _cdc_arrow_type(tj)) for n, tj, _ in fields]
                ),
            )
            parts_rows.append(
                t.append_column(
                    "_change_type",
                    pa.array([e["type"]] * t.num_rows, pa.string()),
                )
            )
        tbl = (
            pa.concat_tables(parts_rows)
            if parts_rows
            else arrow_schema.empty_table()
        )
        mapping = cur.get("column_mapping") or {}
        if mapping:
            tbl = tbl.rename_columns(
                [mapping.get(c, c) for c in tbl.column_names]
            )
        return tbl
    cdf_schema = StructType(
        list(schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
            StructField("_commit_timestamp", TimestampType()),
        ]
    )
    reader = _VersionedChangeFeedStreamReader(table.path, cdf_schema, 0, pks)
    parts = reader.partitions({"version": v - 1}, {"version": v})
    if all(isinstance(p, _CFInsertPartition) for p in parts):
        return None  # insert-only: readers derive from the add actions
    batches = [b for p in parts for b in reader.read(p)]
    if batches:
        tbl = pa.Table.from_batches(batches)
        tbl = tbl.drop_columns(["_commit_version", "_commit_timestamp"])
    else:
        tbl = arrow_schema.empty_table()
    # cdc files follow the DATA files' naming: physical columns under
    # column mapping, _change_type stored literally (the spec's rule)
    mapping = cur.get("column_mapping") or {}
    if mapping:
        tbl = tbl.rename_columns(
            [mapping.get(c, c) for c in tbl.column_names]
        )
    return tbl


def _cdc_arrow_type(type_json: str):
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_json_string

    return to_arrow_type(_parse_datatype_json_string(type_json))


def export_delta_incremental(
    table: VersionedTable,
    dest: str,
    to_version: int | None = None,
    primary_keys: list[str] | None = None,
) -> int:
    """Mirror ``table`` into a Delta table at ``dest`` INCREMENTALLY:
    the first call snapshots the current head as Delta commit 0; every
    later call emits ONE ``_delta_log`` commit per NEW source version —
    add actions for added files, remove actions for removed ones, and
    re-adds (same relative path, new ``deletionVector`` descriptor) for
    carried files whose vector changed, which is exactly how Delta
    itself expresses a DV update. Compaction commits emit their
    adds/removes with ``dataChange: false`` (Delta's OPTIMIZE
    convention), so a streaming reader of the MIRROR skips them the
    same way a reader of the source does. Schema / column-mapping
    changes re-emit ``metaData`` with STABLE column-mapping ids (a
    physical name keeps its id across commits — the state records the
    assignment). Returns the mirrored source version.

    Cost is O(changed files) per call — new data files hard-link,
    re-adds reuse already-exported bytes — where re-running
    :func:`export_delta_snapshot` for a new version is O(table).

    Bookkeeping lives in ``_vt_mirror_state.json`` at the mirror root:
    mirrored source version, Delta log head, the source-path →
    exported-relative-path map (a carried file must keep its exported
    name or earlier commits break), the protocol/schema memos and the
    column-id assignment. Delta readers never see it — the log directs
    readers to the referenced files; unreferenced extras are ignored.

    Not a general Delta writer: single-writer tool semantics (the
    mirror owns ``dest``; no OCC against other writers), and the
    source versions being drained must still be retained — a vacuumed
    gap raises (resolve fails loudly) rather than silently skipping
    history.

    ``primary_keys`` (set at mirror CREATION, carried in the state)
    turns on the real Delta CHANGE DATA FEED: the metaData declares
    ``delta.enableChangeDataFeed``, the protocol records the
    changeDataFeed writer requirement, and every update-class source
    version writes its row-level change slice — classified by the SAME
    engine code as the streaming feed — as a ``_change_data`` parquet
    + ``cdc`` action, so a downstream Delta consumer's
    ``readChangeFeed`` sees exactly what the engine's
    ``table_changes`` reports (insert-only commits write no cdc;
    readers derive their inserts from the add actions, Delta's own
    blind-append rule)."""
    head = table.current_version()
    if head is None:
        raise FileNotFoundError(f"no versions in {table.path}")
    v1 = head if to_version is None else to_version
    state_path = os.path.join(dest, _MIRROR_STATE)
    log_dir = os.path.join(dest, "_delta_log")

    if not os.path.exists(state_path):
        if os.path.isdir(dest) and os.listdir(dest):
            raise FileExistsError(
                f"{dest} is not empty and has no mirror state — refusing "
                "to adopt a foreign table"
            )
        os.makedirs(log_dir, exist_ok=True)
        mirror = {
            "source_path": table.path,
            "source_version": v1,
            "delta_version": -1,
            "files": {},
            "column_ids": {},
            **(
                {"primary_keys": list(primary_keys)}
                if primary_keys
                else {}
            ),
        }
        # the initial snapshot is the empty→head transition through the
        # SAME emitter as every later commit (stable ids from commit 0)
        _emit_mirror_commit(
            dest,
            log_dir,
            mirror,
            {"files": [], "dv": {}},
            table.log.resolve(v1),
            v1,
        )
        _atomic_json_dump(mirror, state_path)
        return v1

    with open(state_path) as f:
        mirror = json.load(f)
    if os.path.realpath(mirror["source_path"]) != table.path:
        raise ValueError(
            f"{dest} mirrors {mirror['source_path']}, not {table.path}"
        )
    pks = mirror.get("primary_keys")
    if primary_keys is not None and list(primary_keys) != (pks or []):
        raise ValueError(
            f"{dest} was created with primary_keys={pks}; the change "
            "feed contract is fixed at mirror creation"
        )
    v0 = mirror["source_version"]
    if v1 <= v0:
        return v0
    prev = table.log.resolve(v0)
    for v in range(v0 + 1, v1 + 1):
        cur = table.log.resolve(v)
        cdc = _mirror_cdc_table(table, v, pks) if pks else None
        _emit_mirror_commit(dest, log_dir, mirror, prev, cur, v, cdc)
        # every N mirror commits, land the public CLASSIC checkpoint +
        # _last_checkpoint — Delta's cadence; readers then need only
        # the checkpoint plus the JSON suffix, and older JSONs become
        # truncatable (mirror_log_cleanup)
        if mirror["delta_version"] % _MIRROR_CHECKPOINT_INTERVAL == 0:
            _write_classic_checkpoint(log_dir, mirror["delta_version"])
        prev = cur
    mirror["source_version"] = v1
    _atomic_json_dump(mirror, state_path)
    return v1


def mirror_log_cleanup(dest: str) -> int:
    """Delete the mirror's JSON commits at or below its newest classic
    checkpoint AND every superseded checkpoint parquet (Delta's
    metadata cleanup): readers reconstruct that state from the newest
    checkpoint, so both are redundant. Returns how many log files were
    removed. Time travel to
    pre-checkpoint versions is gone after cleanup — same trade as
    Delta's ``delta.logRetentionDuration`` expiry."""
    log_dir = os.path.join(dest, "_delta_log")
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return 0
    with open(lc) as f:
        cp_v = json.load(f)["version"]
    removed = 0
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            if int(name[:-5]) <= cp_v:
                os.remove(os.path.join(log_dir, name))
                removed += 1
        elif name.endswith(".checkpoint.parquet"):
            # superseded checkpoints are as redundant as covered JSONs —
            # each is O(table files) rows, so a long-lived mirror that
            # checkpoints every N commits would otherwise grow without
            # bound in exactly the artifact cleanup exists to bound
            stem = name[: -len(".checkpoint.parquet")]
            if stem.isdigit() and int(stem) < cp_v:
                os.remove(os.path.join(log_dir, name))
                removed += 1
    return removed


# ---------------------------------------------------------------------------
# mirror checkpoints: the public CLASSIC checkpoint (one parquet, one
# row per action) + _last_checkpoint pointer, every N mirror commits
# ---------------------------------------------------------------------------

#: mirror commits between classic checkpoints (Delta's own default)
_MIRROR_CHECKPOINT_INTERVAL = 10


def _replay_own_log(log_dir: str) -> tuple[dict, dict, dict[str, dict]]:
    """WRITER-side replay of the mirror's own emitted ``_delta_log`` —
    (protocol, metaData, adds by path) — so checkpoint content derives
    from what was actually written, independent of the foreign reader
    (which must stay code-disjoint to keep its evidentiary value).
    Starts from the newest checkpoint if one exists (the pre-truncation
    JSONs may already be gone)."""
    protocol: dict = {}
    metadata: dict = {}
    adds: dict[str, dict] = {}
    start = 0
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as f:
            cp_v = json.load(f)["version"]
        p, m, adds = _read_classic_checkpoint(
            os.path.join(log_dir, f"{cp_v:020d}.checkpoint.parquet")
        )
        protocol, metadata = p, m
        start = cp_v + 1
    names = sorted(
        n
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit() and int(n[:-5]) >= start
    )
    for name in names:
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "protocol" in act:
                    protocol = act["protocol"]
                elif "metaData" in act:
                    metadata = act["metaData"]
                elif "add" in act:
                    adds[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    adds.pop(act["remove"]["path"], None)
    return protocol, metadata, adds


def _read_classic_checkpoint(path: str) -> tuple[dict, dict, dict[str, dict]]:
    """Writer-side parse of a classic checkpoint parquet (for the
    replay above)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    protocol: dict = {}
    metadata: dict = {}
    adds: dict[str, dict] = {}
    n = tbl.num_rows
    for i in range(n):
        if cols.get("protocol", [None] * n)[i] is not None:
            protocol = {
                k: v for k, v in cols["protocol"][i].items() if v is not None
            }
        if cols.get("metaData", [None] * n)[i] is not None:
            md = dict(cols["metaData"][i])
            if md.get("configuration") is not None:
                md["configuration"] = dict(md["configuration"])
            metadata = {k: v for k, v in md.items() if v is not None}
        if cols.get("add", [None] * n)[i] is not None:
            add = {
                k: v for k, v in cols["add"][i].items() if v is not None
            }
            if "partitionValues" in add:
                add["partitionValues"] = dict(add["partitionValues"])
            if add.get("deletionVector") is not None:
                add["deletionVector"] = dict(add["deletionVector"])
            adds[add["path"]] = add
    return protocol, metadata, adds


def _write_classic_checkpoint(log_dir: str, version: int) -> str:
    """Write the PUBLIC classic checkpoint for ``version``: ONE parquet
    file, one row per live action, nullable struct columns
    ``protocol`` / ``metaData`` / ``add`` (remove tombstones are
    omitted — they exist for vacuum-retention bookkeeping, which the
    single-writer mirror doesn't need), plus the ``_last_checkpoint``
    pointer. After this lands, the JSON commits at or below ``version``
    are REDUNDANT for readers — Delta's metadata-cleanup contract — so
    a mirror's log can be truncated without breaking its consumers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    protocol, metadata, adds = _replay_own_log(log_dir)

    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", dv_t),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    rows_proto: list = [protocol]
    rows_meta: list = [None]
    rows_add: list = [None]
    md = dict(metadata)
    md["format"] = {"provider": md.get("format", {}).get("provider", "parquet")}
    md["partitionColumns"] = md.get("partitionColumns", [])
    md["configuration"] = list(md.get("configuration", {}).items())
    rows_proto.append(None)
    rows_meta.append(md)
    rows_add.append(None)
    for path in sorted(adds):
        a = dict(adds[path])
        a["partitionValues"] = list(a.get("partitionValues", {}).items())
        a.setdefault("deletionVector", None)
        rows_proto.append(None)
        rows_meta.append(None)
        rows_add.append(a)
    tbl = pa.table(
        {
            "protocol": pa.array(rows_proto, proto_t),
            "metaData": pa.array(rows_meta, meta_t),
            "add": pa.array(rows_add, add_t),
        }
    )
    out = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    pq.write_table(tbl, out)
    _atomic_json_dump(
        {"version": version, "size": tbl.num_rows},
        os.path.join(log_dir, "_last_checkpoint"),
    )
    return out


def mirror_vacuum(dest: str, dry_run: bool = False) -> list[str]:
    """Delete the mirror's data and deletion-vector files no SURVIVING
    log entry references (Delta's VACUUM, single-writer form): a file
    removed by a mirrored source version stays on disk so retained
    commits can still time-travel to it — once the covering JSONs are
    cleaned up (:func:`mirror_log_cleanup`) nothing can reference it
    and it is reclaimable. The referenced set is every ``add`` in the
    newest checkpoint AND in every surviving JSON commit (any retained
    version must stay readable), plus their DV files. Returns the
    deleted (or, with ``dry_run``, deletable) paths."""
    log_dir = os.path.join(dest, "_delta_log")
    referenced: set[str] = set()
    dv_referenced: set[str] = set()

    def note_add(add: dict) -> None:
        referenced.add(urllib.parse.unquote(add["path"]))
        dv = add.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            import base64
            import uuid as _uuid

            enc = dv["pathOrInlineDv"]
            u = _uuid.UUID(bytes=base64.b85decode(enc[-20:]))
            dv_referenced.add(f"deletion_vector_{u}.bin")

    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as f:
            cp_v = json.load(f)["version"]
        _p, _m, adds = _read_classic_checkpoint(
            os.path.join(log_dir, f"{cp_v:020d}.checkpoint.parquet")
        )
        for add in adds.values():
            note_add(add)
    cdc_referenced: set[str] = set()
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            with open(os.path.join(log_dir, name)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        act = json.loads(line)
                        if "add" in act:
                            note_add(act["add"])
                        elif "cdc" in act:
                            # change-data files are referenced only by
                            # their commit's cdc action (the protocol
                            # never checkpoints cdc), so they live
                            # exactly as long as their JSON survives
                            cdc_referenced.add(
                                urllib.parse.unquote(act["cdc"]["path"])
                            )
    doomed: list[str] = []
    for name in sorted(os.listdir(dest)):
        full = os.path.join(dest, name)
        if not os.path.isfile(full):
            continue
        if name.endswith(".parquet") and name not in referenced:
            doomed.append(full)
        elif (
            name.startswith("deletion_vector_")
            and name.endswith(".bin")
            and name not in dv_referenced
        ):
            doomed.append(full)
    cdc_dir = os.path.join(dest, "_change_data")
    if os.path.isdir(cdc_dir):
        for name in sorted(os.listdir(cdc_dir)):
            rel = f"_change_data/{name}"
            full = os.path.join(dest, rel)
            if os.path.isfile(full) and rel not in cdc_referenced:
                # the covering JSON was cleaned up: nothing can read
                # this change slice any more (Delta's CDF retention
                # follows log retention)
                doomed.append(full)
    if not dry_run:
        for p in doomed:
            os.remove(p)
    return doomed
