"""A minimal, INDEPENDENT Delta Lake table reader.

Purpose: interop evidence for ``operators/delta_export.py``. delta-spark
is environment-blocked in this sandbox, so nothing has ever parsed an
exported table except the code that wrote it. This module is that
missing foreign reader: it is written against the PUBLIC Delta
transaction protocol (delta-io/delta PROTOCOL.md) and the public
RoaringFormatSpec (RoaringBitmap/RoaringFormatSpec), and it shares ZERO
code with the exporter — no imports from
``modular_etl_data_platform_spark``, no shared helpers, independent
byte-level parsers for the DV file framing and the roaring containers
(including the run-container form the exporter never writes). A byte
format the exporter got wrong will fail here unless both sides misread
the spec the same way.

Supported surface (what the protocol requires of a reader at the
feature set the exporter emits):

- ``_delta_log/<version>.json`` commit files, replayed in version
  order; ``add`` / ``remove`` actions reconciled by path (last action
  wins), ``metaData`` and ``protocol`` latest-wins.
- protocol gate: ``minReaderVersion`` <= 3 and every ``readerFeatures``
  entry within {deletionVectors, columnMapping} — anything newer is
  refused loudly, per the spec's forward-compatibility rule.
- column mapping mode ``name``: parquet columns resolve by each schema
  field's ``delta.columnMapping.physicalName`` metadata and surface
  under their logical names.
- deletion vectors, ``u`` (file) storage: RFC 1924 base85 UUID →
  ``deletion_vector_<uuid>.bin``, format-version byte, big-endian
  framed + CRC-32-checked bitmap, RoaringBitmapArray portable
  serialization over standard-format 32-bit roaring bitmaps (array,
  bitmap AND run containers).
- per-file ``stats`` ``numRecords`` cross-checked against the parquet
  footer when present.

Out of scope (the exporter never emits them; refused or ignored
explicitly): checkpoints, partitioned tables beyond empty
``partitionValues``, inline (``i``) / absolute-path (``p``) DVs, CDC
actions.
"""

from __future__ import annotations

import base64
import json
import os
import struct
import urllib.parse
import uuid as _uuid
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

#: protocol ceiling this reader implements
_MAX_READER_VERSION = 3
_KNOWN_READER_FEATURES = {"deletionVectors", "columnMapping"}

# RoaringFormatSpec constants (public interchange format)
_SERIAL_COOKIE = 12347  # run containers present
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
# delta-io RoaringBitmapArray portable magic
_PORTABLE_MAGIC = 1681511377


class DeltaReadError(RuntimeError):
    """The table violates the protocol or needs an unsupported feature."""


# ---------------------------------------------------------------------------
# log replay
# ---------------------------------------------------------------------------

def _commit_versions(log_dir: str, after: int | None) -> list[int]:
    """JSON commit versions to replay. Without a checkpoint the chain
    must be contiguous from 0; with one (``after`` = checkpoint
    version) only the contiguous suffix strictly above it is required —
    earlier commits may have been cleaned up, per the protocol's
    metadata-cleanup rule."""
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            v = int(stem)
            if after is None or v > after:
                out.append(v)
    out.sort()
    if after is None:
        if not out:
            raise DeltaReadError(f"no commit files in {log_dir}")
        if out[0] != 0 or out != list(range(0, out[-1] + 1)):
            raise DeltaReadError(f"non-contiguous commit versions {out}")
    elif out and out != list(range(after + 1, out[-1] + 1)):
        raise DeltaReadError(
            f"non-contiguous commits {out} after checkpoint {after}"
        )
    return out


def _load_checkpoint(log_dir: str) -> tuple[int, dict, dict, dict] | None:
    """Read ``_last_checkpoint`` and the classic (single-file)
    checkpoint parquet it names: (version, protocol, metadata, adds).
    One row per action; struct columns ``protocol`` / ``metaData`` /
    ``add`` / optionally ``remove`` and ``txn`` (the spec's classic
    form). Multi-part checkpoints are refused loudly (out of scope)."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as f:
        meta = json.load(f)
    if meta.get("parts") not in (None, 1):
        raise DeltaReadError(
            f"multi-part checkpoint ({meta['parts']} parts) not supported"
        )
    v = int(meta["version"])
    path = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    if not os.path.exists(path):
        raise DeltaReadError(f"_last_checkpoint names missing {path}")
    tbl = pq.read_table(path)
    names = set(tbl.column_names)
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    protocol: dict | None = None
    metadata: dict | None = None
    adds: dict[str, dict] = {}
    for i in range(tbl.num_rows):
        if "protocol" in names and cols["protocol"][i] is not None:
            protocol = {
                k: v2
                for k, v2 in cols["protocol"][i].items()
                if v2 is not None
            }
        if "metaData" in names and cols["metaData"][i] is not None:
            md = {
                k: v2
                for k, v2 in cols["metaData"][i].items()
                if v2 is not None
            }
            if "configuration" in md:
                md["configuration"] = dict(md["configuration"])
            metadata = md
        if "add" in names and cols["add"][i] is not None:
            add = {
                k: v2 for k, v2 in cols["add"][i].items() if v2 is not None
            }
            if "partitionValues" in add:
                add["partitionValues"] = dict(add["partitionValues"])
            adds[urllib.parse.unquote(add["path"])] = add
        if "remove" in names and cols.get("remove", [None])[i] is not None:
            # remove tombstones in a checkpoint are retention
            # bookkeeping; the file is NOT live
            rm = cols["remove"][i]
            adds.pop(urllib.parse.unquote(rm["path"]), None)
    if protocol is None or metadata is None:
        raise DeltaReadError("checkpoint lacks protocol/metaData row")
    return v, protocol, metadata, adds


def replay_log(table_path: str) -> dict:
    """Replay the log into the latest snapshot state — the newest
    classic checkpoint (when ``_last_checkpoint`` exists) plus the JSON
    commits above it, or every JSON commit from 0: ``{"protocol",
    "metadata", "adds": {path: add_action}}`` with paths URL-decoded
    and relative to the table root."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"{table_path} has no _delta_log")
    protocol: dict | None = None
    metadata: dict | None = None
    adds: dict[str, dict] = {}
    cp_version: int | None = None
    cp = _load_checkpoint(log_dir)
    if cp is not None:
        cp_version, protocol, metadata, adds = cp
    for v in _commit_versions(log_dir, cp_version):
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    add = action["add"]
                    adds[urllib.parse.unquote(add["path"])] = add
                elif "remove" in action:
                    adds.pop(
                        urllib.parse.unquote(action["remove"]["path"]), None
                    )
                # commitInfo / txn / cdc actions don't affect the snapshot
    if protocol is None or metadata is None:
        raise DeltaReadError("log has no protocol/metaData action")
    mrv = protocol.get("minReaderVersion", 1)
    if mrv > _MAX_READER_VERSION:
        raise DeltaReadError(f"minReaderVersion {mrv} > supported {_MAX_READER_VERSION}")
    unknown = set(protocol.get("readerFeatures", [])) - _KNOWN_READER_FEATURES
    if unknown:
        raise DeltaReadError(f"unsupported readerFeatures {sorted(unknown)}")
    fmt = metadata.get("format", {}).get("provider")
    if fmt != "parquet":
        raise DeltaReadError(f"unsupported format provider {fmt!r}")
    return {"protocol": protocol, "metadata": metadata, "adds": adds}


# ---------------------------------------------------------------------------
# schema: logical names, physical resolution, arrow types for null-fill
# ---------------------------------------------------------------------------

_SIMPLE_ARROW = {
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "string": pa.string(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "date": pa.date32(),
}


def _arrow_type(spark_type) -> pa.DataType:
    """Arrow type for a Spark schema-JSON type — used only to null-fill
    a column absent from an old file, so unknown/nested types may fall
    back to arrow's null type (concat promotes it against real data)."""
    if isinstance(spark_type, str):
        if spark_type in _SIMPLE_ARROW:
            return _SIMPLE_ARROW[spark_type]
        if spark_type.startswith("decimal("):
            p, s = spark_type[8:-1].split(",")
            return pa.decimal128(int(p), int(s))
        if spark_type in ("timestamp", "timestamp_ltz"):
            return pa.timestamp("us", tz="UTC")
        if spark_type == "timestamp_ntz":
            return pa.timestamp("us")
        return pa.null()
    if isinstance(spark_type, dict) and spark_type.get("type") == "array":
        return pa.list_(_arrow_type(spark_type["elementType"]))
    return pa.null()


def _columns(metadata: dict) -> list[dict]:
    """Top-level columns as ``{"name", "physical", "type"}`` — physical
    is the parquet column name per the column-mapping mode."""
    schema = json.loads(metadata["schemaString"])
    mode = metadata.get("configuration", {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode not in ("none", "name"):
        raise DeltaReadError(f"unsupported columnMapping.mode {mode!r}")
    cols = []
    for field in schema["fields"]:
        meta = field.get("metadata") or {}
        if mode == "name":
            physical = meta.get("delta.columnMapping.physicalName")
            if not physical:
                raise DeltaReadError(
                    f"columnMapping.mode=name but field {field['name']!r} "
                    "has no physicalName"
                )
        else:
            physical = field["name"]
        cols.append(
            {
                "name": field["name"],
                "physical": physical,
                "type": field.get("type"),
            }
        )
    return cols


# ---------------------------------------------------------------------------
# deletion vectors
# ---------------------------------------------------------------------------

def _read_u16s(buf: bytes, off: int, n: int) -> tuple:
    return struct.unpack_from(f"<{n}H", buf, off), off + 2 * n


def _parse_roaring32(buf: bytes, off: int) -> tuple[list[int], int]:
    """Parse ONE standard-format 32-bit roaring bitmap starting at
    ``off``; returns (sorted values, new offset). Implements all three
    container kinds and both cookie forms per RoaringFormatSpec."""
    (cookie,) = struct.unpack_from("<i", buf, off)
    off += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        runbits = buf[off : off + nbytes]
        off += nbytes
        has_run = [bool(runbits[i >> 3] & (1 << (i & 7))) for i in range(n)]
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, off)
        off += 4
        has_run = [False] * n
    else:
        raise DeltaReadError(f"bad roaring cookie {cookie}")
    descs = []
    for _ in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, off)
        off += 4
        descs.append((key, card_m1 + 1))
    # the offset header exists unless the run form has < threshold
    # containers; containers are contiguous in order, so it can be
    # skipped and the data read sequentially
    if not ((cookie & 0xFFFF) == _SERIAL_COOKIE and n < _NO_OFFSET_THRESHOLD):
        off += 4 * n
    values: list[int] = []
    for i, (key, card) in enumerate(descs):
        base = key << 16
        if has_run[i]:
            (nruns,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(nruns):
                start, length = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            vals, off = _read_u16s(buf, off, card)
            values.extend(base | v for v in vals)
        else:
            bits = buf[off : off + 8192]
            off += 8192
            for byte_ix, b in enumerate(bits):
                while b:
                    low = b & -b
                    values.append(base | (byte_ix << 3) | low.bit_length() - 1)
                    b ^= low
    return values, off


def _parse_bitmap_array(data: bytes) -> set[int]:
    """delta-io RoaringBitmapArray 'portable' serialization: LE magic,
    LE int64 bitmap count, then standard-format 32-bit bitmaps; bitmap
    ``i`` carries the low 32 bits of values whose high 32 bits are i."""
    magic, count = struct.unpack_from("<iq", data, 0)
    if magic != _PORTABLE_MAGIC:
        raise DeltaReadError(f"bad RoaringBitmapArray magic {magic}")
    off = 12
    out: set[int] = set()
    for i in range(count):
        vals, off = _parse_roaring32(data, off)
        out.update((i << 32) | v for v in vals)
    if off != len(data):
        raise DeltaReadError(
            f"trailing bytes in DV bitmap: consumed {off} of {len(data)}"
        )
    return out


def _dv_path(table_path: str, descriptor: dict) -> str:
    """Resolve a ``u``-storage descriptor to its file: the LAST 20
    characters of pathOrInlineDv are the RFC 1924 base85 of the UUID's
    16 bytes; any leading characters are a path prefix (the spec's
    optional random prefix)."""
    enc = descriptor["pathOrInlineDv"]
    prefix, b85 = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=base64.b85decode(b85))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def read_deletion_vector(table_path: str, descriptor: dict) -> set[int]:
    """Decode one ``deletionVector`` descriptor into the set of deleted
    row indexes. Verifies the format-version byte, the framed size
    against ``sizeInBytes``, the CRC-32 checksum, and ``cardinality``."""
    st = descriptor.get("storageType")
    if st != "u":
        raise DeltaReadError(f"unsupported DV storageType {st!r}")
    path = _dv_path(table_path, descriptor)
    with open(path, "rb") as f:
        raw = f.read()
    if raw[0:1] != b"\x01":
        raise DeltaReadError(f"unknown DV file format version {raw[0]}")
    off = descriptor["offset"]
    (size,) = struct.unpack_from(">i", raw, off)
    if size != descriptor["sizeInBytes"]:
        raise DeltaReadError(
            f"DV framed size {size} != descriptor sizeInBytes "
            f"{descriptor['sizeInBytes']}"
        )
    data = raw[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
    if zlib.crc32(data) != crc:
        raise DeltaReadError(f"DV checksum mismatch in {path}")
    values = _parse_bitmap_array(data)
    if len(values) != descriptor["cardinality"]:
        raise DeltaReadError(
            f"DV cardinality {len(values)} != descriptor "
            f"{descriptor['cardinality']}"
        )
    return values


# ---------------------------------------------------------------------------
# snapshot assembly
# ---------------------------------------------------------------------------

def iter_delta_file_tables(table_path: str):
    """Yield ``(relative_path, aligned_table)`` per LIVE file — the
    bounded-memory form of :func:`read_delta_table` (one file resident
    at a time): log replayed, protocol gated, column mapping resolved,
    deletion vectors applied, missing (later-added) columns
    null-filled. Reconciliation jobs should consume THIS and fold
    per-file aggregates instead of materializing the whole table."""
    state = replay_log(table_path)
    cols = _columns(state["metadata"])
    for rel in sorted(state["adds"]):
        add = state["adds"][rel]
        if add.get("partitionValues"):
            raise DeltaReadError("partitioned tables are out of scope")
        fpath = os.path.join(table_path, rel)
        tbl = pq.read_table(fpath)
        stats = add.get("stats")
        if stats:
            n_rec = json.loads(stats).get("numRecords")
            if n_rec is not None and n_rec != tbl.num_rows:
                raise DeltaReadError(
                    f"stats numRecords {n_rec} != parquet rows "
                    f"{tbl.num_rows} for {rel}"
                )
        if "deletionVector" in add:
            deleted = read_deletion_vector(table_path, add["deletionVector"])
            bad = [i for i in deleted if i >= tbl.num_rows]
            if bad:
                raise DeltaReadError(
                    f"DV row index {max(bad)} out of range for {rel}"
                )
            keep = [i for i in range(tbl.num_rows) if i not in deleted]
            tbl = tbl.take(pa.array(keep, pa.int64()))
        yield rel, _align_logical(tbl, cols)


def read_delta_table(table_path: str) -> pa.Table:
    """The live rowset of the Delta table at ``table_path`` as ONE
    arrow table under LOGICAL column names (see
    :func:`iter_delta_file_tables` for the bounded-memory form)."""
    chunks = [t for _, t in iter_delta_file_tables(table_path)]
    if not chunks:
        # an empty table still has the declared logical schema
        state = replay_log(table_path)
        cols = _columns(state["metadata"])
        fields = [
            pa.field(c["name"], _arrow_type(c["type"])) for c in cols
        ]
        return pa.schema(fields).empty_table()
    return pa.concat_tables(chunks, promote_options="permissive")


# ---------------------------------------------------------------------------
# change data feed (the public CDF read protocol)
# ---------------------------------------------------------------------------

def _align_logical(tbl: pa.Table, cols: list[dict], extra: list[str] = ()):
    """Project a physical-named file table onto logical column names,
    null-filling columns the file predates; ``extra`` columns (e.g.
    ``_change_type``) pass through under their own names."""
    arrays, fields = [], []
    names = set(tbl.column_names)
    for c in cols:
        if c["physical"] in names:
            arr = tbl.column(c["physical"])
            arrays.append(arr)
            fields.append(pa.field(c["name"], arr.type))
        else:
            t = _arrow_type(c["type"])
            arrays.append(pa.nulls(tbl.num_rows, type=t))
            fields.append(pa.field(c["name"], t))
    for name in extra:
        if name not in names:
            raise DeltaReadError(f"change-data file lacks column {name}")
        arr = tbl.column(name)
        arrays.append(arr)
        fields.append(pa.field(name, arr.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _stamp_cdf(tbl: pa.Table, version: int, ts_ms: int) -> pa.Table:
    n = tbl.num_rows
    return tbl.append_column(
        "_commit_version", pa.array([version] * n, pa.int64())
    ).append_column(
        "_commit_timestamp",
        pa.array([ts_ms * 1000] * n, pa.timestamp("us", tz="UTC")),
    )


def iter_change_feed(
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
):
    """Yield row-level change slices (one arrow table per change-data
    or added file) between two commit versions per the PUBLIC
    change-data-feed protocol: a commit carrying ``cdc`` actions is
    read EXCLUSIVELY from its ``_change_data`` files (recorded change
    data, ``_change_type`` stored in-file); a commit without cdc whose
    dataChange adds are its only data actions derives each added
    file's live rows as ``insert`` (the blind-append rule — deletion
    vectors applied first); dataChange=false commits (OPTIMIZE) emit
    nothing; a dataChange remove WITHOUT recorded cdc is refused
    loudly — the reader cannot row-classify a rewrite by itself.
    Slices carry logical columns + ``_change_type`` /
    ``_commit_version`` / ``_commit_timestamp`` (stamped from
    ``commitInfo``). One file resident at a time — the bounded-memory
    form; :func:`read_change_feed` concatenates."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"{table_path} has no _delta_log")
    avail = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            avail.append(int(stem))
    if not avail:
        raise DeltaReadError(f"no commit files in {log_dir}")
    avail.sort()
    end = avail[-1] if ending_version is None else ending_version
    missing = [
        v for v in range(starting_version, end + 1) if v not in set(avail)
    ]
    if missing:
        raise DeltaReadError(
            f"change-feed versions {missing} are not in the log "
            "(cleaned up?) — CDF retention follows log retention"
        )
    # metadata (schema + column mapping) active at each commit: seed
    # from the newest checkpoint BELOW the replay window when earlier
    # JSONs were cleaned up, then track metaData actions forward
    metadata: dict | None = None
    replay_from = avail[0]
    if avail[0] > 0:
        cp = _load_checkpoint(log_dir)
        if cp is None or cp[0] < avail[0] - 1:
            raise DeltaReadError(
                f"log starts at {avail[0]} without a covering "
                "checkpoint — cannot establish schema for the change feed"
            )
        metadata = cp[2]
    for v in range(replay_from, end + 1):
        adds, removes, cdcs = [], [], []
        ts_ms: int | None = None
        path = os.path.join(log_dir, f"{v:020d}.json")
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    metadata = action["metaData"]
                elif "add" in action:
                    adds.append(action["add"])
                elif "remove" in action:
                    removes.append(action["remove"])
                elif "cdc" in action:
                    cdcs.append(action["cdc"])
                elif "commitInfo" in action:
                    t = action["commitInfo"].get("timestamp")
                    if t is not None:
                        ts_ms = int(t)
        if v < starting_version:
            continue  # replayed only to track metadata
        if metadata is None:
            raise DeltaReadError(f"no metaData known at version {v}")
        if ts_ms is None:
            ts_ms = int(os.path.getmtime(path) * 1000)
        cols = _columns(metadata)
        if cdcs:
            # recorded change data wins; add/remove actions of the same
            # commit are IGNORED for CDF purposes (the protocol's rule)
            for cdc in cdcs:
                rel = urllib.parse.unquote(cdc["path"])
                tbl = pq.read_table(os.path.join(table_path, rel))
                yield _stamp_cdf(
                    _align_logical(tbl, cols, extra=["_change_type"]),
                    v,
                    ts_ms,
                )
            continue
        data_adds = [a for a in adds if a.get("dataChange")]
        data_removes = [r for r in removes if r.get("dataChange", True)]
        if not data_adds and not data_removes:
            continue  # OPTIMIZE / metadata-only commit: zero changes
        if data_removes:
            raise DeltaReadError(
                f"version {v} removes files with dataChange=true and "
                "records no cdc — the reader cannot row-classify a "
                "rewrite (table not CDF-enabled for this commit?)"
            )
        for add in data_adds:
            rel = urllib.parse.unquote(add["path"])
            tbl = pq.read_table(os.path.join(table_path, rel))
            if "deletionVector" in add:
                deleted = read_deletion_vector(
                    table_path, add["deletionVector"]
                )
                keep = [i for i in range(tbl.num_rows) if i not in deleted]
                tbl = tbl.take(pa.array(keep, pa.int64()))
            aligned = _align_logical(tbl, cols).append_column(
                "_change_type",
                pa.array(["insert"] * tbl.num_rows, pa.string()),
            )
            yield _stamp_cdf(aligned, v, ts_ms)


def read_change_feed(
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> pa.Table:
    """The change feed as ONE arrow table — see
    :func:`iter_change_feed` for semantics and the bounded-memory
    form."""
    chunks = list(
        iter_change_feed(table_path, starting_version, ending_version)
    )
    if not chunks:
        state = replay_log(table_path)
        fields = [
            pa.field(c["name"], _arrow_type(c["type"]))
            for c in _columns(state["metadata"])
        ] + [
            pa.field("_change_type", pa.string()),
            pa.field("_commit_version", pa.int64()),
            pa.field("_commit_timestamp", pa.timestamp("us", tz="UTC")),
        ]
        return pa.schema(fields).empty_table()
    return pa.concat_tables(chunks, promote_options="permissive")


def snapshot_info(table_path: str) -> dict:
    """Small diagnostic summary (file/DV counts, schema names, mode)."""
    state = replay_log(table_path)
    cols = _columns(state["metadata"])
    adds = state["adds"]
    return {
        "num_files": len(adds),
        "num_deletion_vectors": sum(
            1 for a in adds.values() if "deletionVector" in a
        ),
        "columns": [c["name"] for c in cols],
        "column_mapping_mode": state["metadata"]
        .get("configuration", {})
        .get("delta.columnMapping.mode", "none"),
        "protocol": state["protocol"],
    }


if __name__ == "__main__":
    import sys

    info = snapshot_info(sys.argv[1])
    print(json.dumps(info, indent=2))
    t = read_delta_table(sys.argv[1])
    print(f"live rows: {t.num_rows}")
