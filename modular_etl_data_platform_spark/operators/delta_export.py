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

- ``protocol``: minReaderVersion 1 / minWriterVersion 2 (the baseline
  feature set; nothing this export writes needs more),
- ``metaData``: table id, parquet format, the Spark ``schemaString``
  (the engine's commit log already stores schemas in exactly this
  form), empty ``partitionColumns`` (snapshot files are not
  hive-partitioned),
- one ``add`` per data file: URL-encoded RELATIVE path,
  ``partitionValues`` {}, size, modificationTime, ``dataChange`` true,
  and a ``stats`` JSON string with ``numRecords`` plus min/maxValues
  for the numeric stats columns the commit log recorded (the same
  data-skipping statistics Delta itself would collect).

Data files are HARD-LINKED into the destination (falling back to copy
across devices): zero bytes move for a same-filesystem export, and the
source snapshot stays immutable — the export is a new root, so later
writes to the versioned table never disturb the exported Delta table
(it is a SNAPSHOT export, not a live mirror; re-export for a newer
version).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid

from modular_etl_data_platform_spark.operators.versioned import (
    VersionedTable,
)


def export_delta_snapshot(
    table: VersionedTable, dest: str, version: int | None = None
) -> str:
    """Materialize ``table``'s snapshot at ``version`` (default head)
    under ``dest`` as a Delta table; returns ``dest``. Fails if ``dest``
    already holds files — an export never silently overwrites."""
    v = table.current_version() if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versions in {table.path}")
    state = table.log.resolve(v)
    if state.get("dv"):
        # hard-linked files would RESURRECT vector-deleted rows, and
        # Delta protocol 1/2 (this export's target) cannot express
        # deletion vectors — materialize first, then export
        raise ValueError(
            f"snapshot v{v} of {table.path} carries deletion vectors; "
            "run compact()/compact_where() to materialize them before "
            "exporting (protocol-1/2 Delta cannot express DVs)"
        )
    if state.get("column_mapping"):
        # the files carry PHYSICAL column names; a protocol-1/2 Delta
        # log (no columnMapping metadata) would read them as missing
        # columns — rewrite to identity naming first
        raise ValueError(
            f"snapshot v{v} of {table.path} uses column mapping "
            "(renamed/dropped columns); this export targets protocol-1/2 "
            "Delta, which cannot express it — export a pre-mapping "
            "version, or copy out via read().write.parquet(...)"
        )
    if os.path.isdir(dest) and os.listdir(dest):
        raise FileExistsError(f"export destination {dest} is not empty")
    log_dir = os.path.join(dest, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)

    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": state["schema"],
                "partitionColumns": [],
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    stats = state.get("stats", {})
    for i, src in enumerate(sorted(state["files"])):
        rel = f"part-{i:05d}-{uuid.uuid4().hex}.parquet"
        out = os.path.join(dest, rel)
        try:
            os.link(src, out)  # zero-copy on the same filesystem
        except OSError:
            shutil.copy2(src, out)
        entry = stats.get(src) or {}
        file_stats: dict = {}
        mins, maxs = {}, {}
        for col, rec in entry.items():
            # numeric [lo, hi] ranges map 1:1 onto Delta's min/maxValues;
            # the ts/date ISO encodings and the empty-file marker stay
            # engine-internal (Delta readers treat absent stats as
            # unprunable — conservative, never wrong)
            if isinstance(rec, list):
                mins[col], maxs[col] = rec[0], rec[1]
        if mins:
            file_stats["minValues"], file_stats["maxValues"] = mins, maxs
        import pyarrow.parquet as pq

        file_stats = {
            "numRecords": pq.ParquetFile(out).metadata.num_rows,
            **file_stats,
        }
        actions.append(
            {
                "add": {
                    "path": urllib.parse.quote(rel),
                    "partitionValues": {},
                    "size": os.path.getsize(out),
                    "modificationTime": int(os.path.getmtime(out) * 1000),
                    "dataChange": True,
                    "stats": json.dumps(file_stats),
                }
            }
        )
    commit = os.path.join(log_dir, f"{0:020d}.json")
    with open(commit, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return dest
