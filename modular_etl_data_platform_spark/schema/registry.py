"""Declarative table-config registry: JSON config -> Spark StructType + metadata.

Re-specifies (does not port) the reference's schema-loader surface
(reference: src/utils/schema_loader.py:18-302): a JSON file per table
declares columns/datatypes, primary keys, partitioning, source info,
per-column ``transformation`` expressions, data-quality rules and SCD
config. This implementation compiles the closed reference type set
(reference: src/utils/schema_loader.py:27-34,87-96) and extends it with
``double``, ``float``, ``binary`` and any DDL-expressible complex type
(``array<...>``, ``map<...>``, ``struct<...>``) for the large-scale
pipeline operators.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", re.IGNORECASE)


def parse_datatype(datatype: str) -> T.DataType:
    """Compile a declared datatype string to a Spark DataType.

    Primitive registry first, then ``decimal(p,s)``, then fall through to
    ``DataType.fromDDL`` so complex types (array/map/struct) work too.
    """
    dt = datatype.strip()
    low = dt.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    m = _DECIMAL_RE.match(low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    try:
        return T.DataType.fromDDL(dt)
    except Exception as exc:  # pragma: no cover - defensive
        raise ValueError(f"Unsupported datatype: {datatype!r}") from exc


@dataclass
class TableConfig:
    """Parsed table configuration with typed accessors."""

    raw: dict[str, Any]
    path: str | None = None

    # -- identity ---------------------------------------------------------
    @property
    def table_name(self) -> str:
        return self.raw["table_name"]

    @property
    def source_table(self) -> str | None:
        return self.raw.get("source_table")

    @property
    def load_type(self) -> str:
        return self.raw.get("load_type", "append")

    @property
    def primary_keys(self) -> list[str]:
        return list(self.raw.get("primary_keys", []))

    @property
    def partition_by(self) -> list[str]:
        return list(self.raw.get("partition_by", []))

    @property
    def incremental_column(self) -> str | None:
        return self.raw.get("incremental_column")

    # -- columns ----------------------------------------------------------
    @property
    def columns(self) -> list[dict[str, Any]]:
        return list(self.raw.get("columns", []))

    @property
    def metadata_columns(self) -> list[dict[str, Any]]:
        return list(self.raw.get("metadata_columns", []))

    def column_names(self, include_metadata: bool = False) -> list[str]:
        cols = [c["name"] for c in self.columns]
        if include_metadata:
            cols += [c["name"] for c in self.metadata_columns]
        return cols

    def required_columns(self) -> list[str]:
        return [c["name"] for c in self.columns if not c.get("nullable", True)]

    def transformations(self) -> dict[str, str]:
        """name -> SQL expression for columns that declare a transformation."""
        return {
            c["name"]: c["transformation"]
            for c in self.columns
            if c.get("transformation")
        }

    # -- schema compile ----------------------------------------------------
    def spark_schema(self, include_metadata: bool = False) -> T.StructType:
        cols = self.columns + (self.metadata_columns if include_metadata else [])
        return T.StructType(
            [
                T.StructField(
                    c["name"], parse_datatype(c["datatype"]), c.get("nullable", True)
                )
                for c in cols
            ]
        )

    # -- source info --------------------------------------------------------
    @property
    def source_info(self) -> dict[str, Any]:
        keys = (
            "source_system",
            "source_type",
            "file_format",
            "file_path",
            "delimiter",
            "header",
        )
        return {k: self.raw[k] for k in keys if k in self.raw}

    # -- rules / scd ---------------------------------------------------------
    @property
    def data_quality_rules(self) -> dict[str, Any]:
        return dict(self.raw.get("data_quality_rules", {}))

    @property
    def scd_config(self) -> dict[str, Any]:
        return dict(self.raw.get("scd_config", {}))


@dataclass
class SchemaRegistry:
    """Loads and caches table configs from a config directory tree."""

    config_dir: str | None = None
    _cache: dict[str, TableConfig] = field(default_factory=dict)

    def load(self, path: str | Path) -> TableConfig:
        p = Path(path)
        cfg = TableConfig(raw=json.loads(p.read_text()), path=str(p))
        self._cache[cfg.table_name] = cfg
        return cfg

    def register(self, raw: dict[str, Any]) -> TableConfig:
        cfg = TableConfig(raw=raw)
        self._cache[cfg.table_name] = cfg
        return cfg

    def get(self, table_name: str) -> TableConfig:
        if table_name not in self._cache and self.config_dir:
            for p in Path(self.config_dir).rglob("*.json"):
                try:
                    cfg = self.load(p)
                except (json.JSONDecodeError, KeyError):
                    continue
                if cfg.table_name == table_name:
                    return cfg
        return self._cache[table_name]

    def tables(self) -> list[str]:
        return sorted(self._cache)
