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


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside <...> or (...)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_datatype(datatype: str) -> T.DataType:
    """Compile a declared datatype string to a Spark DataType.

    Primitive registry, ``decimal(p,s)``, and a session-free recursive
    parser for ``array<...>``/``map<...,...>``/``struct<...>``
    (``DataType.fromDDL`` needs a live SparkSession, which a config
    registry must not require), with ``fromDDL`` as the last resort.
    """
    dt = datatype.strip()
    low = dt.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    m = _DECIMAL_RE.match(low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if low.startswith("array<") and low.endswith(">"):
        return T.ArrayType(parse_datatype(dt[6:-1]))
    if low.startswith("map<") and low.endswith(">"):
        k, v = _split_top_level(dt[4:-1])
        return T.MapType(parse_datatype(k), parse_datatype(v))
    if low.startswith("struct<") and low.endswith(">"):
        fields = []
        for part in _split_top_level(dt[7:-1]):
            name, ftype = part.split(":", 1)
            fields.append(T.StructField(name.strip(), parse_datatype(ftype)))
        return T.StructType(fields)
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

    # -- reference dimensional dialect ---------------------------------------
    # The reference declares dimensional metadata both table-level
    # (business_key/surrogate_key/scd_config, e.g. reference:
    # config/gold/schema/gold_dim_customer_schema.json) and per column
    # (is_business_key/is_surrogate_key/scd_type/is_measure/
    # is_dimension_key/references/calculation, e.g.
    # gold_fact_orders_schema.json). These accessors read either form.

    @property
    def business_key(self) -> str | None:
        if "business_key" in self.raw:
            return self.raw["business_key"]
        for c in self.columns:
            if c.get("is_business_key"):
                return c["name"]
        return None

    @property
    def surrogate_key(self) -> str | None:
        if "surrogate_key" in self.raw:
            return self.raw["surrogate_key"]
        for c in self.columns:
            if c.get("is_surrogate_key"):
                return c["name"]
        return None

    def scd_columns(self) -> tuple[list[str], list[str]]:
        """(type2_columns, type1_columns) — per-column ``scd_type`` flags
        first, falling back to the table-level ``scd_config`` block."""
        t2 = [
            c["name"]
            for c in self.columns
            if str(c.get("scd_type", "")).lower() in ("2", "type2")
        ]
        t1 = [
            c["name"]
            for c in self.columns
            if str(c.get("scd_type", "")).lower() in ("1", "type1")
        ]
        if not t2 and not t1:
            scd = self.scd_config
            t2 = list(scd.get("type2_columns", []))
            t1 = list(scd.get("type1_columns", []))
        return t2, t1

    def measure_columns(self) -> list[dict[str, Any]]:
        """Fact measures: per-column ``is_measure`` (+ measure_type and
        optional calculation), plus the table-level ``measures`` list."""
        out = [
            {
                "name": c["name"],
                "measure_type": c.get("measure_type", "additive"),
                "calculation": c.get("calculation"),
            }
            for c in self.columns
            if c.get("is_measure")
        ]
        names = {m["name"] for m in out}
        for m in self.raw.get("measures", []):
            if isinstance(m, dict) and m.get("name") not in names:
                out.append(
                    {
                        "name": m["name"],
                        "measure_type": m.get("aggregation", "SUM").lower(),
                        "calculation": None,
                    }
                )
        return out

    def calculated_columns(self) -> dict[str, str]:
        """name -> calculation expression for ``is_calculated`` columns
        and the table-level ``calculated_measures`` list."""
        out = {
            c["name"]: c["calculation"]
            for c in self.columns
            if c.get("is_calculated") and c.get("calculation")
        }
        for m in self.raw.get("calculated_measures", []):
            if isinstance(m, dict) and m.get("calculation"):
                out.setdefault(m["name"], m["calculation"])
        return out

    def dimension_joins(self) -> list[dict[str, Any]]:
        """Dimension-key resolution specs: this engine's table-level
        ``dimension_joins`` list, else the reference's per-column
        ``references`` blocks on ``is_dimension_key`` columns."""
        if "dimension_joins" in self.raw:
            return list(self.raw["dimension_joins"])
        out = []
        for c in self.columns:
            ref = c.get("references")
            if c.get("is_dimension_key") and isinstance(ref, dict):
                out.append({"key_column": c["name"], **ref})
        return out


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

    def load_all(self) -> list[str]:
        """Load every config under ``config_dir`` into the cache."""
        if self.config_dir:
            for p in sorted(Path(self.config_dir).rglob("*.json")):
                try:
                    self.load(p)
                except (json.JSONDecodeError, KeyError):
                    continue
        return self.tables()

    def tables(self) -> list[str]:
        return sorted(self._cache)
