"""Incremental-processing watermark state (SURVEY §2.2 P3, §4).

The reference declares an ``incremental_column`` per silver table and
prescribes "use watermarking for idempotency" (reference:
config/silver/schema/README.md:265-268,329-332) but ships no state
mechanism. This is it: a tiny key-value table (table_name → high-water
mark) read by the driver before each incremental load.

Scale: the state table is O(#tables) rows — driver-side trivial; the
payoff is that ``col > watermark`` prunes partitions at the source scan.
"""

from __future__ import annotations

import json
import os
from typing import Any


class WatermarkStore:
    """File-backed watermark state (swap for a catalog table in prod)."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict[str, Any]:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def get(self, table: str) -> str | None:
        return self._load().get(table)

    def set(self, table: str, value: str) -> None:
        state = self._load()
        state[table] = value
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True, default=str)
        os.replace(tmp, self.path)


def incremental_filter(df, incremental_column: str, watermark: str | None):
    """Rows strictly newer than the stored mark (None → full load)."""
    from pyspark.sql import functions as F

    if watermark is None:
        return df
    return df.filter(F.col(incremental_column) > F.lit(watermark))


def advance_watermark(df, incremental_column: str) -> str | None:
    """Max value of the incremental column in the processed batch."""
    from pyspark.sql import functions as F

    row = df.agg(F.max(incremental_column).alias("m")).collect()[0]
    return None if row.m is None else str(row.m)
