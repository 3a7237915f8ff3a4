"""Declarative data-quality validation engine (SURVEY §2.9 C3, §2.2 P4-P7,
§2.5 A6/A7, §2.1 S10).

Compiles the reference's ``data_quality_rules`` config dialect
(reference: config/silver/schema/README.md:139-157; e.g.
silver_orders_schema.json:138-165) into Spark Column predicates:

- ``null_checks``: required columns IS NOT NULL (P4)
- ``value_constraints``: set membership (P5) or comparison string (P6)
- ``format_validations``: regex ``rlike`` (P7)
- ``uniqueness_checks``: PK duplicate detection — aggregation-based (A6)
- ``referential_integrity``: FK anti-join orphan detection (J5)

Severity levels follow the reference contract
(reference: config/silver/schema/README.md:141-157): ``error`` rows are
quarantined, ``warning`` rows pass with a flag, ``info`` is metric-only.

Scale: all row-level rules evaluate in ONE projection pass (no per-rule
jobs); uniqueness adds one aggregation shuffle; each RI rule is a
broadcast anti-join against the distinct parent keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMPARISON_OPS = ("<=", ">=", "!=", "<>", "<", ">", "=")


@dataclass
class Rule:
    name: str
    column: str
    kind: str  # null_check | value_constraint | format_validation
    predicate: F.Column  # True == row PASSES
    severity: str = "error"


@dataclass
class RuleSet:
    rules: list[Rule] = field(default_factory=list)
    uniqueness: list[list[str]] = field(default_factory=list)
    referential: dict[str, dict[str, str]] = field(default_factory=dict)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_config(cls, dq: dict[str, Any], severities: dict[str, str] | None = None) -> "RuleSet":
        # per-rule severity overrides: config-declared first, caller wins
        severities = {**dq.get("severities", {}), **(severities or {})}
        rs = cls()
        for col in dq.get("null_checks", []):
            rs.rules.append(
                Rule(
                    name=f"null_check:{col}",
                    column=col,
                    kind="null_check",
                    predicate=F.col(col).isNotNull(),
                    severity=severities.get(f"null_check:{col}", "error"),
                )
            )
        for col, constraint in dq.get("value_constraints", {}).items():
            if isinstance(constraint, list):
                pred = F.col(col).isin(constraint)
            else:
                text = str(constraint).strip()
                for op in _COMPARISON_OPS:
                    if text.startswith(op):
                        pred = F.expr(f"`{col}` {text}")
                        break
                else:
                    raise ValueError(f"unparseable value constraint: {constraint!r}")
            # NULL never *fails* a value constraint (that's the null check's job)
            rs.rules.append(
                Rule(
                    name=f"value_constraint:{col}",
                    column=col,
                    kind="value_constraint",
                    predicate=F.col(col).isNull() | pred,
                    severity=severities.get(f"value_constraint:{col}", "error"),
                )
            )
        for col, pattern in dq.get("format_validations", {}).items():
            rs.rules.append(
                Rule(
                    name=f"format_validation:{col}",
                    column=col,
                    kind="format_validation",
                    predicate=F.col(col).isNull() | F.col(col).rlike(pattern),
                    severity=severities.get(f"format_validation:{col}", "warning"),
                )
            )
        uniq = dq.get("uniqueness_checks", [])
        if uniq:
            # reference dialect: flat list = each column independently unique;
            # nested list = composite key
            if all(isinstance(u, str) for u in uniq) and len(uniq) > 1 and dq.get("composite_unique"):
                rs.uniqueness.append(list(uniq))
            else:
                for u in uniq:
                    rs.uniqueness.append([u] if isinstance(u, str) else list(u))
        rs.referential = dict(dq.get("referential_integrity", {}))
        return rs

    # -- row-level evaluation ------------------------------------------------
    def with_flags(self, df: DataFrame, flag_prefix: str = "__dq_") -> DataFrame:
        """One projection adding a boolean pass-flag per rule."""
        return df.withColumns(
            {f"{flag_prefix}{r.name}": r.predicate for r in self.rules}
        )

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(valid, quarantined): rows failing any error-severity rule are
        quarantined with the list of failed rules attached (S10)."""
        flagged = self.with_flags(df)
        error_rules = [r for r in self.rules if r.severity == "error"]
        if not error_rules:
            return df, df.limit(0).withColumn("failed_rules", F.array().cast("array<string>"))
        fail_any = None
        failed_names = []
        for r in error_rules:
            flag = F.col(f"__dq_{r.name}")
            failed_names.append(F.when(~flag, F.lit(r.name)))
            fail_any = (~flag) if fail_any is None else (fail_any | (~flag))
        failed_arr = F.array_compact(F.array(*failed_names)).alias("failed_rules")
        drop = [f"__dq_{r.name}" for r in self.rules]
        valid = flagged.filter(~fail_any).drop(*drop)
        quarantined = flagged.filter(fail_any).select(*df.columns, failed_arr)
        return valid, quarantined

    # -- metrics (A7) ---------------------------------------------------------
    def metrics(self, df: DataFrame) -> DataFrame:
        """Long-format per-rule fail counts in a single aggregation pass."""
        flagged = self.with_flags(df)
        aggs = [
            F.sum(F.when(~F.col(f"__dq_{r.name}"), 1).otherwise(0)).alias(r.name)
            for r in self.rules
        ] + [F.count(F.lit(1)).alias("total_rows")]
        wide = flagged.agg(*aggs)
        stack_expr = ", ".join(f"'{r.name}', `{r.name}`" for r in self.rules)
        return wide.selectExpr(
            f"stack({len(self.rules)}, {stack_expr}) as (rule, failed_count)",
            "total_rows",
        )

    def metrics_wide(self, df: DataFrame, alias_map: dict[str, str] | None = None) -> DataFrame:
        """Single-row wide metrics; aliases per ``alias_map``."""
        alias_map = alias_map or {}
        flagged = self.with_flags(df)
        aggs = [
            F.sum(F.when(~F.col(f"__dq_{r.name}"), 1).otherwise(0)).alias(
                alias_map.get(r.name, r.name)
            )
            for r in self.rules
        ] + [F.count(F.lit(1)).alias("total_rows")]
        return flagged.agg(*aggs)

    # -- table-level checks -----------------------------------------------------
    def uniqueness_violations(self, df: DataFrame) -> dict[str, DataFrame]:
        from modular_etl_data_platform_spark.operators.dedup import duplicate_keys

        return {
            "+".join(keyset): duplicate_keys(df, keyset) for keyset in self.uniqueness
        }

    def ri_violations(
        self, df: DataFrame, parents: dict[str, DataFrame]
    ) -> dict[str, DataFrame]:
        """Orphans per declared FK; ``parents`` maps reference_table name →
        DataFrame."""
        from modular_etl_data_platform_spark.operators.joins import ri_orphans

        out = {}
        for fk, ref in self.referential.items():
            parent = parents[ref["reference_table"]]
            out[fk] = ri_orphans(df, parent, fk=fk, pk=ref["reference_column"])
        return out
