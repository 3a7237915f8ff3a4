"""Expression-based column transformations (SURVEY §2.2 P2, §2.3 T1-T8).

Silver-layer cleansing is declared per column as a SQL expression
(reference: config/silver/schema/README.md:169-174, e.g.
``initcap(trim(first_name))``, ``coalesce(upper(trim(country)), 'USA')``).
We compile each expression with ``F.expr`` so Catalyst folds it into the
scan projection — no Python in the hot path, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.schema.registry import TableConfig
from modular_etl_data_platform_spark.functions.scalar import FORMAT_PHONE_SQL


def compile_expression(expr: str) -> F.Column:
    """Compile a declared transformation expression to a Column.

    ``format_phone(col)`` — the reference's only non-native function
    (reference: config/silver/schema/README.md:97-99) — is rewritten into
    its native regexp composition so it stays JVM-side.
    """
    if "format_phone(" in expr:
        inner = expr[expr.index("format_phone(") + len("format_phone(") : expr.rindex(")")]
        expr = FORMAT_PHONE_SQL.format(col=inner)
    return F.expr(expr)


def apply_transformations(
    df: DataFrame,
    transformations: dict[str, str] | None = None,
    config: TableConfig | None = None,
) -> DataFrame:
    """Apply per-column SQL-expression transformations in one projection."""
    if transformations is None:
        if config is None:
            raise ValueError("pass transformations or config")
        transformations = config.transformations()
    if not transformations:
        return df
    return df.withColumns({name: compile_expression(e) for name, e in transformations.items()})


def conform_to_schema(
    df: DataFrame, config: TableConfig, extra_cols: list[str] | None = None
) -> DataFrame:
    """Project + cast to the declared column set/types (schema projection P1).

    Schema evolution contract: source columns NOT in the declared schema
    are dropped; declared columns missing from the source are null-filled
    at their declared type — so the target schema is byte-stable across
    upstream additions and (nullable) removals, and required-column
    enforcement stays where it belongs, in the validation rules.

    ``extra_cols`` are carried through untouched (e.g. the dedup ordering
    column, which is metadata rather than a declared column)."""
    fields = config.spark_schema(include_metadata=False).fields
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in df.columns
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in fields
    ]
    declared = {f.name for f in fields}
    for c in extra_cols or []:
        if c in df.columns and c not in declared:
            cols.append(F.col(c))
    return df.select(*cols)
