"""Scalar helper functions (SURVEY §2.3 T5-T7, T9) — all native, no UDFs.

Everything here composes built-in Spark SQL functions so expressions stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# format_phone (T7): normalize any messy phone string to XXX-XXX-XXXX using
# the last 10 digits (reference format contract:
# config/silver/schema/README.md:97-99; raw data contains forms like
# '001-581-896-0013x3890' and '(518)349-5931x0341'). Extensions ("x1234")
# are stripped before digit extraction. Native composition — the reference
# treats this as its one custom function; a Python UDF is unnecessary.
FORMAT_PHONE_SQL = (
    "CASE WHEN length(regexp_replace(regexp_extract({col}, '^([^xX]*)', 1), '[^0-9]', '')) >= 10 "
    "THEN concat_ws('-', "
    " substr(right(regexp_replace(regexp_extract({col}, '^([^xX]*)', 1), '[^0-9]', ''), 10), 1, 3), "
    " substr(right(regexp_replace(regexp_extract({col}, '^([^xX]*)', 1), '[^0-9]', ''), 10), 4, 3), "
    " substr(right(regexp_replace(regexp_extract({col}, '^([^xX]*)', 1), '[^0-9]', ''), 10), 7, 4)) "
    "ELSE NULL END"
)


def format_phone(col: str | Column) -> Column:
    name = col if isinstance(col, str) else col._jc.toString()  # noqa: SLF001
    return F.expr(FORMAT_PHONE_SQL.format(col=name))


def null_safe_hash(cols: list[str], delimiter: str = "|") -> Column:
    """SCD2 change-detection hash (T6) with explicit null sentinels.

    ``concat_ws`` silently drops NULLs, so ``md5(concat_ws('|', a, b))``
    collides (NULL,'x') with ('x',NULL) — the reference formula
    (reference: config/gold/schema/README.md:137-147) has this hazard; we
    null-guard each column with a sentinel that also escapes the delimiter.
    """
    guarded = [
        F.coalesce(F.col(c).cast("string"), F.lit("\u0001NULL\u0001")) for c in cols
    ]
    return F.md5(F.concat_ws(delimiter, *guarded))


def date_key(col: str | Column) -> Column:
    """Derived yyyyMMdd integer date key (T5/J3)
    (reference: config/gold/schema/gold_fact_orders_schema.json:42-46)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def is_weekend(col: str | Column) -> Column:
    """Weekend flag (T9). Spark ``dayofweek`` is 1=Sunday..7=Saturday, so
    weekend == (1, 7). (The reference's column *description* claims
    1=Monday — reference: config/gold/schema/gold_dim_date_schema.json:67 —
    but its formula assumes Spark semantics; we follow the formula.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.dayofweek(c).isin(1, 7)
