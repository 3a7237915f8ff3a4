"""Physical-plan inspection utilities (SURVEY §4).

The engine adds NO custom Catalyst rules — §4's conclusion is that
Catalyst + AQE already provide every optimization the reference
prescribes. What the engine does add is *evidence*: these helpers turn a
DataFrame's physical plan into a checkable summary so tests
(tests/test_plans.py), the CLI (`query --explain`) and ad-hoc tuning can
assert the plan properties SCALE.md claims — pushdown reached the scan,
dims broadcast, shuffles bounded, no accidental cartesian blowups.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (``df.explain`` only prints)."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Grep-level summary of the physical plan: counts of the operators
    that dominate cost at scale, plus what reached the parquet scans."""
    p = explain_formatted(df)
    simple = explain_formatted(df, "simple")
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
        "broadcasts": p.count("BroadcastExchange"),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "nested_loop_joins": p.count("BroadcastNestedLoopJoin")
        + p.count("CartesianProduct"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", p),
        # the formatted mode drops the codegen markers; count them in
        # the simple-mode tree (each "*(n)" prefix is one fused region)
        "whole_stage_codegen": len(set(re.findall(r"\*\((\d+)\)", simple))),
    }


def assert_distributed(df: DataFrame) -> None:
    """Raise if the plan contains an all-pairs operator (CartesianProduct
    or an unbroadcast nested loop) — the CI guard form of the SCALE.md
    rule that candidate generation must be bucket-local."""
    s = plan_summary(df)
    if s["nested_loop_joins"]:
        raise AssertionError(
            f"plan contains {s['nested_loop_joins']} nested-loop/cartesian join(s):\n"
            + explain_formatted(df, "simple")
        )
