"""Dump `.explain("formatted")` for bench queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/explain_dump.py <tag> <suffix> [sf_dir] [q1 q2 ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: the
whole bench HEADLINE). Each file holds the formatted physical plan of the
DataFrame the query returns. For roundtrip/streaming queries whose returned
frame is a pinned localCheckpoint scan, the interesting plans are the inner
stage frames — those are captured separately by the optimization notes —
but the returned-frame plan is still recorded so every headline query has a
checkable artifact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    from bench import HEADLINE
    from modular_etl_data_platform_spark.queries.catalog import QUERIES
    from modular_etl_data_platform_spark.session import get_spark

    if not names:
        names = HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
