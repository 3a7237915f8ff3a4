"""Command-line entry points.

    python -m modular_etl_data_platform_spark pipeline --raw DIR --warehouse DIR
        Run the full config-driven medallion flow (bronze → silver → gold)
        using a config directory (default: configs/ecommerce).

    python -m modular_etl_data_platform_spark query NAME [--sf-dir DIR]
        Run one named catalog query and print its rows (first --limit).

    python -m modular_etl_data_platform_spark list
        List every registered query.

    python -m modular_etl_data_platform_spark sql "SELECT ..." [--sf-dir DIR]
        SQL passthrough over the testdata tables (registered as views).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="modular_etl_data_platform_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="run the medallion pipeline")
    p.add_argument("--raw", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--config-dir", default=None)

    q = sub.add_parser("query", help="run a named catalog query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true")

    sub.add_parser("list", help="list registered queries")

    s = sub.add_parser(
        "sql", help="SQL passthrough over the testdata views (and a warehouse)"
    )
    s.add_argument("statement")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument(
        "--warehouse",
        default=None,
        help="also register every table under this warehouse as a view",
    )
    s.add_argument("--limit", type=int, default=20)

    a = sub.add_parser("audit", help="run the Gold DQ suite over a warehouse")
    a.add_argument("--warehouse", required=True)
    a.add_argument("--config-dir", default=None)
    a.add_argument("--strict", action="store_true", help="exit 1 on violations")

    c = sub.add_parser(
        "corpus", help="run the corpus curation pipeline to training shards"
    )
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    c.add_argument("--out", required=True)
    c.add_argument("--min-quality", type=float, default=0.05)
    c.add_argument("--pack-capacity", type=int, default=512)

    args = ap.parse_args(argv)

    from modular_etl_data_platform_spark.queries.catalog import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        return 0

    from modular_etl_data_platform_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "pipeline":
        from modular_etl_data_platform_spark.pipeline.ecommerce import (
            CONFIG_DIR,
            run_pipeline,
        )

        metrics = run_pipeline(
            spark, args.raw, args.warehouse, config_dir=args.config_dir or CONFIG_DIR
        )
        print(json.dumps(metrics, indent=2, default=str))
        return 0

    if args.cmd == "query":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "sql":
        from modular_etl_data_platform_spark.session import load_tables, load_warehouse

        load_tables(spark, args.sf_dir)
        if args.warehouse:
            load_warehouse(spark, args.warehouse)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    if args.cmd == "audit":
        from modular_etl_data_platform_spark.pipeline.audit import (
            assert_clean,
            audit_warehouse,
        )
        from modular_etl_data_platform_spark.pipeline.ecommerce import CONFIG_DIR

        report = audit_warehouse(
            spark, args.warehouse, args.config_dir or CONFIG_DIR
        )
        print(json.dumps(report, indent=2))
        if args.strict:
            try:
                assert_clean(report)
            except AssertionError as exc:
                print(str(exc), file=sys.stderr)
                return 1
        return 0

    if args.cmd == "corpus":
        from modular_etl_data_platform_spark.pipeline.corpus import (
            CurationConfig,
            curate_corpus,
        )

        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        benchmark = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
        train = docs.filter("doc_id % 97 <> 0")
        cfg = CurationConfig(
            min_quality=args.min_quality, pack_capacity=args.pack_capacity
        )
        res = curate_corpus(spark, train, benchmark, out_dir=args.out, config=cfg)
        print(json.dumps(res["counts"], indent=2))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
