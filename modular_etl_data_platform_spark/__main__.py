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
    p.add_argument(
        "--storage",
        choices=("parquet", "versioned"),
        default="parquet",
        help="layer storage: plain parquet or versioned manifest-log tables",
    )

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
    a.add_argument(
        "--pin",
        action="append",
        default=[],
        metavar="TABLE=VERSION",
        help="audit a versioned table at a pinned snapshot (repeatable)",
    )

    c = sub.add_parser(
        "corpus", help="run the corpus curation pipeline to training shards"
    )
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    c.add_argument("--out", required=True)
    c.add_argument("--min-quality", type=float, default=0.05)
    c.add_argument("--pack-capacity", type=int, default=512)
    c.add_argument("--pack-shards", type=int, default=None)
    c.add_argument(
        "--line-dedup-df",
        type=int,
        default=None,
        help="drop segments appearing in >= N distinct docs (off by default)",
    )

    ex = sub.add_parser(
        "expect",
        help="run a JSON expectation suite (GE dialect) against a table/view",
    )
    ex.add_argument("suite", help="path to a JSON expectation-suite file")
    ex.add_argument("table", help="testdata view or warehouse table name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ex.add_argument("--warehouse", default=None)
    ex.add_argument("--strict", action="store_true", help="exit 1 on failures")

    ai = sub.add_parser(
        "ann-index", help="materialize a partition-pruned IVF embedding index"
    )
    ai.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ai.add_argument("--out", required=True)
    ai.add_argument(
        "--kmeans", type=int, default=None,
        help="learn K cells with deterministic k-means (default: use the label column)",
    )
    ai.add_argument("--iters", type=int, default=5)
    ai.add_argument("--dim", type=int, default=64)

    aq = sub.add_parser("ann-query", help="top-k probe against an ann-index")
    aq.add_argument("--index", required=True)
    aq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    aq.add_argument("--vec-id", type=int, required=True)
    aq.add_argument("--k", type=int, default=5)
    aq.add_argument("--probes", type=int, default=1)
    aq.add_argument("--dim", type=int, default=64)

    vt = sub.add_parser(
        "vt",
        help=(
            "versioned-table ops: history/read/restore/compact/"
            "delete-where/vacuum/export-delta/enable-cdf/change-feed"
        ),
    )
    vt.add_argument("path", help="versioned table root")
    vt.add_argument(
        "action",
        choices=[
            "history", "detail", "read", "restore", "compact", "compact-where",
            "delete-where", "update-where", "vacuum", "export-delta",
            "mirror-delta",
            "convert", "clone", "rename-column", "drop-column",
            "merge", "add-constraint", "drop-constraint",
            "enable-cdf", "disable-cdf", "change-feed",
        ],
    )
    vt.add_argument(
        "--primary-keys",
        default=None,
        help=(
            "for enable-cdf (required) / change-feed (derive fallback): "
            "comma-sep row-identity columns"
        ),
    )
    vt.add_argument(
        "--since-version",
        type=int,
        default=None,
        help="for change-feed: emit per-commit changes AFTER this version",
    )
    vt.add_argument(
        "--stats-columns",
        default=None,
        help="for convert: comma-sep columns to record footer stats for",
    )
    vt.add_argument("--version", type=int, default=None, help="for read/restore")
    vt.add_argument("--keep-last", type=int, default=1, help="for vacuum")
    vt.add_argument(
        "--retention-hours",
        type=float,
        default=None,
        help="for vacuum: ALSO keep every version committed this recently",
    )
    vt.add_argument(
        "--dry-run",
        action="store_true",
        help="for vacuum: count what would be deleted, touch nothing",
    )
    vt.add_argument(
        "--file-retention-seconds",
        type=float,
        default=None,
        help=(
            "for vacuum: only delete unreferenced data/DV/bloom files "
            "older than this (default 1h — protects files a live "
            "writer landed but hasn't committed yet); 0 reclaims "
            "immediately"
        ),
    )
    vt.add_argument("--target-files", type=int, default=1, help="for compact")
    vt.add_argument("--order-by", default=None, help="for compact: comma-sep cols")
    vt.add_argument(
        "--zorder-by",
        default=None,
        help="for compact: comma-sep cols, Morton-curve clustering",
    )
    vt.add_argument("--column", default=None, help="for compact-where: stats column")
    vt.add_argument("--lo", type=float, default=None, help="for compact-where")
    vt.add_argument("--hi", type=float, default=None, help="for compact-where")
    vt.add_argument("--limit", type=int, default=20, help="for read")
    vt.add_argument("--dest", default=None, help="for export-delta: output dir")
    vt.add_argument(
        "--where",
        default=None,
        help="for delete-where/update-where: SQL predicate",
    )
    vt.add_argument(
        "--set",
        action="append",
        default=None,
        metavar="COL=EXPR",
        help="for update-where: assignment (repeatable)",
    )
    vt.add_argument(
        "--use-dv",
        action="store_true",
        help="for update-where: deletion-vector strategy (no file rewrites)",
    )
    vt.add_argument("--old", default=None, help="for rename-column")
    vt.add_argument("--new", default=None, help="for rename-column")
    vt.add_argument(
        "--drop", default=None, help="for drop-column: the column name"
    )
    vt.add_argument(
        "--source", default=None, help="for merge: parquet path of the source batch"
    )
    vt.add_argument(
        "--on", default=None, help="for merge: comma-sep equality key columns"
    )
    vt.add_argument(
        "--clauses",
        default=None,
        help=(
            "for merge: JSON list of clauses, e.g. "
            '[{"when":"matched","action":"update"},'
            '{"when":"not_matched","action":"insert","condition":"s.qty>0"},'
            '{"when":"not_matched_by_source","action":"delete"}] '
            "(set: optional {col: sql_expr}; omitted = all from source). "
            "Default: classic upsert (update-all + insert-all)"
        ),
    )
    vt.add_argument("--name", default=None, help="for add/drop-constraint")
    vt.add_argument(
        "--expr", default=None, help="for add-constraint: the CHECK SQL"
    )
    vt.add_argument(
        "--as-of-timestamp",
        default=None,
        help="for read: ISO-8601 UTC instant (TIMESTAMP AS OF)",
    )

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
            spark,
            args.raw,
            args.warehouse,
            config_dir=args.config_dir or CONFIG_DIR,
            storage=args.storage,
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

        pins = {}
        for spec in args.pin:
            table, _, ver = spec.partition("=")
            pins[table] = int(ver)
        report = audit_warehouse(
            spark,
            args.warehouse,
            args.config_dir or CONFIG_DIR,
            at_versions=pins or None,
        )
        print(json.dumps(report, indent=2))
        if args.strict:
            try:
                assert_clean(report)
            except AssertionError as exc:
                print(str(exc), file=sys.stderr)
                return 1
        return 0

    if args.cmd == "expect":
        from modular_etl_data_platform_spark.operators.expectations import (
            ExpectationSuite,
        )
        from modular_etl_data_platform_spark.session import load_tables, load_warehouse

        load_tables(spark, args.sf_dir)
        if args.warehouse:
            load_warehouse(spark, args.warehouse)
        with open(args.suite) as f:
            suite = ExpectationSuite.from_config(json.load(f))
        results = suite.validate(spark.table(args.table)).collect()
        print(
            json.dumps(
                [
                    {
                        "expectation_type": r.expectation_type,
                        "column": r.column,
                        "observed": r.observed,
                        "success": r.success,
                    }
                    for r in results
                ],
                indent=2,
            )
        )
        if args.strict and not all(r.success for r in results):
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
            min_quality=args.min_quality,
            pack_capacity=args.pack_capacity,
            pack_shards=args.pack_shards,
            line_dedup_min_df=args.line_dedup_df,
        )
        res = curate_corpus(spark, train, benchmark, out_dir=args.out, config=cfg)
        print(json.dumps(res["counts"], indent=2))
        return 0

    if args.cmd == "ann-index":
        from modular_etl_data_platform_spark.corpus.similarity import (
            build_ivf_index,
            kmeans_cells,
        )

        emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        cells = (
            kmeans_cells(emb, k=args.kmeans, iters=args.iters, dim=args.dim)
            if args.kmeans
            else None
        )
        build_ivf_index(emb, args.out, cells=cells)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"indexed": n, "path": args.out}))
        return 0

    if args.cmd == "ann-query":
        from pyspark.sql import functions as F

        from modular_etl_data_platform_spark.corpus.similarity import (
            ivf_probe_indexed,
        )

        emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        row = emb.filter(F.col("vec_id") == args.vec_id).select("embedding").first()
        if row is None:
            print(f"vec_id {args.vec_id} not found", file=sys.stderr)
            return 2
        out = ivf_probe_indexed(
            spark,
            args.index,
            [float(x) for x in row[0]],
            k=args.k,
            probes=args.probes,
            dim=args.dim,
        )
        out.show(args.k, truncate=False)
        return 0

    if args.cmd == "vt":
        from modular_etl_data_platform_spark.operators.versioned import (
            VersionedTable,
        )

        table = VersionedTable(spark, args.path)
        if args.action == "history":
            print(
                json.dumps(
                    [
                        {k: v for k, v in m.items() if k not in ("schema", "stats")}
                        | {"n_files": len(m["files"])}
                        for m in table.history()
                    ],
                    indent=2,
                )
            )
        elif args.action == "detail":
            d = table.detail(version=args.version)
            d.pop("schema", None)  # table-level summary; schema via read
            print(json.dumps(d, indent=2))
        elif args.action == "read":
            ts = None
            if args.as_of_timestamp:
                from datetime import datetime, timezone

                ts = datetime.fromisoformat(args.as_of_timestamp)
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=timezone.utc)
            table.read(args.version, timestamp=ts).show(
                args.limit, truncate=False
            )
        elif args.action == "restore":
            if args.version is None:
                print("restore requires --version", file=sys.stderr)
                return 2
            print(json.dumps({"new_version": table.restore(args.version)}))
        elif args.action == "compact":
            order = args.order_by.split(",") if args.order_by else None
            zorder = args.zorder_by.split(",") if args.zorder_by else None
            v = table.compact(
                target_files=args.target_files, order_by=order, zorder_by=zorder
            )
            print(json.dumps({"new_version": v}))
        elif args.action == "compact-where":
            if args.column is None or args.lo is None or args.hi is None:
                raise SystemExit("compact-where requires --column --lo --hi")
            order = args.order_by.split(",") if args.order_by else None
            zorder = args.zorder_by.split(",") if args.zorder_by else None
            v = table.compact_where(
                args.column,
                args.lo,
                args.hi,
                target_files=args.target_files,
                order_by=order,
                zorder_by=zorder,
            )
            print(json.dumps({"new_version": v}))
        elif args.action == "convert":
            from modular_etl_data_platform_spark.operators.versioned import (
                convert_to_versioned,
            )

            cols = (
                [c.strip() for c in args.stats_columns.split(",") if c.strip()]
                if args.stats_columns
                else None
            )
            vt2 = convert_to_versioned(spark, args.path, stats_columns=cols)
            print(json.dumps({"converted": args.path, "version": vt2.current_version()}))
        elif args.action == "delete-where":
            if not args.where:
                raise SystemExit("delete-where requires --where '<predicate>'")
            prune = None
            if args.column is not None:
                prune = (args.column, args.lo, args.hi)
            v = table.delete_where(args.where, prune=prune)
            print(json.dumps({"new_version": v}))
        elif args.action == "update-where":
            if not args.where or not args.set:
                raise SystemExit(
                    "update-where requires --where '<predicate>' and at "
                    "least one --set COL=EXPR"
                )
            assignments = {}
            for a in args.set:
                col, eq, expr = a.partition("=")
                if not eq:
                    raise SystemExit(f"--set needs COL=EXPR, got {a!r}")
                assignments[col.strip()] = expr.strip()
            prune = None
            if args.column is not None:
                prune = (args.column, args.lo, args.hi)
            v = table.update_where(
                assignments,
                args.where,
                prune=prune,
                use_deletion_vectors=args.use_dv,
            )
            print(json.dumps({"new_version": v}))
        elif args.action == "merge":
            if not args.source or not args.on:
                raise SystemExit("merge requires --source and --on")
            kw = {}
            if args.clauses:
                groups = {"matched": [], "not_matched": [], "not_matched_by_source": []}
                for cl in json.loads(args.clauses):
                    when = cl.get("when")
                    if when not in groups:
                        raise SystemExit(f"unknown clause 'when': {when!r}")
                    groups[when].append(
                        (cl.get("action"), cl.get("set"), cl.get("condition"))
                    )
                kw = {k: v for k, v in groups.items() if v}
            v = table.merge(
                spark.read.parquet(args.source),
                on=[c.strip() for c in args.on.split(",") if c.strip()],
                **kw,
            )
            print(json.dumps({"new_version": v}))
        elif args.action == "add-constraint":
            if not args.name or not args.expr:
                raise SystemExit("add-constraint requires --name and --expr")
            v = table.add_constraint(args.name, args.expr)
            print(json.dumps({"new_version": v, "constraints": table.constraints()}))
        elif args.action == "enable-cdf":
            if not args.primary_keys:
                raise SystemExit("enable-cdf requires --primary-keys")
            v = table.enable_change_data_feed(
                [c.strip() for c in args.primary_keys.split(",") if c.strip()]
            )
            print(json.dumps({"new_version": v, "cdf": table.cdf_property()}))
        elif args.action == "disable-cdf":
            v = table.disable_change_data_feed()
            print(json.dumps({"new_version": v, "cdf": table.cdf_property()}))
        elif args.action == "change-feed":
            if args.since_version is None:
                raise SystemExit("change-feed requires --since-version")
            pks = (
                [c.strip() for c in args.primary_keys.split(",") if c.strip()]
                if args.primary_keys
                else None
            )
            rows = (
                table.read_change_feed(
                    args.since_version, args.version, primary_keys=pks
                )
                .limit(args.limit)
                .collect()
            )
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.action == "drop-constraint":
            if not args.name:
                raise SystemExit("drop-constraint requires --name")
            v = table.drop_constraint(args.name)
            print(json.dumps({"new_version": v, "constraints": table.constraints()}))
        elif args.action == "rename-column":
            if not args.old or not args.new:
                raise SystemExit("rename-column requires --old and --new")
            v = table.rename_column(args.old, args.new)
            print(json.dumps({"new_version": v}))
        elif args.action == "drop-column":
            if not args.drop:
                raise SystemExit("drop-column requires --drop <column>")
            v = table.drop_column(args.drop)
            print(json.dumps({"new_version": v}))
        elif args.action == "clone":
            if not args.dest:
                ap.error("clone requires --dest")
            c = table.clone(args.dest, version=args.version)
            print(
                json.dumps(
                    {"cloned_to": c.path, "version": c.current_version()}
                )
            )
        elif args.action == "vacuum":
            deleted = table.vacuum(
                keep_last=args.keep_last,
                retention_hours=args.retention_hours,
                dry_run=args.dry_run,
                **(
                    {"file_retention_seconds": args.file_retention_seconds}
                    if args.file_retention_seconds is not None
                    else {}
                ),
            )
            key = "would_delete_files" if args.dry_run else "deleted_files"
            print(json.dumps({key: deleted}))
        elif args.action == "export-delta":
            if not args.dest:
                ap.error("export-delta requires --dest")
            from modular_etl_data_platform_spark.operators.delta_export import (
                export_delta_snapshot,
            )

            out = export_delta_snapshot(table, args.dest, version=args.version)
            print(json.dumps({"exported": out, "version": args.version}))
        elif args.action == "mirror-delta":
            # incremental: first call snapshots, later calls emit one
            # Delta commit per new source version (O(changed files))
            if not args.dest:
                ap.error("mirror-delta requires --dest")
            from modular_etl_data_platform_spark.operators.delta_export import (
                export_delta_incremental,
            )

            v = export_delta_incremental(
                table, args.dest, to_version=args.version
            )
            print(json.dumps({"mirrored": args.dest, "source_version": v}))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
