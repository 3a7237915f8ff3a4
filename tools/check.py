"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given SF dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet files, and
compares row count, sorted column names, and an order-insensitive value
hash. Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


PD_TS_MIN = __import__("datetime").datetime(1677, 9, 22)
PD_TS_MAX = __import__("datetime").datetime(2262, 4, 11)


def driver_unsafe(sdf, rows):
    """Return reasons the DRIVER's pandas canonicalizer would choke on this
    result even though our object-level compare is fine: complex-typed
    output columns (unhashable list cells in ``sort_values``) and datetime
    values outside pandas' nanosecond range (``OutOfBoundsDatetime``,
    e.g. a 9999-12-31 SCD2 sentinel). Query surfaces must ship strings
    for both (CORRECTNESS_r01: q10, q56)."""
    import datetime

    from pyspark.sql.types import ArrayType, MapType, StructType

    reasons = [
        f"complex-typed column {f.name!r} ({f.dataType.simpleString()})"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    dt_idx = [
        i
        for i, f in enumerate(sdf.schema.fields)
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz", "date")
    ]
    for i in dt_idx:
        for row in rows:
            v = row[i]
            if v is None:
                continue
            if isinstance(v, datetime.datetime):
                bad = not (PD_TS_MIN <= v.replace(tzinfo=None) <= PD_TS_MAX)
            elif isinstance(v, datetime.date):
                bad = not (PD_TS_MIN.date() <= v <= PD_TS_MAX.date())
            else:
                continue
            if bad:
                reasons.append(
                    f"column {sdf.columns[i]!r} value {v} outside pandas ns range"
                )
                break
    return reasons


def norm_value(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT or v is pd.NA:
        # a null timestamp is object-None on a from_records side but NaT
        # on a .df() side — same logical value, one token
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    # DATE normalizes to a midnight datetime: Spark/fetchall yields
    # datetime.date where duckdb's .df() yields datetime64 — the driver's
    # canonicalizer tolerates this (q09 dates were driver-green in r3),
    # so the replica must too
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"{v} 00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def canon_lines(rows, colnames):
    """Sorted canonical row lines: columns ordered by name, every cell
    through norm_value — the ONE normalize routine behind both hashes
    and the FAIL diagnostics."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        "\x1f".join(norm_value(row[i]) for i in order) for row in rows
    )


def _hash_lines(lines):
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def table_hash(rows, colnames):
    return _hash_lines(canon_lines(rows, colnames))


def pandas_canon_lines(pdf):
    return canon_lines(
        list(pdf.itertuples(index=False, name=None)), list(pdf.columns)
    )


def pandas_hash(pdf):
    """Hash a result AS A PANDAS FRAME — mimics the driver's pandas-based
    canonicalizer, where engine dtype coercions surface that object-level
    compare hides (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64 prints
    '4612.0' while Spark's int64 prints '4612': CORRECTNESS_r04 q100/q109
    failed the driver hash on exactly this while fetchall() passed)."""
    return _hash_lines(pandas_canon_lines(pdf))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from modular_etl_data_platform_spark.session import get_spark

    spark = get_spark("check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            stime = time.time() - t0
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            results[name] = "spark_error"
            continue
        unsafe = driver_unsafe(sdf, srows)
        if unsafe:
            print(f"FAIL  {name}: driver-unsafe output: {'; '.join(unsafe)}")
            results[name] = "driver_unsafe"
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{stime:.1f}s]")
            results[name] = "rows_only"
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            results[name] = "oracle_error"
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh = table_hash(srows, scols)
        dh = table_hash(drows, dcols)
        ok_hash = sh == dh
        # pandas-mode replica of the driver canonicalizer: DuckDB results
        # via .df() (surfaces HUGEINT->float64 etc.), Spark results as a
        # frame built from the collected rows (no Spark re-execution;
        # from_records applies the same null-int->float64 inference
        # toPandas would)
        import pandas as pd

        spdf = pd.DataFrame.from_records(srows, columns=scols)
        dpdf = con.execute(oracles[name]).df()
        sph = pandas_hash(spdf)
        dph = pandas_hash(dpdf)
        ok_pdhash = sph == dph
        status = (
            "PASS" if (ok_count and ok_schema and ok_hash and ok_pdhash) else "FAIL"
        )
        results[name] = status
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {dh}'} "
            f"pdhash={'ok' if ok_pdhash else f'{sph} vs {dph}'} [{stime:.1f}s]"
        )
        if status == "FAIL" and ok_count and ok_schema:
            # print first differing rows for debugging (object-level diff
            # when the object hash differs; otherwise the pandas-level
            # diff that actually failed, reusing the frames from above)
            if not ok_hash:
                snorm = canon_lines(srows, scols)
                dnorm = canon_lines(drows, dcols)
            else:
                snorm = pandas_canon_lines(spdf)
                dnorm = pandas_canon_lines(dpdf)
            shown = 0
            for a, b in zip(snorm, dnorm):
                if a != b:
                    print(f"   spark : {a[:300]}")
                    print(f"   duckdb: {b[:300]}")
                    shown += 1
                    if shown >= 3:
                        break

    n_pass = sum(1 for v in results.values() if v == "PASS")
    print(f"\n{n_pass}/{len(results)} PASS; "
          f"{sum(1 for v in results.values() if v == 'rows_only')} rows-only")
    spark.stop()
    return 0 if all(v in ("PASS", "rows_only") for v in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
