from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.functions.scalar import (
    format_phone,
    null_safe_hash,
)
from modular_etl_data_platform_spark.operators.dedup import (
    dedupe_latest,
    dedupe_latest_salted,
    duplicate_keys,
)
from modular_etl_data_platform_spark.operators.joins import asof_join, pit_join, ri_orphans
from modular_etl_data_platform_spark.operators.date_dim import build_dim_date
from modular_etl_data_platform_spark.operators.validate import RuleSet


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_dedupe_latest(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "a"),
            (1, _ts("2024-01-02T00:00:00"), "b"),
            (2, _ts("2024-01-01T00:00:00"), "c"),
        ],
        ["id", "ts", "v"],
    )
    out = dedupe_latest(df, ["id"], "ts").orderBy("id").collect()
    assert [(r.id, r.v) for r in out] == [(1, "b"), (2, "c")]


def test_dedupe_latest_tiebreak_deterministic(spark):
    t = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame([(1, t, 10, "x"), (1, t, 20, "y")], ["id", "ts", "seq", "v"])
    out = dedupe_latest(df, ["id"], "ts", tiebreakers=["seq"]).collect()
    assert out[0].v == "y"


def test_dedupe_salted_matches_plain(spark):
    rows = [(i % 7, _ts("2024-01-01") + dt.timedelta(minutes=i), i) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "ts", "seq"])
    plain = {(r.id, r.seq) for r in dedupe_latest(df, ["id"], "ts", tiebreakers=["seq"]).collect()}
    salted = {
        (r.id, r.seq)
        for r in dedupe_latest_salted(df, ["id"], "ts", tiebreakers=["seq"]).collect()
    }
    assert plain == salted


def test_duplicate_keys(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    out = duplicate_keys(df, ["k"]).collect()
    assert [(r.k, r.dup_count) for r in out] == [(1, 2)]


def test_format_phone(spark):
    df = spark.createDataFrame(
        [("001-581-896-0013x3890",), ("(518)349-5931x0341",), ("5551234567",), ("12",)],
        ["phone"],
    )
    out = [r.p for r in df.select(format_phone("phone").alias("p")).collect()]
    assert out == ["581-896-0013", "518-349-5931", "555-123-4567", None]


def test_null_safe_hash_distinguishes_null_shift(spark):
    df = spark.createDataFrame([("a", None), (None, "a")], ["x", "y"])
    hashes = [r.h for r in df.select(null_safe_hash(["x", "y"]).alias("h")).collect()]
    assert hashes[0] != hashes[1]


def test_pit_join_picks_covering_version(spark):
    dim = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"), "v1"),
            (1, _ts("2024-02-01T00:00:00"), _ts("9999-12-31T00:00:00"), "v2"),
        ],
        ["bk", "valid_from", "valid_to", "attr"],
    )
    fact = spark.createDataFrame(
        [(100, 1, _ts("2024-01-15T00:00:00")), (101, 1, _ts("2024-02-01T00:00:00"))],
        ["fid", "bk", "evt"],
    )
    out = {r.fid: r.attr for r in pit_join(fact, dim, "bk", "evt").collect()}
    # half-open intervals: the boundary instant belongs to the NEW version
    assert out == {100: "v1", 101: "v2"}


def test_asof_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = [(i, rng.randrange(3), _ts("2024-01-01") + dt.timedelta(minutes=rng.randrange(500))) for i in range(80)]
    right = [(1000 + i, rng.randrange(3), _ts("2024-01-01") + dt.timedelta(minutes=rng.randrange(500)), float(i)) for i in range(60)]
    ldf = spark.createDataFrame(left, ["lid", "k", "t"])
    rdf = spark.createDataFrame(right, ["rid", "k", "rt", "val"])

    out = asof_join(ldf, rdf, on="k", left_time="t", right_time="rt",
                    value_cols=["val"], tiebreaker="rid")
    got = {r.lid: r.asof_val for r in out.collect()}

    # naive reference
    expected = {}
    for lid, k, t in left:
        cands = [(rt, rid, val) for rid, rk, rt, val in right if rk == k and rt <= t]
        expected[lid] = max(cands)[2] if cands else None
    assert got == expected


def test_ri_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], ["id", "fk"])
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    out = ri_orphans(child, parent, fk="fk", pk="pk").collect()
    assert [r.id for r in out] == [2]


def test_date_dim(spark):
    dd = build_dim_date(spark, "2024-01-01", "2024-01-31")
    rows = dd.orderBy("date").collect()
    assert len(rows) == 31
    assert rows[0].date_key == 20240101
    assert rows[0].day_name == "Monday"
    assert rows[0].is_weekend is False
    sat = [r for r in rows if r.day_name == "Saturday"][0]
    assert sat.is_weekend is True
    assert rows[0].week_of_year == 1


def test_ruleset_split_and_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "active", 10.0, "a@b.com"),
            (None, "active", 5.0, "c@d.com"),   # null fail
            (3, "zombie", 5.0, "e@f.com"),      # domain fail
            (4, "active", -1.0, "not-an-email"),  # range fail + format warning
        ],
        ["id", "status", "amount", "email"],
    )
    rules = RuleSet.from_config(
        {
            "null_checks": ["id"],
            "value_constraints": {"status": ["active", "inactive"], "amount": ">= 0"},
            "format_validations": {"email": "^[^@]+@[^@]+\\.[a-z]+$"},
        }
    )
    valid, quarantined = rules.split(df)
    assert valid.count() == 1
    q = {tuple(r.failed_rules) for r in quarantined.collect()}
    assert ("null_check:id",) in q
    assert ("value_constraint:status",) in q
    assert ("value_constraint:amount",) in q  # format is warning severity

    m = {r.rule: r.failed_count for r in rules.metrics(df).collect()}
    assert m["null_check:id"] == 1
    assert m["value_constraint:status"] == 1
    assert m["value_constraint:amount"] == 1
    assert m["format_validation:email"] == 1


def test_salted_join_matches_plain_join(spark):
    from modular_etl_data_platform_spark.operators.skew import salted_join

    # left: heavily skewed key distribution (90% key=1)
    left = spark.range(0, 10000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 1 ELSE id % 50 END AS k"
    )
    right = spark.range(0, 50).selectExpr("id AS k", "id * 100 AS dim_val")
    plain = {(r.id, r.dim_val) for r in left.join(right, "k").collect()}
    salted = {(r.id, r.dim_val) for r in salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain
    # left rows actually scatter across salt values (hot key parallelized)
    from pyspark.sql import functions as F

    n_salts = (
        left.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .filter("k = 1")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_salted_distinct_count_exact(spark):
    from modular_etl_data_platform_spark.operators.skew import salted_distinct_count

    df = spark.range(0, 20000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 7) END AS g",
        "concat('u', id % 123) AS v",
    )
    got = {
        r.g: r.n_distinct_v
        for r in salted_distinct_count(df, "g", "v", salt=16).collect()
    }
    expected = {
        r.g: r.n
        for r in df.groupBy("g").agg(__import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("v").alias("n")).collect()
    }
    assert got == expected


def test_upsert_partition_scoped_leaves_other_partitions_untouched(spark, tmp_path):
    import os

    from modular_etl_data_platform_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "inv")
    base = spark.createDataFrame(
        [(p, d, p * 10 + d) for p in range(3) for d in (1, 2, 3)],
        "pid int, day int, qty int",
    )
    upsert_parquet(spark, base, path, ["pid", "day"], partition_by=["day"])

    def files(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {d: files(d) for d in (1, 2, 3)}
    # batch touches only day=2: update pid=0, insert pid=9
    batch = spark.createDataFrame(
        [(0, 2, 999), (9, 2, 900)], "pid int, day int, qty int"
    )
    upsert_parquet(spark, batch, path, ["pid", "day"], partition_by=["day"])

    # untouched partitions keep their exact files (no rewrite)
    assert files(1) == before[1]
    assert files(3) == before[3]
    assert files(2) != before[2]

    out = {(r.pid, r.day): r.qty for r in spark.read.parquet(path).collect()}
    assert out[(0, 2)] == 999 and out[(9, 2)] == 900
    assert out[(0, 1)] == 1 and out[(2, 3)] == 23
    assert len(out) == 10


def test_conform_schema_evolution(spark):
    """Upstream adds a column -> dropped; upstream drops a nullable
    declared column -> null-filled at declared type. Target schema is
    stable either way."""
    from modular_etl_data_platform_spark.operators.transforms import conform_to_schema
    from modular_etl_data_platform_spark.schema.registry import TableConfig

    cfg = TableConfig(
        raw={
            "table_name": "t",
            "columns": [
                {"name": "id", "datatype": "bigint", "nullable": False},
                {"name": "name", "datatype": "string", "nullable": True},
                {"name": "score", "datatype": "double", "nullable": True},
            ],
        }
    )
    evolved = spark.createDataFrame(
        [(1, "a", "surprise")], "id long, name string, new_upstream_col string"
    )
    out = conform_to_schema(evolved, cfg)
    assert [f.name for f in out.schema.fields] == ["id", "name", "score"]
    assert dict(out.dtypes)["score"] == "double"
    row = out.collect()[0]
    assert row.score is None and row.name == "a"


def test_chunk_text_udtf_matches_native_expression(spark):
    """The UDTF form must produce the same chunks as the native
    expression form (corpus/text.py::chunk_text) — the UDTF is the
    extension-point demo, the expression is the hot path."""
    from modular_etl_data_platform_spark.corpus.text import chunk_text
    from modular_etl_data_platform_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(120)))], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = {
        (r.chunk_no, r.chunk_text)
        for r in spark.sql(
            "SELECT c.* FROM udtf_docs, LATERAL chunk_text(text, 50, 10) c"
        ).collect()
    }
    via_expr = {
        (r.chunk_no, r.chunk_text) for r in chunk_text(docs, 50, 10).collect()
    }
    assert via_udtf == via_expr and len(via_udtf) == 3
