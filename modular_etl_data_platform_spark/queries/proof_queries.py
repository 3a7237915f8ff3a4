"""Driver-verified proofs for the operators previously exercised only by
pytest (VERDICT round-2 coverage table: S4 glob source, S6/T3 audit
columns, C1 bronze corrupt-record quarantine, C7 gold DQ suite, §2.11
UDTF surface) plus the two container-runnable Structured Streaming paths
(§2.10: built-in watermarked windowed aggregation and
``dropDuplicatesWithinWatermark``).

Each query runs the REAL operator end-to-end — the streaming ones start
an actual ``writeStream`` (availableNow trigger, memory sink) inside the
query callable and return the sink table — and the aggregate the driver
hashes must match a DuckDB oracle computed directly on the parquet
views, so a wrong watermark, a dropped glob file, an un-quarantined
corrupt row or a mis-windowed chunk all fail the gate.

The stateful APIs that can't run in this container are covered
elsewhere: ``transformWithStateInPandas`` needs google.protobuf
(test_streaming.py::test_running_totals_transform_with_state skips
loudly) and the ``applyInPandasWithState`` sessionizer only emits on
processing-time timeouts, so its batch twin q42 is the oracle-checked
form (tests pin the streaming path).
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.queries.catalog import _t, dsum, query
from modular_etl_data_platform_spark.queries.roundtrip_queries import _pin, _scratch

_MEM_IDS = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str, scratch: str) -> DataFrame:
    """readStream over the events parquet with the same ts normalization
    as the batch loader (catalog._events): schema taken from a footer
    read, NTZ cast to session-zone timestamp (UTC session, so
    value-preserving). The file stream source only accepts directories,
    so the (read-only) testdata file is symlinked into the scratch dir —
    zero copy."""
    path = os.path.join(sf_dir, "events.parquet")
    src_dir = os.path.join(scratch, "in")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(path, link)
        except OSError:
            import shutil

            shutil.copyfile(path, link)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    # mirror BOTH normalization branches of catalog._events: nanos
    # testdata generations surface ts as LONG (nanosAsLong) and need the
    # floor-to-micros conversion; NTZ micros generations just cast
    if schema["ts"].dataType.typeName() in ("long", "integer"):
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(stream_df: DataFrame, ckpt_root: str, mode: str) -> DataFrame:
    """Start → availableNow → await → return the memory-sink table.
    Unique per-invocation sink names keep driver + check + pytest runs in
    one session from colliding; the scratch checkpoint is wiped by
    _scratch, so every invocation recomputes from a clean slate."""
    name = f"proof_sink_{os.getpid()}_{next(_MEM_IDS)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(ckpt_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    q.stop()
    if not finished:
        # fail loudly: a killed-in-flight query would otherwise return a
        # silently partial sink table
        raise TimeoutError(f"streaming proof query {name} did not finish in 300s")
    return stream_df.sparkSession.table(name)


@query(
    "q92_stream_windowed_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q92_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming watermarked windowed aggregation (§2.10, the
    built-in stateful operator): hour tumbling windows per event_type over
    the events stream, complete-mode memory sink so every window is
    emitted deterministically under the one-shot availableNow trigger
    (append mode would hold back windows the final watermark hasn't
    passed). Result must equal the batch GROUP BY — the oracle."""
    ckpt = _scratch("q92_stream_windowed_counts", sf_dir)
    agg = (
        _events_stream(spark, sf_dir, ckpt)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, ckpt, "complete")
    return _pin(
        out.select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


@query(
    "q93_stream_dedup_users",
    "SELECT DISTINCT user_id FROM events",
)
def q93_stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup (§2.10,
    streaming/incremental.py::stream_dedup →
    ``dropDuplicatesWithinWatermark``): the emitted key set must be
    exactly the distinct user_ids. The horizon is set beyond the data's
    time span so state never evicts mid-run — with eviction the operator
    only guarantees at-most-once per horizon, which wouldn't be
    oracle-checkable; the bounded-state path is pinned by
    test_streaming.py instead."""
    from modular_etl_data_platform_spark.streaming.incremental import stream_dedup

    ckpt = _scratch("q93_stream_dedup_users", sf_dir)
    deduped = stream_dedup(
        _events_stream(spark, sf_dir, ckpt), ["user_id"], "ts", "36500 days"
    ).select("user_id")
    return _pin(_run_to_memory(deduped, ckpt, "append"))


@query(
    "q100_stream_sessions",
    """
    WITH s AS (
      SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL 8 HOUR
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    g AS (
      SELECT user_id, ts, cents,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ),
    sess AS (
      SELECT user_id, sid, MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events, SUM(cents) AS total_cents
      FROM g GROUP BY user_id, sid
    ),
    m AS (SELECT user_id, MAX(ts) AS max_ts FROM events GROUP BY user_id)
    SELECT sess.user_id, session_start, session_end, n_events,
           -- CAST: DuckDB types SUM(BIGINT) as HUGEINT, which converts to
           -- float64 under a pandas canonicalizer ("4612.0" vs "4612")
           CAST(total_cents AS BIGINT) AS total_cents
    FROM sess JOIN m ON sess.user_id = m.user_id
    WHERE session_end + INTERVAL 8 HOUR < max_ts
    """,
)
def q100_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator, oracle-pinned end-to-end
    (§2.10, streaming/incremental.py::sessionize_events_event_time):
    event-time gap sessions (8 h) via applyInPandasWithState with
    EventTimeTimeout. Whether a session is emitted by an in-batch split
    or by a watermark timer depends on micro-batching, so the query
    keeps only sessions PROVABLY closed by data — a later same-user
    event beyond the gap — which is batching-invariant; the oracle
    derives exactly that set relationally. Values ride as exact cents so
    per-session sums are order-free across engines."""
    from modular_etl_data_platform_spark.streaming.incremental import (
        sessionize_events_event_time,
    )

    gap_h = 8
    ckpt = _scratch("q100_stream_sessions", sf_dir)
    stream = _events_stream(spark, sf_dir, ckpt).select(
        "user_id", "ts", F.round(F.col("value") * 100).alias("value")
    )
    # Horizon beyond any data span (the q93 pattern): the sessionizer's
    # expired-horizon inline close and its event-time timers then NEVER
    # fire mid-run, so the emitted set is exactly the data-closed
    # sessions — invariant under any micro-batch split the driver's file
    # source chooses. Timer-emitted trailing sessions are per-user LAST
    # sessions, which the data-closed gate below excludes anyway, so the
    # kept result is identical — just batching-proof.
    out = _run_to_memory(
        sessionize_events_event_time(
            stream, gap_minutes=gap_h * 60, watermark="36500 days"
        ),
        ckpt,
        "append",
    )
    user_max = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("__max_ts"))
    )
    return (
        out.join(user_max, "user_id")
        .filter(
            F.col("session_end") + F.expr(f"INTERVAL {gap_h} HOUR")
            < F.col("__max_ts")
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.col("total_value").cast("long").alias("total_cents"),
        )
        .transform(_pin)
    )


@query(
    "q111_stream_stream_attribution",
    """
    SELECT v.user_id,
           v.event_id AS view_event_id,
           a.event_id AS action_event_id,
           v.ts AS view_ts,
           a.ts AS action_ts
    FROM events v JOIN events a ON v.user_id = a.user_id
    WHERE v.event_type = 'view' AND a.event_type = 'purchase'
      AND v.ts <= a.ts AND a.ts <= v.ts + INTERVAL 4 HOUR
    """,
)
def q111_stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (§2.10,
    streaming/incremental.py::attribute_events): every purchase is
    attributed to the same user's views at most 4 h before it — two REAL
    readStreams over the events source joined with watermarks on both
    sides and a time-bound condition (the only shape Spark accepts as a
    bounded-state stream-stream join). The watermark horizon is set past
    the data span so no buffered row evicts mid-run: the emitted match
    set is then exactly the relational time-bounded join the oracle
    computes, independent of micro-batching (inner-join matches emit
    once both sides have arrived; nothing is retracted). Event ids ride
    along so every output row is unique."""
    from modular_etl_data_platform_spark.streaming.incremental import (
        attribute_events,
    )

    ckpt = _scratch("q111_stream_stream_attribution", sf_dir)
    views = (
        _events_stream(spark, sf_dir, ckpt)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    actions = (
        _events_stream(spark, sf_dir, ckpt)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("action_event_id"),
            F.col("ts").alias("action_ts"),
        )
    )
    joined = attribute_events(
        views,
        actions,
        key="user_id",
        view_ts="view_ts",
        action_ts="action_ts",
        watermark="36500 days",
        within="4 hours",
    ).select("user_id", "view_event_id", "action_event_id", "view_ts", "action_ts")
    return _pin(_run_to_memory(joined, ckpt, "append"))


@query(
    "q94_glob_source",
    """
    SELECT o_orderkey % 3 AS slice,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderkey % 3
    """,
)
def q94_glob_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file glob source (S4): orders written as three disjoint
    slice directories, read back through ONE glob pattern with lineage
    from ``input_file_name()``. Grouping by the slice parsed out of the
    file PATH proves every glob member was read and every row is
    attributed to the file that holds it — a missed file or a crossed
    slice changes the per-slice counts and fails the hash."""
    from modular_etl_data_platform_spark.sources.readers import read_path

    scratch = _scratch("q94_glob_source", sf_dir)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for d in range(3):
        orders.filter(F.col("o_orderkey") % 3 == d).write.mode("overwrite").parquet(
            os.path.join(scratch, f"slice_{d}")
        )
    back = read_path(spark, os.path.join(scratch, "slice_*"), "parquet")
    return _pin(
        back.withColumn(
            "slice",
            F.regexp_extract(F.input_file_name(), r"slice_(\d+)", 1).cast("long"),
        )
        .groupBy("slice")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


@query(
    "q95_audit_columns",
    """
    SELECT n_nationkey,
           'erp' AS record_source,
           TRUE AS file_resolved,
           TRUE AS has_ingestion_ts,
           TRUE AS date_consistent
    FROM nation
    """,
)
def q95_audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-column injection (S6/T3, sources/audit.py
    ::add_metadata_columns): the bronze metadata columns must resolve —
    ``source_file`` to the actual scan path, ``ingestion_timestamp`` /
    ``ingestion_date`` to the consistent query-constant clock,
    ``record_source`` to the configured literal. The volatile values
    themselves can't hash across engines, so the query projects the
    INVARIANTS (non-null, path contains the file, date == date of ts)
    which only hold when the wiring is right — e.g. a cache before the
    audit projection voids input_file_name() and flips file_resolved."""
    from modular_etl_data_platform_spark.sources.audit import add_metadata_columns
    from modular_etl_data_platform_spark.sources.readers import read_path

    raw = read_path(spark, os.path.join(sf_dir, "nation.parquet"), "parquet")
    bronze = add_metadata_columns(raw, "erp")
    return bronze.select(
        "n_nationkey",
        "record_source",
        F.col("source_file").contains("nation.parquet").alias("file_resolved"),
        F.col("ingestion_timestamp").isNotNull().alias("has_ingestion_ts"),
        (F.col("ingestion_date") == F.to_date("ingestion_timestamp")).alias(
            "date_consistent"
        ),
    )


@query(
    "q96_bronze_quarantine",
    """
    SELECT COUNT(CASE WHEN c_custkey % 97 <> 0 THEN 1 END) AS n_clean,
           CAST(SUM(CASE WHEN c_custkey % 97 <> 0
                         THEN CAST(c_acctbal AS DECIMAL(18,6)) END)
                AS DOUBLE) AS sum_acctbal,
           COUNT(CASE WHEN c_custkey % 97 = 0 THEN 1 END) AS n_quarantined
    FROM customer
    """,
)
def q96_bronze_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze ingest with corrupt-record quarantine (C1,
    pipeline/medallion.py::ingest_bronze): customers re-serialized as CSV
    with every ``c_custkey % 97 == 0`` row made unparseable (acctbal →
    'CORRUPT'), ingested through the full bronze path. The clean table
    must hold exactly the parseable rows (count + exact acctbal sum) and
    the shared ``bronze_dq_errors`` table exactly the corrupt ones —
    silently nulling a bad row into the clean table, dropping a good
    one, or double-ingesting on the append all break the hash."""
    from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
    from modular_etl_data_platform_spark.schema.registry import TableConfig

    scratch = _scratch("q96_bronze_quarantine", sf_dir)
    cust = _t(spark, sf_dir, "customer")
    lines = cust.select(
        F.concat_ws(
            ",",
            F.col("c_custkey"),
            F.col("c_name"),
            F.when(F.col("c_custkey") % 97 == 0, F.lit("CORRUPT")).otherwise(
                F.col("c_acctbal").cast("string")
            ),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(os.path.join(scratch, "raw", "customers.csv"))

    cfg = TableConfig(
        raw={
            "table_name": "bronze_customers",
            "source_system": "crm",
            "file_format": "csv",
            "delimiter": ",",
            "header": False,
            "file_path": "raw/customers.csv",
            "primary_keys": ["custkey"],
            "columns": [
                {"name": "custkey", "datatype": "bigint", "nullable": False},
                {"name": "name", "datatype": "string", "nullable": False},
                {"name": "acctbal", "datatype": "double", "nullable": True},
            ],
        }
    )
    pipe = MedallionPipeline(spark, warehouse=os.path.join(scratch, "wh"), raw_base=scratch)
    pipe.ingest_bronze(cfg)
    clean = pipe.read_table("bronze_customers").agg(
        F.count(F.lit(1)).alias("n_clean"), dsum(F.col("acctbal"), "sum_acctbal")
    )
    quarantined = pipe.read_table("bronze_dq_errors").agg(
        F.count(F.lit(1)).alias("n_quarantined")
    )
    return _pin(clean.crossJoin(F.broadcast(quarantined)))


@query(
    "q97_gold_dq_suite",
    """
    WITH dim AS (
      SELECT user_id, ts AS valid_from,
             COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
             LEAD(ts) OVER w IS NULL AS is_current,
             CAST(ROW_NUMBER() OVER w AS INT) AS version
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    pert AS (
      SELECT user_id, valid_from,
             CASE WHEN user_id % 100 = 0 AND version = 1
                  THEN valid_to + INTERVAL 1 HOUR ELSE valid_to END AS valid_to,
             CASE WHEN user_id % 100 = 0 THEN TRUE ELSE is_current END AS is_current,
             version
      FROM dim
    ),
    cur AS (
      SELECT COUNT(*) AS n_current_violations FROM (
        SELECT user_id FROM pert GROUP BY user_id
        HAVING SUM(CASE WHEN is_current THEN 1 ELSE 0 END) <> 1
      )
    ),
    olap AS (
      SELECT COUNT(*) AS n_overlap_violations FROM (
        SELECT user_id, valid_from, valid_to,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from ASC, version ASC) AS next_from
        FROM pert
      ) WHERE valid_from >= valid_to
           OR (next_from IS NOT NULL AND valid_to > next_from)
    ),
    orph AS (
      SELECT COUNT(*) AS n_orphaned_facts FROM events e
      WHERE e.user_id NOT IN (
        SELECT user_id FROM events
        WHERE event_type IN ('signup', 'purchase', 'error') AND user_id % 5 <> 0
      )
    )
    SELECT * FROM cur, olap, orph
    """,
)
def q97_gold_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold DQ suite (C7, operators/quality.py): the three invariant
    checks run against an SCD2 dim with DETERMINISTICALLY SEEDED defects
    — every ``user_id % 100 == 0`` key gets all versions re-marked
    current and its first interval stretched one hour into the next, and
    the dim is restricted to ``user_id % 5 != 0`` for the orphan check —
    so each checker must find exactly the violations the oracle derives
    relationally. A checker that under- or over-reports (off-by-one
    interval comparison, missed key, null-swallowing anti-join) breaks
    the hash; an all-zeros result can't pass vacuously."""
    from modular_etl_data_platform_spark.operators.quality import (
        orphaned_fact_violations,
        scd2_current_violations,
        scd2_overlap_violations,
    )
    from modular_etl_data_platform_spark.operators.scd2 import scd2_from_history

    ev = _t(spark, sf_dir, "events")
    hist = ev.filter(F.col("event_type").isin("signup", "purchase", "error"))
    dim = scd2_from_history(
        hist, keys=["user_id"], change_time="ts", tiebreakers=["event_id"]
    )
    seeded = F.col("user_id") % 100 == 0
    perturbed = dim.withColumn(
        "is_current", F.when(seeded, F.lit(True)).otherwise(F.col("is_current"))
    ).withColumn(
        "valid_to",
        F.when(
            seeded & (F.col("version") == 1),
            F.col("valid_to") + F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("valid_to")),
    )
    cur = scd2_current_violations(perturbed, ["user_id"]).agg(
        F.count(F.lit(1)).alias("n_current_violations")
    )
    olap = scd2_overlap_violations(perturbed, ["user_id"], tiebreakers=["version"]).agg(
        F.count(F.lit(1)).alias("n_overlap_violations")
    )
    orph = orphaned_fact_violations(
        ev, dim.filter(F.col("user_id") % 5 != 0), "user_id", "user_id"
    ).agg(F.count(F.lit(1)).alias("n_orphaned_facts"))
    return cur.crossJoin(F.broadcast(olap)).crossJoin(F.broadcast(orph))


@query(
    "q98_udtf_chunks",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE text IS NOT NULL
    ), starts AS (
      SELECT doc_id, words, CAST(s AS INTEGER) AS start
      FROM w, UNNEST(range(0, greatest(len(words) - 10, 1), 40)) AS t(s)
    )
    SELECT doc_id,
           CAST(start // 40 AS INTEGER) AS chunk_no,
           array_to_string(words[start + 1 : start + 50], ' ') AS chunk_text,
           CAST(len(words[start + 1 : start + 50]) AS INTEGER) AS chunk_tokens
    FROM starts
    """,
)
def q98_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF registration surface (§2.11, functions/udtf.py
    ::ChunkText): the registered table function applied via LATERAL in
    SQL — 50-token windows, 10-token overlap — must produce exactly the
    chunks the relational oracle derives with list slicing. Proves the
    registration path, the lateral-join plumbing and the per-row
    generator semantics; the vectorized twin (corpus/text.py::chunk_text,
    q45) remains the hot-path form."""
    from modular_etl_data_platform_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    view = f"q98_docs_{os.getpid()}"
    _t(spark, sf_dir, "documents").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_no, c.chunk_text, c.chunk_tokens
        FROM {view} AS d, LATERAL chunk_text(d.text, 50, 10) AS c
        WHERE d.text IS NOT NULL
        """
    )


_Q112_SUITE = {
    "expectation_suite_name": "customer_gold",
    "expectations": [
        {"expectation_type": "expect_column_to_exist",
         "kwargs": {"column": "c_custkey"}},
        {"expectation_type": "expect_column_values_to_not_be_null",
         "kwargs": {"column": "c_acctbal", "mostly": 0.99}},
        {"expectation_type": "expect_column_values_to_be_between",
         "kwargs": {"column": "c_acctbal", "min_value": 0,
                    "max_value": 10000, "mostly": 0.85}},
        {"expectation_type": "expect_column_values_to_be_in_set",
         "kwargs": {"column": "c_mktsegment",
                    "value_set": ["AUTOMOBILE", "BUILDING",
                                  "FURNITURE", "MACHINERY"],
                    "mostly": 0.9}},
        {"expectation_type": "expect_column_values_to_match_regex",
         "kwargs": {"column": "c_name", "regex": "^CUSTOMER#[0-9]+$"}},
        {"expectation_type": "expect_column_values_to_be_unique",
         "kwargs": {"column": "c_custkey"}},
        {"expectation_type": "expect_table_row_count_to_be_between",
         "kwargs": {"min_value": 100}},
        {"expectation_type": "expect_column_mean_to_be_between",
         "kwargs": {"column": "c_acctbal", "min_value": 1000,
                    "max_value": 9000}},
    ],
}


@query(
    "q112_expectation_suite",
    """
    WITH c AS (SELECT * FROM customer)
    SELECT 'expect_column_to_exist' AS expectation_type,
           'c_custkey' AS "column", 1.0 AS observed, TRUE AS success
    UNION ALL
    SELECT 'expect_column_values_to_not_be_null', 'c_acctbal',
           CAST(COUNT(c_acctbal) AS DOUBLE) / COUNT(*),
           CAST(COUNT(c_acctbal) AS DOUBLE) / COUNT(*) >= 0.99
    FROM c
    UNION ALL
    SELECT 'expect_column_values_to_be_between', 'c_acctbal',
           CAST(COUNT(CASE WHEN c_acctbal >= 0 AND c_acctbal <= 10000
                           THEN 1 END) AS DOUBLE) / COUNT(c_acctbal),
           CAST(COUNT(CASE WHEN c_acctbal >= 0 AND c_acctbal <= 10000
                           THEN 1 END) AS DOUBLE) / COUNT(c_acctbal) >= 0.85
    FROM c
    UNION ALL
    SELECT 'expect_column_values_to_be_in_set', 'c_mktsegment',
           CAST(COUNT(CASE WHEN c_mktsegment IN
                  ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                           THEN 1 END) AS DOUBLE) / COUNT(c_mktsegment),
           CAST(COUNT(CASE WHEN c_mktsegment IN
                  ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
                           THEN 1 END) AS DOUBLE) / COUNT(c_mktsegment) >= 0.9
    FROM c
    UNION ALL
    SELECT 'expect_column_values_to_match_regex', 'c_name',
           CAST(COUNT(CASE WHEN regexp_matches(c_name, '^CUSTOMER#[0-9]+$')
                           THEN 1 END) AS DOUBLE) / COUNT(c_name),
           CAST(COUNT(CASE WHEN regexp_matches(c_name, '^CUSTOMER#[0-9]+$')
                           THEN 1 END) AS DOUBLE) / COUNT(c_name) >= 1.0
    FROM c
    UNION ALL
    SELECT 'expect_column_values_to_be_unique', 'c_custkey',
           CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(c_custkey),
           CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / COUNT(c_custkey) >= 1.0
    FROM c
    UNION ALL
    SELECT 'expect_table_row_count_to_be_between', '',
           CAST(COUNT(*) AS DOUBLE), COUNT(*) >= 100 FROM c
    UNION ALL
    SELECT 'expect_column_mean_to_be_between', 'c_acctbal',
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(c_acctbal),
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(c_acctbal) BETWEEN 1000 AND 9000
    FROM c
    """,
)
def q112_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation-suite DQ (operators/expectations.py — the
    engine's great-expectations-dialect surface; the reference pins GE as
    its DQ intent in requirements.txt without shipping a suite): an
    8-expectation suite over customer evaluated in ONE aggregation pass,
    returning GE-style (expectation_type, column, observed, success)
    rows. The oracle recomputes every observed value and verdict
    relationally, so a mis-computed pass fraction, a wrong mostly
    comparison, nulls counted on the wrong side, or a silently skipped
    expectation all fail the hash."""
    from modular_etl_data_platform_spark.operators.expectations import (
        ExpectationSuite,
    )

    suite = ExpectationSuite.from_config(_Q112_SUITE)
    return suite.validate(_t(spark, sf_dir, "customer"))


@query(
    "q113_stream_cdc_state",
    """
    WITH changes AS (
      SELECT o_orderkey AS order_key, 1 AS seq, 'U' AS op,
             o_totalprice AS price FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 100
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    latest AS (
      SELECT order_key, op, price FROM changes
      QUALIFY ROW_NUMBER() OVER (PARTITION BY order_key
                                 ORDER BY seq DESC) = 1
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM latest WHERE op <> 'D'
    """,
)
def q113_stream_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC application (§2.10,
    streaming/incremental.py::stream_apply_cdc → operators/cdc.py): a
    Debezium-shaped change feed — every order as an initial upsert,
    repricing updates for keys % 3 == 0, deletes for keys % 5 == 0 —
    consumed by the real foreachBatch CDC stream into a parquet state
    table. The feed ships as ONE file so the whole log lands in one
    micro-batch (cross-batch ordering is the feed's contract, not the
    operator's). The final state must equal the relational replay:
    latest change per key, delete-wins keys absent, updated prices —
    a lost delete, a stale update or a duplicated key all break the
    count + exact price sum."""
    from modular_etl_data_platform_spark.streaming.incremental import (
        stream_apply_cdc,
    )

    scratch = _scratch("q113_stream_cdc_state", sf_dir)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    key = F.col("o_orderkey").alias("order_key")
    changes = (
        orders.select(
            key, F.lit(1).alias("seq"), F.lit("U").alias("op"),
            F.col("o_totalprice").alias("price"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 3 == 0).select(
                key, F.lit(2).alias("seq"), F.lit("U").alias("op"),
                (F.col("o_totalprice") + 100).alias("price"),
            )
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 5 == 0).select(
                key, F.lit(3).alias("seq"), F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("price"),
            )
        )
    )
    feed = os.path.join(scratch, "feed")
    changes.coalesce(1).write.mode("overwrite").parquet(feed)
    stream = spark.readStream.schema(
        spark.read.parquet(feed).schema
    ).parquet(feed)
    target = os.path.join(scratch, "state")
    q = stream_apply_cdc(
        spark,
        stream,
        target,
        os.path.join(scratch, "ckpt"),
        keys=["order_key"],
        seq_cols=["seq"],
    )
    finished = q.awaitTermination(300)
    q.stop()
    if not finished:
        raise TimeoutError("q113 CDC stream did not finish in 300s")
    state = spark.read.parquet(target)
    return _pin(
        state.agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("price"), "sum_price"),
        )
    )


@query(
    "q114_stream_sliding_counts",
    """
    SELECT time_bucket(INTERVAL 30 MINUTE, ts)
             - CAST(o AS INTEGER) * INTERVAL 30 MINUTE AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events, UNNEST(range(0, 4)) AS t(o)
    GROUP BY 1, 2
    """,
)
def q114_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming SLIDING-window aggregation (§2.10 — the
    overlapping-window twin of q92's tumbling windows): 2-hour windows
    sliding every 30 minutes, so every event lands in exactly 4
    windows. Complete-mode memory sink as in q92 (deterministic under
    availableNow). The oracle replicates the window assignment
    relationally: each event joins the 4 half-hour-grid starts that
    cover it. A wrong slide arithmetic (off-grid starts, events in 3 or
    5 windows) changes the per-window counts and fails the hash."""
    ckpt = _scratch("q114_stream_sliding_counts", sf_dir)
    agg = (
        _events_stream(spark, sf_dir, ckpt)
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, ckpt, "complete")
    return _pin(
        out.select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


def _q115_oracle() -> str:
    # md5 digest byte k as an integer, parsed from the hex string
    def byte_at(k: int) -> str:
        return (
            f"16*(strpos('0123456789abcdef', substr(md5(text), {2 * k + 1}, 1))-1)"
            f" + (strpos('0123456789abcdef', substr(md5(text), {2 * k + 2}, 1))-1)"
        )

    feats = ", ".join(
        f"CAST({byte_at((i * 7 + 3) % 16)} AS BIGINT) AS f{i}" for i in range(4)
    )
    return f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           {feats}
    FROM documents WHERE text IS NOT NULL
    """


@query("q115_multimodal_pipeline", _q115_oracle())
def q115_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + featurize end-to-end (corpus/multimodal.py):
    document text re-cast as an opaque binary payload
    (attach_binary_payload), run through the REAL ``mapInPandas``
    decode (dims from the deterministic stand-in codec) and the REAL
    Arrow-batched featurizer (md5-seeded pseudo-embedding,
    extract_features) — the exact plumbing a real PIL/ONNX body drops
    into. The oracle recomputes the byte length, the fake-codec
    dimension arithmetic, and the md5-digest-derived feature bytes
    relationally (features ride as exact ints: ROUND(f*255) inverts the
    /255.0 normalization), so a broken Arrow batch shape, a payload
    mangled in transit, or a featurizer reading the wrong bytes all
    fail the hash."""
    from modular_etl_data_platform_spark.corpus.multimodal import (
        attach_binary_payload,
        decode_images,
        extract_features,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = attach_binary_payload(docs, "text", "text/plain")
    decoded = decode_images(media, codec="fake").select(
        "doc_id", "byte_len", "width", "height"
    )
    feats = extract_features(media, dim=4).select(
        "doc_id",
        *[
            F.round(F.col("embedding").getItem(i) * 255)
            .cast("long")
            .alias(f"f{i}")
            for i in range(4)
        ],
    )
    return decoded.join(feats, "doc_id")


@query(
    "q135_versioned_silver_medallion",
    """
    WITH base AS (
      SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer
    ),
    v2 AS (
      SELECT custkey, acctbal + 500.0 AS acctbal FROM base WHERE custkey % 5 = 0
      UNION ALL
      SELECT custkey, acctbal FROM base WHERE custkey % 5 <> 0
    )
    SELECT 1 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM base
    UNION ALL
    SELECT 2 AS version, COUNT(*) AS n_rows,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM v2
    """,
)
def q135_versioned_silver_medallion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion SILVER path on versioned storage
    (MedallionPipeline(storage="versioned") — the reference's layers are
    Delta tables, reference: config/bronze/schema/README.md:83-87): two
    raw CSV batches flow through the full ingest->transform->dedup->
    MERGE pipeline; each silver load publishes a manifest version, and
    BOTH snapshots are read back through the log and aggregated. The
    oracle recomputes each state relationally — a MERGE that leaks the
    update batch into v1, drops a key, or a manifest resolution bug all
    hash-mismatch. This is q123's time-travel contract exercised through
    the PIPELINE entry points rather than the raw table API. (Bronze is
    seeded directly as parquet appends — the CSV/corrupt-capture ingest
    half is q96's proof; repeating it here would only add jobs.)"""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.pipeline.medallion import MedallionPipeline
    from modular_etl_data_platform_spark.schema.registry import TableConfig

    scratch = _scratch("q135_versioned_silver_medallion", sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )

    silver_cfg = TableConfig(
        raw={
            "table_name": "silver_cust_v",
            "source_table": "bronze_cust_v",
            "load_type": "upsert",
            "primary_keys": ["custkey"],
            "columns": [
                {"name": "custkey", "datatype": "bigint", "nullable": False},
                {"name": "acctbal", "datatype": "double", "nullable": True},
                {"name": "updated_at", "datatype": "string", "nullable": False},
            ],
        }
    )

    pipe = MedallionPipeline(
        spark, warehouse=os.path.join(scratch, "wh"), raw_base=scratch,
        storage="versioned",
    )
    bronze_path = pipe.table_path("bronze_cust_v")
    cust.withColumn("updated_at", F.lit("2024-01-01")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(bronze_path)
    pipe.transform_silver(silver_cfg, order_col="updated_at")
    cust.filter(F.col("custkey") % 5 == 0).withColumn(
        "acctbal", F.col("acctbal") + 500.0
    ).withColumn("updated_at", F.lit("2024-06-01")).coalesce(1).write.mode(
        "append"
    ).parquet(bronze_path)
    pipe.transform_silver(silver_cfg, order_col="updated_at")

    vt = VersionedTable(spark, pipe.table_path("silver_cust_v"))

    def snap(v: int) -> DataFrame:
        return vt.read(v).agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("acctbal"), "sum_bal"),
        )

    return _pin(snap(1).unionByName(snap(2)))


@query(
    "q138_versioned_stream_source",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q138_versioned_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SOURCE over the versioned commit log
    (streaming/versioned_source.py — a Spark 4 Python Data Source whose
    offsets are manifest VERSION numbers): the customer table lands as
    three appended versions; one availableNow run must consume exactly
    the union of their files through the log — per-segment counts and
    decimal-exact balances equal the batch table (the oracle). A source
    that skips a version's files, double-reads a carried file, or tears
    a manifest resolution changes the hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q138_versioned_stream_source", sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table = os.path.join(scratch, "cust_v")
    vt = VersionedTable(spark, table)
    for i in range(3):
        vt.write(
            cust.filter(F.col("c_custkey") % 3 == i).coalesce(1),
            mode="append" if i else "overwrite",
        )
    stream = (
        spark.readStream.format("versioned_table").option("path", table).load()
    )
    agg = stream.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("c_acctbal"), "sum_bal"),
    )
    return _pin(_run_to_memory(agg, scratch, "complete"))


@query(
    "q142_versioned_stream_sink",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q142_versioned_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SINK into the versioned commit log
    (streaming/versioned_source.py::_VersionedStreamArrowWriter — the
    write half of the Spark 4 Python Data Source): the customer table,
    landed as three source versions, is piped LOG-TO-LOG — versioned
    read-stream in, versioned write-stream out — and the DESTINATION
    table is aggregated against the batch oracle. Exactly-once through
    both halves: a source that re-emits a carried file, a sink that
    tears a batch across versions, drops a task's file, or
    double-publishes a retried batch all change the per-segment counts/
    decimal-exact sums. The sink's commit mode + recorded batch id are
    asserted in-query."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q142_versioned_stream_sink", sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    src_path = os.path.join(scratch, "cust_src")
    dst_path = os.path.join(scratch, "cust_dst")
    src = VersionedTable(spark, src_path)
    for i in range(3):
        src.write(
            cust.filter(F.col("c_custkey") % 3 == i).coalesce(1),
            mode="append" if i else "overwrite",
        )
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src_path)
        .load()
        .writeStream.format("versioned_table")
        .option("path", dst_path)
        .option("stats_columns", "c_custkey")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dst = VersionedTable(spark, dst_path)
    head = dst._read_manifest(dst.current_version())
    if head.get("mode") != "stream_write" or "stream_batch_id" not in head:
        raise AssertionError("sink did not publish through the stream commit path")
    return _pin(
        dst.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal"), "sum_bal"),
        )
    )


@query(
    "q163_stream_change_feed",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    batch AS (
      SELECT x AS k, 'X' AS s, CAST(x AS DOUBLE) / 10 AS p
      FROM range(1000, 3000) t(x)
    ),
    ch3 AS (  -- v3 MERGE: only batch keys can change
      SELECT n.k,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN o.s IS NOT DISTINCT FROM n.s
                   AND o.p IS NOT DISTINCT FROM n.p THEN NULL
                  ELSE 'update_postimage' END AS ct,
             n.p AS p
      FROM batch n LEFT JOIN base o ON o.k = n.k
    ),
    s3 AS (  -- post-merge state
      SELECT k, s, p FROM batch
      UNION ALL
      SELECT k, s, p FROM base WHERE k NOT IN (SELECT k FROM batch)
    ),
    s4 AS (SELECT * FROM s3 WHERE k % 10 <> 7),
    changes AS (
      SELECT 1 AS _commit_version, 'insert' AS _change_type, k, p
      FROM base WHERE k % 2 = 0
      UNION ALL
      SELECT 2, 'insert', k, p FROM base WHERE k % 2 = 1
      UNION ALL
      SELECT 3, ct, k, p FROM ch3 WHERE ct IS NOT NULL
      UNION ALL
      SELECT 4, 'delete', k, p FROM s3 WHERE k % 10 = 7
      UNION ALL
      SELECT 6, 'update_postimage', k, p + 1 FROM s4 WHERE k % 100 = 11
    )
    SELECT _commit_version, _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM changes GROUP BY _commit_version, _change_type
    """,
)
def q163_stream_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING row-level change feed — Delta's ``readChangeFeed``
    analogue (streaming/versioned_source.py::
    _VersionedChangeFeedStreamReader): a six-version DML history —
    two appends, a MERGE (updates + inserts), a deletion-vector DELETE,
    a compaction, a DV-backed UPDATE — is drained through
    ``read_changes=true`` (rate-limited to 2 versions per micro-batch)
    into a parquet sink, and the per-(version, change_type) counts /
    key sums / decimal-exact value sums must match the oracle's
    relational replay of every version transition. The in-query
    assertions pin the streaming-specific contracts the oracle can't
    see: the compaction version emits ZERO rows (dataChange=false), and
    the version cap bounds every offset advance (asserted by walking
    the reader's own offset protocol — under availableNow Spark fixes
    the target offset BEFORE initialOffset and the Python DataSource
    API has no ReadLimit pass-through, so the trigger path can't
    observe the cap; the offset walk is the same code the
    processing-time trigger runs). Classification parity with batch
    ``table_changes`` (q137) comes free: both derive the feed from the
    same per-version file diffs."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q163_stream_change_feed", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    table = os.path.join(scratch, "orders_v")
    vt = VersionedTable(spark, table, stats_columns=["k"])
    vt.write(orders.filter(F.col("k") % 2 == 0).coalesce(1))  # v1
    vt.write(
        orders.filter(F.col("k") % 2 == 1).coalesce(1), mode="append"
    )  # v2
    batch = spark.range(1000, 3000).select(
        F.col("id").alias("k"),
        F.lit("X").alias("s"),
        (F.col("id").cast("double") / 10).alias("p"),
    )
    vt.upsert(batch, ["k"])  # v3: updates + inserts
    vt.delete_where("k % 10 = 7")  # v4: DV deletes
    v_compact = vt.compact(target_files=2)  # v5: dataChange=false
    vt.update_where(
        {"p": "p + 1"}, "k % 100 = 11", use_deletion_vectors=True
    )  # v6: DV-backed UPDATE
    stream = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .option("read_changes", "true")
        .option("primary_keys", "k")
        .option("max_versions_per_batch", "2")
        .load()
    )
    out = os.path.join(scratch, "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # rate-limit contract, asserted on the reader's own offset protocol
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        _VersionedChangeFeedStreamReader,
    )

    rd = _VersionedChangeFeedStreamReader(
        table, stream.schema, 0, ["k"], max_versions_per_batch=2
    )
    off = rd.initialOffset()
    spans = []
    while True:
        end = rd.latestOffset()
        if end["version"] <= off["version"]:
            break
        spans.append(end["version"] - off["version"])
        rd.partitions(off, end)
        off = end
    if spans != [2, 2, 2]:  # 6 versions, never more than 2 per advance
        raise AssertionError(f"version cap violated: offset spans {spans}")
    feed = spark.read.parquet(out)
    if feed.filter(F.col("_commit_version") == v_compact).count() != 0:
        raise AssertionError(
            "compaction (dataChange=false) emitted change rows"
        )
    return _pin(
        feed.groupBy("_commit_version", "_change_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )
    )


@query(
    "q169_sharded_change_feed",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    changes AS (
      SELECT 1 AS _commit_version, 'insert' AS _change_type, k, p FROM base
      UNION ALL
      SELECT 2, 'update_postimage', k, p + 100 FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT 2, 'insert', -(k + 1), p FROM base WHERE k % 7 = 0
    )
    SELECT _commit_version, _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM changes GROUP BY _commit_version, _change_type
    """,
)
def q169_sharded_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARDED update-class change-feed classification — the scale
    answer to a giant MERGE (streaming/versioned_source.py::
    _CFDiffPartition): a MERGE whose changed bytes exceed
    ``diff_partition_bytes`` classifies across ceil(changed / target)
    PK-hash-range partitions instead of one Arrow task, each shard
    reading the commit's files filtered to its hash range BEFORE the
    join (bounded memory; equal keys co-shard, so the union of shards
    is exactly the unsharded classification). The stream here runs the
    REAL sharded path — ``diff_partition_bytes`` is sized to the source
    table so the MERGE version fans out at every scale factor — and the
    in-query assertions pin what the oracle can't see: the MERGE
    version planned >1 diff partition (asserted on the reader's own
    partitions() protocol, the same code the trigger runs), the shard
    ids tile range(nshards), and no key classified twice. The
    per-(version, change_type) counts / key sums / decimal-exact value
    sums must match the oracle's relational replay of the history."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _CFDiffPartition,
        _VersionedChangeFeedStreamReader,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q169_sharded_change_feed", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    table = os.path.join(scratch, "orders_v")
    vt = VersionedTable(spark, table)
    vt.write(orders.coalesce(1))  # v1
    batch = (
        orders.filter(F.col("k") % 3 == 0).withColumn(
            "p", F.col("p") + F.lit(100)
        )
    ).unionByName(
        orders.filter(F.col("k") % 7 == 0).select(
            (-(F.col("k") + 1)).alias("k"), F.col("s"), F.col("p")
        )
    )
    vt.upsert(batch.coalesce(1), ["k"])  # v2: giant MERGE, rewrite-style
    # target ~ a quarter of the source bytes: the MERGE's changed bytes
    # (old file + rewritten files) exceed it at ANY scale factor, so the
    # fan-out engages without ever exploding the shard count
    target = max(16 * 1024, os.path.getsize(os.path.join(sf_dir, "orders.parquet")) // 4)
    stream = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .option("read_changes", "true")
        .option("primary_keys", "k")
        .option("diff_partition_bytes", str(target))
        .load()
    )
    out = os.path.join(scratch, "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the fan-out contract, asserted on the reader's own partition plan
    rd = _VersionedChangeFeedStreamReader(
        table, stream.schema, 0, ["k"], diff_partition_bytes=target
    )
    diff_parts = [
        p
        for p in rd.partitions({"version": 1}, {"version": 2})
        if isinstance(p, _CFDiffPartition)
    ]
    if len(diff_parts) < 2:
        raise AssertionError(
            f"MERGE version classified in {len(diff_parts)} partition(s); "
            "expected the PK-hash fan-out to engage"
        )
    if {p.shard for p in diff_parts} != set(range(diff_parts[0].nshards)):
        raise AssertionError("shard ids do not tile range(nshards)")
    feed = spark.read.parquet(out)
    v2 = feed.filter(F.col("_commit_version") == 2)
    if v2.count() != v2.select("k").distinct().count():
        raise AssertionError("a key classified in more than one shard")
    return _pin(
        feed.groupBy("_commit_version", "_change_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )
    )


@query(
    "q172_split_file_read",
    """
    SELECT o_orderstatus AS s,
           COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey % 10 <> 4
    GROUP BY o_orderstatus
    """,
)
def q172_split_file_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-file ROW-GROUP SPLITTING through the format-API reader
    (streaming/versioned_source.py::_FilePartition(rg_shard=...)):
    the whole orders table lands as ONE versioned file, a DV delete
    carves rows out of it, and the read runs with ``split_file_bytes``
    sized so the single file must plan across multiple row-group-range
    partitions — Spark's maxPartitionBytes discipline for the Python
    data source, planned from the LOG's recorded file size (zero
    footer reads at planning time). In-query assertions pin what the
    oracle can't see: the file actually split (>1 planned partition,
    asserted on the reader's own partitions() protocol), every
    partition names the same file, and the shard ids tile
    range(nshards). The aggregate — computed THROUGH the sharded read,
    deletion-vector positions offset per shard — must match the
    oracle's relational replay, so a duplicated or dropped row group,
    or a mis-offset DV mask, changes the hash."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _VersionedBatchReaderBase,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q172_split_file_read", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    table = os.path.join(scratch, "orders_v")
    vt = VersionedTable(spark, table)
    vt.write(orders.coalesce(1))  # ONE file holds the whole table
    vt.delete_where("o_orderkey % 10 = 4")  # DV: file-global positions
    # target an 8-way split of the single file at ANY scale factor
    m = vt._read_manifest(vt.current_version())
    fsize = sum(m.get("sizes", {}).get(f, 0) for f in m["files"])
    target = max(1024, fsize // 8)
    rd = _VersionedBatchReaderBase(
        table,
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).schema,
        None,
        split_bytes=target,
    )
    parts = rd.partitions()
    if len(parts) < 2:
        raise AssertionError(
            f"single {fsize}-byte file planned {len(parts)} partition(s) "
            f"at split_bytes={target}; expected a row-group split"
        )
    if len({p.path for p in parts}) != 1:
        raise AssertionError("split partitions should all name the one file")
    shards = sorted(p.rg_shard for p in parts)
    if shards != [(i, len(parts)) for i in range(len(parts))]:
        raise AssertionError(f"shard ids do not tile: {shards}")
    df = (
        spark.read.format("versioned_table")
        .option("path", table)
        .option("split_file_bytes", str(target))
        .load()
    )
    return _pin(
        df.groupBy(F.col("o_orderstatus").alias("s")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


@query(
    "q173_recorded_cdc",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS s, o_totalprice AS p FROM orders
    ),
    changes AS (
      SELECT 1 AS _commit_version, 'insert' AS _change_type, k, p FROM base
      UNION ALL
      SELECT 3, 'delete', k, p FROM base WHERE k % 30 = 6
      UNION ALL
      SELECT 3, 'update_postimage', k, p + 100 FROM base
      WHERE k % 3 = 0 AND k % 30 <> 6
      UNION ALL
      SELECT 3, 'insert', -(k + 1), p FROM base WHERE k % 7 = 0
    )
    SELECT _commit_version, _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM changes GROUP BY _commit_version, _change_type
    """,
)
def q173_recorded_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-TIME CDC (operators/versioned.py::enable_change_data_feed
    — the delta.enableChangeDataFeed analogue, the round-11 verdict's
    top item): a giant MERGE against a CDC-enabled table persists its
    row-level slice as recorded ``_change_data`` files riding the
    commit record, and the change-feed STREAM serves the MERGE version
    from those files alone. The derived diff's total I/O on a giant
    MERGE is changed²/target (each of ceil(changed/target) PK-hash
    shards re-reads every changed file); the recorded path reads the
    slice once, per-cdc-file parallel, with large files row-group-split
    — the 100 TB shape. The MERGE exercises every clause class:
    conditional DELETE (k%30=6), unconditional update (k%3=0 rows get
    p+100), a SUPPRESSION cohort (k%5=2 rows re-asserted with identical
    values must emit NOTHING — extra update rows would break the
    oracle hash), and negative-key inserts (k%7=0; orders keys start
    at 0, so -(k+1) can never collide). In-query assertions pin what
    the oracle can't see: the commit actually RECORDED (cdc entries in
    the log), every planned partition for the MERGE version is a
    recorded partition pointing under ``_change_data/`` and NEVER at a
    data file (the zero-re-read contract), the plan fans out past the
    per-task byte target (row-group splitting of recorded files), and
    the metadata-only enable commit (v2) emits zero feed rows. The
    per-(version, change_type) counts / key sums / decimal-exact value
    sums come from a REAL availableNow stream drain and must match the
    oracle's relational replay."""
    import json as _json

    from modular_etl_data_platform_spark.operators.versioned import (
        _CDC_DIR,
        VersionedTable,
        _commit_name,
    )
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
        _CFRecordedPartition,
        _VersionedChangeFeedStreamReader,
    )

    spark.dataSource.register(VersionedTableStreamDataSource)
    scratch = _scratch("q173_recorded_cdc", sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    table = os.path.join(scratch, "orders_v")
    vt = VersionedTable(spark, table, stats_columns=["k"])
    vt.write(orders.coalesce(2))  # v1: two files
    vt.enable_change_data_feed(["k"])  # v2: metadata-only
    upd = orders.filter(F.col("k") % 3 == 0).withColumn(
        "p", F.col("p") + F.lit(100)
    )
    same = orders.filter(
        (F.col("k") % 5 == 2) & (F.col("k") % 3 != 0)
    )  # re-asserted identical rows: must SUPPRESS
    ins = orders.filter(F.col("k") % 7 == 0).select(
        (-(F.col("k") + 1)).alias("k"), F.col("s"), F.col("p")
    )
    v = vt.merge(
        upd.unionByName(same).unionByName(ins),
        ["k"],
        matched=[
            ("delete", None, "t.k % 30 = 6"),
            ("update", None, None),
        ],
        not_matched=[("insert", None, None)],
    )
    rec = _json.loads(vt.log.store.read(_commit_name(v)))
    entries = rec.get("cdc")
    if not entries:
        raise AssertionError("MERGE did not record its change slice")
    if {e["type"] for e in entries} != {
        "insert",
        "delete",
        "update_postimage",
    }:
        raise AssertionError(
            f"recorded types wrong: { {e['type'] for e in entries} }"
        )
    # per-task byte target sized to the largest recorded file so the
    # plan must row-group-split it at ANY scale factor
    target = max(1024, max(e["size"] for e in entries) // 2 + 1)
    stream = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .option("read_changes", "true")
        .option("primary_keys", "k")
        .option("diff_partition_bytes", str(target))
        .load()
    )
    out = os.path.join(scratch, "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the zero-re-read contract, asserted on the reader's own plan
    rd = _VersionedChangeFeedStreamReader(
        table, stream.schema, 0, ["k"], diff_partition_bytes=target
    )
    parts = rd.partitions({"version": v - 1}, {"version": v})
    if not parts or not all(
        isinstance(p, _CFRecordedPartition) for p in parts
    ):
        raise AssertionError(
            f"MERGE version planned non-recorded partitions: "
            f"{ {type(p).__name__ for p in parts} }"
        )
    data_files = set(vt.log.resolve(v)["files"]) | set(
        vt.log.resolve(v - 1)["files"]
    )
    for p in parts:
        if os.sep + _CDC_DIR + os.sep not in p.path or p.path in data_files:
            raise AssertionError(f"recorded partition re-reads data: {p.path}")
    if len(parts) <= len(entries):
        raise AssertionError(
            f"{len(entries)} recorded files planned only {len(parts)} "
            f"partitions at target={target}; row-group split did not engage"
        )
    if rd.partitions({"version": 1}, {"version": 2}):
        raise AssertionError("metadata-only enable commit emitted changes")
    feed = spark.read.parquet(out)
    return _pin(
        feed.groupBy("_commit_version", "_change_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("long").alias("key_sum"),
            dsum(F.col("p"), "sum_price"),
        )
    )
