"""Structured Streaming variants of the medallion entry points.

The reference simulates feeds with daily batch files + watermark columns
(SURVEY §2.10); these operators run the SAME configs continuously:

- :func:`stream_ingest` — file-source ``readStream`` → audit columns →
  partitioned append (C1 as a stream). Exactly-once via checkpointing.
- :func:`stream_bronze_to_silver` — ``foreachBatch`` micro-batch loop
  running the silver transform (transform → validate → dedup → upsert)
  per batch; the MERGE keeps the output keyed-latest, which is the
  streaming-upsert pattern Delta/Spark docs prescribe for CDC.
- :func:`sessionize_events` — example custom stateful operator via
  ``applyInPandasWithState`` (session windows with a gap timeout).

Scale: file streams at 100 TB use ``maxFilesPerTrigger`` to bound batch
size; dedup-in-batch shuffles only the micro-batch, and the upsert is
partition-scoped. Watermarks bound state for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from modular_etl_data_platform_spark.operators.dedup import dedupe_latest
from modular_etl_data_platform_spark.operators.transforms import (
    apply_transformations,
    conform_to_schema,
)
from modular_etl_data_platform_spark.operators.upsert import upsert_parquet
from modular_etl_data_platform_spark.operators.validate import RuleSet
from modular_etl_data_platform_spark.schema.registry import TableConfig
from modular_etl_data_platform_spark.sources.audit import add_metadata_columns


def stream_apply_cdc(
    spark: SparkSession,
    changes_stream: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
):
    """Apply a streaming CDC feed (upsert + delete opcodes) to a parquet
    table via ``foreachBatch`` — the delete-capable extension of
    :func:`stream_bronze_to_silver`'s upsert loop, i.e. the standard
    Spark pattern for consuming a Debezium/Delta-CDF-shaped feed.
    Each micro-batch collapses to latest-per-key before merging, so a
    key updated many times within a batch rewrites once."""
    from modular_etl_data_platform_spark.operators.cdc import (
        apply_cdc_parquet,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_cdc_parquet(
            spark, batch, target_path, keys, seq_cols, op_col, delete_op
        )

    return (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_ingest(
    spark: SparkSession,
    config: TableConfig,
    source_dir: str,
    target_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 100,
):
    """C1 as a stream: continuously ingest files matching the config."""
    info = config.source_info
    fmt = (info.get("file_format") or "parquet").lower()
    reader = (
        spark.readStream.schema(config.spark_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "csv":
        src = reader.options(
            header=str(bool(info.get("header", True))).lower(),
            sep=info.get("delimiter", ","),
        ).csv(source_dir)
    elif fmt == "json":
        src = reader.json(source_dir)
    else:
        src = reader.parquet(source_dir)
    bronze = add_metadata_columns(src, config.raw.get("source_system", "stream"))
    writer = (
        bronze.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
    if config.partition_by:
        writer = writer.partitionBy(*config.partition_by)
    return writer.start()


def stream_bronze_to_silver(
    spark: SparkSession,
    config: TableConfig,
    bronze_path: str,
    silver_path: str,
    checkpoint: str,
    order_col: str = "ingestion_timestamp",
):
    """C2 as a stream: micro-batch transform→validate→dedup→MERGE."""
    bronze_schema = config.raw.get("bronze_schema")
    reader = spark.readStream
    if bronze_schema is not None:
        reader = reader.schema(bronze_schema)
    else:
        static = spark.read.parquet(bronze_path)
        reader = reader.schema(static.schema)
    stream = reader.parquet(bronze_path)
    rules = RuleSet.from_config(config.data_quality_rules)

    def process(batch: DataFrame, batch_id: int) -> None:
        transformed = apply_transformations(batch, config.transformations())
        conformed = conform_to_schema(transformed, config, extra_cols=[order_col])
        valid, _ = rules.split(conformed)
        deduped = dedupe_latest(valid, config.primary_keys, order_col)
        final = (
            deduped.drop(order_col)
            if order_col not in config.column_names()
            else deduped
        )
        upsert_parquet(spark, final, silver_path, config.primary_keys)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "start TIMESTAMP, end TIMESTAMP, n BIGINT, total DOUBLE"


def stream_upsert_versioned(
    stream_df: DataFrame,
    table_path: str,
    primary_keys: list[str],
    checkpoint: str,
    evolve_schema: bool = False,
):
    """Stream into a :class:`~...operators.versioned.VersionedTable` —
    each micro-batch publishes ONE new version (an atomic manifest
    rename), so downstream readers always see a consistent snapshot and
    any batch's result can be time-traveled to or rolled back with
    ``restore``. Combined with the checkpoint, a replayed micro-batch
    after a crash just publishes again over the same keys — the keyed
    upsert makes replays idempotent at the row level.

    This is the emulation-side analogue of streaming MERGE into Delta
    (the reference's silver streaming contract); single-writer like the
    rest of the versioned layer."""
    from modular_etl_data_platform_spark.operators.versioned import VersionedTable

    def process(batch: DataFrame, batch_id: int) -> None:
        vt = VersionedTable(batch.sparkSession, table_path)
        vt.upsert(batch, primary_keys, evolve_schema=evolve_schema)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def _sessionize(key, pdfs, state: GroupState):
    """applyInPandasWithState body: fold events into an open session; emit
    when the gap timeout fires."""
    import pandas as pd

    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [start],
                "session_end": [end],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs))
    lo, hi = rows["ts"].min(), rows["ts"].max()
    n, total = len(rows), float(rows["value"].sum())
    if state.exists:
        start, end, n0, total0 = state.get
        state.update((min(start, lo), max(end, hi), n0 + n, total0 + total))
    else:
        state.update((lo, hi, n, total))
    state.setTimeoutDuration(30_000)  # 30s gap closes the session
    yield from ()


def _sessionize_event_time(gap_ms: int):
    """Build an applyInPandasWithState body for EVENT-TIME gap sessions.

    Unlike :func:`_sessionize` (processing-time: a session closes when no
    events ARRIVE for the gap), this splits on the event-time axis —
    within a batch, consecutive events further than ``gap_ms`` apart
    start a new session; batch sessions chain-merge with the stored open
    session SORTED BY EVENT TIME (so out-of-order arrivals above the
    watermark extend a session's start or open an earlier one — never
    get absorbed with a wrong start); closed sessions emit immediately
    and the trailing open session persists with an event-time timer at
    ``session_end + gap``, firing when the WATERMARK passes it. For
    per-key event-time-ordered delivery (replayed logs, the file-stream
    shape q100 drives) the emitted session set is batching-invariant;
    under arbitrary reordering an event that would BRIDGE two
    already-emitted sessions cannot retract them — the same caveat as
    any early-emitting streaming sessionizer, and why q100's gate keeps
    only provably data-closed sessions."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        def row(start, end, n, total):
            return _session_row(key[0], start, end, n, total)

        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame([row(start, end, n, total)])
            return

        open_session = list(state.get) if state.exists else None
        closed, cur = _merge_event_time_sessions(
            pd.concat(list(pdfs)), open_session, gap_ms
        )
        closed = [row(*c) for c in closed]
        # pd.Timestamp.value is ns-since-epoch on the NAIVE value —
        # session-zone (UTC) semantics regardless of the host TZ, unlike
        # datetime.timestamp() which assumes local time
        timeout = int(pd.Timestamp(cur[1]).value // 1_000_000) + gap_ms
        if timeout <= state.getCurrentWatermarkMs():
            # the watermark already passed the gap horizon: the trailing
            # session is closed too — a timer in the past is not allowed
            closed.append(row(*cur))
            state.remove()
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(timeout)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def _session_row(user_id, start, end, n, total):
    return {
        "user_id": user_id,
        "session_start": start,
        "session_end": end,
        "n_events": n,
        "total_value": total,
    }


def _merge_event_time_sessions(rows, open_session, gap_ms: int):
    """The pure-pandas core both stateful APIs share: split a batch on
    the event-time axis, chain-merge with the stored open session, and
    return ``(closed_sessions, trailing_open_session)`` — each session a
    ``[start, end, n_events, total_value]`` list.

    Sorting merged segments by session start means an out-of-order batch
    (events before the stored session's start, still above the
    watermark) extends/starts sessions correctly instead of being
    absorbed with a too-late session_start."""
    rows = rows.sort_values("ts")
    gaps = rows["ts"].diff().dt.total_seconds().mul(1000).fillna(0)
    sid = (gaps > gap_ms).cumsum()
    sessions = []
    for _, grp in rows.groupby(sid, sort=True):
        sessions.append(
            [grp["ts"].iloc[0], grp["ts"].iloc[-1], len(grp), float(grp["value"].sum())]
        )
    if open_session is not None:
        sessions.append(list(open_session))
        sessions.sort(key=lambda t: t[0])
    closed = []
    cur = None
    for seg in sessions:
        if cur is not None and (seg[0] - cur[1]).total_seconds() * 1000 <= gap_ms:
            cur = [cur[0], max(cur[1], seg[1]), cur[2] + seg[2], cur[3] + seg[3]]
        else:
            if cur is not None:
                closed.append(cur)
            cur = seg
    return closed, cur


def sessionize_events_event_time(
    events_stream: DataFrame,
    gap_minutes: int = 480,
    watermark: str = "1 second",
) -> DataFrame:
    """Event-time gap sessionization as a custom stateful streaming
    operator (applyInPandasWithState, EventTimeTimeout): the determinism
    contract is in :func:`_sessionize_event_time`. Emits each session
    once, when it CLOSES — by a later event beyond the gap, or by the
    watermark passing session_end + gap."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_event_time(gap_minutes * 60_000),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _has_tws_runtime() -> bool:
    """True only when transformWithStateInPandas can actually run: the
    API must exist on GroupedData (Spark 4+ — protobuf alone proves
    nothing, it ships transitively with grpc/arrow/gcp stacks on Spark
    3.x clusters) AND google.protobuf must be importable (the state
    server's wire format; absent in this sandbox — same env-block
    pattern as delta-spark, see tests/test_streaming_tws.py). Note the
    operator additionally needs the RocksDB state store provider
    configured on the session
    (``spark.sql.streaming.stateStore.providerClass``) — that is a
    deployment setting the selector cannot probe without starting a
    query, so it stays documented rather than detected."""
    from pyspark.sql.group import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return False
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_events_event_time_tws(
    events_stream: DataFrame,
    gap_minutes: int = 480,
    watermark: str = "1 second",
) -> DataFrame:
    """Event-time gap sessionization on the **transformWithStateInPandas**
    API (Spark 4 successor of ``applyInPandasWithState``: typed state
    variables, named event-time timers, RocksDB-backed in production).

    Same semantics and same pandas core (:func:`_merge_event_time_sessions`)
    as :func:`sessionize_events_event_time`; only the state plumbing
    differs — a ValueState holds the open session, and an explicit
    event-time timer at ``session_end + gap`` replaces
    ``setTimeoutTimestamp``. Kept alongside the GroupState form so the
    engine exposes both stateful APIs; ``sessionize_events_event_time_best``
    picks at runtime.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_minutes * 60_000

    class GapSessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState(
                "open",
                "session_start TIMESTAMP, session_end TIMESTAMP, "
                "n_events BIGINT, total_value DOUBLE",
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            open_session = (
                list(self._open.get()) if self._open.exists() else None
            )
            if open_session is not None:
                # a pending close-timer exists for the stored session;
                # it will be re-registered at the merged horizon below
                self._handle.deleteTimer(
                    int(pd.Timestamp(open_session[1]).value // 1_000_000) + gap_ms
                )
            closed, cur = _merge_event_time_sessions(
                pd.concat(list(rows)), open_session, gap_ms
            )
            closed = [_session_row(key[0], *c) for c in closed]
            timeout = int(pd.Timestamp(cur[1]).value // 1_000_000) + gap_ms
            if timeout <= timerValues.getCurrentWatermarkInMs():
                closed.append(_session_row(key[0], *cur))
                self._open.clear()
            else:
                self._open.update(tuple(cur))
                self._handle.registerTimer(timeout)
            if closed:
                yield pd.DataFrame(closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            if self._open.exists():
                cur = list(self._open.get())
                self._open.clear()
                yield pd.DataFrame([_session_row(key[0], *cur)])

        def close(self) -> None:
            pass

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            GapSessions(),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def sessionize_events_event_time_best(
    events_stream: DataFrame,
    gap_minutes: int = 480,
    watermark: str = "1 second",
) -> DataFrame:
    """Pick the stateful API at runtime: transformWithStateInPandas when
    its protobuf runtime is present (Spark 4 production path), else the
    GroupState form (which this sandbox can execute)."""
    impl = (
        sessionize_events_event_time_tws
        if _has_tws_runtime()
        else sessionize_events_event_time
    )
    return impl(events_stream, gap_minutes=gap_minutes, watermark=watermark)


def sessionize_events(events_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: gap-based session windows over
    (user_id) with per-group state — the applyInPandasWithState shape the
    engine exposes for operators Spark lacks natively."""
    return (
        events_stream.withWatermark("ts", "1 minute")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running per-user totals via **transformWithStateInPandas** — the
    Spark 4 successor of ``applyInPandasWithState`` (typed state
    variables on a ``StatefulProcessor``, RocksDB-backed in production,
    TTL support). Emits the updated cumulative (n_events, total_value)
    for every user touched by each micro-batch; state is one tiny tuple
    per user, so memory scales with distinct users, not events.

    Kept alongside the GroupState sessionizer (:func:`sessionize_events`)
    deliberately: the engine exposes BOTH stateful APIs the platform
    supports.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once dedup across micro-batches:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and discards
    re-deliveries arriving within the watermark horizon. Unlike plain
    ``dropDuplicates`` on a stream, state is EVICTED once the watermark
    passes — bounded memory at any scale, the right tool for at-least-once
    sources (Kafka redeliveries, file re-lists).

    Batch twin: ``dedupe_latest`` (operators/dedup.py) — same keyed-unique
    guarantee, checked by the oracle; this is the streaming form.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def attribute_events(
    views: DataFrame,
    actions: DataFrame,
    key: str = "user_id",
    view_ts: str = "view_ts",
    action_ts: str = "action_ts",
    watermark: str = "10 minutes",
    within: str = "15 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each action to the
    view by the same ``key`` that happened at most ``within`` before it —
    the canonical ads/funnel attribution shape.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can compute how long to buffer each side and evict
    state — the stream-stream join is ONLY scale-safe with both
    constraints. Timestamp columns must be distinct names (the key column
    is the single shared name).
    """
    v = views.withWatermark(view_ts, watermark)
    a = actions.withWatermark(action_ts, watermark)
    return v.join(
        a,
        F.expr(
            f"{view_ts} <= {action_ts} AND "
            f"{action_ts} <= {view_ts} + interval {within}"
        ).__and__(v[key] == a[key]),
        "inner",
    ).drop(a[key])


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical late-data
    pattern: events later than ``watermark`` past the max seen event time
    are dropped; window state is freed once the watermark passes the
    window end, so state is bounded at any scale.

    Works identically on a batch DataFrame (watermark is a no-op there),
    which is how the oracle checks the semantics.
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_curate_documents(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint: str,
    min_quality: float = 0.05,
    schema: str = "doc_id long, text string",
    nb_model_path: str | None = None,
    nb_min_score: float = 0.0,
    nb_buckets: int = 4096,
):
    """Streaming corpus intake: continuously ingest document files, score
    and filter them, and append only documents whose content fingerprint
    has never been seen — exact dedup ACROSS batches via an anti-join
    against the already-curated table (the streaming twin of
    pipeline/corpus.py's batch flow; near-dup runs as a periodic batch
    job over the curated table).

    ``nb_model_path`` points at a persisted :func:`corpus.curation.
    nb_train` model: each batch is then ALSO scored with
    :func:`corpus.curation.nb_apply` against yesterday's model and
    documents below ``nb_min_score`` drop — the streaming face of the
    pipeline's model-filter stage (train offline on the curated corpus,
    filter the intake online; the ≤buckets+2-row model loads once at
    stream definition and broadcasts into every micro-batch).

    Each micro-batch shuffles only itself; the seen-fingerprint set is a
    single-column scan of the target (at scale: partition the target by a
    fingerprint prefix so the anti-join prunes files).
    """
    import os

    from pyspark.sql import DataFrame as _DF

    from modular_etl_data_platform_spark.corpus import text as ctext

    stream = spark.readStream.schema(schema).json(source_dir)

    nb_model = None
    if nb_model_path is not None:
        from modular_etl_data_platform_spark.corpus import curation as ccur

        # load + sentinel-validate ONCE at stream definition; a missing
        # or malformed model should fail the start(), not batch 17
        nb_model = spark.read.parquet(nb_model_path)
        ccur.nb_apply(spark.createDataFrame([], schema), nb_model,
                      buckets=nb_buckets)

    def process(batch: _DF, batch_id: int) -> None:
        scored = ctext.with_text_stats(batch).filter(
            F.col("quality_score") >= min_quality
        )
        if nb_model is not None:
            from modular_etl_data_platform_spark.corpus import curation as ccur

            keep = ccur.nb_apply(
                batch, nb_model, buckets=nb_buckets
            ).filter(F.col("score") >= nb_min_score)
            scored = scored.join(
                keep.select("doc_id"), "doc_id", "left_semi"
            )
        # within-batch exact dedup: keep the min doc_id per fingerprint
        w_cols = ["fingerprint"]
        scored = scored.dropDuplicates(w_cols)
        if os.path.exists(target_path):
            seen = spark.read.parquet(target_path).select("fingerprint").dropDuplicates()
            scored = scored.join(F.broadcast(seen), "fingerprint", "left_anti")
        scored.write.mode("append").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
