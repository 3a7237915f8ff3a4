"""Corpus curation operators for training-data pipelines: benchmark
decontamination, sequence-packing plans, mixture/sampling weights, and
repetition (boilerplate) scoring.

These extend the reference's DQ/dedup surface (cf.
``config/silver/schema/README.md`` validation + dedup contracts) with the
curation steps an LLM data pipeline runs between "cleaned corpus" and
"training shards". All hot paths are native Spark expressions — no Python
UDFs — with DuckDB oracle twins in ``queries/corpus_queries.py``.

Scale notes:

- **Decontamination** joins the corpus against the *benchmark* n-gram set,
  which is tiny (eval suites are MBs, the corpus is TBs) — broadcast the
  probe side, never shuffle the corpus. One explode + broadcast-join +
  per-doc count.
- **Packing plan** as written uses a global ordered window (exact,
  oracle-checkable). At 100 TB, pack per shard instead: the same window
  inside ``Window.partitionBy(shard)`` keeps every task independent and
  loses <1 bin of fill per shard — run it after ``repartitionByRange`` on
  the sort key.
- **Mixture weights** is a two-level aggregate over group counts —
  negligible data after the first groupBy.
- **Repetition stats** is a pure projection; the top-n-gram count is
  O(distinct² ) per row in the worst case, bounded by document length —
  fine for chunked/clipped corpora, and still cheaper than a
  per-doc groupBy shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_hashes_sql(text_col: str, n: int = 5) -> str:
    """Spark SQL: distinct 60-bit integer hashes (md5 prefix) of word
    n-grams of ``text_col``. Integer keys, not hex strings: the
    decontamination join/broadcast then moves 8-byte keys instead of
    32-char strings — 4× smaller probe set at 100 TB."""
    w = f"split({text_col}, ' ')"
    return (
        f"array_distinct(transform(sequence(0, greatest(size({w}) - {n}, 0)), "
        f"i -> cast(conv(substr(md5(concat_ws(' ', slice({w}, i+1, {n}))), 1, 15), 16, 10) as bigint)))"
    )


def ngram_hashes_duckdb(text_col: str, n: int = 5) -> str:
    w = f"string_split({text_col}, ' ')"
    return (
        f"list_distinct(list_transform(range(0, greatest(len({w}) - {n}, 0) + 1), "
        f"i -> ('0x' || substr(md5(array_to_string({w}[i+1:i+{n}], ' ')), 1, 15))::BIGINT))"
    )


def decontaminate(
    train: DataFrame,
    probe: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    probe_grams: DataFrame | None = None,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with a benchmark
    (eval) set — the decontamination pass run before training.

    Returns one row per training doc: ``n_overlap`` distinct contaminated
    n-grams and an ``is_contaminated`` flag. The probe n-gram set is
    deduplicated and **broadcast** (benchmarks are tiny relative to the
    corpus); the corpus side is one explode + broadcast hash join + count
    — the corpus itself is never shuffled. A caller that decontaminates
    many batches against the SAME benchmark can precompute (and cache)
    the deduplicated gram set once and pass it as ``probe_grams`` — the
    per-batch plan is then a cache read instead of re-exploding the
    benchmark every batch (the streaming pipeline does this).
    """
    if probe_grams is None:
        probe_grams = (
            probe.select(
                F.explode(F.expr(ngram_hashes_sql(text_col, n))).alias("gh")
            )
            .dropDuplicates()
        )
    train_grams = train.select(
        F.col(id_col), F.explode(F.expr(ngram_hashes_sql(text_col, n))).alias("gh")
    )
    hits = (
        train_grams.join(F.broadcast(probe_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def packing_plan(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shards: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-capacity context windows (training
    sequence packing): docs are laid out longest-first in one deterministic
    stream and cut every ``capacity`` tokens; ``bin_id`` is the window the
    document *starts* in.

    This is the contiguous-fill approximation of first-fit-decreasing —
    exact, order-stable (ties broken by id), and pure SQL, so the plan is
    reproducible across runs and engines. A document longer than
    ``capacity`` still gets a bin (it would be split downstream).

    ``shards`` is the scale path (the DEFAULT for the catalog query): docs
    are sharded deterministically by ``id % shards`` and packed
    longest-first WITHIN each shard — the window is partitioned, so no
    single task ever sees the whole corpus. Bin ids stay globally unique
    via ``bin_in_shard * shards + shard_id``; the cost is at most one
    partial bin per shard. ``shards=None`` runs the exact single-stream
    form (fine for ≤10⁶-doc inputs).
    """
    if shards is None:
        w = Window.orderBy(F.col(token_col).desc(), F.col(id_col))
        cum_before = F.coalesce(
            F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        return df.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("n_tokens"),
            F.floor(cum_before / capacity).cast("long").alias("bin_id"),
            cum_before.cast("long").alias("tokens_before"),
        )
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("long")
    w = Window.partitionBy("__shard").orderBy(F.col(token_col).desc(), F.col(id_col))
    cum_before = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        df.withColumn("__shard", shard)
        .select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("n_tokens"),
            (F.floor(cum_before / capacity) * shards + F.col("__shard"))
            .cast("long")
            .alias("bin_id"),
            cum_before.cast("long").alias("tokens_before"),
            F.col("__shard").alias("shard_id"),
        )
    )


def packing_summary(plan: DataFrame, capacity: int) -> DataFrame:
    """Per-bin packing stats: docs, token sum, fill ratio (integer/integer
    division → engine-portable doubles)."""
    return plan.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        (F.sum("n_tokens").cast("double") / F.lit(float(capacity))).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# mixture / sampling weights
# ---------------------------------------------------------------------------


def select_by_token_budget(
    df: DataFrame,
    group_cols: list[str],
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data selection under a per-slice token budget: within each group,
    rank docs best-first (``order_col`` desc, id tie-break) and keep the
    prefix whose cumulative ``token_col`` stays within ``budget`` — the
    "fill each domain's quota with its best documents" step of a
    training-mix build.

    One partitioned window (group key), no global sort; emits the
    running total as ``cum_tokens`` so callers can audit fill levels.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("cum_tokens", F.sum(token_col).over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )


def apply_mixture(
    df: DataFrame,
    group_cols: list[str],
    alpha: float = 0.5,
    token_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """REALIZE the mixture: deterministically downsample each corpus
    slice so the surviving corpus matches the temperature-scaled target
    mixture (:func:`mixture_weights`). The most-upweighted slice keeps
    everything; every other slice keeps ``sample_factor/max`` of its
    docs, selected by the same md5-bucket trick as
    ``text.stratified_sample_hash`` — reproducible across runs, engines
    and cluster layouts, and idempotent for pipeline re-runs.

    The per-group thresholds are a tiny broadcast (one row per slice);
    the corpus side is a pure filter projection — no shuffle.
    """
    w = mixture_weights(df, group_cols, alpha, token_col)
    mx = w.select(F.max("sample_factor").alias("__mx"))
    rates = (
        w.crossJoin(F.broadcast(mx))
        .select(
            *group_cols,
            F.floor(F.col("sample_factor") / F.col("__mx") * 10000)
            .cast("int")
            .alias("__thresh"),
        )
    )
    bucket = F.expr(
        f"conv(substr(md5(concat('{salt}|', CAST({id_col} AS STRING))), 1, 4), 16, 10) % 10000"
    ).cast("int")
    return (
        df.join(F.broadcast(rates), group_cols)
        .withColumn("__bucket", bucket)
        .filter(F.col("__bucket") < F.col("__thresh"))
        .drop("__bucket", "__thresh")
    )


def mixture_weights(
    df: DataFrame,
    group_cols: list[str],
    alpha: float = 0.5,
    token_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus slice (the
    "mixture" step that upweights rare domains/languages before training).

    share_g = size_g / total; weight_g ∝ share_g^alpha (alpha=0.5 →
    sqrt-temperature, computed with ``sqrt`` so the arithmetic is
    IEEE-exact and portable). ``sample_factor`` = weight/share is the
    per-document resampling multiplier. Size is row count, or token sum
    when ``token_col`` is given.

    Cross-engine determinism: the normalizing sum over group sqrt-shares
    is done in decimal(28,12) — double summation order varies between
    engines, decimals don't.
    """
    if alpha != 0.5:
        raise ValueError("portable implementation supports alpha=0.5 (sqrt)")
    size = F.sum(token_col) if token_col else F.count(F.lit(1))
    sizes = df.groupBy(*group_cols).agg(size.cast("long").alias("group_size"))
    total = sizes.select(F.sum("group_size").alias("total"))
    shared = sizes.crossJoin(F.broadcast(total)).withColumn(
        "share", F.col("group_size").cast("double") / F.col("total")
    )
    scaled = shared.withColumn("scaled", F.sqrt(F.col("share")))
    norm = scaled.select(
        F.sum(F.col("scaled").cast("decimal(28,12)")).cast("double").alias("norm")
    )
    return (
        scaled.crossJoin(F.broadcast(norm))
        .select(
            *group_cols,
            "group_size",
            "share",
            (F.col("scaled") / F.col("norm")).alias("weight"),
            ((F.col("scaled") / F.col("norm")) / F.col("share")).alias("sample_factor"),
        )
    )


# ---------------------------------------------------------------------------
# repetition / boilerplate scoring
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``dup_word_frac``: 1 − distinct/total words — boilerplate and
      keyword-stuffing detector;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams — loops and templated text.

    Pure projection (no shuffle). The top-bigram count sorts the bigram
    array and folds it in ONE ``aggregate`` pass tracking the longest run
    of equal neighbours — O(n log n) per row. Two traps this avoids: the
    naive count-each-distinct scan is O(distinct·total) (quadratic on
    exactly the repetitive documents this operator exists to catch), and
    chaining array expressions through nested lambdas re-evaluates the
    inner expression per element (interpreted higher-order functions have
    no common-subexpression elimination), turning "sort once" into
    "sort n² times".
    """
    w = f"split({text_col}, ' ')"
    bg = (
        f"transform(sequence(0, greatest(size({w}) - 2, 0)), "
        f"i -> concat_ws(' ', slice({w}, i+1, 2)))"
    )
    step = (
        "CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "THEN acc.run + 1 ELSE CAST(1 AS BIGINT) END"
    )
    max_run = (
        f"aggregate(sort_array({bg}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), "
        "'best', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct('prev', x, 'run', {step}, "
        f"'best', greatest(acc.best, {step})), "
        "acc -> acc.best)"
    )
    dup_word = (
        f"1.0 - CAST(size(array_distinct({w})) AS DOUBLE) / CAST(size({w}) AS DOUBLE)"
    )
    top_bigram = (
        f"CAST({max_run} AS DOUBLE) / CAST(size({bg}) AS DOUBLE)"
    )
    return df.select(
        F.col(id_col),
        F.expr(dup_word).alias("dup_word_frac"),
        F.expr(top_bigram).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# curriculum ordering
# ---------------------------------------------------------------------------


def curriculum_order(
    df: DataFrame,
    difficulty_col: str = "n_chars",
    n_buckets: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Difficulty-interleaved curriculum ordering: bucket documents into
    ``n_buckets`` global difficulty deciles, rank deterministically
    inside each bucket, and emit an ``interleave_key`` whose ascending
    order visits the buckets round-robin (easy, …, hard, easy, …) — the
    anti-clumping schedule a curriculum/annealing data loader consumes.

    Bucket thresholds come from ONE interpolated-percentile aggregate
    (n_buckets-1 doubles, broadcast back) — never ``ntile()``/
    ``percent_rank()``, whose unpartitioned global window would funnel
    the corpus through a single task. The in-bucket ``row_number`` is a
    window over ``n_buckets`` partitions; at 100 TB sub-shard it the same
    way as the packing plan (partition by (bucket, shard) and offset by
    shard — the interleave survives because ranks stay dense per shard).
    Thresholds are rounded to 6 dp so the bucket predicate is
    cross-engine stable."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    th = df.agg(
        *[
            F.round(F.expr(f"percentile({difficulty_col}, {f})"), 6).alias(
                f"__t{i}"
            )
            for i, f in enumerate(fracs)
        ]
    )
    bucketed = df.crossJoin(F.broadcast(th)).withColumn(
        "bucket",
        sum(
            F.when(F.col(difficulty_col) > F.col(f"__t{i}"), 1).otherwise(0)
            for i in range(len(fracs))
        ).cast("int"),
    ).drop(*[f"__t{i}" for i in range(len(fracs))])
    w = Window.partitionBy("bucket").orderBy(
        F.col(difficulty_col).asc(), F.col(id_col).asc()
    )
    return bucketed.withColumn(
        "rank_in_bucket", F.row_number().over(w).cast("long")
    ).withColumn(
        "interleave_key",
        ((F.col("rank_in_bucket") - 1) * n_buckets + F.col("bucket")).cast(
            "long"
        ),
    )


def group_split(
    df: DataFrame,
    group_col: str,
    val_frac: float = 0.1,
    salt: str = "split0",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/val split: the assignment hashes
    the GROUP key — pass the near-dup ``cluster_id`` from
    connected_components and every member of a duplicate cluster lands on
    the SAME side, so no near-copy of a validation document can leak into
    train (the failure mode of row-wise random splits on undeduplicated
    corpora). The md5-derived uniform makes the split reproducible across
    runs, engines and cluster layouts (same trick as
    rules.weighted_sample); expected val share is ``val_frac`` of
    GROUPS — weight by group size first if document-share matters.
    Pure projection: no shuffle, no RNG state."""
    from modular_etl_data_platform_spark.corpus.rules import _uniform_sql

    u = F.expr(_uniform_sql(group_col, salt))
    return df.withColumn(
        split_col, F.when(u < val_frac, F.lit("val")).otherwise(F.lit("train"))
    )


def deterministic_shuffle(
    df: DataFrame,
    num_shards: int,
    seed: str = "shuf0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible global training-order shuffle WITHOUT a global sort.

    Training pipelines need the corpus in a pseudo-random order that is
    exactly reproducible (resume a run, compare two runs, shard across
    data-loader workers). Each row gets a rank key ``md5(seed|id)``; its
    shard is a hex-prefix bucket of that key (uniform by construction —
    no hot shards regardless of id distribution), and its position
    within the shard is a ``row_number`` ordered by (key, id). Reading
    shards ``0..num_shards-1``, each in position order, replays one
    deterministic permutation of the corpus; changing ``seed`` gives an
    independent permutation (fresh epoch order).

    Scale: a pure projection plus ONE shuffle on the uniform shard key;
    each shard sorts independently (no global ordering step — the
    permutation is defined per shard, which is exactly how data-loader
    workers consume it). Returns (id, shard, pos) plus the input columns.

    ``seed`` is restricted to ``[A-Za-z0-9_.|-]`` (it is interpolated
    into the DuckDB oracle twin as a literal; a quote would break the
    parse there, so the contract rejects it uniformly). The Spark key is
    built from column expressions, never string-spliced SQL."""
    _validate_shuffle_seed(seed)
    key = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(F.col("__shuffle_key"), 1, 5), 16, 10).cast("long")
        % num_shards
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__shuffle_key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__shuffle_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__shuffle_key")
    )


def _validate_shuffle_seed(seed: str) -> None:
    import re

    if not re.fullmatch(r"[A-Za-z0-9_.|-]+", seed):
        raise ValueError(
            f"shuffle seed must match [A-Za-z0-9_.|-]+, got {seed!r}"
        )


def deterministic_shuffle_oracle_sql(
    inner_sql: str,
    num_shards: int,
    seed: str = "shuf0",
    id_col: str = "doc_id",
    extra_cols: str = "",
) -> str:
    """DuckDB twin of :func:`deterministic_shuffle` over ``inner_sql``."""
    _validate_shuffle_seed(seed)
    key = f"md5('{seed}|' || CAST({id_col} AS VARCHAR))"
    return f"""
    WITH t AS (
      SELECT {id_col}{extra_cols},
             {key} AS k,
             (('0x' || substr({key}, 1, 5))::BIGINT) % {num_shards} AS shard
      FROM ({inner_sql})
    )
    SELECT {id_col}{extra_cols}, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, {id_col})
                AS BIGINT) AS pos
    FROM t
    """


def _bucketed_ngram_sql(text_col: str, n: int, buckets: int) -> str:
    """Spark SQL: one hashed feature BUCKET per word n-gram (md5-prefix
    int mod ``buckets``) — NOT distinct: DSIR's features are counts.
    Twin of :func:`_bucketed_ngram_duckdb`."""
    w = f"split({text_col}, ' ')"
    return (
        f"transform(sequence(0, greatest(size({w}) - {n}, 0)), "
        f"i -> pmod(cast(conv(substr(md5(concat_ws(' ', slice({w}, i+1, {n}))), 1, 15), 16, 10) as bigint), {buckets}))"
    )


def _bucketed_ngram_duckdb(text_col: str, n: int, buckets: int) -> str:
    w = f"string_split({text_col}, ' ')"
    return (
        f"list_transform(range(0, greatest(len({w}) - {n}, 0) + 1), "
        f"i -> ('0x' || substr(md5(array_to_string({w}[i+1:i+{n}], ' ')), 1, 15))::BIGINT % {buckets})"
    )


def dsir_logweights(
    df: DataFrame,
    target_filter: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    ngram: int = 2,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling — public paper): score every raw document by
    how much its hashed n-gram feature profile looks like the TARGET
    domain (``target_filter`` selects the target sample, e.g.
    ``lang = 'en'`` or a curated-domain flag). Per document,
    ``logw = sum_b count_b * (ln p_target(b) - ln p_raw(b))`` with
    Laplace-smoothed bucket distributions — the paper's bag-of-hashed-
    ngrams importance estimator.

    Determinism across engines: the per-document sum folds the bucket
    terms in SORTED bucket order (``aggregate`` over a sorted struct
    array — same fold order as the oracle's ``list(... ORDER BY b)``),
    so float addition order can never differ between engines; the only
    residual is libm's ln (sub-ulp), which is why driver-gated outputs
    aggregate the SELECTED SET, not raw weights.

    Scale shape: the corpus is featurized ONCE — a single explode +
    two-key groupBy yields the per-doc counts (map-side combined), and
    BOTH distributions derive from that table by further aggregation
    (raw = sum over all docs, target = sum over the semi-joined target
    ids), so no second pass over the text ever runs. The bucket
    distribution table is ``buckets`` rows: it collects to the driver
    once (same budget as a watermark probe) to fold the T/R totals into
    the broadcast ratio table. Nothing is ever all-pairs; cost is
    linear in corpus tokens.

    Returns (id, logw)."""
    feats = df.select(
        F.col(id_col),
        F.explode(
            F.expr(_bucketed_ngram_sql(text_col, ngram, buckets))
        ).alias("b"),
    )
    cnts = feats.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c"))
    # one featurization pass across the three consumers; cache() (not
    # localCheckpoint) so the blocks stay LRU-EVICTABLE — a pinned
    # checkpoint per invocation would accumulate un-reclaimable memory
    # across a long session (recompute-on-eviction is the safe failure)
    cnts = cnts.cache()
    tgt_ids = df.filter(F.expr(target_filter)).select(F.col(id_col))
    raw = cnts.groupBy("b").agg(F.sum("c").alias("rc"))
    tgt = (
        cnts.join(tgt_ids, id_col, "left_semi")
        .groupBy("b")
        .agg(F.sum("c").alias("tc"))
    )
    # <= buckets rows each: fold totals driver-side, ship one ratio map
    dist = {
        r["b"]: [r["rc"], 0] for r in raw.collect()
    }
    for r in tgt.collect():
        dist[r["b"]][1] = r["tc"]
    R = sum(v[0] for v in dist.values())
    T = sum(v[1] for v in dist.values())
    spark = df.sparkSession
    ratio = spark.createDataFrame(
        [(b, int(rc), int(tc)) for b, (rc, tc) in sorted(dist.items())],
        "b long, rc long, tc long",
    ).select(
        "b",
        (
            (F.log(F.col("tc") + 1) - F.log(F.lit(float(T + buckets))))
            - (F.log(F.col("rc") + 1) - F.log(F.lit(float(R + buckets))))
        ).alias("lr"),
    )
    terms = cnts.join(F.broadcast(ratio), "b").select(
        F.col(id_col),
        F.struct(F.col("b"), (F.col("c") * F.col("lr")).alias("t")).alias("s"),
    )
    return terms.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list("s")),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("logw")
    )


def dsir_select(
    df: DataFrame,
    target_filter: str,
    n_select: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    ngram: int = 2,
) -> DataFrame:
    """Top ``n_select`` documents by DSIR importance weight
    (deterministic rank: weight desc, id asc — the paper's Gumbel
    resampling swapped for a reproducible top-k, the same determinism
    tradeoff the corpus samplers make). Returns the selected rows of
    ``df`` with ``logw`` attached."""
    w = dsir_logweights(df, target_filter, id_col, text_col, buckets, ngram)
    top = (
        w.orderBy(F.col("logw").desc(), F.col(id_col).asc())
        .limit(n_select)
    )
    return df.join(top, id_col)


# ---------------------------------------------------------------------------
# quality classifier (curated-vs-crawl Naive Bayes) and UniMax mixing
# ---------------------------------------------------------------------------


def nb_quality_scores(
    df: DataFrame,
    positive_filter: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Curated-vs-crawl quality classifier: multinomial Naive Bayes over
    hashed unigram features — the GPT-3 data-curation filter (Brown et
    al. 2020, Appendix A: a classifier trained with curated corpora as
    the positive class and raw CommonCrawl as the negative class scores
    every crawl document) and CCNet's model-based quality stage (Wenzek
    et al. 2020), with the linear classifier made closed-form (count-
    based NB with Laplace smoothing) so training is a single aggregation
    and the whole operator is oracle-replayable — no iterative solver.

    ``positive_filter`` is a SQL predicate selecting the curated
    (positive) documents, e.g. ``source IN ('src0','src1')``. Each
    document's score is

        ln(n_pos_docs) - ln(n_neg_docs)
        + sum_w count_w * [ln(c_pos_w + 1) - ln(N_pos + B)
                           - ln(c_neg_w + 1) + ln(N_neg + B)]

    i.e. the NB log-odds of "curated" with add-one smoothing over ``B``
    hash buckets; ``pred`` is the sign. Feature hashing (md5-prefix →
    bucket, the portable recipe shared with the MinHash/DSIR oracles)
    caps the model at ``buckets`` rows NO MATTER the corpus size — at
    100 TB the model still broadcasts, which is the published fastText-
    classifier deployment shape (score = one broadcast join + one
    map-side-combinable per-doc sum; the corpus shuffles only
    (id, bucket, count) rows, never text).

    Scale shape: the corpus is featurized ONCE — explode + two-key
    groupBy cached (LRU-evictable, the dsir_logweights convention);
    training totals fold driver-side from ONE 1-row aggregate (the
    watermark-probe budget); the ``buckets``-row LLR table broadcasts.
    Cross-engine determinism: every LLR and the prior round to 9
    decimals before use, per-token terms round to 9 and sum as
    decimal(28,12) (order-free, the q162 recipe), so scores are
    bit-stable vs the DuckDB twin.

    Returns (id, is_curated, score, pred).
    """
    feats = df.select(
        F.col(id_col),
        # 3VL: a NULL predicate row must land squarely in the negative
        # class (when(~NULL) selects NEITHER branch, so without the
        # coalesce such rows would vanish from token totals while
        # still counting as negative documents)
        F.coalesce(F.expr(positive_filter), F.lit(False)).alias("__pos"),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    ).select(
        id_col,
        "__pos",
        (
            F.conv(F.substring(F.md5(F.col("__w")), 1, 15), 16, 10).cast(
                "long"
            )
            % buckets
        ).alias("__b"),
    )
    cnts = feats.groupBy(id_col, "__pos", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # one featurization pass across the two consumers (totals + scoring);
    # cache(), not localCheckpoint, so blocks stay LRU-evictable
    cnts = cnts.cache()
    tot = cnts.agg(
        F.sum(F.when(F.col("__pos"), F.col("__c")).otherwise(0)).alias("pt"),
        F.sum(F.when(~F.col("__pos"), F.col("__c")).otherwise(0)).alias("nt"),
        F.count_distinct(F.when(F.col("__pos"), F.col(id_col))).alias("pd"),
        F.count_distinct(F.when(~F.col("__pos"), F.col(id_col))).alias("nd"),
    ).collect()[0]
    n_pos, n_neg = int(tot["pt"]), int(tot["nt"])
    if not tot["pd"] or not tot["nd"]:
        # Spark's log() returns NULL for non-positive input, so an empty
        # class would silently null every score instead of failing
        raise ValueError(
            "nb_quality_scores needs at least one document in EACH "
            f"class (positive={int(tot['pd'])}, negative={int(tot['nd'])})"
        )
    prior = F.round(
        F.log(F.lit(float(tot["pd"]))) - F.log(F.lit(float(tot["nd"]))), 9
    )
    model = cnts.groupBy("__b").agg(
        F.sum(F.when(F.col("__pos"), F.col("__c")).otherwise(0)).alias("pc"),
        F.sum(F.when(~F.col("__pos"), F.col("__c")).otherwise(0)).alias("nc"),
    )
    llr = model.select(
        "__b",
        F.round(
            (F.log(F.col("pc") + 1) - F.log(F.lit(float(n_pos + buckets))))
            - (F.log(F.col("nc") + 1) - F.log(F.lit(float(n_neg + buckets)))),
            9,
        ).alias("__lr"),
    )
    return (
        cnts.join(F.broadcast(llr), "__b")
        .groupBy(id_col, "__pos")
        .agg(
            F.sum(
                F.round(F.col("__c") * F.col("__lr"), 9).cast(
                    "decimal(28,12)"
                )
            ).alias("__s")
        )
        .select(
            F.col(id_col),
            F.col("__pos").alias("is_curated"),
            F.round(F.col("__s").cast("double") + prior, 9).alias("score"),
            (F.col("__s").cast("double") + prior > 0).alias("pred"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    epoch_cap: int = 2,
    budget_num: int = 3,
    budget_den: int = 2,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language-sampling allocation (Chung et al. 2023: budget-
    constrained uniform allocation with a per-language epoch cap —
    closed-form water-filling instead of temperature heuristics; the
    complement to :func:`mixture_weights`' sqrt-temperature scheme).

    Token budget ``B = (T * budget_num) // budget_den`` (integer, T =
    total corpus tokens) is spread as evenly as possible across
    languages without any language exceeding ``epoch_cap`` epochs of its
    own data: walking languages by ascending size, a language whose cap
    is below its fair share of the remaining budget is CAPPED at
    ``epoch_cap * size`` (low-resource languages get up-sampled to the
    cap); every language after the first uncapped one splits the
    remaining budget evenly (head languages get down-sampled). The
    paper's sequential water-filling is replaced by its closed form over
    prefix sums — rank languages ascending, a rank is capped iff

        N * s_i * (L - i + 1) <= B - N * P_{i-1}

    (monotone in i, enforced with a running-min so float/tie noise can
    never produce a capped rank after an uncapped one) — so the whole
    allocation is two window passes over L rows, no loop.

    Scale shape: the only corpus-sized work is the per-language token
    count (size(split) projection + map-side-combined groupBy —
    nothing wider than (lang, long) shuffles); the water-filling windows
    run over L rows (languages, not documents), so the single-partition
    unbounded window is by construction tiny. All arithmetic up to the
    final division is integer-exact; the division rounds to 9 decimals
    (the catalog's cross-engine float recipe).

    Returns (lang, n_tokens, capped, alloc_tokens, epochs).
    """
    if epoch_cap < 1 or budget_num < 1 or budget_den < 1:
        raise ValueError(
            "epoch_cap, budget_num and budget_den must be positive "
            f"integers (got {epoch_cap}, {budget_num}, {budget_den})"
        )
    n = F.size(F.split(F.col(text_col), " ")).cast("long")
    sizes = (
        df.select(F.col(lang_col).alias("lang"), n.alias("__n"))
        .groupBy("lang")
        .agg(F.sum("__n").alias("n_tokens"))
    )
    asc = Window.orderBy("n_tokens", "lang")
    run = asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    everything = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    N = F.lit(int(epoch_cap)).cast("long")
    r = sizes.select(
        "lang",
        "n_tokens",
        F.row_number().over(asc).alias("__i"),
        F.sum("n_tokens").over(run).alias("__p"),
        F.count(F.lit(1)).over(everything).alias("__l"),
        F.sum("n_tokens").over(everything).alias("__t"),
    ).withColumn(
        "__budget",
        F.expr(f"CAST(__t * {int(budget_num)} DIV {int(budget_den)} AS BIGINT)"),
    )
    cond = (
        N * F.col("n_tokens") * (F.col("__l") - F.col("__i") + 1)
        <= F.col("__budget") - N * (F.col("__p") - F.col("n_tokens"))
    )
    r = r.withColumn(
        "capped", F.min(cond.cast("int")).over(run) == 1
    ).withColumn(
        "__k",
        F.sum(F.col("capped").cast("long")).over(everything),
    ).withColumn(
        "__pk",
        F.sum(
            F.when(F.col("capped"), F.col("n_tokens")).otherwise(0)
        ).over(everything),
    )
    alloc_raw = F.when(
        F.col("capped"), (N * F.col("n_tokens")).cast("double")
    ).otherwise(
        (F.col("__budget") - N * F.col("__pk")).cast("double")
        / F.greatest(F.col("__l") - F.col("__k"), F.lit(1))
    )
    alloc = F.round(alloc_raw, 9)
    return r.select(
        "lang",
        "n_tokens",
        "capped",
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 9).alias("epochs"),
    )


def _nb_bucket(col: str, buckets: int):
    """Portable hashed-unigram bucket (md5 prefix → int, the MinHash/
    DSIR oracle recipe) — shared by the one-pass classifier and the
    train/apply split."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long")
        % buckets
    )


#: model rows carrying the scalar parts of a trained NB model: the class
#: prior (ln pos_docs − ln neg_docs) and the default LLR applied to
#: buckets never seen in training (the fully-smoothed ratio). Hash
#: buckets are always ≥ 0, so the sentinels can never collide.
NB_PRIOR_BUCKET = -1
NB_DEFAULT_BUCKET = -2


def nb_train(
    df: DataFrame,
    positive_filter: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Train the :func:`nb_quality_scores` model ONCE and return it as a
    persistable ``(b long, lr double)`` DataFrame — ``buckets`` LLR rows
    plus two sentinel rows (:data:`NB_PRIOR_BUCKET` carries the class
    prior, :data:`NB_DEFAULT_BUCKET` the fully-smoothed LLR for buckets
    the training corpus never produced, which :func:`nb_apply` gives to
    unseen features). Write it with ``model.write.parquet(...)`` and
    score tomorrow's intake batches without touching today's corpus —
    the incremental path the dedup/IVF/gram-index families already
    have; the artifact is ≤ ``buckets``+2 rows no matter the corpus.

    Same determinism recipe as the one-pass form (round-9 LLRs), so
    train-then-apply on the SAME corpus reproduces
    :func:`nb_quality_scores` bit-for-bit (pinned in tests)."""
    from pyspark.sql import Observation

    # per-class DOC counts ride the featurization pass as an
    # Observation on the pre-explode frame (one row per document) —
    # the model trains from literally ONE corpus scan. They are NOT
    # derivable from the bucket aggregate: per-bucket distinct-doc
    # counts overcount across buckets (a doc hits many buckets).
    obs = Observation("nb_train_docs")
    base = df.select(
        # 3VL: a NULL predicate row must land squarely in the negative
        # class (when(~NULL) selects NEITHER branch, so without the
        # coalesce such rows would vanish from token totals while
        # still counting as negative documents)
        F.coalesce(F.expr(positive_filter), F.lit(False)).alias("__pos"),
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
    ).observe(
        obs,
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("pos_docs"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0)).alias("neg_docs"),
    )
    feats = base.select(
        "__pos",
        "__id",
        F.explode(F.split(F.col("__t"), " ")).alias("__w"),
    ).select("__pos", "__id", _nb_bucket("__w", buckets).alias("__b"))
    cnts = feats.groupBy("__pos", "__b").agg(
        F.count(F.lit(1)).alias("__c"),
        F.count_distinct("__id").alias("__d"),
    )
    cnts = cnts.cache()
    tot = cnts.agg(
        F.sum(F.when(F.col("__pos"), F.col("__c")).otherwise(0)).alias("pt"),
        F.sum(F.when(~F.col("__pos"), F.col("__c")).otherwise(0)).alias("nt"),
    ).collect()[0]
    # the collect above consumed the observed plan, so the metrics are
    # in hand; SUM over zero rows is NULL (ANSI), never "no violation"
    metrics = obs.get
    dcnt = {
        True: int(metrics["pos_docs"] or 0),
        False: int(metrics["neg_docs"] or 0),
    }
    if not dcnt.get(True) or not dcnt.get(False):
        raise ValueError(
            "nb_train needs at least one document in EACH class "
            f"(positive={dcnt.get(True, 0)}, negative={dcnt.get(False, 0)})"
        )
    n_pos, n_neg = int(tot["pt"]), int(tot["nt"])
    import math

    prior = round(
        math.log(float(dcnt[True])) - math.log(float(dcnt[False])), 9
    )
    default_lr = round(
        -math.log(float(n_pos + buckets)) + math.log(float(n_neg + buckets)),
        9,
    )
    model = (
        cnts.groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__pos"), F.col("__c")).otherwise(0)).alias(
                "pc"
            ),
            F.sum(F.when(~F.col("__pos"), F.col("__c")).otherwise(0)).alias(
                "nc"
            ),
        )
        .select(
            F.col("__b").alias("b"),
            F.round(
                (
                    F.log(F.col("pc") + 1)
                    - F.log(F.lit(float(n_pos + buckets)))
                )
                - (
                    F.log(F.col("nc") + 1)
                    - F.log(F.lit(float(n_neg + buckets)))
                ),
                9,
            ).alias("lr"),
        )
    )
    sentinels = df.sparkSession.createDataFrame(
        [(NB_PRIOR_BUCKET, prior), (NB_DEFAULT_BUCKET, default_lr)],
        "b long, lr double",
    )
    return model.unionByName(sentinels)


def nb_sentinels(model: DataFrame) -> dict[int, float]:
    """Collect and validate a :func:`nb_train` model's sentinel rows
    (class prior + default LLR) — one tiny driver action over the
    ≤ buckets+2-row model. :func:`nb_apply` calls this internally;
    per-batch callers (the streaming curation pipeline) hoist it to
    stream definition so the collect runs once per stream instead of
    once per micro-batch (guide §4.5: heavyweight init once)."""
    prior_rows = {
        int(r["b"]): float(r["lr"])
        for r in model.filter(F.col("b") < 0).collect()
    }
    if NB_PRIOR_BUCKET not in prior_rows or NB_DEFAULT_BUCKET not in prior_rows:
        raise ValueError(
            "model is missing its sentinel rows — was it produced by "
            "nb_train()?"
        )
    return prior_rows


def nb_apply(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    sentinels: dict[int, float] | None = None,
) -> DataFrame:
    """Score documents against a :func:`nb_train` model (today's intake
    batch against yesterday's model — no retraining): one explode, one
    broadcast join against the ≤ ``buckets``+2-row model, one per-doc
    decimal fold. Buckets the model never saw score the
    :data:`NB_DEFAULT_BUCKET` fully-smoothed LLR. ``buckets`` must
    match the value the model was trained with. ``sentinels`` (from
    :func:`nb_sentinels`) skips the per-call sentinel collect when the
    caller already holds the validated prior rows.

    Returns (id, score, pred) — no ``is_curated``: the label predicate
    is a training-time concept and an intake batch has no label."""
    prior_rows = sentinels if sentinels is not None else nb_sentinels(model)
    prior = F.lit(prior_rows[NB_PRIOR_BUCKET])
    default_lr = F.lit(prior_rows[NB_DEFAULT_BUCKET])
    feats = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    ).select(id_col, _nb_bucket("__w", buckets).alias("b"))
    cnts = feats.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("__c"))
    return (
        cnts.join(F.broadcast(model.filter(F.col("b") >= 0)), "b", "left")
        .select(
            F.col(id_col),
            F.round(
                F.col("__c") * F.coalesce(F.col("lr"), default_lr), 9
            ).alias("__t"),
        )
        .groupBy(id_col)
        .agg(F.sum(F.col("__t").cast("decimal(28,12)")).alias("__s"))
        .select(
            F.col(id_col),
            F.round(F.col("__s").cast("double") + prior, 9).alias("score"),
            (F.col("__s").cast("double") + prior > 0).alias("pred"),
        )
    )
