"""End-to-end corpus curation pipeline: raw documents → training shards.

The LLM-data analogue of the e-commerce medallion flow
(``pipeline/ecommerce.py``), composing the corpus operators into the
standard curation sequence:

0. **line-dedup** (optional) — drop cross-document boilerplate segments
   before anything computes stats over them;
0b. **substring-dedup** (optional) — cut cross-document repeated
   n-gram spans (keep-first; corpus/ngram_dedup.py) that line
   granularity misses;
1. **annotate** — token/quality/language stats (pure projection);
2. **filter** — drop low-quality and repetition-heavy documents;
2b. **model filter** (optional) — CCNet/GPT-3-style classifier stage:
   score every survivor with the closed-form NB curated-vs-crawl
   classifier (``curation.nb_quality_scores``) and drop documents
   below the score floor — the published ordering (cheap heuristic
   rules first, the model over the survivors);
3. **dedup** — exact dedup, then MinHash-LSH near-dup clusters; keep one
   representative (the min doc_id) per cluster;
4. **decontaminate** — drop documents sharing word n-grams with the
   benchmark/eval set;
5. **mix** — per-(source, lang) sqrt-temperature sampling weights, or
   UniMax budget-capped per-language allocations (``mixture_scheme``);
6. **pack** — lay the surviving docs into fixed-token training bins and
   write shards partitioned by bin range.

Every stage is a DataFrame → DataFrame operator from ``corpus/``; this
module only sequences them and carries the bookkeeping (per-stage
survivor counts for the run report). Stage order matters at scale: the
cheap projections (quality, repetition) run BEFORE the shuffling stages
(dedup, decontamination) so each shuffle sees only survivors.

Scale: the only corpus-wide shuffles are the exact-dedup groupBy and the
LSH band join — both bounded by SCALE.md's bucket-capping recipe. The
benchmark n-gram set broadcasts. Packing uses the per-shard window form
at scale (see ``curation.packing_plan``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import curation, dedup, text


@dataclass
class CurationConfig:
    min_quality: float = 0.3
    max_top_bigram_frac: float = 0.5
    langs: list[str] = field(default_factory=lambda: ["en", "de", "es", "fr", "zh"])
    lsh_threshold: float = 0.5
    lsh_max_bucket: int | None = 1000
    decontaminate_ngram: int = 5
    pack_capacity: int = 512
    pack_shards: int | None = None
    mixture_groups: list[str] = field(default_factory=lambda: ["source", "lang"])
    #: drop text segments appearing in >= this many distinct docs BEFORE
    #: any stats/dedup (CCNet-style boilerplate removal); None = off
    line_dedup_min_df: int | None = None
    line_sep: str = "\n"
    #: cut cross-document repeated token n-gram spans (keep-first;
    #: Lee-et-al-style substring dedup) after line dedup; None = off
    ngram_dedup_min_docs: int | None = None
    ngram_dedup_n: int = 8
    #: grams above this occurrence count lose their canonical copy too
    #: (boilerplate flood guard; see ngram_dedup.remove_repeated_ngrams)
    ngram_dedup_max_occurrences: int | None = 10_000
    #: SQL predicate naming the curated (positive) seed for the NB
    #: model-filter stage (e.g. "source IN ('wiki', 'books')");
    #: None = stage off
    classifier_positive: str | None = None
    #: drop documents whose NB log-odds falls below this floor
    classifier_min_score: float = 0.0
    classifier_buckets: int = 4096
    #: "temperature" (sqrt-temperature weights over mixture_groups) or
    #: "unimax" (budget-capped per-language token allocations)
    mixture_scheme: str = "temperature"
    unimax_epoch_cap: int = 2


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str | None = None,
    config: CurationConfig | None = None,
) -> dict[str, object]:
    """Run the full curation flow; returns the per-stage DataFrames plus
    survivor counts. When ``out_dir`` is given, writes the packed shards
    partitioned by ``bin_id`` bucket."""
    cfg = config or CurationConfig()
    parallelism = spark.sparkContext.defaultParallelism
    counts: dict[str, int] = {"input": docs.count()}

    # 0. cross-document boilerplate removal — BEFORE any stats, so
    # fingerprints/token counts/quality see the cleaned text; docs whose
    # every segment was boilerplate drop out here
    if cfg.line_dedup_min_df:
        cleaned = dedup.line_dedup(
            docs, min_doc_freq=cfg.line_dedup_min_df, sep=cfg.line_sep
        )
        docs = (
            docs.drop("text")
            .join(
                cleaned.filter(F.col("n_lines_kept") > 0).withColumnRenamed(
                    "clean_text", "text"
                ),
                "doc_id",
            )
            .drop("n_lines_kept")
            .withColumn("n_chars", F.length("text"))
        )
        counts["after_line_dedup"] = docs.count()

    # 0b. cross-document repeated-substring removal: spans the line
    # granularity can't see (repeats inside longer lines or crossing
    # line boundaries); keep-first semantics, so exactly one canonical
    # copy of each repeated span survives corpus-wide
    if cfg.ngram_dedup_min_docs:
        from modular_etl_data_platform_spark.corpus import ngram_dedup

        cleaned = ngram_dedup.remove_repeated_ngrams(
            docs,
            n=cfg.ngram_dedup_n,
            min_docs=cfg.ngram_dedup_min_docs,
            max_occurrences=cfg.ngram_dedup_max_occurrences,
        )
        docs = (
            docs.drop("text")
            .join(cleaned.filter(F.length("text") > 0), "doc_id")
            .withColumn("n_chars", F.length("text"))
        )
        counts["after_ngram_dedup"] = docs.count()

    # 1-2. annotate + filter (pure projections — run before any shuffle)
    annotated = text.with_text_stats(docs).join(
        curation.repetition_stats(docs), "doc_id"
    )
    kept = annotated.filter(
        (F.col("quality_score") >= cfg.min_quality)
        & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
        & F.col("predicted_lang").isin(cfg.langs)
    )
    counts["after_quality"] = kept.count()

    # 2b. model-based quality filter (CCNet/GPT-3 ordering: the cheap
    # heuristic rules above prune first, the classifier scores only the
    # survivors; the 4096-row model broadcasts at any corpus size)
    if cfg.classifier_positive:
        scores = curation.nb_quality_scores(
            kept,
            cfg.classifier_positive,
            buckets=cfg.classifier_buckets,
        )
        kept = kept.join(
            scores.filter(
                F.col("score") >= cfg.classifier_min_score
            ).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        counts["after_classifier"] = kept.count()

    # 3a. exact dedup: keep the canonical (min-id) copy of each fingerprint
    canon = (
        kept.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept.join(canon, "doc_id", "left_semi").cache()
    counts["after_exact_dedup"] = kept.count()

    # 3b. near-dup clusters; keep the min-id representative per cluster
    pairs = dedup.minhash_lsh_dedup(
        kept,
        threshold=cfg.lsh_threshold,
        parallelism=parallelism,
        max_bucket_size=cfg.lsh_max_bucket,
    )
    clusters = dedup.connected_components(kept.select("doc_id"), pairs)
    reps = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(reps.select("doc_id"), "doc_id", "left_semi")
    counts["after_near_dedup"] = kept.count()

    # 4. benchmark decontamination
    contam = curation.decontaminate(
        kept, benchmark, n=cfg.decontaminate_ngram
    ).filter("is_contaminated")
    kept = kept.join(contam.select("doc_id"), "doc_id", "left_anti").cache()
    counts["after_decontamination"] = kept.count()

    # 5. mixture over the survivors: sampling weights (temperature) or
    # budget-capped token allocations (unimax) — "weights" is
    # scheme-shaped: (groups..., weight) vs (lang, ..., alloc_tokens)
    if cfg.mixture_scheme == "unimax":
        weights = curation.unimax_allocation(
            kept, epoch_cap=cfg.unimax_epoch_cap
        )
    elif cfg.mixture_scheme == "temperature":
        weights = curation.mixture_weights(kept, cfg.mixture_groups)
    else:
        raise ValueError(
            f"unknown mixture_scheme {cfg.mixture_scheme!r} "
            "(expected 'temperature' or 'unimax')"
        )

    # 6. packing plan + shards (per-shard windows when pack_shards set —
    # the default for corpora that don't fit one task's sort)
    plan = curation.packing_plan(
        kept.select("doc_id", "n_tokens"),
        capacity=cfg.pack_capacity,
        shards=cfg.pack_shards,
    )
    shards = kept.join(plan.select("doc_id", "bin_id", "tokens_before"), "doc_id")
    if out_dir is not None:
        (
            shards.withColumn("shard", F.floor(F.col("bin_id") / 64))
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(out_dir)
        )
    counts["bins"] = plan.agg(F.countDistinct("bin_id")).collect()[0][0]

    return {
        "annotated": annotated,
        "kept": kept,
        "weights": weights,
        "plan": plan,
        "shards": shards,
        "counts": counts,
    }


def stream_curate_versioned(
    spark: SparkSession,
    intake_path: str,
    curated_path: str,
    model: DataFrame,
    checkpoint: str,
    nb_buckets: int = 4096,
    bin_tokens: int = 512,
    app_id: str = "stream_curate",
    dedup_state: str = "index",
    fp_index_path: str | None = None,
    fp_index_buckets: int = 1024,
    near_dedup: bool = False,
    near_threshold: float = 0.5,
    shingle_n: int = 3,
    sig_index_path: str | None = None,
    sig_index_buckets: int = 1024,
    benchmark: DataFrame | None = None,
    decont_n: int = 5,
    index_compact_every: int | None = None,
    index_compact_target: int = 8,
    curated_files_per_commit: int | None = None,
):
    """The curation pipeline run CONTINUOUSLY — the streaming twin of
    the q171 batch composition, the production shape for crawl intake:

    versioned intake feed → NB model filter → cross-batch exact dedup
    → per-batch UniMax allocation → per-language sorted contiguous
    binning → ONE curated-table version per micro-batch,
    txn-idempotent.

    - **Intake** is a versioned table (the crawl landing zone, written
      by any producer through the commit protocol); the stream is its
      file-level change feed, so each micro-batch reads exactly the
      newly-committed files — O(new data) at any table size. Under a
      processing-time trigger ``max_versions_per_batch=1`` gives
      one-version-per-batch pacing; under availableNow (this entry
      point) the same shape comes from draining once per intake commit
      (the Python DataSource API has no ReadLimit pass-through — see
      q163's offset-walk note).
    - **Model filter**: ``nb_apply`` against a :func:`corpus.curation.
      nb_train` model trained OFFLINE (yesterday's curated corpus) —
      the ≤buckets+2-row model broadcasts into every batch; scoring is
      one explode + one broadcast join, batch-bounded.
    - **Cross-batch dedup** (``dedup_state="index"``, the default):
      within-batch keep-min-doc_id per text fingerprint, then an
      anti-join against a PERSISTED, bucket-clustered accepted-
      fingerprint index (:class:`corpus.state_index.
      BucketedStateIndex`) maintained by this same foreachBatch under
      its own (app, batch) transaction. The probe opens only the index
      files whose recorded bucket range intersects the batch's buckets
      — per-batch probe I/O is batch-proportional at ANY accepted-
      corpus size, never a corpus scan. ``dedup_state="scan"`` keeps
      the legacy full-scan anti-join against the curated table's
      fingerprints (exact same semantics, O(corpus) I/O per batch —
      retained for the index-equals-scan property tests).
    - **Cross-batch NEAR-dup** (``near_dedup=True``): the q171 batch
      flagship's blocking scheme run continuously — each batch doc's
      distinct ``shingle_n``-shingle hash set with its min-shingle
      block key ``bk``. Within the batch, a doc is dropped when any
      LOWER-id batch doc in its block verifies at Jaccard ≥
      ``near_threshold`` (greedy keep-lowest — deterministic and
      relationally replayable without recursion). Across batches, the
      ACCEPTED corpus's signatures live in a second
      :class:`BucketedStateIndex` keyed on ``bk`` with the accepted
      doc's shingle set as payload — the batch probes only its block
      keys' bucket-intersecting files, verifies candidates by exact
      Jaccard on the stored sets (never re-reading accepted text), and
      drops verified matches. Batch-proportional I/O, the q60
      incremental-near-dup shape with persisted, file-pruned state.
    - **Decontamination** (``benchmark`` given): the batch drops every
      doc sharing a word ``decont_n``-gram hash with the benchmark
      set (``curation.decontaminate`` — the probe's gram set is
      deduplicated and broadcast; the batch side is one explode +
      broadcast join, batch-bounded).
    - **UniMax + packing**: the batch's OWN language allocation
      (closed-form water-filling over L language rows) rides every
      curated row as (capped, alloc_tokens, epochs), and documents
      pack into ``bin_tokens`` bins per language by sorted contiguous
      binning — longest-first order cut every ``bin_tokens`` tokens
      (``curation.packing_plan``'s contiguous-fill approximation of
      first-fit-decreasing; a window over the batch partition —
      batch-bounded, never corpus-wide).
    - **Exactly-once**: each micro-batch publishes ONE curated version
      through ``VersionedTable.write(append, txn_app_id, txn_version=
      batch_id)`` — a retried batch (crash between commit and
      checkpoint, or a replay against a rebuilt checkpoint) is a
      no-op, Delta's foreachBatch-idempotence contract. The index
      append lands AFTER the curated commit under txn app
      ``{app_id}#fpidx``: a crash in the window between them leaves
      the index one batch behind the curated table, and the replayed
      batch (the stream checkpoint was never advanced) re-runs the
      probe against that same pre-batch index state, no-ops the
      curated write, and lands the missing index append — the index
      therefore always equals the curated fingerprint set at every
      probe.

    Returns the started StreamingQuery (availableNow)."""
    from pyspark.sql import Window

    from modular_etl_data_platform_spark.corpus import curation as ccur
    from modular_etl_data_platform_spark.corpus.state_index import (
        BucketedStateIndex,
    )
    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
    )
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        VersionedTableStreamDataSource,
    )

    if dedup_state not in ("index", "scan"):
        raise ValueError(
            f"dedup_state must be 'index' or 'scan', got {dedup_state!r}"
        )
    spark.dataSource.register(VersionedTableStreamDataSource)
    # Materialize the model ONCE at stream definition: nb_apply reads
    # the model twice per call (sentinel-row collect + broadcast
    # build), so an unmaterialized nb_train pipeline would re-run its
    # whole training aggregation for EVERY micro-batch. The model is
    # ≤ buckets+2 rows by contract — the same bound that makes the
    # per-batch broadcast safe makes this one-time driver collect safe
    # (guide §4.5: heavyweight init once, amortized over every batch).
    model = spark.createDataFrame(model.collect(), model.schema)
    # sentinel-validate the model at stream DEFINITION (a malformed
    # model must fail the start(), not batch 17); the collected
    # sentinels are reused by every micro-batch's nb_apply so the
    # per-batch sentinel collect disappears (guide §4.5: heavyweight
    # init once per stream, not once per batch)
    nb_s = ccur.nb_sentinels(model)
    ccur.nb_apply(
        spark.createDataFrame([], "doc_id long, text string"),
        model,
        buckets=nb_buckets,
        sentinels=nb_s,
    )
    # the benchmark's deduplicated gram set is batch-invariant: build
    # it once at stream definition and cache it, so each batch's
    # decontamination reads the cached probe set instead of
    # re-exploding the benchmark per consumer (guide §5)
    probe_grams = None
    if benchmark is not None:
        probe_grams = (
            benchmark.select(
                F.explode(
                    F.expr(ccur.ngram_hashes_sql("text", decont_n))
                ).alias("gh")
            )
            .dropDuplicates()
            .cache()
        )
    stream = (
        spark.readStream.format("versioned_table")
        .option("path", intake_path)
        .load()
    )

    fpidx_path = fp_index_path or (curated_path.rstrip("/") + "_fpidx")
    sigidx_path = sig_index_path or (curated_path.rstrip("/") + "_sigidx")

    def process(batch: DataFrame, batch_id: int) -> None:
        curated = VersionedTable(spark, curated_path)
        fpidx = BucketedStateIndex(
            spark,
            fpidx_path,
            key_cols=["fingerprint"],
            n_buckets=fp_index_buckets,
        )
        sigidx = BucketedStateIndex(
            spark,
            sigidx_path,
            key_cols=["bk"],
            n_buckets=sig_index_buckets,
            payload_cols=["acc_id", "acc_sh"],
        )
        scores = ccur.nb_apply(
            batch, model, buckets=nb_buckets, sentinels=nb_s
        )
        surv = batch.join(
            scores.filter("pred").select("doc_id", "score"), "doc_id"
        ).withColumn("fingerprint", F.md5(F.col("text")))
        # within-batch exact dedup: deterministic keep-min-doc_id (a
        # dropDuplicates here would be engine-order-dependent)
        wfp = Window.partitionBy("fingerprint").orderBy("doc_id")
        uniq = (
            surv.withColumn("__rn", F.row_number().over(wfp))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        persisted = []
        # pin the scored+deduped batch ONCE: everything below (the index
        # probe's bucket collect, the near-dup legs, the curated write,
        # the index appends) re-reads it, and without the cache each
        # consumer re-runs the NB scoring + window pipeline — including
        # a fresh pass over the micro-batch source (guide §5: cache a
        # frame reused by several actions; batch-sized by construction)
        uniq = uniq.cache()
        persisted.append(uniq)
        if dedup_state == "index":
            # cross-batch dedup against the persisted fingerprint
            # index: the probe opens only the batch's bucket-
            # intersecting index files — batch-proportional I/O at any
            # accepted-corpus size (the 100 TB design point; the scan
            # branch below is the O(corpus)-per-batch shape it
            # replaces). Pin the survivors: the index-probe anti-join
            # (pruned file reads + join) otherwise re-executes inside
            # every downstream consumer's action — the near-dup legs,
            # the allocation aggregate and the out fill all sit above
            # it (batch-sized by construction)
            uniq = fpidx.anti_join(uniq)
        elif curated.current_version() is not None:
            seen = curated.read().select("fingerprint").dropDuplicates()
            # broadcast the accepted-fingerprint set only while the
            # curated table is small (sizes ride the log — metadata-only
            # check); past the cap the anti-join shuffles instead of
            # OOMing the driver
            st = curated.log.resolve(curated.current_version())
            if sum(st.get("sizes", {}).values()) <= 256 * 1024 * 1024:
                seen = F.broadcast(seen)
            uniq = uniq.join(seen, "fingerprint", "left_anti")
        sigs = None
        if near_dedup:
            # HASHED shingle sets (60-bit ints, dedup.shingle_hashes_sql):
            # the persisted signature index stores these as its payload
            # — 8-byte ints instead of raw shingle strings; Jaccard on
            # the hash sets equals Jaccard on the shingles (same
            # md5-prefix hash on both engines, collisions ~2^-60).
            # Blocking is DOUBLE-MIN: each doc's TWO smallest shingle
            # hashes are its block keys, so a one-token edit can never
            # escape the block (a new minimum displaces, not replaces —
            # the old minimum stays among the top-2; single-min blocking
            # measurably missed one-token perturbations once the min
            # moved). Cost: <=2 key rows per doc in joins and index.
            # pin the shingle arrays: the within-batch self-join reads
            # sigs on BOTH sides (Spark has no common-subexpression
            # reuse across join sides), and the cross-batch leg + the
            # index append read them again — without the cache the
            # shingle explode/array pipeline re-runs per consumer
            sigs = uniq.select(
                "doc_id",
                F.array_distinct(
                    F.expr(dedup.shingle_hashes_sql("text", shingle_n))
                ).alias("sh"),
            ).cache()
            persisted.append(sigs)
            keys = sigs.select(
                "doc_id",
                F.explode(F.slice(F.array_sort("sh"), 1, 2)).alias("bk"),
            )

            def _jac(a_sh, b_sh):
                inter = F.size(F.array_intersect(a_sh, b_sh))
                return inter.cast("double") / (
                    F.size(a_sh) + F.size(b_sh) - inter
                )

            # within-batch greedy keep-lowest: a doc drops when ANY
            # lower-id batch doc sharing a block key verifies at >=
            # threshold (flat pair set — no cluster recursion,
            # deterministic, and relationally replayable)
            kp = keys.select(
                F.col("doc_id").alias("p_id"), F.col("bk").alias("p_bk")
            )
            pair_ids = (
                keys.join(
                    kp,
                    (F.col("bk") == F.col("p_bk"))
                    & (F.col("p_id") < F.col("doc_id")),
                )
                .select("doc_id", "p_id")
                .distinct()
            )
            p_sh = sigs.select(
                F.col("doc_id").alias("p_id"), F.col("sh").alias("p_sh")
            )
            # pin the (tiny, doc_id-only) dropped-set: it anti-joins
            # into uniq, sigs AND keys — uncached, the whole pair
            # self-join + Jaccard verification would re-run inside
            # every one of those consumers' downstream actions
            near_within = (
                pair_ids.join(sigs, "doc_id")
                .join(p_sh, "p_id")
                .filter(_jac(F.col("sh"), F.col("p_sh")) >= near_threshold)
                .select("doc_id")
                .distinct()
            ).cache()
            persisted.append(near_within)
            uniq = uniq.join(near_within, "doc_id", "left_anti")
            sigs = sigs.join(near_within, "doc_id", "left_anti")
            keys = keys.join(near_within, "doc_id", "left_anti")
            if sigidx.exists():
                # cross-batch: probe the accepted-signature index by
                # block key (file-pruned to the batch's bk buckets) and
                # verify candidates by exact Jaccard on the STORED
                # shingle sets — the accepted corpus's text is never
                # re-read
                cand = sigidx.matches(keys.join(sigs, "doc_id"))
                # same shape as near_within: a tiny dropped-set read by
                # three anti-joins — pin it so the index probe + stored-
                # set Jaccard verification runs once per batch
                near_acc = (
                    cand.filter(
                        _jac(F.col("sh"), F.col("acc_sh")) >= near_threshold
                    )
                    .select("doc_id")
                    .distinct()
                ).cache()
                persisted.append(near_acc)
                uniq = uniq.join(near_acc, "doc_id", "left_anti")
                sigs = sigs.join(near_acc, "doc_id", "left_anti")
                keys = keys.join(near_acc, "doc_id", "left_anti")
            # the signature-index append re-reads sigs/keys after the
            # curated commit — pin the surviving signatures
            sigs = sigs.cache()
            persisted.append(sigs)
            keys = keys.cache()
            persisted.append(keys)
        if benchmark is not None:
            contam = ccur.decontaminate(
                uniq, benchmark, n=decont_n, probe_grams=probe_grams
            ).filter("is_contaminated")
            uniq = uniq.join(contam.select("doc_id"), "doc_id", "left_anti")
        # pin the FINAL survivors: the UniMax aggregate and the packed
        # output below each evaluate this frame (Spark has no common-
        # subexpression reuse across the join's two sides), so without
        # the cache the whole per-batch chain — NB scoring, dedup
        # anti-joins, near-dup legs, decontamination explode — runs
        # once per consumer instead of once per batch. The count() is a
        # deliberate EAGER fill: both consumers sit inside ONE write
        # job, and two concurrent scans of an UNFILLED cached relation
        # serialize on the block-store's per-partition load locks
        # (measured: wall up ~50%, executor CPU down — tasks blocked,
        # not computing); filling first costs one cheap job and makes
        # every later read a lock-free cache hit
        uniq = uniq.withColumn(
            "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
        ).cache()
        persisted.append(uniq)
        uniq.count()
        uni = ccur.unimax_allocation(uniq)
        wp = Window.partitionBy("lang").orderBy(
            F.col("n_tokens").desc(), F.col("doc_id")
        )
        cum_before = F.coalesce(
            F.sum("n_tokens").over(
                wp.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        out = (
            uniq.withColumn(
                "bin_id", F.floor(cum_before / bin_tokens).cast("long")
            )
            .join(
                uni.select("lang", "capped", "alloc_tokens", "epochs"),
                "lang",
            )
            .withColumn("batch", F.lit(batch_id).cast("long"))
            .select(
                "batch", "doc_id", "lang", "source", "fingerprint",
                "n_tokens", "bin_id", "score", "capped", "alloc_tokens",
                "epochs",
            )
        )
        multi_use = dedup_state == "index" or near_dedup
        if multi_use:
            # multiple consumers below (curated commit + index
            # appends): cache so the NB-score/dedup/allocation pipeline
            # runs once per batch, not per write job
            out = out.cache()
            persisted.append(out)
        # size the commit's file count to the MICRO-BATCH, not the
        # cluster: a batch-sized frame landed at shuffle-partition
        # fan-out writes one near-empty file per task (guide §6: small
        # files hurt twice — every later curated read re-opens them).
        # The coalesce reads the already-cached `out`, so it narrows
        # only the write job, never the batch pipeline's parallelism;
        # None (or scan mode, where `out` is uncached) keeps the
        # engine's native fan-out.
        land = out
        if multi_use and curated_files_per_commit:
            land = out.coalesce(curated_files_per_commit)
        try:
            curated.write(
                land,
                mode="append" if curated.current_version() else "overwrite",
                txn_app_id=app_id,
                txn_version=batch_id,
            )
            if dedup_state == "index":
                # maintain the accepted-fingerprint index AFTER the
                # curated commit (crash-window analysis in the entry
                # docstring); its own (app#fpidx, batch) txn makes
                # replays no-ops
                fpidx.append(
                    out.select("fingerprint"),
                    txn_app_id=f"{app_id}#fpidx",
                    txn_version=batch_id,
                )
            if near_dedup:
                # accepted docs' signatures join the block-key index
                # (post-decontam survivors only — a contaminated doc is
                # not accepted state; its future duplicates fail the
                # same broadcast decontamination instead)
                sigidx.append(
                    keys.join(sigs, "doc_id")
                    .join(out.select("doc_id"), "doc_id", "left_semi")
                    .select(
                        F.col("bk"),
                        F.col("doc_id").alias("acc_id"),
                        F.col("sh").alias("acc_sh"),
                    ),
                    txn_app_id=f"{app_id}#sigidx",
                    txn_version=batch_id,
                )
            if (
                index_compact_every
                and (batch_id + 1) % index_compact_every == 0
            ):
                # bound the probe's epoch fan-out (docstring: Index
                # compaction) — re-cluster the state indexes on bucket
                if dedup_state == "index" and fpidx.exists():
                    fpidx.compact(target_files=index_compact_target)
                if near_dedup and sigidx.exists():
                    sigidx.compact(target_files=index_compact_target)
        finally:
            for frame in persisted:
                frame.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
