"""Plan-shape regression tests: the physical-plan properties SCALE.md
claims (pushdown, pruning, broadcast dims, bounded shuffles) asserted on
the actual plans so perf characteristics can't silently regress."""

from __future__ import annotations

import re

import pytest

from modular_etl_data_platform_spark.plans import explain_formatted, plan_summary
from modular_etl_data_platform_spark.queries.catalog import QUERIES


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    def get(name: str) -> str:
        return explain_formatted(QUERIES[name](spark, sf_dir))

    return get


def test_filters_push_to_parquet_scan(plan):
    p = plan("q02_filter_project")
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", p)
    assert pushed, p
    assert "l_shipdate" in pushed.group(1) and "l_quantity" in pushed.group(1)


def test_scan_prunes_columns(plan):
    p = plan("q02_filter_project")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert schemas
    # lineitem has 16 columns; the query needs far fewer
    assert all(len(s.split(",")) <= 8 for s in schemas), schemas


def test_star_join_broadcasts_dimensions(plan):
    p = plan("q03_star_join_revenue")
    assert "BroadcastExchange" in p
    # the fact table must NOT be shuffled for the join: no SortMergeJoin
    assert "SortMergeJoin" not in p


def test_asof_join_is_one_key_shuffle_no_range_join(plan):
    # the as-of join compiles to union + window over the key — ONE hash
    # shuffle, never a cartesian/range join
    p = plan("q11_asof_join")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    args = re.findall(r"Arguments: hashpartitioning\(([^,]+)", p)
    assert args and all("user_id" in a for a in args), args


def test_minhash_barrier_pins_single_md5_pass(spark):
    """The repartition barrier in minhash_signatures exists so projection
    collapse can NOT inline the per-shingle md5 pass into each of the k
    output columns (known 6x cliff: 24.7s -> 3.7s at sf0.1). Guard: the
    optimized plan computes md5 exactly once, and a RoundRobin exchange
    separates it from the k permutation projections."""
    from modular_etl_data_platform_spark.corpus.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta") for i in range(10)],
        ["doc_id", "text"],
    )
    out = minhash_signatures(docs, k=8, parallelism=4)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") == 1, (
        f"md5 computed {optimized.count('md5')}x — barrier collapsed:\n{optimized}"
    )
    # the shuffling Repartition (round-robin) barrier must survive between
    # the md5 projection and the permutation projection
    assert re.search(r"Repartition \d+, true", optimized), optimized


def test_lsh_pairs_single_shuffle_no_self_join(spark):
    """lsh_candidate_pairs generates in-bucket pairs from ONE data-heavy
    groupBy of the banded ids — no self-equi-join (the old form shuffled
    the banded table per side), no window. Without a cap: exactly two
    hash exchanges (band-key groupBy + pair dedup). With a cap: one more
    TINY-row exchange for the map-side-combined bucket count, applied as
    a broadcast anti-join BEFORE collect_list so an oversized bucket is
    never materialized as one aggregation-buffer array."""
    from modular_etl_data_platform_spark.corpus.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma delta") for i in range(20)],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(docs, k=8, parallelism=2)
    p = (
        lsh_candidate_pairs(sigs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in p and "Window" not in p, p
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 2, p

    capped = (
        lsh_candidate_pairs(sigs, max_bucket_size=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cap joins broadcast-anti (never a shuffle join) and the only
    # added exchange is the count aggregate's (partial_count = map-side
    # combined); the collect_list groupBy and pair dedup stay as before
    assert "BroadcastHashJoin" in capped and "LeftAnti" in capped, capped
    assert "SortMergeJoin" not in capped and "Window" not in capped, capped
    assert "partial_count" in capped, capped
    assert len(re.findall(r"Exchange hashpartitioning", capped)) == 3, capped
    # collect_list must run on the capped (post-anti-join) rows
    assert capped.index("collect_list") < capped.index("BroadcastHashJoin"), capped


def test_cap_buckets_never_shuffles_the_banded_table(spark):
    """_cap_buckets applies the oversized-bucket cap as a broadcast
    left-anti join against the (few) over-cap keys: the capped side must
    keep its partitioning — a hash exchange of the banded table to apply
    the cap would shuffle the whole persisted corpus at scale."""
    from modular_etl_data_platform_spark.corpus.dedup import _cap_buckets

    banded = spark.createDataFrame(
        [(i, i % 3, f"k{i % 5}") for i in range(50)],
        ["doc_id", "band_id", "band_key"],
    )
    p = _cap_buckets(banded, 5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "Window" not in p, p
    # the only hash exchange feeds the count aggregate (map-side combined
    # -> partial_count before it), never the anti-join probe side
    assert "partial_count" in p, p
    probe_side = p.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side, p


def test_packing_plan_is_sharded_not_global(plan):
    # q51 must pack per-shard: window partitioned by the doc_id shard,
    # never a single-partition global sort of the corpus
    p = plan("q51_packing_plan")
    assert "SinglePartition" not in p, p
    assert "hashpartitioning(__shard" in p or "hashpartitioning(shard" in p, p


def test_dedup_shuffles_once_on_pk(plan):
    p = plan("q05_dedup_latest")
    # exactly one exchange: the PK window shuffle (plus zero broadcasts)
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchange == 1, p
    assert re.search(r"Arguments: hashpartitioning\(user_id", p), p


def test_aggregation_is_partial_then_final(plan):
    p = plan("q01_pricing_summary")
    # map-side combine: partial_ aggregates before the single exchange
    assert "partial_sum" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_anti_join_is_broadcast(plan):
    p = plan("q39_ri_quarantine")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_decontamination_broadcasts_probe_set(plan):
    # the corpus side must never shuffle for the probe join: the probe
    # n-gram set broadcasts, and the only hash shuffles are the per-doc
    # count and the final left join back to train ids
    p = plan("q50_decontamination")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p.split("BroadcastHashJoin")[0]


def test_minhash_signature_hash_computed_before_barrier(spark, plan):
    # the md5 shingle-hash array must be projected BEFORE the repartition
    # exchange so the k permutation minima read the materialized array
    # (projection collapse would otherwise inline 8 md5 passes).
    # clearCache: an earlier test's cached LSH signature table would
    # otherwise substitute an InMemoryTableScan into this plan
    spark.catalog.clearCache()
    p = plan("q21_minhash_signatures")
    exchange_pos = p.find("RoundRobinPartitioning")
    assert exchange_pos > 0
    assert p.count("md5") == 1, "md5 shingle pass must appear exactly once"


def test_quality_suite_two_exchanges_one_scan(plan):
    """The fused quality suite (q165) must be ONE corpus pass: a single
    parquet scan of documents and exactly two exchanges — the
    (doc, n, gram) count and the per-doc fold. A third exchange or a
    second scan means the fusion regressed to the per-operator shape
    (three reads, three explodes) it exists to replace."""
    p = plan("q165_quality_suite")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchange == 2, p
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", p))
    assert n_scans == 1, p


def test_nb_classifier_model_broadcasts_and_featurizes_once(plan):
    """q167's scoring join must BROADCAST the 4096-row LLR model (the
    corpus side never shuffles for it — the fastText deployment shape),
    and the cached featurization must be the plan's only corpus pass: a
    SortMergeJoin on the bucket key means the model stopped
    broadcasting; more than the cache-definition's single parquet scan,
    or fewer than two InMemoryTableScan consumers (model branch +
    scoring branch), means the cache stopped sharing the explode."""
    p = plan("q167_quality_classifier")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert len(re.findall(r"InMemoryTableScan", p)) >= 2, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p


def test_unimax_single_corpus_aggregate(plan):
    """q168's only corpus-sized work is the per-language token count:
    one parquet scan, and the first exchange out of it carries the
    (lang, long) partial aggregate — the water-filling windows run on L
    language rows behind a single-partition exchange by construction."""
    p = plan("q168_unimax_mixture")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "partial_sum" in p, p


def test_moving_stats_single_shuffle_shared_sort(plan):
    # lag/lead/frames/row_number all share one user_id shuffle + sort
    p = plan("q54_user_moving_stats")
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchange == 1, p
    assert re.search(r"hashpartitioning\(user_id", p)


# Allowlisted nested-loop joins, each deliberate:
# - q24/q25/q47/q52: broadcast of a 1-row aggregate or query vector — a
#   pointwise projection, not an all-pairs scan;
# - q26: the exact all-pairs cosine form kept for oracle parity (the
#   LSH-prefiltered equi-join scale path lives in corpus/similarity.py).
CARTESIAN_OK = {
    "q24_ann_bruteforce_topk",
    "q25_ann_ivf_topk",
    "q26_embedding_near_dup",
    "q47_tfidf_top_terms",
    "q52_mixture_weights",
    "q59_lm_perplexity",  # 1-row trigram-total broadcast
    "q64_apply_mixture",  # 1-row max(sample_factor) broadcast
    "q77_curriculum_order",  # 1-row percentile-thresholds broadcast
    "q90_value_histogram",  # 1-row min/max-bounds broadcast
    "q91_key_skew_profile",  # 1-row total broadcast for the share column
    "q85_drift_report",  # 1-row category-share totals broadcast (TVD)
    "q96_bronze_quarantine",  # 1-row quarantine-count aggregate broadcast
    "q97_gold_dq_suite",  # 1-row violation-count aggregates broadcast
    "q103_ivf_batch_probe",  # k-row centroid sidecar broadcast (routing)
    # exact-search side of the recall evaluation: the small query SAMPLE
    # broadcasts into one scored corpus pass (offline eval, sample-sized)
    "q124_ann_recall",
    # PQ/ADC: the 1-row query vector broadcasts into the subspace slicer
    # and the m x codes table build (both tiny by construction); IVF-PQ
    # adds the same 1-row broadcast for the centroid routing — identical
    # shape to q24/q25/q103's allowlisted routing joins
    "q159_pq_adc_topk",
    "q160_ivf_pq_topk",
    # same 1-row query-vector broadcasts as q160, plus the exact
    # re-rank's k·α-row shortlist broadcast (shortlist-sized fetch)
    "q164_ivf_pq_rerank",
    # r13 optimization: the indexed-probe query literal (and its norm)
    # now ride a 1-row broadcast instead of re-folding the norm per
    # scanned row — same 1-row-broadcast shape as q24/q159
    "q62_ann_ivf_indexed",
    "q102_ivf_incremental_append",
}


def test_no_query_plans_a_cartesian_product(spark, sf_dir):
    """Global guard: no catalog query may compile to a CartesianProduct,
    and unbroadcast nested-loop joins are forbidden everywhere."""
    from modular_etl_data_platform_spark.queries.catalog import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        p = spark._jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "simple"
        )
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in p and name not in CARTESIAN_OK:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_plan_summary_and_distributed_guard(spark, sf_dir):
    from modular_etl_data_platform_spark.plans import assert_distributed

    df = QUERIES["q03_star_join_revenue"](spark, sf_dir)
    s = plan_summary(df)
    assert s["broadcast_hash_joins"] >= 3 and s["sort_merge_joins"] == 0
    assert s["pushed_filters"], s
    assert_distributed(df)  # no cartesian anywhere in the star query

    lone = spark.range(3).alias("a").crossJoin(spark.range(3).alias("b"))
    with pytest.raises(AssertionError):
        assert_distributed(lone)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path_factory):
    """§4 evidence: a date-partitioned fact joined to a filtered dim gets
    a runtime partition filter (DPP) — only matching partitions are
    scanned, the property fact tables at 100 TB live and die by."""
    import pyspark.sql.functions as F

    from modular_etl_data_platform_spark.plans import explain_formatted

    path = str(tmp_path_factory.mktemp("dpp") / "fact")
    fact = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 30).alias("date_key"), (F.col("id") * 2).alias("v")
    )
    fact.write.partitionBy("date_key").parquet(path)
    dim = spark.range(0, 30).select(
        F.col("id").alias("date_key"), (F.col("id") % 7 == 0).alias("is_weekend")
    )
    j = (
        spark.read.parquet(path)
        .join(dim.filter("is_weekend"), "date_key")
        .agg(F.sum("v").alias("total"))
    )
    p = explain_formatted(j)
    assert "dynamicpruning" in p.lower(), p
    j.collect()  # and it executes
