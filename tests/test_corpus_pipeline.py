"""End-to-end corpus curation pipeline on the sf0.001 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import curation
from modular_etl_data_platform_spark.pipeline.corpus import (
    CurationConfig,
    curate_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
    train = docs.filter("doc_id % 97 <> 0")
    out = tmp_path_factory.mktemp("shards")
    cfg = CurationConfig(min_quality=0.05, lsh_threshold=0.5)
    res = curate_corpus(spark, train, benchmark, out_dir=str(out), config=cfg)
    res["out_dir"] = str(out)
    return res


def test_stage_counts_monotone(result):
    c = result["counts"]
    assert (
        c["input"]
        >= c["after_quality"]
        >= c["after_exact_dedup"]
        >= c["after_near_dedup"]
        >= c["after_decontamination"]
        > 0
    )


def test_no_duplicate_fingerprints_survive(result):
    kept = result["kept"]
    dupes = kept.groupBy("fingerprint").count().filter("count > 1").count()
    assert dupes == 0


def test_no_contaminated_docs_survive(spark, result):
    kept = result["kept"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
    recheck = curation.decontaminate(kept, benchmark)
    assert recheck.filter("is_contaminated").count() == 0


def test_weights_are_a_distribution(result):
    rows = result["weights"].collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    assert all(r.sample_factor > 0 for r in rows)


def test_shards_written_and_complete(spark, result):
    shards = spark.read.parquet(result["out_dir"])
    assert shards.count() == result["counts"]["after_decontamination"]
    # every doc carries its packing assignment
    assert {"bin_id", "tokens_before", "shard"} <= set(shards.columns)
    # bins are dense-ish: max bin consistent with total tokens / capacity
    total = shards.agg(F.sum("n_tokens")).collect()[0][0]
    max_bin = shards.agg(F.max("bin_id")).collect()[0][0]
    assert max_bin == total // 512


def test_line_dedup_stage_cleans_before_stats(spark, tmp_path):
    """With line_dedup_min_df set, boilerplate segments are gone before
    fingerprints/stats are computed, and fully-boilerplate docs drop out
    in stage 0."""
    rows = [
        (1, "FOOTER\nthe quick brown fox jumps over the lazy dog today", "en", "web", 0),
        (2, "FOOTER\nan entirely different sentence about data engines here", "en", "web", 0),
        (3, "FOOTER", "en", "web", 0),  # fully boilerplate
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text"))
    benchmark = spark.createDataFrame(
        [(99, "totally unrelated benchmark text")], "doc_id long, text string"
    )
    cfg = CurationConfig(
        min_quality=0.0, max_top_bigram_frac=1.0, line_dedup_min_df=2,
        pack_shards=2,
    )
    res = curate_corpus(
        spark, docs, benchmark, out_dir=str(tmp_path / "s"), config=cfg
    )
    c = res["counts"]
    assert c["after_line_dedup"] == 2  # doc 3 was pure boilerplate
    kept_texts = {r.doc_id: r.text for r in res["kept"].select("doc_id", "text").collect()}
    assert all("FOOTER" not in t for t in kept_texts.values())
    assert set(kept_texts) == {1, 2}


def test_ngram_dedup_stage_cuts_repeated_spans(spark, tmp_path):
    """With ngram_dedup_min_docs set, cross-document repeated n-gram
    spans are cut (keep-first) before stats; the canonical copy stays."""
    shared = "alpha beta gamma delta"
    rows = [
        (1, f"{shared} and the quick brown fox jumps over the dog", "en", "web", 0),
        (2, f"intro words {shared} completely different tail here today", "en", "web", 0),
        (3, "no repeats in this document at all whatsoever today", "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text"))
    benchmark = spark.createDataFrame(
        [(99, "totally unrelated benchmark text")], "doc_id long, text string"
    )
    cfg = CurationConfig(
        min_quality=0.0, max_top_bigram_frac=1.0,
        ngram_dedup_min_docs=2, ngram_dedup_n=4, pack_shards=2,
        lsh_threshold=0.99,
    )
    res = curate_corpus(
        spark, docs, benchmark, out_dir=str(tmp_path / "s"), config=cfg
    )
    c = res["counts"]
    assert c["after_ngram_dedup"] == 3
    texts = {r.doc_id: r.text for r in res["kept"].select("doc_id", "text").collect()}
    assert shared in texts[1]  # canonical copy (min doc_id) survives
    assert shared not in texts[2]  # later copy cut
    assert texts[3] == rows[2][1]  # untouched


def test_classifier_stage_and_unimax_scheme(spark):
    """Stage 2b (NB model filter) drops below-floor docs between
    after_quality and after_exact_dedup; mixture_scheme='unimax'
    reshapes the weights output to per-language allocations."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.filter("doc_id % 97 = 0").select("doc_id", "text")
    train = docs.filter("doc_id % 97 <> 0")
    cfg = CurationConfig(
        min_quality=0.05,
        lsh_threshold=0.5,
        classifier_positive=(
            "source IN ('src0','src1','src2','src3','src4',"
            "'src5','src6','src7','src8','src9')"
        ),
        classifier_min_score=-0.5,
        mixture_scheme="unimax",
    )
    res = curate_corpus(spark, train, benchmark, config=cfg)
    c = res["counts"]
    assert "after_classifier" in c
    assert c["after_classifier"] <= c["after_quality"]
    assert c["after_classifier"] > 0  # the floor must not wipe the corpus
    w = res["weights"]
    assert set(w.columns) == {
        "lang", "n_tokens", "capped", "alloc_tokens", "epochs",
    }
    rows = w.collect()
    assert all(r.epochs <= cfg.unimax_epoch_cap + 1e-9 for r in rows)
    # survivors' languages only
    langs = {
        r.lang for r in res["kept"].select("lang").distinct().collect()
    }
    assert {r.lang for r in rows} == langs


def test_unknown_mixture_scheme_rejected(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="mixture_scheme"):
        curate_corpus(
            spark,
            docs,
            docs.limit(1).select("doc_id", "text"),
            config=CurationConfig(mixture_scheme="zipf"),
        )
