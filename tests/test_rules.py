"""Quality-rule bundle, weighted sampling, adaptive length filter
(corpus/rules.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import rules as crules


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", 43),
        (1, "### ### ### ### ### ### ### ###", "en", 31),  # all symbols
        (2, "a b", "en", 3),  # too short
        (3, "the cat sat on the mat and then slept", "en", 37),
        (4, "0 1 2 3 4 5 6 7 8 9 10 11", "en", 25),  # no alpha words
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])


def test_gopher_rules_flags(spark, docs):
    out = {r.doc_id: r.asDict() for r in crules.gopher_rules(docs).collect()}
    assert out[0]["passes"] is True
    # symbol doc: fails symbol ratio and alpha ratio and stopwords
    assert out[1]["rule_symbol_ratio"] is False
    assert out[1]["passes"] is False
    # 2-word doc: fails word count
    assert out[2]["rule_word_count"] is False
    assert out[2]["passes"] is False
    # digit doc: fails alpha ratio
    assert out[4]["rule_alpha_ratio"] is False
    assert out[4]["passes"] is False
    assert out[3]["passes"] is True


def test_gopher_rules_pure_projection(spark, docs):
    plan = crules.gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle at any scale


def test_weighted_sample_deterministic_and_biased(spark):
    rows = [(i, 10.0 if i % 2 == 0 else 0.1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    s1 = {r.doc_id for r in crules.weighted_sample(df, 100, "w").collect()}
    s2 = {r.doc_id for r in crules.weighted_sample(df, 100, "w").collect()}
    assert s1 == s2  # reproducible
    heavy = sum(1 for d in s1 if d % 2 == 0)
    assert heavy > 80  # 100x weight ratio dominates the sample
    # exponential-key math matches the reference formula for a spot row
    import hashlib

    row = crules.weighted_sample(df, 1, "w").collect()[0]
    u = (
        int(hashlib.md5(f"ws0|{row.doc_id}".encode()).hexdigest()[:5], 16) + 0.5
    ) / (1 << 20)
    w = 10.0 if row.doc_id % 2 == 0 else 0.1
    assert row.sample_key == pytest.approx(round(-math.log(u) / w, 9), abs=1e-9)


def test_weighted_sample_zero_weight_clamped(spark):
    df = spark.createDataFrame([(0, 0.0), (1, 1.0)], ["doc_id", "w"])
    out = crules.weighted_sample(df, 2, "w").collect()
    assert len(out) == 2  # zero weight clamps, never divides by zero
    assert all(math.isfinite(r.sample_key) for r in out)


def test_adaptive_length_filter_per_group_bounds(spark):
    rows = [("en", i, i * 10) for i in range(100)] + [
        ("zh", 1000 + i, 5000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_chars"])
    kept = crules.adaptive_length_filter(df).collect()
    en = [r.n_chars for r in kept if r.lang == "en"]
    zh = [r.n_chars for r in kept if r.lang == "zh"]
    # each group trimmed against ITS OWN distribution: en keeps ~[p05,p95]
    # of 0..990, zh of 5000..5099 — a global band would drop one group
    assert en and zh
    assert min(en) >= 40 and max(en) <= 950
    assert min(zh) >= 5004 and max(zh) <= 5095


def test_quality_suite_matches_component_operators(spark, sf_dir):
    """The fused suite must agree signal-for-signal with the three
    operators it replaces: gopher_rules, repetition_signals, and
    lexical_signals (entropy via the algebraic identity, equal to the
    definitional form within the 9-dp rounding convention)."""
    from modular_etl_data_platform_spark.corpus import rules as crules
    from modular_etl_data_platform_spark.corpus import text as ctext
    from modular_etl_data_platform_spark.queries.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    fused = {r["doc_id"]: r for r in crules.quality_suite(docs).collect()}
    words = {r["doc_id"]: r for r in crules.gopher_rules(docs).collect()}
    reps = {r["doc_id"]: r for r in crules.repetition_signals(docs).collect()}
    lex = {r["doc_id"]: r for r in ctext.lexical_signals(docs).collect()}
    assert set(fused) == set(words) == set(reps) == set(lex)
    word_cols = [
        "n_words", "mean_word_len", "symbol_ratio", "alpha_ratio",
        "stopword_hits", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_alpha_ratio", "rule_stopwords",
    ]
    rep_cols = [
        "top_2gram_frac", "top_3gram_frac", "top_4gram_frac",
        "dup_5gram_frac", "dup_10gram_frac", "rule_top_2gram",
        "rule_top_3gram", "rule_top_4gram", "rule_dup_5gram",
        "rule_dup_10gram",
    ]
    for d, f in fused.items():
        for c in word_cols:
            assert f[c] == words[d][c], (d, c, f[c], words[d][c])
        for c in rep_cols:
            assert f[c] == reps[d][c], (d, c, f[c], reps[d][c])
        assert f["n_words"] == lex[d]["n_tokens"]
        assert f["n_types"] == lex[d]["n_types"]
        assert f["ttr"] == lex[d]["ttr"]
        # two rounding paths to the same entropy: definitional -sum p ln p
        # (per-term rounded) vs ln n - (sum c ln c)/n (per-term rounded)
        assert abs(f["entropy"] - lex[d]["entropy"]) < 1e-6, (
            d, f["entropy"], lex[d]["entropy"],
        )
        # the suite's conjunction covers exactly the 10 component rules
        assert f["passes"] == (words[d]["passes"] and reps[d]["passes"])
