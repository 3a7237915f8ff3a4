from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import curation as ccur


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon nothing shared here"),  # shares the 5-gram prefix
        (2, "totally unrelated words with zero overlap whatsoever"),
        (3, "spam spam spam spam spam spam spam spam"),
        (4, "one two three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_flags_overlap(spark, docs):
    probe = docs.filter("doc_id = 0")
    train = docs.filter("doc_id != 0")
    out = {r.doc_id: (r.n_overlap, r.is_contaminated)
           for r in ccur.decontaminate(train, probe).collect()}
    assert out[1][1] is True and out[1][0] >= 1  # shares 'alpha..epsilon'
    assert out[2] == (0, False)
    assert out[4] == (0, False)
    assert set(out) == {1, 2, 3, 4}  # zero-overlap docs are kept


def test_packing_plan_fills_bins(spark):
    rows = [(i, f"doc{i}", t) for i, t in enumerate([60, 50, 40, 30, 20, 10])]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_tokens"])
    plan = {r.doc_id: r for r in
            ccur.packing_plan(df, capacity=100).collect()}
    # longest-first layout: 60, 50 -> 60 starts bin 0; 50 starts at 60 (bin 0)
    assert plan[0].bin_id == 0 and plan[0].tokens_before == 0
    assert plan[1].bin_id == 0 and plan[1].tokens_before == 60
    assert plan[2].bin_id == 1  # starts at 110
    # every doc gets exactly one row, cumulative ordering is consistent
    befores = sorted(r.tokens_before for r in plan.values())
    assert befores == [0, 60, 110, 150, 180, 200]


def test_mixture_weights_sum_to_one(spark):
    rows = [(i, "g1" if i < 8 else "g2") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = {r.grp: r for r in ccur.mixture_weights(df, ["grp"]).collect()}
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-9
    # sqrt temperature upweights the minority slice
    assert out["g2"].sample_factor > 1.0 > out["g1"].sample_factor
    assert abs(out["g1"].share - 0.8) < 1e-12


def test_mixture_weights_rejects_other_alpha(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "grp"])
    with pytest.raises(ValueError):
        ccur.mixture_weights(df, ["grp"], alpha=0.3)


def test_repetition_stats(spark, docs):
    out = {r.doc_id: r for r in ccur.repetition_stats(docs).collect()}
    assert out[3].dup_word_frac == pytest.approx(1 - 1 / 8)
    assert out[3].top_bigram_frac == 1.0  # 'spam spam' is every bigram
    assert out[4].dup_word_frac == 0.0
    assert out[4].top_bigram_frac == pytest.approx(1 / 9)


def test_apply_mixture_realizes_target_proportions(spark):
    """900/100 skewed corpus, sqrt temperature: the minority slice keeps
    everything (it is the most-upweighted), the majority sheds to ~1/3 —
    the realized mixture approaches the 75/25 sqrt target."""
    from modular_etl_data_platform_spark.corpus.curation import apply_mixture

    rows = [(i, "big", "en") for i in range(900)] + [
        (1000 + i, "small", "en") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "lang"])
    out = apply_mixture(docs, ["source", "lang"])
    by_src = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert by_src["small"] == 100          # most-upweighted keeps all
    assert 250 <= by_src["big"] <= 420     # ~1/3 of 900, md5-bucket noise

    # deterministic: same input -> identical survivors
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in apply_mixture(docs, ["source", "lang"]).collect()}
    assert a == b


def test_induce_vocab_and_oov(spark):
    from modular_etl_data_platform_spark.corpus.text import induce_vocab, oov_stats

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b rare")], ["doc_id", "text"]
    )
    vocab = induce_vocab(docs, vocab_size=2)
    assert [r.word for r in vocab.collect()] == ["a", "b"]  # freq desc, tie lex
    out = {r.doc_id: (r.n_tokens, r.n_oov, round(r.oov_rate, 6))
           for r in oov_stats(docs, vocab).collect()}
    assert out[0] == (6, 1, round(1 / 6, 6))   # 'c' is OOV
    assert out[1] == (3, 1, round(1 / 3, 6))   # 'rare' is OOV


def test_select_by_token_budget(spark):
    from modular_etl_data_platform_spark.corpus.curation import (
        select_by_token_budget,
    )

    rows = [
        (0, "a", 50, 9.0), (1, "a", 40, 8.0), (2, "a", 30, 7.0),
        (3, "b", 100, 1.0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens", "quality_score"])
    kept = {r.doc_id: r.cum_tokens for r in select_by_token_budget(
        df, ["source"], budget=95, token_col="n_tokens", order_col="quality_score"
    ).collect()}
    # slice a: 50+40=90 fits, +30 would blow the budget; slice b: 100 > 95
    assert kept == {0: 50, 1: 90}


def test_group_split_keeps_groups_together(spark):
    """group_split: every member of a group lands on the same side, the
    assignment is deterministic across invocations, and val share is in
    a sane band for many groups."""
    from pyspark.sql import functions as F

    from modular_etl_data_platform_spark.corpus.curation import group_split

    rows = [(i, i // 4) for i in range(400)]  # 100 groups of 4 docs
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = group_split(df, "cluster_id", val_frac=0.2)
    per_group = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .collect()
    )
    assert all(r.n_sides == 1 for r in per_group)
    val_groups = (
        out.filter("split = 'val'").select("cluster_id").distinct().count()
    )
    assert 5 <= val_groups <= 40  # ~20 of 100 expected
    again = {
        (r.doc_id, r.split) for r in group_split(df, "cluster_id", 0.2).collect()
    }
    assert again == {(r.doc_id, r.split) for r in out.collect()}


def test_deterministic_shuffle_reproducible_and_balanced(spark, sf_dir):
    from modular_etl_data_platform_spark.corpus.curation import (
        deterministic_shuffle,
    )
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = deterministic_shuffle(docs, num_shards=8)
    b = deterministic_shuffle(docs, num_shards=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every row appears exactly once; positions are dense per shard
    n = docs.count()
    assert a.count() == n
    dense = a.groupBy("shard").agg(
        F.count(F.lit(1)).alias("c"), F.max("pos").alias("m")
    )
    assert all(r["c"] == r["m"] for r in dense.collect())
    # uniform shards: no shard is empty or dominant at 8 shards
    counts = [r["c"] for r in dense.collect()]
    assert len(counts) == 8 and max(counts) < n / 2
    # a different seed yields a different permutation
    c = deterministic_shuffle(docs, num_shards=8, seed="epoch1")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_deterministic_shuffle_rejects_unsafe_seed(spark, sf_dir):
    """The seed is interpolated into the DuckDB oracle twin as a SQL
    literal — a quote or expression fragment must be rejected up front,
    in BOTH the operator and the oracle builder."""
    import pytest

    from modular_etl_data_platform_spark.corpus.curation import (
        deterministic_shuffle,
        deterministic_shuffle_oracle_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    for bad in ("ep'och", 'x") --', "a;b", "s e e d"):
        with pytest.raises(ValueError, match="seed must match"):
            deterministic_shuffle(docs, num_shards=4, seed=bad)
        with pytest.raises(ValueError, match="seed must match"):
            deterministic_shuffle_oracle_sql("SELECT 1 AS doc_id", 4, seed=bad)
    # the documented alphabet stays accepted
    assert deterministic_shuffle(docs, num_shards=4, seed="Ep0_ch.2|x-")


def test_dsir_enriches_target_domain(spark):
    """DSIR (hashed-bigram importance weights): documents written in
    the target's vocabulary outrank off-domain ones, selection is
    deterministic, and the selected set keeps the requested size."""
    from modular_etl_data_platform_spark.corpus.curation import (
        dsir_logweights,
        dsir_select,
    )

    rows = []
    for i in range(30):  # target-like docs: English-ish function words
        rows.append((i, "the cat sat on the mat and the dog ran", "en"))
    for i in range(30, 60):  # off-domain docs: disjoint vocabulary
        rows.append((i, "zqx wvu rrr kkk ppp mmm nnn bbb ccc ddd", "xx"))
    # the scorer only SEES the target via the filter; text drives ranks
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r.doc_id: r.logw for r in dsir_logweights(docs, "lang = 'en'").collect()}
    assert min(w[i] for i in range(30)) > max(w[i] for i in range(30, 60))
    sel = dsir_select(docs, "lang = 'en'", 30)
    ids = {r.doc_id for r in sel.collect()}
    assert ids == set(range(30))  # exactly the on-domain docs
    # deterministic: same data -> same weights
    w2 = {r.doc_id: r.logw for r in dsir_logweights(docs, "lang = 'en'").collect()}
    assert w == w2


def test_nb_classifier_separates_planted_vocab(spark):
    # positive docs use a disjoint planted vocabulary -> the NB log-odds
    # must separate the classes with certainty, and a held-back mixed doc
    # must land between the pure classes
    pos = [(i, "good clean prose text", "cur") for i in range(4)]
    neg = [(10 + i, "junk spam noise garbage", "crawl") for i in range(4)]
    mid = [(20, "good clean spam garbage", "crawl")]
    df = spark.createDataFrame(pos + neg + mid, ["doc_id", "text", "src"])
    out = {
        r.doc_id: r
        for r in ccur.nb_quality_scores(
            df, "src = 'cur'", buckets=64
        ).collect()
    }
    assert len(out) == 9
    assert all(out[i].pred and out[i].score > 0 for i in range(4))
    assert all(not out[10 + i].pred and out[10 + i].score < 0 for i in range(4))
    lo = max(out[10 + i].score for i in range(4))
    hi = min(out[i].score for i in range(4))
    assert lo < out[20].score < hi  # mixed doc scores between the classes
    assert out[0].is_curated and not out[10].is_curated


def test_nb_classifier_deterministic_across_runs(spark):
    rows = [
        (i, f"w{i % 7} w{(i * 3) % 11} w{(i * 5) % 13}", f"s{i % 4}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    a = ccur.nb_quality_scores(df, "src IN ('s0', 's1')", buckets=128)
    b = ccur.nb_quality_scores(df, "src IN ('s0', 's1')", buckets=128)
    sa = {r.doc_id: r.score for r in a.collect()}
    sb = {r.doc_id: r.score for r in b.collect()}
    assert sa == sb  # bit-stable: round-9 terms, decimal sums


def test_unimax_caps_low_resource_and_waterfills_head(spark):
    # sizes 100/200/700, cap 2 epochs, budget = 1.5x total = 1500:
    # rank1 (100): 2*100*3=600 <= 1500           -> capped at 200
    # rank2 (200): 2*200*2=800 <= 1500-200=1300  -> capped at 400
    # rank3 (700): 2*700*1=1400 > 1300-400=900   -> uncapped, gets 900
    rows = (
        [(i, " ".join(["w"] * 100), "lo") for i in range(1)]
        + [(10 + i, " ".join(["w"] * 100), "mid") for i in range(2)]
        + [(20 + i, " ".join(["w"] * 100), "hi") for i in range(7)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.lang: r for r in ccur.unimax_allocation(df).collect()}
    assert out["lo"].capped and out["lo"].alloc_tokens == 200.0
    assert out["lo"].epochs == 2.0
    assert out["mid"].capped and out["mid"].alloc_tokens == 400.0
    assert not out["hi"].capped and out["hi"].alloc_tokens == 900.0
    assert abs(out["hi"].epochs - round(900 / 700, 9)) < 1e-12
    # allocations exhaust the budget exactly
    assert sum(r.alloc_tokens for r in out.values()) == 1500.0


def test_unimax_all_capped_budget_surplus(spark):
    # budget exceeds every cap -> all languages capped, no division blows
    rows = [(i, " ".join(["w"] * 10), f"l{i}") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = ccur.unimax_allocation(
        df, epoch_cap=1, budget_num=10, budget_den=1
    ).collect()
    assert all(r.capped for r in out)
    assert all(r.epochs == 1.0 for r in out)


def test_nb_classifier_rejects_empty_class(spark):
    df = spark.createDataFrame(
        [(0, "a b c", "cur"), (1, "d e f", "cur")],
        ["doc_id", "text", "src"],
    )
    with pytest.raises(ValueError, match="EACH"):
        ccur.nb_quality_scores(df, "src = 'cur'", buckets=16)


def test_unimax_rejects_nonpositive_params(spark):
    df = spark.createDataFrame([(0, "a", "en")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError, match="positive"):
        ccur.unimax_allocation(df, epoch_cap=0)


def test_nb_train_apply_reproduces_one_pass(spark):
    rows = [
        (i, f"w{i % 7} w{(i * 3) % 11} w{(i * 5) % 13}", f"s{i % 4}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    pos = "src IN ('s0', 's1')"
    one_pass = {
        r.doc_id: (r.score, r.pred)
        for r in ccur.nb_quality_scores(df, pos, buckets=128).collect()
    }
    model = ccur.nb_train(df, pos, buckets=128)
    applied = {
        r.doc_id: (r.score, r.pred)
        for r in ccur.nb_apply(df, model, buckets=128).collect()
    }
    assert one_pass == applied  # bit-for-bit, including the prior


def test_nb_model_persists_and_scores_unseen_batch(spark, tmp_path):
    train = spark.createDataFrame(
        [(0, "good clean text", "cur"), (1, "junk spam noise", "crawl")],
        ["doc_id", "text", "src"],
    )
    model = ccur.nb_train(train, "src = 'cur'", buckets=64)
    path = str(tmp_path / "nb_model")
    model.write.parquet(path)
    reloaded = spark.read.parquet(path)
    assert reloaded.count() <= 64 + 2
    batch = spark.createDataFrame(
        [(10, "good clean text"), (11, "junk spam noise"),
         (12, "entirely unseen vocabulary here")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ccur.nb_apply(batch, reloaded, buckets=64).collect()}
    assert out[10].pred and not out[11].pred
    # every score reproduces from the persisted model alone: prior +
    # sum of per-token LLRs, unseen-or-collided buckets resolved through
    # the model exactly as nb_apply does (hashing-trick semantics: an
    # "unseen" token may collide into a trained bucket — that's the
    # feature, not a bug)
    import hashlib
    from decimal import Decimal

    lrs = {int(r.b): r.lr for r in reloaded.collect()}
    prior = lrs[ccur.NB_PRIOR_BUCKET]
    default_lr = lrs[ccur.NB_DEFAULT_BUCKET]
    for doc_id, text in [(10, "good clean text"),
                         (11, "junk spam noise"),
                         (12, "entirely unseen vocabulary here")]:
        total = Decimal(0)
        for w in text.split(" "):
            b = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 64
            total += Decimal(str(round(lrs.get(b, default_lr), 9)))
        expected = round(float(total) + prior, 9)
        assert out[doc_id].score == expected, (doc_id, expected)


def test_nb_apply_rejects_sentinel_free_model(spark):
    fake = spark.createDataFrame([(0, 0.5)], "b long, lr double")
    docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="sentinel"):
        ccur.nb_apply(docs, fake)


def test_nb_classifier_null_predicate_rows_are_negative(spark):
    # src NULL -> predicate NULL -> the row must count as a NEGATIVE
    # document AND its tokens as negative-class tokens (not vanish)
    df = spark.createDataFrame(
        [(0, "good words", "cur"), (1, "bad words", None),
         (2, "bad words", "crawl")],
        ["doc_id", "text", "src"],
    )
    out = {r.doc_id: r for r in
           ccur.nb_quality_scores(df, "src = 'cur'", buckets=32).collect()}
    assert not out[1].is_curated
    # identical text + identical class treatment -> identical score
    assert out[1].score == out[2].score
