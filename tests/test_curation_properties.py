"""Property-based curation tests: packing-plan invariants over random
token distributions, decontamination monotonicity, repetition bounds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modular_etl_data_platform_spark.corpus import curation as ccur

token_lists = st.lists(
    st.integers(min_value=1, max_value=300), min_size=1, max_size=25
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(tokens=token_lists, capacity=st.sampled_from([64, 128, 512]))
@SLOW
def test_packing_plan_invariants(spark, tokens, capacity):
    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    plan = sorted(
        ccur.packing_plan(df, capacity=capacity).collect(),
        key=lambda r: r.tokens_before,
    )
    # every doc appears exactly once
    assert sorted(r.doc_id for r in plan) == sorted(r[0] for r in rows)
    # the stream is contiguous: each offset = previous offset + its tokens
    offset = 0
    for r in plan:
        assert r.tokens_before == offset
        assert r.bin_id == offset // capacity
        offset += r.n_tokens
    # longest-first layout
    lengths = [r.n_tokens for r in plan]
    assert lengths == sorted(lengths, reverse=True)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=5, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=6,
    )
)
@SLOW
def test_decontamination_monotone_in_probe(spark, texts):
    """A larger probe set can only flag MORE n-grams per doc."""
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    train = docs.filter("doc_id >= 1")
    small = docs.filter("doc_id = 0")
    big = docs  # superset probe: includes every train doc -> full overlap
    n_small = {
        r.doc_id: r.n_overlap
        for r in ccur.decontaminate(train, small, n=3).collect()
    }
    n_big = {
        r.doc_id: r.n_overlap
        for r in ccur.decontaminate(train, big, n=3).collect()
    }
    assert set(n_small) == set(n_big)
    for k in n_small:
        assert n_big[k] >= n_small[k]
        assert n_big[k] >= 1  # probe ⊇ self ⇒ every doc overlaps itself


@given(
    words=st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=2, max_size=20)
)
@SLOW
def test_repetition_stats_bounds(spark, words):
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    r = ccur.repetition_stats(df).collect()[0]
    assert 0.0 <= r.dup_word_frac < 1.0
    assert 0.0 < r.top_bigram_frac <= 1.0
    # all-identical words -> every bigram identical
    if len(set(words)) == 1:
        assert r.top_bigram_frac == 1.0
