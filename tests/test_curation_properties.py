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


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=6
    ),
    cap=st.sampled_from([1, 2, 3]),
)
@SLOW
def test_unimax_waterfilling_invariants(spark, sizes, cap):
    """Closed-form water-filling == the paper's sequential algorithm:
    allocations never exceed the cap, uncapped languages all receive the
    same fair share (>= every capped language's cap), and the budget is
    exactly exhausted whenever demand N*T exceeds it."""
    rows = [
        (100 * li + d, " ".join(["w"] * 1), f"l{li:02d}")
        for li, n in enumerate(sizes)
        for d in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccur.unimax_allocation(df, epoch_cap=cap).collect()
    by = {r.lang: r for r in out}
    assert len(by) == len(sizes)
    T = sum(sizes)
    B = (T * 3) // 2
    for li, n in enumerate(sizes):
        r = by[f"l{li:02d}"]
        assert r.n_tokens == n
        # never above the epoch cap (epsilon for the round-9 division)
        assert r.alloc_tokens <= cap * n + 1e-6
        if r.capped:
            assert r.alloc_tokens == float(cap * n)
    shares = sorted({r.alloc_tokens for r in out if not r.capped})
    assert len(shares) <= 1  # uncapped languages split evenly
    if shares:
        # a capped language's cap is never above the uncapped share
        # (otherwise it should not have been capped)
        assert all(
            r.alloc_tokens <= shares[0] + 1e-6 for r in out if r.capped
        )
        # budget exhausted exactly (allocations are exact up to round-9)
        assert abs(sum(r.alloc_tokens for r in out) - B) < 1e-3
    else:
        # everything capped: demand N*T fit inside the budget
        assert cap * T <= B


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@SLOW
def test_nb_scores_row_order_invariant(spark, seed):
    """Scores are a pure function of the (set of) documents: shuffling
    the input rows (different partitioning, different aggregation
    encounter order) must reproduce every score bit-for-bit — the
    round-9-terms + decimal-sum recipe leaves no float-order residue."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))),
            f"s{rng.randint(0, 3)}",
        )
        for i in range(30)
    ]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    a = spark.createDataFrame(rows, "doc_id long, text string, src string")
    b = spark.createDataFrame(
        shuffled, "doc_id long, text string, src string"
    ).repartition(7)
    pos = "src IN ('s0', 's1')"
    sa = {
        r.doc_id: (r.score, r.pred)
        for r in ccur.nb_quality_scores(a, pos, buckets=64).collect()
    }
    sb = {
        r.doc_id: (r.score, r.pred)
        for r in ccur.nb_quality_scores(b, pos, buckets=64).collect()
    }
    assert sa == sb
