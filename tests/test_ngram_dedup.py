"""Cross-document repeated n-gram dedup (corpus/ngram_dedup.py).

The driver oracle (q119/q120) hashes the full sf corpus; these pin the
operator's semantics on crafted inputs where the right answer is
readable by eye: the keep-first rule, span overlap, the boilerplate
occurrence cap, and short/empty-document passthrough.
"""

from __future__ import annotations

import pytest

from modular_etl_data_platform_spark.corpus.ngram_dedup import (
    remove_repeated_ngrams,
    repeated_ngram_spans,
)


@pytest.fixture()
def docs(spark):
    # "a b c" repeats in docs 1/2/3; doc 4 is unrelated; doc 5 too short
    return spark.createDataFrame(
        [
            (1, "x a b c y"),
            (2, "a b c z w"),
            (3, "q q a b c"),
            (4, "u v w x y"),
            (5, "a b"),
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_spans_locate_every_occurrence(spark, docs):
    spans = repeated_ngram_spans(docs, n=3, min_docs=2).collect()
    got = {(r.doc_id, r.start_tok, r.end_tok, r.gram) for r in spans}
    assert got == {
        (1, 1, 3, "a b c"),
        (2, 0, 2, "a b c"),
        (3, 2, 4, "a b c"),
    }


def test_remove_keeps_first_occurrence_only(spark, docs):
    out = {r.doc_id: r.text for r in remove_repeated_ngrams(docs, n=3, min_docs=2).collect()}
    # canonical copy: smallest doc_id (1) at its smallest position
    assert out[1] == "x a b c y"
    assert out[2] == "z w"
    assert out[3] == "q q"
    assert out[4] == "u v w x y"  # untouched
    assert out[5] == "a b"  # shorter than n: passthrough
    assert 6 not in out  # null text filtered like every corpus operator


def test_remove_handles_overlapping_spans(spark):
    # "a b c d" in both docs; doc 20's copy is cut; within doc 20 the
    # overlapping repeated trigram spans must union, not double-remove
    docs = spark.createDataFrame(
        [(10, "a b c d"), (20, "p a b c d q")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in remove_repeated_ngrams(docs, n=4, min_docs=2).collect()}
    assert out[10] == "a b c d"
    assert out[20] == "p q"


def test_max_occurrences_cuts_flooded_gram_everywhere(spark):
    rows = [(i, f"pre{i} the same boilerplate tail{i}") for i in range(1, 6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        r.doc_id: r.text
        for r in remove_repeated_ngrams(docs, n=2, min_docs=2).collect()
    }
    assert uncapped[1] == "pre1 the same boilerplate tail1"  # canonical kept
    assert uncapped[2] == "pre2 tail2"
    # cap below the flood count: the canonical copy is cut too
    capped = {
        r.doc_id: r.text
        for r in remove_repeated_ngrams(
            docs, n=2, min_docs=2, max_occurrences=3
        ).collect()
    }
    assert capped[1] == "pre1 tail1"
    assert all(capped[i] == f"pre{i} tail{i}" for i in range(1, 6))


def test_wide_shuffles_key_on_gram_hash_not_string(spark, docs):
    """The scale contract of the module docstring: every gram-keyed
    Exchange partitions on the 8-byte xxhash64 key (``__gh``) or the
    uniform doc id — never on the gram STRING (~50-100 bytes at n=8,
    ~10× the shuffle payload). Both public entry points are pinned."""
    from modular_etl_data_platform_spark.corpus.ngram_dedup import (
        build_gram_index,
        incremental_remove_repeated,
    )

    for df in (
        repeated_ngram_spans(docs, n=3, min_docs=2),
        remove_repeated_ngrams(docs, n=3, min_docs=2, max_occurrences=10),
        incremental_remove_repeated(docs, build_gram_index(docs, n=3), n=3),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert exchanges, "expected shuffles in the pipeline"
        narrow = ("__gh#", "__g#", "__d#", "doc_id#")
        for line in exchanges:
            assert "gram#" not in line, f"string-keyed exchange: {line.strip()}"
            assert any(k in line for k in narrow), line.strip()


def test_plan_stays_jvm_side(spark, docs):
    """No Python execution and no cartesian product anywhere in the
    pipeline — windows/rebuild are higher-order expressions."""
    plan = remove_repeated_ngrams(docs, n=3, min_docs=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_within_doc_dedup_keeps_first_occurrence_order(spark):
    from modular_etl_data_platform_spark.corpus.dedup import (
        dedup_lines_within_doc,
    )

    docs = spark.createDataFrame(
        [
            (1, "header\nbody one\nheader\nbody two\nheader"),
            (2, "a\nb\nc"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_lines_within_doc(docs).collect()}
    assert out[1] == "header\nbody one\nbody two"
    assert out[2] == "a\nb\nc"
    assert 3 not in out
    # zero-shuffle: the plan has no Exchange
    plan = dedup_lines_within_doc(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- property: Spark pipeline == brute-force python reference ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = st.sampled_from(["a", "b", "c", "d"])
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


def _ref_spans(texts, n, min_docs):
    """Brute-force reference of repeated_ngram_spans."""
    occ = []
    for doc_id, text in texts:
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            occ.append((doc_id, i, " ".join(toks[i : i + n])))
    docs_per_gram = {}
    for doc_id, _, g in occ:
        docs_per_gram.setdefault(g, set()).add(doc_id)
    rep = {g for g, d in docs_per_gram.items() if len(d) >= min_docs}
    return {(d, i, i + n - 1, g) for d, i, g in occ if g in rep}


def _ref_clean(texts, n, min_docs):
    """Brute-force reference of remove_repeated_ngrams (no cap)."""
    spans = _ref_spans(texts, n, min_docs)
    canonical = {}
    for d, s, _e, g in sorted(spans):
        canonical.setdefault(g, (d, s))
    covered = {}
    for d, s, e, g in spans:
        if canonical[g] == (d, s):
            continue
        covered.setdefault(d, set()).update(range(s, e + 1))
    out = {}
    for doc_id, text in texts:
        toks = text.split(" ")
        cov = covered.get(doc_id, set())
        out[doc_id] = " ".join(t for i, t in enumerate(toks) if i not in cov)
    return out


@given(
    texts=st.lists(_DOC, min_size=1, max_size=8),
    n=st.sampled_from([2, 3]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ngram_dedup_matches_bruteforce_reference(spark, texts, n):
    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got_spans = {
        tuple(r)
        for r in repeated_ngram_spans(docs, n=n, min_docs=2)
        .select("doc_id", "start_tok", "end_tok", "gram")
        .collect()
    }
    assert got_spans == _ref_spans(rows, n, 2)
    got_clean = {
        r.doc_id: r.text
        for r in remove_repeated_ngrams(docs, n=n, min_docs=2).collect()
    }
    assert got_clean == _ref_clean(rows, n, 2)


def test_incremental_variant_cuts_all_indexed_occurrences(spark):
    from modular_etl_data_platform_spark.corpus.ngram_dedup import (
        build_gram_index,
        incremental_remove_repeated,
        incremental_repeated_spans,
    )

    existing = spark.createDataFrame(
        [(1, "x a b c y")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "p a b c q a b c"), (11, "fresh text only")],
        "doc_id long, text string",
    )
    idx = build_gram_index(existing, n=3)
    spans = incremental_repeated_spans(new, idx, n=3).collect()
    assert {(r.doc_id, r.start_tok) for r in spans} == {(10, 1), (10, 5)}
    out = {r.doc_id: r.text for r in incremental_remove_repeated(new, idx, n=3).collect()}
    # BOTH batch occurrences cut: the corpus holds the canonical copy
    assert out[10] == "p q"
    assert out[11] == "fresh text only"
