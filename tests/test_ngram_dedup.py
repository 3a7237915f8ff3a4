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
