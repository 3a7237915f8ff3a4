"""Cross-document repeated n-gram (substring) deduplication.

The training-data pass popularized by "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL 2022 — public paper): token
spans that recur across documents (license boilerplate, navigation
chrome, templated paragraphs) are located EXACTLY and cut, keeping one
canonical occurrence, without dropping whole documents the way
doc-level dedup (corpus/dedup.py) does. Complements line dedup
(``line_dedup``: newline-delimited units) by catching repeats that
cross line boundaries or live inside longer lines.

Spark-first shape (no suffix array needed — the fixed-window form):

1. Tokenize + window: every ``n``-token window of every document,
   built with JVM-side higher-order expressions (``transform`` over
   ``sequence`` + ``slice`` + ``concat_ws``) — a pure projection that
   inflates rows by ~token_count per doc, never a UDF. The window
   string is hashed to a 64-bit key (``xxhash64``) IN THE SAME
   PROJECTION and dropped before any exchange.
2. Repeat detection: ONE gram-hash-keyed shuffle —
   ``(gram_hash, doc) dropDuplicates`` then count docs per hash,
   map-side combined; hashes in ≥ ``min_docs`` docs are "repeated".
3. Canonical keep-first: per repeated hash, the occurrence in the
   smallest doc_id at its smallest position survives; every other
   occurrence is a cut span. Two aggregates over the REPEATED subset
   only (orders of magnitude smaller than the gram stream).
4. Rebuild: cut spans group to a per-doc covered-position set (one
   doc_id-keyed shuffle, uniform), and the text is rebuilt with a
   higher-order ``filter`` over the token array — no Python. Where the
   output schema needs the gram STRING (``repeated_ngram_spans``), it
   is re-derived doc-side by re-slicing the token array at the kept
   positions — the string never rides a gram-keyed exchange.

At 100 TB: every gram-keyed wide shuffle carries (gram_hash, doc_id,
pos) triples — 8-byte keys, never the ~50-100-byte gram string and
never document text (text moves exactly once, on the uniform doc_id
key, to rebuild). Skew concentrates in ultra-common grams, which
``max_occurrences`` drops before the keep-first aggregation the same
way ``_cap_buckets`` bounds LSH buckets (a gram occurring millions of
times is boilerplate; cutting every copy but one of a million is still
the right outcome, and the cap only bounds the CANONICAL-selection agg,
not the cut list).

Hashing tradeoff: two distinct grams colliding on xxhash64 would be
treated as the same gram (a unique span mis-marked repeated → one
extra ~n-token cut). Expected colliding pairs ≈ N²/2⁶⁵: at 10¹²
distinct grams that is ~3·10⁴ affected grams, ~3·10⁻⁸ of the corpus —
the same accept-tiny-error regime as MinHash banding, bought for ~10×
less shuffle I/O than exact-string keys. The q119/q120/q122 oracles
compare full outputs against an exact-string DuckDB rebuild, so at
test scale the pipeline is verified collision-free bit-for-bit.

Determinism: xxhash64 is seed-fixed and engine-deterministic; keep-first
is a (min doc_id, min pos) rule — runs agree bit-for-bit, so the driver
hashes the full cleaned corpus (q120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __t token array) for every non-null-text document."""
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )


def _gram_occurrences(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, pos, gram) for every n-token window; pos is 0-based.
    Map-side only — consumers project the string away (``__gh``) before
    any shuffle."""
    toks = _tokens(docs, id_col, text_col)
    windows = F.expr(
        f"transform(sequence(0, size(__t) - {n}), "
        f"i -> concat_ws(' ', slice(__t, i + 1, {n})))"
    )
    return (
        toks.filter(F.size("__t") >= n)
        .select(F.col(id_col), F.posexplode(windows).alias("pos", "gram"))
    )


def _hashed_occurrences(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, pos, __gh) — the narrow occurrence stream every wide
    shuffle operates on; the gram string is dropped in the same
    projection that computes its hash (column pruning keeps it out of
    the exchange payload)."""
    occ = _gram_occurrences(docs, n, id_col, text_col)
    return occ.select(
        F.col(id_col), "pos", F.xxhash64("gram").alias("__gh")
    )


def _repeated_hits(
    docs: DataFrame, n: int, min_docs: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, pos, __gh) triples whose gram appears in ≥ ``min_docs``
    distinct documents. One gram-hash-keyed shuffle ((hash, doc) dedup +
    doc count, both map-side combined); occurrences re-attach with a
    semi join on the same 8-byte key."""
    occ = _hashed_occurrences(docs, n, id_col, text_col)
    repeated = (
        occ.select("__gh", id_col)
        .dropDuplicates()
        .groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__gh")
    )
    return occ.join(repeated, "__gh", "left_semi")


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All occurrences of token n-grams that appear in at least
    ``min_docs`` DISTINCT documents. Returns
    (doc_id, start_tok, end_tok, gram), start/end 0-based inclusive.

    The gram STRING in the output is re-derived by re-slicing the
    document's token array at the hit position (one uniform doc_id-keyed
    join) — the detection shuffles carried only 8-byte hashes."""
    hits = _repeated_hits(docs, n, min_docs, id_col, text_col)
    toks = _tokens(docs, id_col, text_col)
    gram = F.expr(f"concat_ws(' ', slice(__t, pos + 1, {n}))")
    return hits.join(toks, id_col).select(
        id_col,
        F.col("pos").cast("long").alias("start_tok"),
        (F.col("pos") + F.lit(n - 1)).cast("long").alias("end_tok"),
        gram.alias("gram"),
    )


def remove_repeated_ngrams(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int | None = None,
) -> DataFrame:
    """Cut every cross-document repeated n-gram occurrence except one
    canonical copy (smallest doc_id, then smallest position) and rebuild
    the text. Returns (doc_id, text) for every document with NON-NULL
    text (null-text rows are filtered, the corpus-operator convention —
    callers that must preserve them re-join on id, as curate_corpus
    does).

    A token covered by ANY cut span is removed even if a different
    gram's kept occurrence overlaps it — span-level keep-first, the
    deterministic fixed-window reading of Lee et al.'s keep-one rule.

    ``max_occurrences`` drops grams whose occurrence count exceeds it
    from the KEEP-FIRST aggregation only (they are cut everywhere,
    canonical copy included) — bounding the per-gram aggregation state
    on boilerplate floods the same way LSH bucket caps do.

    The whole pass is hash-keyed: no gram string exists past the
    map-side projection (see module docstring for the collision bound)."""
    # materialize the located hits ONCE: they feed the flood count, the
    # canonical self-join (both sides), the cut anti-join and the
    # covered-set build — without a barrier the full tokenize/window/
    # repeat-detection pipeline re-runs per consumer (the lazy
    # checkpoint is GC-released, unlike a session-lifetime cache)
    occ = _repeated_hits(docs, n, min_docs, id_col, text_col).localCheckpoint(
        eager=False
    )

    keep_eligible = occ
    if max_occurrences is not None:
        flooded = (
            occ.groupBy("__gh")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > max_occurrences)
            .select("__gh")
        )
        keep_eligible = occ.join(F.broadcast(flooded), "__gh", "left_anti")

    # canonical occurrence: min doc, then min pos within that doc.
    # Derived frames rename their keys (__g/__d/__p) — all three frames
    # descend from the same occurrence scan, and qualified self-join
    # column references are ambiguous otherwise.
    first_doc = keep_eligible.groupBy(F.col("__gh").alias("__g")).agg(
        F.min(id_col).alias("__fdoc")
    )
    canonical = (
        keep_eligible.join(
            first_doc,
            (F.col("__gh") == F.col("__g")) & (F.col(id_col) == F.col("__fdoc")),
        )
        .groupBy(F.col("__g"), F.col("__fdoc").alias("__d"))
        .agg(F.min("pos").alias("__p"))
    )
    cuts = occ.join(
        canonical,
        (F.col("__gh") == F.col("__g"))
        & (F.col(id_col) == F.col("__d"))
        & (F.col("pos") == F.col("__p")),
        "left_anti",
    ).select(
        F.col(id_col),
        F.col("pos").alias("start_tok"),
        (F.col("pos") + F.lit(n - 1)).alias("end_tok"),
    )

    return _cut_and_rebuild(docs, cuts, id_col, text_col)


def _cut_and_rebuild(
    docs: DataFrame, cuts: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shared rebuild tail of both dedup forms: union the cut spans into
    a per-doc covered-position set (one id-keyed shuffle) and drop the
    covered tokens with a higher-order filter (zero further shuffle).
    Emits (id, text) for every non-null-text doc in ``docs``."""
    covered = (
        cuts.select(
            F.col(id_col),
            F.explode(F.sequence("start_tok", "end_tok")).alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__p").alias("__cov"))
    )
    toks = _tokens(docs, id_col, text_col)
    rebuilt = F.expr(
        "concat_ws(' ', filter(transform(__t, (x, i) -> "
        "IF(__cov IS NOT NULL AND array_contains(__cov, i), NULL, x)), "
        "x -> x IS NOT NULL))"
    )
    return toks.join(covered, id_col, "left").select(
        F.col(id_col), rebuilt.alias(text_col)
    )


# ---------------------------------------------------------------------------
# incremental (continuous-crawl) variant
# ---------------------------------------------------------------------------


def build_gram_index(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The persisted side of incremental substring dedup: one row per
    DISTINCT n-gram HASH of the corpus (column ``__gh``, 8 bytes/gram —
    the string form would be ~10× the storage and shuffle for the same
    probe answer, within the module's collision bound). Computed once at
    ingest, appended per batch (union + dropDuplicates — or a MERGE into
    a hash-partitioned table at warehouse scale); new batches probe it
    without ever re-reading corpus text."""
    return (
        _hashed_occurrences(docs, n, id_col, text_col)
        .select("__gh")
        .dropDuplicates()
    )


def incremental_repeated_spans(
    new_docs: DataFrame,
    gram_index: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Spans in the NEW batch whose n-gram already exists in the corpus
    gram index — the continuous-crawl shape of
    :func:`repeated_ngram_spans`: the existing corpus is never
    re-scanned; the batch's hashed gram stream joins the index on the
    8-byte key (the index side arrives pre-persisted, so the only work
    that scales with the corpus is the one-time index build). The output
    gram string is re-derived from the batch's own token arrays."""
    occ = _hashed_occurrences(new_docs, n, id_col, text_col)
    hits = occ.join(gram_index.select("__gh"), "__gh", "left_semi")
    toks = _tokens(new_docs, id_col, text_col)
    gram = F.expr(f"concat_ws(' ', slice(__t, pos + 1, {n}))")
    return hits.join(toks, id_col).select(
        id_col,
        F.col("pos").cast("long").alias("start_tok"),
        (F.col("pos") + F.lit(n - 1)).cast("long").alias("end_tok"),
        gram.alias("gram"),
    )


def incremental_remove_repeated(
    new_docs: DataFrame,
    gram_index: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut EVERY occurrence in the new batch of an n-gram the corpus
    already contains (the existing corpus holds the canonical copy, so
    no keep-first selection is needed batch-side) and rebuild the text.
    Returns (doc_id, text) for every new document with non-null text
    (same convention as :func:`remove_repeated_ngrams`)."""
    occ = _hashed_occurrences(new_docs, n, id_col, text_col)
    cuts = occ.join(gram_index.select("__gh"), "__gh", "left_semi").select(
        F.col(id_col),
        F.col("pos").alias("start_tok"),
        (F.col("pos") + F.lit(n - 1)).alias("end_tok"),
    )
    return _cut_and_rebuild(new_docs, cuts, id_col, text_col)
