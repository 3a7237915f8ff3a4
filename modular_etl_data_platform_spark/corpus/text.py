"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

Everything is built from native array/lambda expressions
(``split``/``transform``/``filter``/``aggregate``) so the hot path stays
JVM-side and vectorized — no Python UDFs. Each builder has an exactly
equivalent DuckDB SQL form (used by the oracle queries); the shared
constants below keep the two in lockstep.

Scale: all operators are embarrassingly parallel per-row projections — no
shuffle at all. At 100 TB the only consideration is scan parallelism
(``maxPartitionBytes``) and avoiding regex catastrophes; token splits here
are plain single-char splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language heuristic. Deliberately
# tiny: language ID at corpus scale is a per-row lookup against small
# broadcast sets. Tie-break is alphabetical (deterministic).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count. For a BPE-ish estimate see
    :func:`subword_count`."""
    return F.size(tokens(text_col)).cast("long")


def subword_count(text_col: str = "text") -> Column:
    """BPE-ish token estimate: split on word boundaries AND every 4 chars
    inside long words — a cheap, deterministic proxy for subword tokenizer
    length (≈ chars/4 for long words, 1 per short word)."""
    words = tokens(text_col)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4)).cast("long"),
    )


def stopword_hits(text_col: str, lang: str) -> Column:
    sw = STOPWORDS[lang]
    quoted = ", ".join(f"'{w}'" for w in sw)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> x IN ({quoted})))"
    ).cast("long")


def language_id(text_col: str = "text") -> Column:
    """Stopword-vote language heuristic: the language whose stopword list
    hits the most tokens wins; ties break alphabetically (deterministic,
    engine-portable)."""
    langs = sorted(STOPWORDS)
    best_lang = F.lit(langs[0])
    best_score = stopword_hits(text_col, langs[0])
    for lang in langs[1:]:
        score = stopword_hits(text_col, lang)
        improved = score > best_score
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improved, score).otherwise(best_score)
    return best_lang


def language_id_oracle_sql(text_col: str = "text") -> str:
    """DuckDB twin of :func:`language_id` (same vote + tie-break)."""
    langs = sorted(STOPWORDS)

    def hits(lang: str) -> str:
        quoted = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"len(list_filter(string_split({text_col}, ' '), x -> x IN ({quoted})))"

    expr_lang, expr_score = f"'{langs[0]}'", hits(langs[0])
    for lang in langs[1:]:
        s = hits(lang)
        expr_lang = f"CASE WHEN {s} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {s} > {expr_score} THEN {s} ELSE {expr_score} END"
    return expr_lang


def quality_score(text_col: str = "text") -> Column:
    """Deterministic document quality heuristic in [0,1]:
    0.6·min(tokens/200, 1) + 0.4·stopword_ratio(en). Integer inputs →
    identical double arithmetic in any engine."""
    n = token_count(text_col).cast("double")
    stop_ratio = stopword_hits(text_col, "en").cast("double") / n
    return F.least(n / F.lit(200.0), F.lit(1.0)) * 0.6 + stop_ratio * 0.4


def fingerprint(text_col: str = "text") -> Column:
    """Exact-content fingerprint (md5 hex)."""
    return F.md5(F.col(text_col))


def rolling_fingerprint(text_col: str = "text", window: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: minimum md5 over all
    ``window``-token windows — robust to small prefix/suffix edits, still
    a pure projection (no shuffle)."""
    return F.expr(
        f"array_min(transform(sequence(0, greatest(size(split({text_col}, ' ')) - {window}, 0)),"
        f" i -> md5(concat_ws(' ', slice(split({text_col}, ' '), i+1, {window})))))"
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach token/char counts, quality and language."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "n_subwords": subword_count(text_col),
            "quality_score": quality_score(text_col),
            "predicted_lang": language_id(text_col),
            "fingerprint": fingerprint(text_col),
        }
    )


def chunk_text(
    df: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the LLM
    context-window prep step). One row per chunk via posexplode — a pure
    row-expanding projection, no shuffle; chunk_no is deterministic.

    stride = chunk_tokens - overlap; the final partial chunk is kept.
    """
    stride = chunk_tokens - overlap
    w = f"split({text_col}, ' ')"
    starts = f"sequence(0, greatest(size({w}) - {overlap} - 1, 0), {stride})"
    chunks = (
        f"transform({starts}, i -> concat_ws(' ', slice({w}, i+1, {chunk_tokens})))"
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_no", "chunk_text"),
    ).withColumn("chunk_tokens", F.size(F.split("chunk_text", " ")).cast("long"))


def stratified_sample_hash(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row when
    md5(salt|id) mod 10000 < rate·10000. Reproducible across runs,
    engines and cluster layouts (unlike ``sample()``), and exactly
    rerunnable for pipeline idempotency. Pure projection."""
    bucket = F.expr(
        f"conv(substr(md5(concat('{salt}|', CAST({id_col} AS STRING))), 1, 4), 16, 10) % 10000"
    ).cast("int")
    rate_col = None
    for g, r in sorted(rates.items()):
        thresh = int(r * 10000)
        rate_col = (
            F.when(F.col(group_col) == g, F.lit(thresh))
            if rate_col is None
            else rate_col.when(F.col(group_col) == g, F.lit(thresh))
        )
    rate_col = rate_col.otherwise(F.lit(0))
    return df.withColumn("__bucket", bucket).filter(
        F.col("__bucket") < rate_col
    ).drop("__bucket")


def induce_vocab(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency vocabulary induction: the top-``vocab_size`` words
    (ties broken lexicographically, so the vocab is deterministic and
    engine-portable). Returns (word, freq).

    One explode + one uniform-key groupBy shuffle; the top-V selection is
    ``orderBy().limit()`` — Spark's TakeOrdered, a per-partition heap +
    driver merge of V rows per partition, NOT a global sort. V rows come
    back; the corpus never does."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(vocab_size)
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against an induced (or fixed)
    vocabulary — the coverage check run before committing to a tokenizer
    or filtering a crawl against a reference lexicon. Returns
    (id, n_tokens, n_oov, oov_rate).

    The vocab (V rows) broadcasts; the corpus side is explode → broadcast
    left join → one groupBy(doc) shuffle."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    hit = tok.join(
        F.broadcast(vocab.select("word").withColumn("__in", F.lit(1))),
        "word",
        "left",
    )
    return hit.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("oov_rate"),
    )


def char_trigrams(text_col: str = "text") -> Column:
    """All character trigrams of the text (positions 1..len-2)."""
    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - 2, 1)), "
        f"i -> substr({text_col}, i, 3))"
    )


def lm_perplexity_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style LM quality filter: train a character-trigram model on
    the corpus itself, then score each document by its mean trigram
    log-probability (≈ negative perplexity; low scores = out-of-
    distribution text — mojibake, boilerplate, wrong language).

    Two shuffles total: the model build (groupBy trigram) and the per-doc
    score (groupBy doc). The model joins back via BROADCAST — a trigram
    model is bounded by charset³, a few MB, regardless of corpus size.
    Every seen trigram has count ≥ 1 so probabilities need no smoothing.

    Cross-engine determinism: each trigram's ln(p) is rounded to 9
    decimals and summed as decimal(28,12) before the mean — double
    summation order varies, decimals don't (same recipe as TF-IDF/q47).
    """
    tri = df.select(F.col(id_col), F.explode(char_trigrams(text_col)).alias("tri"))
    model = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("tri_n"))
    total = model.agg(F.sum("tri_n").alias("tri_total"))
    scored = (
        tri.join(F.broadcast(model), "tri")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("tri_n").cast("double") / F.col("tri_total")), 9
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        (
            F.sum(F.col("logp").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_logp"),
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
    )


def lexical_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity diagnostics: token/type counts,
    type-token ratio, and the word-distribution Shannon entropy —
    the standard corpus-quality signals (low entropy / low TTR =
    template or looping text; the distributional complement to the
    Gopher repetition rules, which look at n-gram mass).

    Two shuffles, both map-side combinable: the (doc, word) count and
    the per-doc fold — nothing wider than (id, word, count) moves.
    Cross-engine determinism: each word's (p·ln p) term rounds to 9
    decimals and sums as decimal(28,12) (order-free), the q59/q47
    recipe, so the hashed entropy is bit-stable on any engine."""
    from pyspark.sql import Window

    ex = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__w"))
    cnt = ex.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    # per-doc totals as a WINDOW over the counts, not a second
    # aggregation joined back: the join shape re-executes the whole
    # explode+count pipeline once per branch (the union-recompute
    # gotcha) and shuffles it twice — the window reads the counts once
    w = Window.partitionBy(id_col)
    cnt = cnt.select(
        F.col(id_col),
        "__c",
        F.sum("__c").over(w).alias("__n"),
        F.count(F.lit(1)).over(w).alias("__types"),
    )
    p = F.col("__c").cast("double") / F.col("__n")
    term = F.round(p * F.log(p), 9)
    return (
        cnt.select(id_col, "__n", "__types", term.alias("__t"))
        .groupBy(id_col, "__n", "__types")
        .agg(
            (-F.sum(F.col("__t").cast("decimal(28,12)")))
            .cast("double")
            .alias("__e")
        )
        .select(
            F.col(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.col("__types").cast("long").alias("n_types"),
            F.round(
                F.col("__types").cast("double") / F.col("__n"), 9
            ).alias("ttr"),
            F.round("__e", 9).alias("entropy"),
        )
    )


def lexical_signals_oracle_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`lexical_signals` — same per-term rounding,
    same decimal summation."""
    return f"""
    WITH wds AS (
      SELECT doc_id, unnest(string_split({text_col}, ' ')) AS w FROM {table}
    ),
    cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM wds GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS types FROM cnt GROUP BY 1),
    terms AS (
      SELECT cnt.doc_id,
             round((CAST(c AS DOUBLE)/n) * ln(CAST(c AS DOUBLE)/n), 9) AS t
      FROM cnt JOIN tot USING (doc_id)
    )
    SELECT t2.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(types AS BIGINT) AS n_types,
           round(CAST(types AS DOUBLE)/n, 9) AS ttr,
           round(CAST(-SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE), 9) AS entropy
    FROM terms t2 JOIN tot USING (doc_id)
    GROUP BY t2.doc_id, n, types
    """
