"""Document-quality rule bundles and deterministic sampling.

Gopher-style heuristic quality rules (Rae et al. 2021, "Scaling Language
Models" appendix A; also the C4/RefinedWeb rule families), re-expressed as
pure-projection Spark expressions with exact DuckDB twins:

- word-count bounds, mean-word-length bounds,
- symbol-to-word ratio (hash marks / ellipses),
- alphabetic-word ratio,
- stopword presence.

Everything here is a per-row projection (zero shuffle) except the
quantile computation in :func:`adaptive_length_filter` (one tiny
per-group aggregate that broadcasts back). Weighted sampling uses the
exponential-key reservoir trick (Efraimidis & Spirakis 2006) with an
md5-derived uniform, so the sample is reproducible across runs, engines
and cluster layouts — the same determinism convention as
``text.stratified_sample_hash``.

Cross-engine float convention: every derived double that feeds a
comparison or ranking is rounded to 9 decimals first (see catalog.py
docstring) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus.text import STOPWORDS

# Rule thresholds (Gopher-flavored, scaled to the synthetic corpus where
# documents are a few dozen words). One source of truth for both engines.
MIN_WORDS = 5
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_RATIO = 0.8
MIN_STOPWORD_HITS = 1

#: words counting as "symbols" for the symbol-to-word ratio rule
_SYMBOLS = ("#", "...", "…")


def _w(text_col: str) -> str:
    return f"split({text_col}, ' ')"


def _dd_w(text_col: str) -> str:
    return f"string_split({text_col}, ' ')"


def n_words(text_col: str = "text") -> Column:
    return F.expr(f"size({_w(text_col)})").cast("long")


def mean_word_len(text_col: str = "text") -> Column:
    """Mean characters per whitespace word, rounded to 9 dp."""
    return F.round(
        F.expr(
            f"aggregate({_w(text_col)}, cast(0 as bigint), (a, x) -> a + length(x))"
        ).cast("double")
        / F.expr(f"size({_w(text_col)})"),
        9,
    )


def symbol_ratio(text_col: str = "text") -> Column:
    """Fraction of words that are hash/ellipsis symbols."""
    preds = " OR ".join(f"contains(x, '{s}')" for s in _SYMBOLS)
    return F.round(
        F.expr(f"size(filter({_w(text_col)}, x -> {preds}))").cast("double")
        / F.expr(f"size({_w(text_col)})"),
        9,
    )


def alpha_ratio(text_col: str = "text") -> Column:
    """Fraction of words containing at least one ASCII letter."""
    return F.round(
        F.expr(
            f"size(filter({_w(text_col)}, x -> x rlike '[a-zA-Z]'))"
        ).cast("double")
        / F.expr(f"size({_w(text_col)})"),
        9,
    )


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality-rule evaluation: one boolean per rule plus the
    conjunction. Pure projection — at 100 TB this is a map-only pass that
    pipelines into the scan (no shuffle, no Python).

    Reference parity: the reference's validation stage is config-driven
    boolean predicates per row (config/silver/schema READMEs); this is the
    same shape specialized to corpus curation."""
    sw = STOPWORDS["en"]
    quoted = ", ".join(f"'{w}'" for w in sw)
    stop_hits = F.expr(
        f"size(filter({_w(text_col)}, x -> x IN ({quoted})))"
    ).cast("long")
    out = df.select(
        F.col(id_col),
        n_words(text_col).alias("n_words"),
        mean_word_len(text_col).alias("mean_word_len"),
        symbol_ratio(text_col).alias("symbol_ratio"),
        alpha_ratio(text_col).alias("alpha_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS),
        "rule_mean_word_len": (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        "rule_symbol_ratio": F.col("symbol_ratio") <= MAX_SYMBOL_RATIO,
        "rule_alpha_ratio": F.col("alpha_ratio") >= MIN_ALPHA_RATIO,
        "rule_stopwords": F.col("stopword_hits") >= MIN_STOPWORD_HITS,
    }
    out = out.withColumns(rules)
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("passes", passes)


def gopher_rules_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`gopher_rules` (same constants, same rounding)."""
    w = _dd_w(text_col)
    preds = " OR ".join(f"contains(x, '{s}')" for s in _SYMBOLS)
    quoted = ", ".join(f"'{x}'" for x in STOPWORDS["en"])
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({w}) AS BIGINT) AS n_words,
             round(CAST(list_reduce(list_transform({w}, x -> len(x)), (a,b) -> a+b) AS DOUBLE)
                   / len({w}), 9) AS mean_word_len,
             round(CAST(len(list_filter({w}, x -> {preds})) AS DOUBLE)
                   / len({w}), 9) AS symbol_ratio,
             round(CAST(len(list_filter({w}, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / len({w}), 9) AS alpha_ratio,
             CAST(len(list_filter({w}, x -> x IN ({quoted}))) AS BIGINT) AS stopword_hits
      FROM {table}
    )
    SELECT *,
           (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
            AND rule_alpha_ratio AND rule_stopwords) AS passes
    FROM (
      SELECT *,
             (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS rule_word_count,
             (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
               AS rule_mean_word_len,
             (symbol_ratio <= {MAX_SYMBOL_RATIO}) AS rule_symbol_ratio,
             (alpha_ratio >= {MIN_ALPHA_RATIO}) AS rule_alpha_ratio,
             (stopword_hits >= {MIN_STOPWORD_HITS}) AS rule_stopwords
      FROM base
    )
    """


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis-Spirakis exponential keys)
# ---------------------------------------------------------------------------

#: uniform granularity: md5 prefix of 5 hex chars -> 2^20 buckets
_U_BUCKETS = 1 << 20


def _uniform_sql(id_col: str, salt: str) -> str:
    """Spark SQL: deterministic uniform in (0,1) from md5(salt|id)."""
    return (
        f"(conv(substr(md5(concat('{salt}|', cast({id_col} as string))), 1, 5), 16, 10)"
        f" + 0.5) / {_U_BUCKETS}"
    )


def _uniform_duckdb(id_col: str, salt: str) -> str:
    return (
        f"((('0x' || substr(md5('{salt}|' || CAST({id_col} AS VARCHAR)), 1, 5))::BIGINT"
        f" + 0.5) / {_U_BUCKETS})"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: each row gets
    an exponential key ``-ln(u)/w`` from a hash-derived uniform ``u``; the
    ``k`` smallest keys are the sample (Efraimidis & Spirakis 2006 A-Res).
    Higher weight → smaller expected key → higher inclusion odds.

    Scale: pure projection + ``orderBy().limit(k)`` = TakeOrdered — a
    per-partition top-k heap and a k-row driver merge; the corpus is
    never globally sorted. Reruns (and the DuckDB twin) pick the exact
    same rows: keys are md5-derived and rounded to 9 dp before ranking
    (ties then break on id).
    """
    key = F.round(
        -F.log(F.expr(_uniform_sql(id_col, salt)))
        / F.greatest(F.col(weight_col).cast("double"), F.lit(1e-9)),
        9,
    )
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_oracle_sql(
    inner_sql: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws0",
) -> str:
    """DuckDB twin of :func:`weighted_sample` over ``inner_sql``."""
    u = _uniform_duckdb(id_col, salt)
    return f"""
    SELECT *, round(-ln({u}) / greatest(CAST({weight_col} AS DOUBLE), 1e-9), 9)
              AS sample_key
    FROM ({inner_sql})
    ORDER BY sample_key ASC, {id_col} ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Adaptive (per-group quantile) length filtering
# ---------------------------------------------------------------------------


def adaptive_length_filter(
    df: DataFrame,
    group_col: str = "lang",
    length_col: str = "n_chars",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``length_col`` lies within the [lo, hi] quantile
    band OF THEIR OWN GROUP — per-language length filtering where a fixed
    global threshold would mis-trim languages with different length
    distributions (the per-language adaptation CCNet applies to its LM
    filter).

    The per-group exact interpolated percentiles are a tiny aggregate
    (one row per group) broadcast back onto the corpus — one shuffle of
    group-count rows, zero shuffle of the corpus itself. Bounds are
    rounded to 6 dp in both engines so the inclusion predicate is
    cross-engine stable."""
    bounds = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({length_col}, {lo})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile({length_col}, {hi})"), 6).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .filter(
            (F.col(length_col) >= F.col("__lo"))
            & (F.col(length_col) <= F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def adaptive_length_filter_oracle_sql(
    table: str = "documents",
    group_col: str = "lang",
    length_col: str = "n_chars",
    lo: float = 0.05,
    hi: float = 0.95,
) -> str:
    """DuckDB twin: ``quantile_cont`` is the same interpolated percentile
    as Spark's ``percentile``."""
    return f"""
    SELECT t.*
    FROM {table} t
    JOIN (
      SELECT {group_col},
             round(quantile_cont({length_col}, {lo}), 6) AS __lo,
             round(quantile_cont({length_col}, {hi}), 6) AS __hi
      FROM {table}
      GROUP BY {group_col}
    ) b USING ({group_col})
    WHERE t.{length_col} >= b.__lo AND t.{length_col} <= b.__hi
    """


# ---------------------------------------------------------------------------
# Gopher repetition rules (Rae et al. 2021, appendix A1.1 — the other
# half of the quality suite: n-gram repetition signals, the family
# Dolma/RefinedWeb/FineWeb all apply)
# ---------------------------------------------------------------------------

#: n values for the TOP-n-gram char-fraction signals and their ceilings
#: (Gopher's published thresholds)
TOP_NGRAM_LIMITS = {2: 0.20, 3: 0.18, 4: 0.16}
#: n values for the DUPLICATED-n-gram char-fraction signals + ceilings
DUP_NGRAM_LIMITS = {5: 0.15, 10: 0.10}


def _strict_grams_sql(words_expr: str, n: int) -> str:
    """Word n-grams over an ALREADY-SPLIT words array, STRICT (docs
    shorter than n yield none — repetition signals must not invent
    partial grams the way the dedup shinglers deliberately do). Takes
    the words EXPRESSION, not the text column: interpreted higher-order
    lambdas have no CSE, so re-splitting inside each n's transform
    costs 3.7x (measured — project the split once and reference it)."""
    w = words_expr
    return (
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(0, size({w}) - {n}), "
        f"i -> concat_ws(' ', slice({w}, i + 1, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals + rule booleans: the fraction of
    characters covered by the MOST FREQUENT {2,3,4}-gram and by ALL
    duplicated {5,10}-grams (count x gram chars / doc chars, capped at
    1 — the standard overlap-ignoring estimate the public filtering
    pipelines use), each gated by Gopher's published ceiling.

    Scale shape: every n's grams ride ONE explode (an array of
    (n, gram) structs concatenated JVM-side), so the corpus is read
    once and the only shuffle is the (doc, n, gram) count — map-side
    combinable, key cardinality bounded by corpus tokens. The top-gram
    argmax folds into the same aggregation (min over a (-count, gram)
    struct: deterministic count-desc/gram-asc tie-break, no second
    shuffle, no window)."""
    ns = sorted({*TOP_NGRAM_LIMITS, *DUP_NGRAM_LIMITS})
    gram_arrays = ", ".join(
        f"transform({_strict_grams_sql('__ws', n)}, "
        f"g -> struct({n} AS n, g AS gram))"
        for n in ns
    )
    exploded = df.select(
        F.col(id_col),
        F.length(text_col).alias("__chars"),
        F.expr(_w(text_col)).alias("__ws"),  # split ONCE, reuse per n
    ).select(
        F.col(id_col),
        "__chars",
        F.explode(F.expr(f"concat({gram_arrays})")).alias("__p"),
    ).select(id_col, "__chars", F.col("__p.n").alias("__n"), F.col("__p.gram").alias("__g"))
    counts = exploded.groupBy(id_col, "__chars", "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_n = counts.groupBy(id_col, "__chars", "__n").agg(
        F.min(
            F.struct((-F.col("__c")).alias("nc"), F.col("__g").alias("g"))
        ).alias("__top"),
        F.sum(
            F.when(F.col("__c") > 1, F.col("__c") * F.length("__g")).otherwise(
                F.lit(0)
            )
        ).alias("__dupchars"),
    )

    def frac(chars_expr):
        return F.round(
            F.least(
                F.lit(1.0),
                chars_expr.cast("double")
                / F.nullif(F.col("__chars"), F.lit(0)).cast("double"),
            ),
            9,
        )

    top_chars = (-F.col("__top.nc")) * F.length("__top.g")
    sig_cols = []
    for n in TOP_NGRAM_LIMITS:
        sig_cols.append(
            F.max(F.when(F.col("__n") == n, frac(top_chars))).alias(
                f"top_{n}gram_frac"
            )
        )
    for n in DUP_NGRAM_LIMITS:
        sig_cols.append(
            F.max(F.when(F.col("__n") == n, frac(F.col("__dupchars")))).alias(
                f"dup_{n}gram_frac"
            )
        )
    per_doc = per_n.groupBy(id_col).agg(*sig_cols)
    out = df.select(id_col).join(per_doc, id_col, "left")
    rules = {}
    for n, lim in TOP_NGRAM_LIMITS.items():
        out = out.withColumn(
            f"top_{n}gram_frac", F.coalesce(f"top_{n}gram_frac", F.lit(0.0))
        )
        rules[f"rule_top_{n}gram"] = F.col(f"top_{n}gram_frac") <= lim
    for n, lim in DUP_NGRAM_LIMITS.items():
        out = out.withColumn(
            f"dup_{n}gram_frac", F.coalesce(f"dup_{n}gram_frac", F.lit(0.0))
        )
        rules[f"rule_dup_{n}gram"] = F.col(f"dup_{n}gram_frac") <= lim
    out = out.withColumns(rules)
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("passes", passes)


def repetition_signals_oracle_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`repetition_signals` — same strict grams,
    same count-desc/gram-asc argmax, same cap/round."""
    w = _dd_w(text_col)
    ns = sorted({*TOP_NGRAM_LIMITS, *DUP_NGRAM_LIMITS})
    values = ", ".join(f"({n})" for n in ns)
    top_cols = ",\n           ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN topfrac END), 0.0) AS top_{n}gram_frac"
        for n in TOP_NGRAM_LIMITS
    )
    dup_cols = ",\n           ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN dupfrac END), 0.0) AS dup_{n}gram_frac"
        for n in DUP_NGRAM_LIMITS
    )
    top_rules = ",\n           ".join(
        f"(top_{n}gram_frac <= {lim}) AS rule_top_{n}gram"
        for n, lim in TOP_NGRAM_LIMITS.items()
    )
    dup_rules = ",\n           ".join(
        f"(dup_{n}gram_frac <= {lim}) AS rule_dup_{n}gram"
        for n, lim in DUP_NGRAM_LIMITS.items()
    )
    all_rules = " AND ".join(
        [f"rule_top_{n}gram" for n in TOP_NGRAM_LIMITS]
        + [f"rule_dup_{n}gram" for n in DUP_NGRAM_LIMITS]
    )
    return f"""
    WITH grams AS (
      SELECT doc_id, length({text_col}) AS chars, t.n,
             unnest(CASE WHEN len({w}) >= t.n THEN
               list_transform(range(0, len({w}) - t.n + 1),
                              i -> array_to_string({w}[i+1:i+t.n], ' '))
             ELSE [] END) AS gram
      FROM {table}, (VALUES {values}) t(n)
    ),
    cnts AS (
      SELECT doc_id, chars, n, gram, COUNT(*) AS c
      FROM grams GROUP BY 1, 2, 3, 4
    ),
    per_n AS (
      SELECT doc_id, chars, n,
             round(LEAST(1.0, CAST(MAX(CASE WHEN rn = 1 THEN c * length(gram) END) AS DOUBLE)
                   / NULLIF(chars, 0)), 9) AS topfrac,
             round(LEAST(1.0, CAST(SUM(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS DOUBLE)
                   / NULLIF(chars, 0)), 9) AS dupfrac
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                     ORDER BY c DESC, gram ASC) AS rn
        FROM cnts
      ) GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT d.doc_id,
           {top_cols},
           {dup_cols}
      FROM {table} d LEFT JOIN per_n p ON d.doc_id = p.doc_id
      GROUP BY d.doc_id
    )
    SELECT *, ({all_rules}) AS passes FROM (
      SELECT *,
           {top_rules},
           {dup_rules}
      FROM per_doc
    )
    """


# ---------------------------------------------------------------------------
# Fused quality suite: word rules + repetition rules + lexical diversity
# in ONE corpus pass (one split, one explode, two exchanges)
# ---------------------------------------------------------------------------


def quality_suite(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EVERY text-quality signal this module and ``text.py`` compute —
    the Gopher word rules (:func:`gopher_rules`), the n-gram repetition
    rules (:func:`repetition_signals`) and the lexical-diversity
    diagnostics (``text.lexical_signals``) — in ONE pass over the
    corpus. A real 100 TB curation run computes all signals per read;
    running the three operators separately reads, splits and explodes
    the corpus three times.

    The fusion key: WORDS ARE 1-GRAMS. One split feeds one explode of
    (n, gram) structs for n in {1} ∪ TOP ∪ DUP; one (doc, n, gram)
    count is the only data-sized shuffle; one per-doc aggregation folds
    every signal out of the counts —

    - word rules from the n=1 rows (word-multiset functions: counts,
      mean length, symbol/alpha/stopword fractions all weight by c);
    - repetition top-gram argmax as min over a (-count, gram) struct
      (q161's no-window trick) and dup-gram mass as a conditional sum;
    - lexical entropy via the identity H = ln n − (Σ c·ln c)/n, so no
      per-doc total is needed BEFORE the aggregation (the per-term
      rounding convention carries over: each c·ln c rounds to 9 dp and
      sums as decimal, then one double division — bit-stable
      cross-engine like q162, algebraically equal to the definitional
      −Σ p·ln p).

    Exactly TWO exchanges at any corpus size (plan-asserted in
    tests/test_plans.py): the gram count and the per-doc fold. Every
    doc has ≥1 word (split never yields an empty array), so the n=1
    rows guarantee per-doc coverage with no join back."""
    sw = STOPWORDS["en"]
    quoted = ", ".join(f"'{w}'" for w in sw)
    sym_preds = " OR ".join(f"contains(__g, '{s}')" for s in _SYMBOLS)
    ns = sorted({*TOP_NGRAM_LIMITS, *DUP_NGRAM_LIMITS})
    gram_arrays = ", ".join(
        ["transform(__ws, g -> struct(1 AS n, g AS gram))"]
        + [
            f"transform({_strict_grams_sql('__ws', n)}, "
            f"g -> struct({n} AS n, g AS gram))"
            for n in ns
        ]
    )
    exploded = (
        df.select(
            F.col(id_col),
            F.length(text_col).alias("__chars"),
            F.expr(_w(text_col)).alias("__ws"),  # split ONCE
        )
        .select(
            F.col(id_col),
            "__chars",
            F.explode(F.expr(f"concat({gram_arrays})")).alias("__p"),
        )
        .select(
            id_col,
            "__chars",
            F.col("__p.n").alias("__n"),
            F.col("__p.gram").alias("__g"),
        )
    )
    counts = exploded.groupBy(id_col, "__chars", "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # The per-doc fold is necessarily a SortAggregate (the top-gram
    # argmax min carries a string, the entropy sum a wide decimal —
    # neither buffers in the mutable hash-agg row), and SortAggregate
    # evaluates its inputs OUTSIDE whole-stage codegen. So every
    # per-row term — the stopword IN list, the symbol/alpha
    # predicates, the c·ln c entropy term, the argmax sort key — is
    # precomputed here in a codegen'd PROJECTION over the count rows,
    # leaving the fold with bare sum/min over ready columns (measured:
    # the fused pass dropped under the three separate operators' sum
    # only after this split; with the terms inline in the aggregate it
    # cost 1.6x the parts).
    is_word = F.col("__n") == 1
    terms = counts.select(
        F.col(id_col),
        "__chars",
        F.when(is_word, F.col("__c")).alias("__wc"),
        F.when(is_word, F.col("__c") * F.length("__g")).alias("__twlen"),
        F.when(is_word & F.expr(f"({sym_preds})"), F.col("__c")).alias("__tsym"),
        F.when(is_word & F.col("__g").rlike("[a-zA-Z]"), F.col("__c")).alias(
            "__talpha"
        ),
        F.when(is_word & F.expr(f"__g IN ({quoted})"), F.col("__c")).alias(
            "__tstop"
        ),
        F.when(
            is_word,
            F.round(
                F.col("__c").cast("double") * F.log(F.col("__c").cast("double")),
                9,
            ).cast("decimal(28,12)"),
        ).alias("__tent"),
        *[
            # top-gram argmax as min over a SORTABLE STRING: zero-padded
            # inverted count, then the gram — count desc / gram asc,
            # exactly q161's tie-break
            F.when(
                F.col("__n") == n,
                F.concat(
                    F.lpad(
                        (F.lit(1_000_000_000) - F.col("__c")).cast("string"),
                        10,
                        "0",
                    ),
                    F.lit(":"),
                    F.col("__g"),
                ),
            ).alias(f"__tkey{n}")
            for n in TOP_NGRAM_LIMITS
        ],
        *[
            F.when(
                (F.col("__n") == n) & (F.col("__c") > 1),
                F.col("__c") * F.length("__g"),
            ).alias(f"__tdup{n}")
            for n in DUP_NGRAM_LIMITS
        ],
    )
    per_doc = terms.groupBy(id_col, "__chars").agg(
        F.sum("__wc").cast("long").alias("n_words"),
        F.sum("__twlen").alias("__wlen"),
        F.coalesce(F.sum("__tsym"), F.lit(0)).alias("__sym"),
        F.coalesce(F.sum("__talpha"), F.lit(0)).alias("__alpha"),
        F.coalesce(F.sum("__tstop"), F.lit(0)).cast("long").alias(
            "stopword_hits"
        ),
        F.count("__wc").cast("long").alias("n_types"),
        F.sum("__tent").alias("__entS"),
        *[F.min(f"__tkey{n}").alias(f"__top{n}") for n in TOP_NGRAM_LIMITS],
        *[
            F.coalesce(F.sum(f"__tdup{n}"), F.lit(0)).alias(f"__dup{n}")
            for n in DUP_NGRAM_LIMITS
        ],
    )

    def frac9(num):
        return F.round(
            F.least(
                F.lit(1.0),
                num.cast("double")
                / F.nullif(F.col("__chars"), F.lit(0)).cast("double"),
            ),
            9,
        )

    cols = [
        F.col(id_col),
        F.col("n_words"),
        F.round(
            F.col("__wlen").cast("double") / F.col("n_words"), 9
        ).alias("mean_word_len"),
        F.round(F.col("__sym").cast("double") / F.col("n_words"), 9).alias(
            "symbol_ratio"
        ),
        F.round(F.col("__alpha").cast("double") / F.col("n_words"), 9).alias(
            "alpha_ratio"
        ),
        F.col("stopword_hits"),
        F.col("n_types"),
        F.round(F.col("n_types").cast("double") / F.col("n_words"), 9).alias(
            "ttr"
        ),
        F.round(
            F.log(F.col("n_words").cast("double"))
            - F.coalesce(F.col("__entS").cast("double"), F.lit(0.0))
            / F.col("n_words"),
            9,
        ).alias("entropy"),
    ]
    for n in TOP_NGRAM_LIMITS:
        top_c = F.lit(1_000_000_000) - F.substring(f"__top{n}", 1, 10).cast(
            "long"
        )
        top_len = F.length(f"__top{n}") - 11
        cols.append(
            F.coalesce(
                frac9(top_c * top_len), F.lit(0.0)
            ).alias(f"top_{n}gram_frac")
        )
    for n in DUP_NGRAM_LIMITS:
        cols.append(frac9(F.col(f"__dup{n}")).alias(f"dup_{n}gram_frac"))
    out = per_doc.select(*cols)
    rules = {
        "rule_word_count": (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS),
        "rule_mean_word_len": (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN),
        "rule_symbol_ratio": F.col("symbol_ratio") <= MAX_SYMBOL_RATIO,
        "rule_alpha_ratio": F.col("alpha_ratio") >= MIN_ALPHA_RATIO,
        "rule_stopwords": F.col("stopword_hits") >= MIN_STOPWORD_HITS,
    }
    for n, lim in TOP_NGRAM_LIMITS.items():
        rules[f"rule_top_{n}gram"] = F.col(f"top_{n}gram_frac") <= lim
    for n, lim in DUP_NGRAM_LIMITS.items():
        rules[f"rule_dup_{n}gram"] = F.col(f"dup_{n}gram_frac") <= lim
    out = out.withColumns(rules)
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else (passes & F.col(name))
    return out.withColumn("passes", passes)


def quality_suite_oracle_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`quality_suite` — the same single
    (doc, n, gram) count feeding every signal, the same argmax
    tie-break, rounding and entropy identity."""
    w = _dd_w(text_col)
    sym_preds = " OR ".join(f"contains(gram, '{s}')" for s in _SYMBOLS)
    quoted = ", ".join(f"'{x}'" for x in STOPWORDS["en"])
    ns = sorted({*TOP_NGRAM_LIMITS, *DUP_NGRAM_LIMITS})
    values = ", ".join(f"({n})" for n in [1] + ns)
    top_cols = ",\n           ".join(
        f"round(LEAST(1.0, CAST(COALESCE(MAX(CASE WHEN n = {n} AND rn = 1 "
        f"THEN c * length(gram) END), 0) AS DOUBLE) / NULLIF(chars, 0)), 9) "
        f"AS top_{n}gram_frac"
        for n in TOP_NGRAM_LIMITS
    )
    dup_cols = ",\n           ".join(
        f"round(LEAST(1.0, CAST(COALESCE(SUM(CASE WHEN n = {n} AND c > 1 "
        f"THEN c * length(gram) END), 0) AS DOUBLE) / NULLIF(chars, 0)), 9) "
        f"AS dup_{n}gram_frac"
        for n in DUP_NGRAM_LIMITS
    )
    top_rules = ",\n           ".join(
        f"(top_{n}gram_frac <= {lim}) AS rule_top_{n}gram"
        for n, lim in TOP_NGRAM_LIMITS.items()
    )
    dup_rules = ",\n           ".join(
        f"(dup_{n}gram_frac <= {lim}) AS rule_dup_{n}gram"
        for n, lim in DUP_NGRAM_LIMITS.items()
    )
    all_rules = " AND ".join(
        [
            "rule_word_count",
            "rule_mean_word_len",
            "rule_symbol_ratio",
            "rule_alpha_ratio",
            "rule_stopwords",
        ]
        + [f"rule_top_{n}gram" for n in TOP_NGRAM_LIMITS]
        + [f"rule_dup_{n}gram" for n in DUP_NGRAM_LIMITS]
    )
    return f"""
    WITH grams AS (
      SELECT doc_id, length({text_col}) AS chars, t.n,
             unnest(CASE WHEN t.n = 1 THEN {w}
               WHEN len({w}) >= t.n THEN
                 list_transform(range(0, len({w}) - t.n + 1),
                                i -> array_to_string({w}[i+1:i+t.n], ' '))
               ELSE [] END) AS gram
      FROM {table}, (VALUES {values}) t(n)
    ),
    cnts AS (
      SELECT doc_id, chars, n, gram, COUNT(*) AS c
      FROM grams GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                   ORDER BY c DESC, gram ASC) AS rn
      FROM cnts
    ),
    per_doc AS (
      SELECT doc_id,
           CAST(SUM(CASE WHEN n = 1 THEN c END) AS BIGINT) AS n_words,
           round(CAST(SUM(CASE WHEN n = 1 THEN c * length(gram) END) AS DOUBLE)
                 / SUM(CASE WHEN n = 1 THEN c END), 9) AS mean_word_len,
           round(CAST(COALESCE(SUM(CASE WHEN n = 1 AND ({sym_preds}) THEN c END), 0) AS DOUBLE)
                 / SUM(CASE WHEN n = 1 THEN c END), 9) AS symbol_ratio,
           round(CAST(COALESCE(SUM(CASE WHEN n = 1 AND regexp_matches(gram, '[a-zA-Z]') THEN c END), 0) AS DOUBLE)
                 / SUM(CASE WHEN n = 1 THEN c END), 9) AS alpha_ratio,
           CAST(COALESCE(SUM(CASE WHEN n = 1 AND gram IN ({quoted}) THEN c END), 0) AS BIGINT)
             AS stopword_hits,
           CAST(SUM(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS n_types,
           round(CAST(SUM(CASE WHEN n = 1 THEN 1 END) AS DOUBLE)
                 / SUM(CASE WHEN n = 1 THEN c END), 9) AS ttr,
           round(ln(SUM(CASE WHEN n = 1 THEN c END))
                 - CAST(COALESCE(SUM(CASE WHEN n = 1
                     THEN CAST(round(c * ln(c), 9) AS DECIMAL(28,12)) END), 0) AS DOUBLE)
                   / SUM(CASE WHEN n = 1 THEN c END), 9) AS entropy,
           {top_cols},
           {dup_cols}
      FROM ranked GROUP BY doc_id, chars
    )
    SELECT *, ({all_rules}) AS passes FROM (
      SELECT *,
           (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS rule_word_count,
           (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
             AS rule_mean_word_len,
           (symbol_ratio <= {MAX_SYMBOL_RATIO}) AS rule_symbol_ratio,
           (alpha_ratio >= {MIN_ALPHA_RATIO}) AS rule_alpha_ratio,
           (stopword_hits >= {MIN_STOPWORD_HITS}) AS rule_stopwords,
           {top_rules},
           {dup_rules}
      FROM per_doc
    )
    """
