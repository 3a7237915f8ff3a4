"""Catalog entries for the corpus (LLM-data-pipeline) operators.

Oracle SQL for the hash/vector operators is generated from the same
constants as the Spark expressions (corpus/dedup.py, corpus/text.py) so
the two engines stay in lockstep. See catalog.py's module docstring for
the cross-engine determinism conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.queries.catalog import ORACLES, _t, query
from modular_etl_data_platform_spark.corpus import dedup as cdedup
from modular_etl_data_platform_spark.corpus import similarity as csim
from modular_etl_data_platform_spark.corpus import text as ctext
from modular_etl_data_platform_spark.corpus.multimodal import attach_binary_payload

# ---------------------------------------------------------------------------
# DuckDB expression twins
# ---------------------------------------------------------------------------


def _dd_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x,y) -> x+y)"
    )


def _dd_cos(a: str, b: str) -> str:
    return f"({_dd_dot(a, b)} / (sqrt({_dd_dot(a, a)}) * sqrt({_dd_dot(b, b)})))"


def _dd_subwords(text_col: str = "text") -> str:
    w = f"string_split({text_col}, ' ')"
    return (
        f"list_reduce(list_transform({w}, "
        f"t -> greatest(CAST(1 AS BIGINT), CAST(ceil(len(t)/4.0) AS BIGINT))), (a,b) -> a+b)"
    )


# ---------------------------------------------------------------------------
# Text analysis (token counting, quality, language-ID, fingerprint)
# ---------------------------------------------------------------------------


@query(
    "q17_text_stats",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           {_dd_subwords()} AS n_subwords,
           md5(text) AS fingerprint
    FROM documents
    """,
)
def q17_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish subword estimate) and exact
    content fingerprint — pure projections, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ctext.token_count().alias("n_tokens"),
        ctext.subword_count().alias("n_subwords"),
        ctext.fingerprint().alias("fingerprint"),
    )


@query(
    "q18_text_quality",
    """
    SELECT doc_id,
           least(CAST(len(string_split(text,' ')) AS DOUBLE) / 200.0, 1.0) * 0.6
             + (CAST(len(list_filter(string_split(text,' '),
                  x -> x IN ('the','a','of','and','is','to','in','that'))) AS DOUBLE)
                / CAST(len(string_split(text,' ')) AS DOUBLE)) * 0.4 AS quality_score
    FROM documents
    """,
)
def q18_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length + stopword-ratio blend)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", ctext.quality_score().alias("quality_score"))


@query(
    "q19_language_id",
    f"""
    SELECT doc_id, lang,
           {ctext.language_id_oracle_sql()} AS predicted_lang
    FROM documents
    """,
)
def q19_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language heuristic vs the labeled lang column."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", ctext.language_id().alias("predicted_lang"))


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------


@query(
    "q20_exact_dedup",
    """
    WITH doubled AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM doubled
    GROUP BY md5(text)
    """,
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash on a corpus with injected duplicates
    (the corpus unioned with a re-crawled copy of itself)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return cdedup.exact_dedup(docs.unionByName(recrawl))


def _minhash_oracle(k: int = 8) -> str:
    cols = ",\n           ".join(
        f"{cdedup.minhash_duckdb('text', s)} AS mh{s}" for s in range(k)
    )
    return f"SELECT doc_id,\n           {cols}\n    FROM documents"


@query("q21_minhash_signatures", _minhash_oracle())
def q21_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8 seeded-md5 minima over word 3-shingles)."""
    return cdedup.minhash_signatures(
        _t(spark, sf_dir, "documents"),
        parallelism=spark.sparkContext.defaultParallelism,
    )


def _lsh_pairs_oracle(
    k: int = 8, bands: int = 4, threshold: float = 0.2, max_bucket: int = 50
) -> str:
    sig_cols = ",\n             ".join(
        f"{cdedup.minhash_duckdb('text', s)} AS mh{s}" for s in range(k)
    )
    rows = k // bands
    band_vals = ", ".join(
        "(" + str(b) + ", " + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) + ")"
        for b in range(bands)
    )
    sh = f"list_distinct({cdedup.shingles_duckdb('text')})"
    return f"""
    WITH sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM documents
    ),
    bands AS (
      SELECT doc_id, b.band_id, b.band_key
      FROM sigs, (VALUES {band_vals}) AS b(band_id, band_key)
      QUALIFY COUNT(*) OVER (PARTITION BY b.band_id, b.band_key) <= {max_bucket}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT doc_id, {sh} AS sh FROM documents)
    SELECT id_a, id_b,
           CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
    FROM cands JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) >= {threshold}
    """


LSH_THRESHOLD = 0.2
#: band buckets larger than this are dropped before pairing (boilerplate
#: guard); mirrored by a QUALIFY window count in the DuckDB oracles.
LSH_MAX_BUCKET = 50


@query(
    "q22_minhash_lsh_pairs",
    _lsh_pairs_oracle(threshold=LSH_THRESHOLD, max_bucket=LSH_MAX_BUCKET),
)
def q22_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs: MinHash LSH banding → bucket-size cap →
    candidates → true n-gram-Jaccard verification (only candidate pairs
    are scored)."""
    return cdedup.minhash_lsh_dedup(
        _t(spark, sf_dir, "documents"),
        threshold=LSH_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
        max_bucket_size=LSH_MAX_BUCKET,
    )


def _simhash_oracle(bits: int = 16) -> str:
    votes = ",\n             ".join(
        f"SUM((ascii(substr(md5(tok), {b + 1}, 1)) % 2) * 2 - 1) AS v{b}"
        for b in range(bits)
    )
    value = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, CAST({value} AS BIGINT) AS simhash FROM votes
    """


@query("q23_simhash", _simhash_oracle())
def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document (token ±1 bit votes)."""
    return cdedup.simhash(
        _t(spark, sf_dir, "documents"),
        parallelism=spark.sparkContext.defaultParallelism,
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@query(
    "q24_ann_bruteforce_topk",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {_dd_cos('embedding', 'qe')} AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def q24_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec 0 (brute-force baseline)."""
    return csim.cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


def _ivf_oracle(k: int = 5, dim: int = 64) -> str:
    return f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cent AS (
      SELECT label AS cell, list(s ORDER BY d) AS centroid FROM (
        SELECT label, d, CAST(SUM(CAST(embedding[d] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, {dim + 1}) t(d)
        GROUP BY label, d
      ) GROUP BY label
    ),
    best AS (
      SELECT cell FROM cent, q
      ORDER BY {_dd_cos('centroid', 'qe')} DESC, cell ASC
      LIMIT 1
    )
    SELECT e.vec_id, e.label AS cell, {_dd_cos('e.embedding', 'qe')} AS cos_sim
    FROM embeddings e JOIN best ON e.label = best.cell, q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {k}
    """


@query("q25_ann_ivf_topk", _ivf_oracle())
def q25_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: route to the nearest coarse cell (exact decimal-sum
    centroids), exact top-5 within that cell only."""
    return csim.ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=5)


@query("q62_ann_ivf_indexed", _ivf_oracle())
def q62_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION IVF shape q25 only simulates: embeddings
    materialized PARTITIONED BY cell (corpus/similarity.py::
    build_ivf_index), probe routed to the best cell and reading ONLY that
    cell's files — `cell IN (...)` lands in PartitionFilters, so the scan
    is file-level pruned (plan-asserted in tests). Same answers as q25's
    in-memory routing, hence the same oracle."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_index_")
    csim.build_ivf_index(emb, path)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return csim.ivf_probe_indexed(spark, path, [float(x) for x in qv], k=5, probes=1)


def _ivf_append_oracle(k: int = 5, dim: int = 64) -> str:
    """Existing corpus (vec_id % 5 != 0) builds the index; the rest is
    appended by sidecar-centroid argmax assignment; probe = q62's
    routing over the unioned index. The query vector (vec 0) is itself
    in the APPENDED batch, so a broken append can't return it."""
    return f"""
    WITH old AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0),
    nw AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
    cent AS (
      SELECT label AS cell, list(s ORDER BY d) AS centroid FROM (
        SELECT label, d, CAST(SUM(CAST(embedding[d] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM old, range(1, {dim + 1}) t(d)
        GROUP BY label, d
      ) GROUP BY label
    ),
    assigned AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT n.vec_id, n.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY {_dd_cos('n.embedding', 'c.centroid')} DESC, c.cell ASC) AS rn
        FROM nw n, cent c
      ) WHERE rn = 1
    ),
    idx AS (
      SELECT vec_id, embedding, label AS cell FROM old
      UNION ALL
      SELECT vec_id, embedding, cell FROM assigned
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    best AS (
      SELECT cell FROM cent, q
      ORDER BY {_dd_cos('centroid', 'qe')} DESC, cell ASC
      LIMIT 1
    )
    SELECT i.vec_id, i.cell, {_dd_cos('i.embedding', 'qe')} AS cos_sim
    FROM idx i JOIN best ON i.cell = best.cell, q
    ORDER BY cos_sim DESC, i.vec_id ASC
    LIMIT {k}
    """


@query("q102_ivf_incremental_append", _ivf_append_oracle())
def q102_ivf_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance (corpus/similarity.py::ivf_append): build
    the partitioned index from the existing corpus, append the new batch
    by broadcast sidecar-centroid assignment (index never rescanned,
    quantizer unchanged), then probe for a NEWLY APPENDED vector — the
    result must contain it, proving appended rows land in the right cell
    partitions and are served by the same file-pruned probe as q62."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    path = tempfile.mkdtemp(prefix="ivf_index_app_")
    csim.build_ivf_index(old, path)
    csim.ivf_append(spark, path, new)
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return csim.ivf_probe_indexed(spark, path, [float(x) for x in qv], k=5, probes=1)


def _ivf_batch_probe_oracle(k: int = 3, probes: int = 1, dim: int = 64) -> str:
    """Relational replay of the batched IVF probe: route each query
    (vec_id % 97 = 0) to its best cell(s) by exact-centroid cosine, scan
    only those cells, top-k per query."""
    return f"""
    WITH cent AS (
      SELECT label AS cell, list(s ORDER BY d) AS centroid FROM (
        SELECT label, d, CAST(SUM(CAST(embedding[d] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, {dim + 1}) t(d)
        GROUP BY label, d
      ) GROUP BY label
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0),
    routed AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_dd_cos('q.qv', 'c.centroid')} DESC, c.cell ASC) AS rn
        FROM q, cent c
      ) WHERE rn <= {probes}
    )
    SELECT query_id, e.vec_id, cos_sim, rank FROM (
      SELECT r.query_id, e.vec_id,
             {_dd_cos('e.embedding', 'r.qv')} AS cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY r.query_id
               ORDER BY {_dd_cos('e.embedding', 'r.qv')} DESC, e.vec_id ASC)
               AS INTEGER) AS rank
      FROM routed r JOIN embeddings e ON e.label = r.cell
    ) AS e
    WHERE rank <= {k}
    """


@query("q103_ivf_batch_probe", _ivf_batch_probe_oracle())
def q103_ivf_batch_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving (corpus/similarity.py::ivf_probe_batch): every
    vec_id % 97 == 0 vector probes the partitioned IVF index in ONE job —
    broadcast sidecar routing + broadcast query join against the index on
    the partition column (dynamic partition pruning limits the scan to
    routed cells; the index is never shuffled). Each query's top-3 with
    rank must match the relational replay."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_index_batch_")
    csim.build_ivf_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return csim.ivf_probe_batch(spark, path, queries, k=3, probes=1)


@query(
    "q26_embedding_near_dup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_dd_cos('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_dd_cos('a.embedding', 'b.embedding')} >= 0.45
    """,
)
def q26_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.45 ≈ 99.97th pct of this corpus; exact all-pairs form for the
    oracle; the LSH-prefiltered scale path is
    corpus/similarity.py::embedding_near_dup_pairs(use_lsh_prefilter=True))."""
    return csim.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.45,
        use_lsh_prefilter=False,
        parallelism=spark.sparkContext.defaultParallelism,
    )


def _lsh_near_dup_oracle(
    threshold: float, planes: int = 16, bands: int = 4, dim: int = 64
) -> str:
    """DuckDB twin of the banded LSH-prefiltered near-dup path: the ±1
    hyperplane weights are the SAME Python-computed literals the Spark
    plan embeds (corpus/similarity.py::_plane_weights), so the scale path
    itself is hash-verified — not just the brute-force baseline (q26)."""
    weight_lists = ", ".join(
        "[" + ", ".join(str(w) for w in csim._plane_weights(j, dim)) + f"] AS w{j}"
        for j in range(planes)
    )

    def proj(j: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * w{j}[i])), (a, b) -> a + b)"
        )

    sig = " + ".join(
        f"(CASE WHEN {proj(j)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(planes)
    )
    width = planes // bands
    mask = (1 << width) - 1
    band_rows = ", ".join(f"({j})" for j in range(bands))
    return f"""
    WITH w AS (SELECT {weight_lists}),
    sigs AS (
      SELECT vec_id, embedding, CAST({sig} AS BIGINT) AS lsh_sig
      FROM embeddings, w
    ),
    banded AS (
      SELECT vec_id, embedding, b.band,
             (lsh_sig >> (b.band * {width})) & {mask} AS key
      FROM sigs, (VALUES {band_rows}) AS b(band)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, {_dd_cos('ea.embedding', 'eb.embedding')} AS cos_sim
    FROM cands
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
    WHERE {_dd_cos('ea.embedding', 'eb.embedding')} >= {threshold}
    """


def _knn_join_oracle(k: int, planes: int = 32, bands: int = 4, dim: int = 64) -> str:
    """DuckDB twin of the banded k-NN join: same md5-parity plane
    literals, directed candidate set, ROW_NUMBER top-k per query."""
    weight_lists = ", ".join(
        "[" + ", ".join(str(w) for w in csim._plane_weights(j, dim)) + f"] AS w{j}"
        for j in range(planes)
    )

    def proj(j: int) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, {dim + 1}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * w{j}[i])), (a, b) -> a + b)"
        )

    sig = " + ".join(
        f"(CASE WHEN {proj(j)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(planes)
    )
    width = planes // bands
    mask = (1 << width) - 1
    band_rows = ", ".join(f"({j})" for j in range(bands))
    return f"""
    WITH w AS (SELECT {weight_lists}),
    sigs AS (
      SELECT vec_id, CAST({sig} AS BIGINT) AS lsh_sig
      FROM embeddings, w
    ),
    banded AS (
      SELECT vec_id, b.band, (lsh_sig >> (b.band * {width})) & {mask} AS key
      FROM sigs, (VALUES {band_rows}) AS b(band)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             {_dd_cos('ea.embedding', 'eb.embedding')} AS cos_sim
      FROM cands
      JOIN embeddings ea ON ea.vec_id = query_id
      JOIN embeddings eb ON eb.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC)
                AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {k}
    """


@query("q99_knn_join", _knn_join_oracle(k=5))
def q99_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN join (corpus/similarity.py::knn_join): every
    embedding → its 5 nearest LSH-band co-bucketed neighbors — the
    all-pairs curation shape (semantic-dedup thresholds, hard-negative
    mining) vs the single-probe ANN queries. Bucket-local equi-joins +
    one query-partitioned top-k window; the oracle replicates the banded
    prefilter bit-for-bit, so approximation recall is hash-pinned."""
    return csim.knn_join(
        _t(spark, sf_dir, "embeddings"),
        k=5,
        parallelism=spark.sparkContext.defaultParallelism,
    )


@query("q58_embedding_near_dup_lsh", _lsh_near_dup_oracle(threshold=0.4))
def q58_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup embedding pairs via the SCALE path: banded 16-bit random-
    hyperplane signatures (4 bands × 4 bits, MinHash-banding style —
    candidates share any band), bucket-local equi-join, then exact cosine
    ≥ 0.4 on candidates only. The oracle replicates the signature
    bit-for-bit, so the recall trade-off of the prefilter is pinned by
    the hash check, not just sampled by tests."""
    return csim.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.4,
        use_lsh_prefilter=True,
        bands=4,
        parallelism=spark.sparkContext.defaultParallelism,
    )


# ---------------------------------------------------------------------------
# Multimodal binary columns
# ---------------------------------------------------------------------------


@query(
    "q27_multimodal_meta",
    """
    SELECT doc_id, 'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
    """,
)
def q27_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata (the multimodal storage
    shape); metadata-only projection never reads payload pages."""
    media = attach_binary_payload(
        _t(spark, sf_dir, "documents"), source_col="text", mime="text/plain"
    )
    return media.select("doc_id", "mime", "byte_len")


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (blocked) + rolling fingerprint
# ---------------------------------------------------------------------------


@query(
    "q36_ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, list_distinct({cdedup.shingles_duckdb('text', 3)}) AS sh
      FROM documents
    ),
    blocked AS (SELECT doc_id, sh, list_min(sh) AS bk FROM sh),
    scored AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM blocked a JOIN blocked b ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.2
    """,
)
def q36_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup with min-shingle blocking: candidates are
    pairs sharing their lexicographically-smallest 3-shingle (a 1-hash
    MinHash band), then true Jaccard on candidates only. |A∪B| is computed
    as |A|+|B|-|A∩B| in both engines — integer arithmetic, identical
    doubles. At 100 TB the block key bounds the self-join exactly like an
    LSH band bucket (cap/salt oversized buckets)."""
    docs = cdedup.fan_out(
        _t(spark, sf_dir, "documents"), spark.sparkContext.defaultParallelism
    )
    # cache: the self-join reads the shingle projection for BOTH sides,
    # and without the barrier the split+transform+distinct pass runs
    # once per side (same rationale as minhash_lsh_dedup's sig cache)
    sh = (
        docs.select(
            "doc_id",
            F.array_distinct(F.expr(cdedup.shingles_sql("text", 3))).alias("sh"),
        )
        .withColumn("bk", F.array_min("sh"))
        .cache()
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


@query(
    "q37_rolling_fingerprint",
    """
    SELECT doc_id,
           md5(text) AS fingerprint,
           list_min(list_transform(
             range(0, greatest(len(string_split(text, ' ')) - 8, 0) + 1),
             i -> md5(array_to_string(string_split(text, ' ')[i+1:i+8], ' '))
           )) AS rolling_fp
    FROM documents
    """,
)
def q37_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact md5 plus a winnowing-style rolling
    fingerprint (min md5 over all 8-token windows) that survives small
    prefix/suffix edits. Pure projection — zero shuffle at any scale."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ctext.fingerprint().alias("fingerprint"),
        ctext.rolling_fingerprint(window=8).alias("rolling_fp"),
    )


# ---------------------------------------------------------------------------
# Chunking + deterministic stratified sampling (training-data prep)
# ---------------------------------------------------------------------------


@query(
    "q45_chunk_documents",
    """
    WITH c AS (
      SELECT doc_id,
             list_transform(
               range(0, greatest(len(string_split(text,' ')) - 10 - 1, 0) + 1, 40),
               i -> array_to_string(string_split(text,' ')[i+1:i+50], ' ')
             ) AS chunks
      FROM documents
    )
    SELECT doc_id,
           generate_subscripts(chunks, 1) - 1 AS chunk_no,
           unnest(chunks) AS chunk_text,
           CAST(len(string_split(unnest(chunks), ' ')) AS BIGINT) AS chunk_tokens
    FROM c
    """,
)
def q45_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 50-token chunks with 10-token overlap
    (stride 40), one output row per chunk — posexplode projection, zero
    shuffle at any corpus size."""
    return ctext.chunk_text(
        _t(spark, sf_dir, "documents"), chunk_tokens=50, overlap=10
    )


@query(
    "q46_stratified_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10000
          < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                      WHEN 'fr' THEN 1000 ELSE 0 END
    """,
)
def q46_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling (en 50%, de 25%, fr 10%) keyed
    on md5(salt|id) — reproducible across runs/engines/cluster layouts,
    unlike sample(); the idempotent shape a training-mix pipeline needs."""
    return ctext.stratified_sample_hash(
        _t(spark, sf_dir, "documents").select("doc_id", "lang"),
        rates={"en": 0.5, "de": 0.25, "fr": 0.1},
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms + PII scrubbing
# ---------------------------------------------------------------------------


@query(
    "q47_tfidf_top_terms",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 9) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    )
    SELECT doc_id, term, tfidf, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
    """,
)
def q47_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF, top-5 terms per document. Two shuffles total
    ((doc,term) tf + term df); the document count joins in as a broadcast
    1-row aggregate. Top-k per doc via window with a term tie-break.
    Scores round to 9 decimals BEFORE ranking: Java Math.log and libm ln
    differ in the last ulp, which would flip near-tie ranks between
    engines."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 9
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "term", "tfidf", "rk")
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


@query(
    "q48_pii_scrub",
    f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or x' || CAST(doc_id AS VARCHAR)
                  || '@test.org today' AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           md5(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g')) AS scrubbed_md5
    FROM t
    """,
)
def q48_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count + redact email addresses (regexp, JVM-side).
    The corpus has no PII, so deterministic emails are injected first;
    output carries the scrubbed-text hash so the redaction itself is
    oracle-verified. Pure projection — no shuffle."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or x"), F.col("doc_id").cast("string"),
            F.lit("@test.org today"),
        ).alias("text"),
    )
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{_EMAIL_RE}')").cast("long").alias("n_emails"),
        F.md5(F.regexp_replace("text", _EMAIL_RE, "[EMAIL]")).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: pairs -> connected components
# ---------------------------------------------------------------------------

_Q49_EDGES_DUCK = f"""
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT doc_id, sh, list_min(sh) AS bk FROM
             (SELECT doc_id, list_distinct({cdedup.shingles_duckdb('text', 3)}) AS sh
              FROM documents)) a
      JOIN (SELECT doc_id, sh, list_min(sh) AS bk FROM
             (SELECT doc_id, list_distinct({cdedup.shingles_duckdb('text', 3)}) AS sh
              FROM documents)) b
        ON a.bk = b.bk AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
"""


@query(
    "q49_dedup_clusters",
    f"""
    WITH RECURSIVE edges AS (
      {_Q49_EDGES_DUCK}
    ),
    bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.src, reach.r FROM bidir b JOIN reach ON b.dst = reach.doc_id
    )
    SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
    """,
)
def q49_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup clusters: connected components by iterative
    min-label propagation (O(diameter) rounds, driver-checked
    convergence). The oracle computes the same fixpoint as a recursive
    CTE. Keeping one doc per cluster_id IS the fuzzy-dedup output."""
    docs = _t(spark, sf_dir, "documents")
    edges = q36_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return cdedup.connected_components(docs.select("doc_id"), edges)


_Q49_ORACLE = ORACLES["q49_dedup_clusters"]

_Q18_QUALITY_DUCK = """
    least(CAST(len(string_split(text,' ')) AS DOUBLE) / 200.0, 1.0) * 0.6
      + (CAST(len(list_filter(string_split(text,' '),
           x -> x IN ('the','a','of','and','is','to','in','that'))) AS DOUBLE)
         / CAST(len(string_split(text,' ')) AS DOUBLE)) * 0.4
"""


@query(
    "q104_cluster_representatives",
    f"""
    WITH RECURSIVE edges AS (
      {_Q49_EDGES_DUCK}
    ),
    bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.src, reach.r FROM bidir b JOIN reach ON b.dst = reach.doc_id
    ),
    clusters AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    scored AS (
      SELECT c.cluster_id, d.doc_id, ({_Q18_QUALITY_DUCK}) AS quality_score,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT cluster_id, doc_id AS keep_doc_id, quality_score, cluster_size
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY quality_score DESC, doc_id ASC) = 1
    """,
)
def q104_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-dedup DECISION step: within every near-dup cluster keep
    the highest-quality document (deterministic doc_id tie-break) and
    record how many copies it stands for — clusters from q49's connected
    components joined with q18's quality heuristic, reduced by one
    cluster-partitioned window. This is the composed keep/drop output a
    curation pipeline feeds downstream; the singleton clusters pass
    through with cluster_size 1."""
    docs = _t(spark, sf_dir, "documents")
    edges = q36_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    clusters = cdedup.connected_components(docs.select("doc_id"), edges)
    scored = clusters.join(
        docs.select("doc_id", ctext.quality_score().alias("quality_score")),
        "doc_id",
    )
    wsz = Window.partitionBy("cluster_id")
    wtop = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("cluster_size", F.count(F.lit(1)).over(wsz))
        .withColumn("__rn", F.row_number().over(wtop))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            "quality_score",
            "cluster_size",
        )
    )


@query("q101_dedup_clusters_star", _Q49_ORACLE)
def q101_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering fixpoint as q49, computed by the O(log n)
    large-star/small-star algorithm (corpus/dedup.py
    ::connected_components_star) — the scale path for DEEP or
    degree-skewed components where min-label propagation's O(diameter)
    rounds blow up. Sharing q49's recursive-CTE oracle pins both
    algorithms to the identical labeling."""
    docs = _t(spark, sf_dir, "documents")
    edges = q36_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return cdedup.connected_components_star(docs.select("doc_id"), edges)


# ---------------------------------------------------------------------------
# Curation: decontamination, packing, mixture weights, repetition
# ---------------------------------------------------------------------------

from modular_etl_data_platform_spark.corpus import curation as ccur


@query(
    "q50_decontamination",
    f"""
    WITH probe AS (
      SELECT DISTINCT unnest({ccur.ngram_hashes_duckdb('text')}) AS gh
      FROM documents WHERE doc_id % 97 = 0
    ),
    train AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
    tg AS (
      SELECT doc_id, unnest({ccur.ngram_hashes_duckdb('text')}) AS gh FROM train
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_overlap FROM tg JOIN probe USING (gh)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(h.n_overlap, 0) > 0 AS is_contaminated
    FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
)
def q50_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with the (deterministically chosen) eval subset. The probe
    n-gram set broadcasts; the corpus is never shuffled."""
    docs = _t(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return ccur.decontaminate(train, probe)


PACKING_SHARDS = 8


@query(
    "q51_packing_plan",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id % {PACKING_SHARDS} AS shard_id
      FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER w, 0) / 512.0)
                * {PACKING_SHARDS} + shard_id AS BIGINT) AS bin_id,
           CAST(COALESCE(SUM(n_tokens) OVER w, 0) AS BIGINT) AS tokens_before,
           CAST(shard_id AS BIGINT) AS shard_id
    FROM t
    WINDOW w AS (PARTITION BY shard_id ORDER BY n_tokens DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def q51_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing plan: lay docs longest-first into 512-token
    context windows (contiguous-fill first-fit-decreasing), packed
    per-shard (the scale path — the window is partitioned by a
    deterministic doc_id shard, never a single global sort; ≤1 partial
    bin lost per shard)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", ctext.token_count().alias("n_tokens")
    )
    return ccur.packing_plan(docs, capacity=512, shards=PACKING_SHARDS)


@query(
    "q52_mixture_weights",
    """
    WITH sizes AS (
      SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS group_size
      FROM documents GROUP BY source, lang
    ),
    shared AS (
      SELECT *, CAST(group_size AS DOUBLE)
                  / (SELECT SUM(group_size) FROM sizes) AS share
      FROM sizes
    ),
    norm AS (
      SELECT CAST(SUM(CAST(sqrt(share) AS DECIMAL(28,12))) AS DOUBLE) AS norm
      FROM shared
    )
    SELECT source, lang, group_size, share,
           sqrt(share) / norm AS weight,
           (sqrt(share) / norm) / share AS sample_factor
    FROM shared CROSS JOIN norm
    """,
)
def q52_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture: sqrt-temperature sampling weights per
    (source, lang) slice, sized by characters — the domain-upweighting
    step before building training shards."""
    docs = _t(spark, sf_dir, "documents")
    return ccur.mixture_weights(docs, ["source", "lang"], token_col="n_chars")


@query(
    "q53_repetition_stats",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             list_transform(range(0, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                            i -> array_to_string(string_split(text, ' ')[i+1:i+2], ' ')) AS bg
      FROM documents
    ),
    s AS (SELECT doc_id, w, bg, list_sort(bg) AS sbg FROM t),
    r AS (
      SELECT doc_id, w, bg, sbg,
             list_filter(range(1, len(sbg) + 1),
                         i -> i = 1 OR sbg[i] != sbg[i-1]) AS starts
      FROM s
    )
    SELECT doc_id,
           1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE)
             AS dup_word_frac,
           CAST(list_max(list_transform(range(1, len(starts) + 1),
                  i -> (CASE WHEN i < len(starts) THEN starts[i+1]
                        ELSE len(sbg) + 1 END) - starts[i])) AS DOUBLE)
             / CAST(len(bg) AS DOUBLE) AS top_bigram_frac
    FROM r
    """,
)
def q53_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-frequent-bigram fraction. Pure projection."""
    return ccur.repetition_stats(_t(spark, sf_dir, "documents"))


@query(
    "q59_lm_perplexity",
    """
    WITH tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(text) - 2, 1) + 1),
                                   i -> substr(text, i, 3))) AS tri
      FROM documents
    ),
    model AS (SELECT tri, COUNT(*) AS tri_n FROM tri GROUP BY tri),
    total AS (SELECT SUM(tri_n) AS tri_total FROM model)
    SELECT doc_id,
           CAST(SUM(CAST(round(ln(CAST(tri_n AS DOUBLE) / tri_total), 9)
                         AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mean_logp,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams
    FROM tri JOIN model USING (tri) CROSS JOIN total
    GROUP BY doc_id
    """,
)
def q59_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained char-trigram LM quality scores (CCNet-style
    perplexity filter): two shuffles, model broadcast back."""
    return ctext.lm_perplexity_scores(_t(spark, sf_dir, "documents"))


@query(
    "q63_line_dedup",
    """
    WITH lines AS (
      SELECT doc_id, arr[i] AS line, i AS pos
      FROM (SELECT doc_id, string_split(text, '. ') AS arr FROM documents) d,
           LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) t
    ),
    boiler AS (
      SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)),
    rebuilt AS (
      SELECT doc_id, string_agg(line, '. ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_lines_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
           CAST(COALESCE(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q63_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (CCNet/RefinedWeb line dedup):
    sentence segments appearing in ≥2 distinct documents are dropped from
    every document, survivors re-joined in order. Linear — explode,
    uniform-key counts, anti-join; never all-pairs."""
    return cdedup.line_dedup(
        _t(spark, sf_dir, "documents"), min_doc_freq=2, sep=". "
    )


@query(
    "q64_apply_mixture",
    """
    WITH sizes AS (
      SELECT source, lang, COUNT(*) AS group_size FROM documents GROUP BY source, lang
    ),
    shared AS (
      SELECT *, CAST(group_size AS DOUBLE)
                  / (SELECT SUM(group_size) FROM sizes) AS share
      FROM sizes
    ),
    norm AS (
      SELECT CAST(SUM(CAST(sqrt(share) AS DECIMAL(28,12))) AS DOUBLE) AS norm
      FROM shared
    ),
    w AS (
      SELECT source, lang, (sqrt(share) / norm) / share AS sample_factor
      FROM shared CROSS JOIN norm
    ),
    rates AS (
      SELECT source, lang,
             CAST(floor(sample_factor / (SELECT MAX(sample_factor) FROM w) * 10000) AS INT) AS thresh
      FROM w
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (source, lang)
    WHERE ('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 4))::INT % 10000
          < r.thresh
    """,
)
def q64_apply_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REALIZED mixture: deterministically downsample each (source, lang)
    slice to the sqrt-temperature target (the most-upweighted slice keeps
    everything) — md5-bucket selection, so the sample is reproducible
    across engines and reruns. Thresholds broadcast; the corpus side is a
    pure filter."""
    out = ccur.apply_mixture(_t(spark, sf_dir, "documents"), ["source", "lang"])
    return out.select("doc_id", "lang", "source")


@query(
    "q65_vocab_oov",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    counts AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY word),
    vocab AS (SELECT word FROM counts ORDER BY freq DESC, word ASC LIMIT 40),
    hit AS (
      SELECT t.doc_id, v.word IS NOT NULL AS in_vocab
      FROM tok t LEFT JOIN vocab v USING (word)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM hit GROUP BY doc_id
    """,
)
def q65_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + coverage: top-40 corpus words by frequency
    (deterministic tie-break), then per-document OOV rate against the
    broadcast vocab — the tokenizer-coverage check of a training-data
    pipeline."""
    docs = _t(spark, sf_dir, "documents")
    vocab = ctext.induce_vocab(docs, vocab_size=40)
    return ctext.oov_stats(docs, vocab)


@query(
    "q66_token_budget_selection",
    """
    SELECT doc_id, source, lang, n_chars, cum_tokens FROM (
      SELECT doc_id, source, lang, n_chars,
             CAST(SUM(n_chars) OVER (
               PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM documents
    ) WHERE cum_tokens <= 20000
    """,
)
def q66_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) token-budget selection: biggest-first prefix of
    each slice until 20k chars — one partitioned window, no global
    sort."""
    out = ccur.select_by_token_budget(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars"),
        ["source", "lang"],
        budget=20000,
        token_col="n_chars",
        order_col="n_chars",
    )
    return out.select("doc_id", "source", "lang", "n_chars", "cum_tokens")


def _incremental_dedup_oracle(
    k: int = 8, bands: int = 4, threshold: float = 0.2, max_bucket: int = 50
) -> str:
    sig_cols = ",\n             ".join(
        f"{cdedup.minhash_duckdb('text', s)} AS mh{s}" for s in range(k)
    )
    rows = k // bands
    band_vals = ", ".join(
        "(" + str(b) + ", "
        + " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) + ")"
        for b in range(bands)
    )
    sh = f"list_distinct({cdedup.shingles_duckdb('text')})"
    return f"""
    WITH sigs AS (
      SELECT doc_id, (doc_id % 7 = 0) AS is_new,
             {sig_cols}
      FROM documents
    ),
    banded AS (
      SELECT doc_id, is_new, b.band_id, b.band_key
      FROM sigs, (VALUES {band_vals}) AS b(band_id, band_key)
      QUALIFY COUNT(*) FILTER (WHERE NOT is_new)
                OVER (PARTITION BY b.band_id, b.band_key) <= {max_bucket}
    ),
    cands AS (
      SELECT DISTINCT n.doc_id AS id_a, e.doc_id AS id_b
      FROM banded n JOIN banded e
        ON n.band_id = e.band_id AND n.band_key = e.band_key
       AND n.is_new AND NOT e.is_new
    ),
    sh AS (SELECT doc_id, {sh} AS sh FROM documents)
    SELECT id_a, id_b,
           CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh)
                - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
    FROM cands JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh)
                - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) >= {threshold}
    """


@query(
    "q60_incremental_dedup",
    _incremental_dedup_oracle(threshold=LSH_THRESHOLD, max_bucket=LSH_MAX_BUCKET),
)
def q60_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-crawl dedup: the NEW batch (doc_id % 7 = 0) is checked
    against the EXISTING corpus via its persisted MinHash signature table
    — new×existing band probes only, never corpus×corpus, with oversized
    existing-side band buckets dropped. Batch cost scales with the batch,
    not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    existing = docs.filter(F.col("doc_id") % 7 != 0)
    # the scenario this models stores signatures in a persisted table
    # (computed once at ingest, appended per batch); the lazy checkpoint
    # stands in for that table so the cap's count pass and the band
    # probe read one materialization instead of re-hashing the corpus
    existing_sigs = cdedup.minhash_signatures(
        existing, parallelism=spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=False)
    return cdedup.incremental_near_dup(
        new,
        existing_sigs,
        existing,
        threshold=LSH_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
        max_bucket_size=LSH_MAX_BUCKET,
    )


# ---------------------------------------------------------------------------
# Quality-rule bundle, weighted sampling, adaptive length filter (rules.py)
# ---------------------------------------------------------------------------

from modular_etl_data_platform_spark.corpus import rules as crules  # noqa: E402


@query("q67_gopher_rules", crules.gopher_rules_oracle_sql())
def q67_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality-rule bundle: per-document word-count
    / mean-word-length / symbol-ratio / alpha-ratio / stopword rules plus
    the conjunction — a pure map-side projection (no shuffle) that
    pipelines into the scan at any corpus size."""
    return crules.gopher_rules(_t(spark, sf_dir, "documents"))


_Q68_WEIGHT_DD = (
    "least(CAST(len(string_split(text,' ')) AS DOUBLE) / 200.0, 1.0) * 0.6"
    " + (CAST(len(list_filter(string_split(text,' '),"
    " x -> x IN ('the','a','of','and','is','to','in','that'))) AS DOUBLE)"
    " / CAST(len(string_split(text,' ')) AS DOUBLE)) * 0.4"
)


@query(
    "q68_weighted_sample",
    crules.weighted_sample_oracle_sql(
        f"SELECT doc_id, lang, source, {_Q68_WEIGHT_DD} AS weight FROM documents",
        k=500,
        weight_col="weight",
    ),
)
def q68_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: 500 docs drawn
    with probability proportional to quality score via exponential keys
    over an md5-derived uniform (Efraimidis-Spirakis). TakeOrdered top-k —
    reproducible across engines, runs and cluster layouts."""
    from modular_etl_data_platform_spark.corpus import text as _ct

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", _ct.quality_score().alias("weight")
    )
    return crules.weighted_sample(docs, k=500, weight_col="weight")


@query("q69_adaptive_length_filter", crules.adaptive_length_filter_oracle_sql())
def q69_adaptive_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive length filtering: keep documents inside their
    OWN language's [p05, p95] length band (fixed global thresholds
    mis-trim languages with different length distributions). The per-group
    interpolated percentiles are a one-row-per-group aggregate broadcast
    back; the corpus itself never shuffles."""
    return crules.adaptive_length_filter(_t(spark, sf_dir, "documents"))


def _semantic_dedup_oracle(threshold: float = 0.4) -> str:
    """Recursive-CTE fixpoint over the SAME banded-hyperplane edge set as
    q58's oracle — the cluster labels are min-reachable-id, exactly what
    min-label propagation converges to."""
    edges = _lsh_near_dup_oracle(threshold=threshold)
    return f"""
    WITH RECURSIVE edges AS ({edges}),
    bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(vec_id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT b.src, reach.r FROM bidir b JOIN reach ON b.dst = reach.vec_id
    )
    SELECT vec_id, MIN(r) AS cluster_id,
           (vec_id = MIN(r)) AS is_representative
    FROM reach GROUP BY vec_id
    """


@query("q76_semantic_dedup", _semantic_dedup_oracle())
def q76_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication over the embedding space:
    banded hyperplane-LSH near-dup pairs (the q58 scale path — bucket-
    local equi-joins, never all-pairs) chained into connected components;
    each embedding gets its semantic cluster label and the min-id member
    is flagged as the cluster representative (keep it, drop the rest).
    The oracle recomputes the identical edge set and closes it with a
    recursive CTE, so both the prefilter AND the clustering are pinned by
    the hash check."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = csim.embedding_near_dup_pairs(
        emb,
        threshold=0.4,
        use_lsh_prefilter=True,
        bands=4,
        parallelism=spark.sparkContext.defaultParallelism,
    ).select("id_a", "id_b")
    labels = cdedup.connected_components(
        emb.select("vec_id"), pairs, id_col="vec_id"
    )
    return labels.select(
        "vec_id",
        "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).alias("is_representative"),
    )


def _curriculum_oracle(n_buckets: int = 10) -> str:
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    th_cols = ", ".join(
        f"round(quantile_cont(n_chars, {f}), 6) AS t{i}" for i, f in enumerate(fracs)
    )
    bucket = " + ".join(
        f"CASE WHEN n_chars > t{i} THEN 1 ELSE 0 END" for i in range(len(fracs))
    )
    return f"""
    WITH th AS (SELECT {th_cols} FROM documents),
    bucketed AS (
      SELECT doc_id, lang, n_chars, CAST({bucket} AS INTEGER) AS bucket
      FROM documents, th
    )
    SELECT doc_id, lang, n_chars, bucket,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                                   ORDER BY n_chars ASC, doc_id ASC) AS BIGINT)
             AS rank_in_bucket,
           CAST((ROW_NUMBER() OVER (PARTITION BY bucket
                                    ORDER BY n_chars ASC, doc_id ASC) - 1)
                * {n_buckets} + bucket AS BIGINT) AS interleave_key
    FROM bucketed
    """


@query("q77_curriculum_order", _curriculum_oracle())
def q77_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difficulty-interleaved curriculum ordering: global decile buckets
    from one percentile aggregate (no ntile/percent_rank global window),
    deterministic in-bucket ranks, and an interleave key that visits
    buckets round-robin — the schedule a curriculum data loader reads
    off directly."""
    out = ccur.curriculum_order(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    )
    return out.select(
        "doc_id", "lang", "n_chars", "bucket", "rank_in_bucket", "interleave_key"
    )


@query(
    "q117_leakage_safe_split",
    f"""
    WITH RECURSIVE edges AS (
      {_Q49_EDGES_DUCK}
    ),
    bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.src, reach.r FROM bidir b JOIN reach ON b.dst = reach.doc_id
    ),
    clusters AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT doc_id, cluster_id,
           CASE WHEN {{u}} < 0.1 THEN 'val' ELSE 'train' END AS split
    FROM clusters
    """.format(u=crules._uniform_duckdb("cluster_id", "split0")),
)
def q117_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val split (corpus/curation.py::group_split): the
    near-dup clusters from q49's connected components become the split
    UNIT — the split decision hashes cluster_id, so near-copies can
    never straddle train and validation. The oracle recomputes the
    clusters (recursive CTE) and the md5-uniform assignment, pinning
    both the group consistency and the exact membership of each side."""
    docs = _t(spark, sf_dir, "documents")
    edges = q36_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    clusters = cdedup.connected_components(docs.select("doc_id"), edges)
    return ccur.group_split(clusters, "cluster_id", val_frac=0.1)


# ---------------------------------------------------------------------------
# Cross-document repeated n-gram (substring) dedup — Lee et al. ACL'22 family
# ---------------------------------------------------------------------------

_NGRAM_N = 5
_NGRAM_MIN_DOCS = 2

_Q119_OCC_DUCK = f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t
             FROM documents WHERE text IS NOT NULL),
    g AS (SELECT doc_id, unnest(generate_series(1, len(t) - {_NGRAM_N - 1})) AS i, t
          FROM toks WHERE len(t) >= {_NGRAM_N}),
    occ AS (SELECT doc_id, i - 1 AS pos,
                   array_to_string(t[i:i + {_NGRAM_N - 1}], ' ') AS gram
            FROM g),
    rep AS (SELECT gram FROM occ GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= {_NGRAM_MIN_DOCS})
"""


@query(
    "q119_repeated_ngram_spans",
    f"""
    WITH {_Q119_OCC_DUCK}
    SELECT o.doc_id, o.pos AS start_tok, o.pos + {_NGRAM_N - 1} AS end_tok, o.gram
    FROM occ o JOIN rep USING (gram)
    """,
)
def q119_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every occurrence of a token {n}-gram shared by ≥2 documents
    (corpus/ngram_dedup.py::repeated_ngram_spans) — the exact-substring
    locate step of Lee-et-al-style training-data dedup. Windows are
    built with JVM-side higher-order expressions; ONE gram-keyed shuffle
    finds the repeated set. The oracle rebuilds the identical windows
    relationally, so a mis-sliced window, off-by-one position, or a
    doc-count threshold drift all hash-mismatch."""
    from modular_etl_data_platform_spark.corpus.ngram_dedup import (
        repeated_ngram_spans,
    )

    return repeated_ngram_spans(
        _t(spark, sf_dir, "documents"), n=_NGRAM_N, min_docs=_NGRAM_MIN_DOCS
    )


@query(
    "q120_ngram_dedup_clean",
    f"""
    WITH {_Q119_OCC_DUCK},
    rocc AS (SELECT o.* FROM occ o JOIN rep USING (gram)),
    first_doc AS (SELECT gram, MIN(doc_id) AS fdoc FROM rocc GROUP BY gram),
    canonical AS (SELECT o.gram, o.doc_id, MIN(o.pos) AS pos
                  FROM rocc o JOIN first_doc f
                    ON o.gram = f.gram AND o.doc_id = f.fdoc
                  GROUP BY o.gram, o.doc_id),
    cuts AS (SELECT o.doc_id, o.pos AS start_tok, o.pos + {_NGRAM_N - 1} AS end_tok
             FROM rocc o
             WHERE NOT EXISTS (SELECT 1 FROM canonical c
                               WHERE c.gram = o.gram AND c.doc_id = o.doc_id
                                 AND c.pos = o.pos)),
    covered AS (SELECT DISTINCT doc_id,
                       unnest(generate_series(start_tok, end_tok)) AS p
                FROM cuts),
    tok_rows AS (SELECT doc_id, ti - 1 AS p, t[ti] AS tok
                 FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS ti, t
                       FROM toks)),
    clean AS (SELECT tr.doc_id, string_agg(tr.tok, ' ' ORDER BY tr.p) AS text
              FROM tok_rows tr LEFT JOIN covered c
                ON tr.doc_id = c.doc_id AND tr.p = c.p
              WHERE c.p IS NULL
              GROUP BY tr.doc_id)
    SELECT t.doc_id, COALESCE(cl.text, '') AS text
    FROM toks t LEFT JOIN clean cl ON t.doc_id = cl.doc_id
    """,
)
def q120_ngram_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full substring-dedup pass
    (corpus/ngram_dedup.py::remove_repeated_ngrams): cut every
    cross-document repeated {n}-gram occurrence except the canonical
    first (min doc_id, then min position) and rebuild each document's
    text. The driver hashes the ENTIRE cleaned corpus against the
    oracle's relational rebuild — keep-first selection, span overlap
    handling, and token reassembly are all pinned bit-for-bit."""
    from modular_etl_data_platform_spark.corpus.ngram_dedup import (
        remove_repeated_ngrams,
    )

    return remove_repeated_ngrams(
        _t(spark, sf_dir, "documents"), n=_NGRAM_N, min_docs=_NGRAM_MIN_DOCS
    )


@query(
    "q121_within_doc_dedup",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE text IS NOT NULL),
    tok_rows AS (SELECT doc_id, ti - 1 AS p, t[ti] AS tok
                 FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS ti, t
                       FROM toks)),
    firsts AS (SELECT doc_id, tok, MIN(p) AS fp
               FROM tok_rows GROUP BY doc_id, tok)
    SELECT doc_id, string_agg(tok, ' ' ORDER BY fp) AS text
    FROM firsts GROUP BY doc_id
    """,
)
def q121_within_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition removal
    (corpus/dedup.py::dedup_lines_within_doc): keep the first occurrence
    of each repeated unit in original order — the self-repetition
    cleanup Gopher's rules (q67) only flag. The testdata corpus has no
    newlines, so the proving query runs the operator at token
    granularity (sep=' '); the oracle rebuilds first-occurrence order
    relationally (min position per unit, re-agg ordered), pinning both
    the dedup and the order preservation of array_distinct. Zero-shuffle
    pure projection at any corpus size."""
    return cdedup.dedup_lines_within_doc(
        _t(spark, sf_dir, "documents"), sep=" "
    )


@query(
    "q122_incremental_ngram_dedup",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE text IS NOT NULL),
    g AS (SELECT doc_id, unnest(generate_series(1, len(t) - {_NGRAM_N - 1})) AS i, t
          FROM toks WHERE len(t) >= {_NGRAM_N}),
    occ AS (SELECT doc_id, i - 1 AS pos,
                   array_to_string(t[i:i + {_NGRAM_N - 1}], ' ') AS gram
            FROM g),
    idx AS (SELECT DISTINCT gram FROM occ WHERE doc_id % 7 <> 0),
    cuts AS (SELECT o.doc_id, o.pos AS start_tok, o.pos + {_NGRAM_N - 1} AS end_tok
             FROM occ o JOIN idx USING (gram) WHERE o.doc_id % 7 = 0),
    covered AS (SELECT DISTINCT doc_id,
                       unnest(generate_series(start_tok, end_tok)) AS p
                FROM cuts),
    new_toks AS (SELECT doc_id, t FROM toks WHERE doc_id % 7 = 0),
    tok_rows AS (SELECT doc_id, ti - 1 AS p, t[ti] AS tok
                 FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS ti, t
                       FROM new_toks)),
    clean AS (SELECT tr.doc_id, string_agg(tr.tok, ' ' ORDER BY tr.p) AS text
              FROM tok_rows tr LEFT JOIN covered c
                ON tr.doc_id = c.doc_id AND tr.p = c.p
              WHERE c.p IS NULL
              GROUP BY tr.doc_id)
    SELECT t.doc_id, COALESCE(cl.text, '') AS text
    FROM new_toks t LEFT JOIN clean cl ON t.doc_id = cl.doc_id
    """,
)
def q122_incremental_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-crawl substring dedup
    (corpus/ngram_dedup.py::incremental_remove_repeated): the NEW batch
    (doc_id % 7 = 0, the q60 split) is cleaned against the EXISTING
    corpus's persisted gram index — every batch occurrence of an indexed
    {n}-gram is cut (the corpus holds the canonical copy), the text
    rebuilt. The existing corpus text is read only to build the index
    (persisted in production; localCheckpoint stands in); batch cost
    scales with the batch."""
    from modular_etl_data_platform_spark.corpus.ngram_dedup import (
        build_gram_index,
        incremental_remove_repeated,
    )

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    existing = docs.filter(F.col("doc_id") % 7 != 0)
    index = build_gram_index(existing, n=_NGRAM_N).localCheckpoint(eager=False)
    return incremental_remove_repeated(new, index, n=_NGRAM_N)


def _ann_recall_oracle(k: int = 5, dim: int = 64, probes: int = 1) -> str:
    return f"""
    WITH qs AS (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id % 97 = 0),
    cent AS (
      SELECT label AS cell, list(s ORDER BY d) AS centroid FROM (
        SELECT label, d, CAST(SUM(CAST(embedding[d] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, {dim + 1}) t(d)
        GROUP BY label, d
      ) GROUP BY label
    ),
    routed AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_dd_cos('c.centroid', 'q.qv')} DESC, c.cell ASC) AS rn
        FROM qs q, cent c
      ) WHERE rn <= {probes}
    ),
    approx AS (
      SELECT query_id, vec_id FROM (
        SELECT r.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY r.query_id
                 ORDER BY {_dd_cos('e.embedding', 'r.qv')} DESC, e.vec_id ASC) AS rn
        FROM routed r JOIN embeddings e ON e.label = r.cell
      ) WHERE rn <= {k}
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_dd_cos('e.embedding', 'q.qv')} DESC, e.vec_id ASC) AS rn
        FROM qs q, embeddings e
      ) WHERE rn <= {k}
    ),
    hits AS (SELECT a.query_id, COUNT(*) AS n_found
             FROM approx a JOIN exact x
               ON a.query_id = x.query_id AND a.vec_id = x.vec_id
             GROUP BY a.query_id)
    SELECT q.query_id,
           COALESCE(h.n_found, 0) AS n_found,
           COALESCE(h.n_found, 0) / {k}.0 AS recall
    FROM qs q LEFT JOIN hits h USING (query_id)
    """


@query("q124_ann_recall", _ann_recall_oracle())
def q124_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the partitioned IVF index vs exact search
    (corpus/similarity.py::ann_recall_at_k) for a deterministic query
    sample (vec_id % 97 = 0) — the evaluation a user tunes probes/cells
    against. The oracle replicates BOTH sides relationally (exact
    decimal-sum centroids, identical cos/id tie-breaks), so the recall
    numbers — not just the plumbing — are hash-pinned cross-engine."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_recall_")
    csim.build_ivf_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return csim.ann_recall_at_k(spark, path, emb, queries, k=5, probes=1)


@query(
    "q130_deterministic_shuffle",
    ccur.deterministic_shuffle_oracle_sql(
        "SELECT doc_id, lang, source FROM documents",
        num_shards=16,
        extra_cols=", lang, source",
    ),
)
def q130_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global corpus shuffle for training order
    (corpus/curation.py::deterministic_shuffle): md5 rank keys, uniform
    hex-prefix shards, per-shard positions — a full deterministic
    permutation with ONE shuffle and NO global sort. The oracle replays
    the identical permutation in DuckDB, so shard assignment AND
    within-shard order are hash-pinned cross-engine."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return ccur.deterministic_shuffle(docs, num_shards=16).select(
        "doc_id", "lang", "source", "shard", "pos"
    )


@query(
    "q147_semdedup",
    f"""
    WITH dropped AS (
      SELECT DISTINCT a.vec_id
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND b.vec_id < a.vec_id
      WHERE {_dd_cos('a.embedding', 'b.embedding')} >= 0.3
    )
    SELECT e.label AS cell,
           COUNT(*) AS n_items,
           CAST(COALESCE(SUM(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_dropped,
           CAST(COALESCE(SUM(CASE WHEN d.vec_id IS NULL THEN NULL ELSE e.vec_id END), 0) AS BIGINT) AS dropped_id_sum
    FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
    GROUP BY e.label
    """,
)
def q147_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (corpus/similarity.py::semdedup — Abbas et al. 2023):
    semantic dedup by embedding clustering. Pairwise cosine runs ONLY
    within a cluster (here the pre-labeled cells, so the oracle can
    replay the exact semantics; production plugs kmeans_cells in as the
    quantizer) and every item with a lower-id near-duplicate in its
    cell is marked dropped — the kept set retains the lowest-id member
    of each duplicate group. Per-cell item counts, drop counts and the
    dropped-id checksum are hash-pinned: a cross-cell comparison, a
    flipped keep-direction, or a float-order-dependent cosine all
    change the hash."""
    marked = csim.semdedup(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.3,
        cell_col="label",
    )
    return (
        marked.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("is_dup"), F.col("vec_id"))), F.lit(0)
            ).cast("long").alias("dropped_id_sum"),
        )
    )


def _dsir_oracle(buckets: int = 64, n: int = 2, frac: float = 0.2) -> str:
    w = "string_split(text, ' ')"
    feat = (
        f"list_transform(range(0, greatest(len({w}) - {n}, 0) + 1), "
        f"i -> ('0x' || substr(md5(array_to_string({w}[i+1:i+{n}], ' ')), 1, 15))::BIGINT % {buckets})"
    )
    return f"""
    WITH feats AS (
      SELECT doc_id, lang, unnest({feat}) AS b FROM documents
    ),
    cnts AS (SELECT doc_id, b, COUNT(*) AS c FROM feats GROUP BY 1, 2),
    raw AS (SELECT b, COUNT(*) AS rc FROM feats GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS tc FROM feats WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM feats WHERE lang = 'en') AS T,
                   (SELECT COUNT(*) FROM feats) AS R),
    ratio AS (
      SELECT raw.b,
             (ln(COALESCE(tgt.tc, 0) + 1) - ln(CAST(T + {buckets} AS DOUBLE)))
           - (ln(raw.rc + 1) - ln(CAST(R + {buckets} AS DOUBLE))) AS lr
      FROM raw LEFT JOIN tgt USING (b), tot
    ),
    wts AS (
      SELECT cnts.doc_id,
             list_reduce(list(cnts.c * ratio.lr ORDER BY cnts.b), (a, x) -> a + x) AS logw
      FROM cnts JOIN ratio USING (b) GROUP BY cnts.doc_id
    ),
    ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id ASC) AS rn
      FROM wts
    ),
    sel AS (
      SELECT d.doc_id, d.lang FROM ranked r JOIN documents d USING (doc_id)
      -- FLOOR matches the Spark side's int() truncation: CAST alone
      -- ROUNDS in DuckDB, so a doc count not divisible by 5 would
      -- select one extra document and hash-mismatch
      WHERE r.rn <= (SELECT CAST(FLOOR(COUNT(*) * {frac}) AS BIGINT) FROM documents)
    )
    SELECT lang, COUNT(*) AS n_sel, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM sel GROUP BY lang
    """


@query("q148_dsir_selection", _dsir_oracle())
def q148_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (corpus/curation.py::dsir_select — Xie et
    al. 2023): score every document by the log-likelihood ratio of its
    hashed-bigram feature counts under the TARGET distribution (the
    corpus's English documents) vs the raw distribution, Laplace-
    smoothed, then keep the top 20% (deterministic rank: weight desc,
    id asc). Per-language counts and id checksums of the SELECTED set
    are hash-pinned — the en share must dominate (the method working),
    and any fold-order drift, smoothing slip, or rank instability
    changes the set. The per-doc sum folds bucket terms in sorted
    bucket order on BOTH engines, so float addition order is pinned;
    selection margins at the cutoff are ~1e-3 (measured), 10^12 x
    libm's ulp noise."""
    from modular_etl_data_platform_spark.corpus import curation as ccur

    docs = _t(spark, sf_dir, "documents")
    n_sel = int(docs.count() * 0.2)
    sel = ccur.dsir_select(docs, "lang = 'en'", n_sel)
    return (
        sel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sel"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


@query(
    "q158_prototype_pruning",
    f"""
    WITH cent AS (
      SELECT label AS cell, list(s ORDER BY d) AS centroid FROM (
        SELECT label, d, CAST(SUM(CAST(embedding[d] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, 65) t(d)
        GROUP BY label, d
      ) GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label AS cell,
             {_dd_cos('e.embedding', 'centroid')} AS proto
      FROM embeddings e JOIN cent ON e.label = cent.cell
    ),
    ranked AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY proto DESC, vec_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY cell) AS n
      FROM scored
    )
    SELECT cell, COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN rn <= FLOOR(n * 0.3) THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
           CAST(COALESCE(SUM(CASE WHEN rn <= FLOOR(n * 0.3) THEN vec_id END), 0) AS BIGINT) AS pruned_id_sum
    FROM ranked GROUP BY cell
    """,
)
def q158_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype pruning (corpus/similarity.py::prototype_prune —
    Sorscher et al. 2022; D4's difficulty stage): score every embedding
    by cosine to its cell's exact decimal-sum centroid and prune the
    most prototypical 30% per cell (keep the hard examples). Pre-labeled
    cells play the quantizer so the oracle replays the EXACT semantics
    (same convention as q147's SemDeDup); per-cell item counts, prune
    counts and the pruned-id checksum are hash-pinned — a drifting
    centroid, a flipped keep-direction, a fold-order-dependent cosine
    or an unstable rank all change the hash."""
    marked = csim.prototype_prune(
        _t(spark, sf_dir, "embeddings"), frac=0.3, cell_col="label"
    )
    return (
        marked.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("is_pruned").cast("long")).alias("n_pruned"),
            F.coalesce(
                F.sum(F.when(F.col("is_pruned"), F.col("vec_id"))), F.lit(0)
            ).cast("long").alias("pruned_id_sum"),
        )
    )


def _pq_oracle(m: int = 8, d: int = 8, codes: int = 16, k: int = 10) -> str:
    l2 = (
        f"list_reduce(list_transform(range(1, {d + 1}), "
        f"i -> (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)) "
        f"* (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE))), (x,y) -> x+y)"
    )
    return f"""
    WITH cb AS (
      SELECT s.s AS sub, e.vec_id AS code_id,
             e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS cvec
      FROM embeddings e, range(0, {m}) s(s)
      WHERE e.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {codes})
    ),
    sv AS (
      SELECT e.vec_id, s.s AS sub, e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS svec
      FROM embeddings e, range(0, {m}) s(s)
    ),
    enc AS (
      SELECT vec_id, sub, code_id FROM (
        SELECT sv.vec_id, sv.sub, cb.code_id,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY {l2} ASC, cb.code_id ASC) AS rn
        FROM sv JOIN cb USING (sub)
      ) WHERE rn = 1
    ),
    q AS (
      SELECT s.s AS sub, embedding[s.s*{d}+1 : s.s*{d}+{d}] AS qvec
      FROM embeddings, range(0, {m}) s(s) WHERE vec_id = 0
    ),
    tbl AS (
      SELECT cb.sub, cb.code_id, {_dd_dot('qvec', 'cvec')} AS t
      FROM cb JOIN q USING (sub)
    ),
    score AS (
      SELECT enc.vec_id,
             list_reduce(list(t ORDER BY enc.sub), (a,b) -> a+b) AS adc
      FROM enc JOIN tbl ON enc.sub = tbl.sub AND enc.code_id = tbl.code_id
      GROUP BY enc.vec_id
    )
    SELECT vec_id, adc FROM score ORDER BY adc DESC, vec_id ASC LIMIT {k}
    """


@query("q159_pq_adc_topk", _pq_oracle())
def q159_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric distance (corpus/similarity.py
    ::pq_encode/pq_topk — Jegou et al. 2011): the corpus compresses to
    m=8 codes per vector against a deterministic sampled codebook (the
    16 lowest-id vectors; production plugs pq_codebook_kmeans in), and
    the query's top-10 is scored purely from an 8x16 inner-product
    table — raw vectors untouched after encoding, the 32x-smaller-index
    scale path that pairs with the IVF routing of q62. The full PQ
    pipeline (slicing, L2 argmin encode with code-id ties, table
    build, sorted-fold ADC sum, rank) is replayed relationally, so the
    approximate RANKING ITSELF is hash-pinned cross-engine — any
    encode/table/fold drift changes the hash."""
    return csim.pq_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


def _ivf_pq_oracle(m: int = 8, d: int = 8, codes: int = 16, k: int = 10, dim: int = 64) -> str:
    l2 = (
        f"list_reduce(list_transform(range(1, {d + 1}), "
        f"i -> (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)) "
        f"* (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE))), (x,y) -> x+y)"
    )
    return f"""
    WITH qfull AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cent AS (
      SELECT label AS cell, list(s ORDER BY dd) AS centroid FROM (
        SELECT label, dd, CAST(SUM(CAST(embedding[dd] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, {dim + 1}) t(dd)
        GROUP BY label, dd
      ) GROUP BY label
    ),
    best AS (
      SELECT cell FROM cent, qfull
      ORDER BY {_dd_cos('centroid', 'qe')} DESC, cell ASC
      LIMIT 1
    ),
    cb AS (
      SELECT s.s AS sub, e.vec_id AS code_id,
             e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS cvec
      FROM embeddings e, range(0, {m}) s(s)
      WHERE e.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {codes})
    ),
    sv AS (
      SELECT e.vec_id, s.s AS sub, e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS svec
      FROM embeddings e JOIN best ON e.label = best.cell, range(0, {m}) s(s)
    ),
    enc AS (
      SELECT vec_id, sub, code_id FROM (
        SELECT sv.vec_id, sv.sub, cb.code_id,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY {l2} ASC, cb.code_id ASC) AS rn
        FROM sv JOIN cb USING (sub)
      ) WHERE rn = 1
    ),
    q AS (
      SELECT s.s AS sub, embedding[s.s*{d}+1 : s.s*{d}+{d}] AS qvec
      FROM embeddings, range(0, {m}) s(s) WHERE vec_id = 0
    ),
    tbl AS (
      SELECT cb.sub, cb.code_id, {_dd_dot('qvec', 'cvec')} AS t
      FROM cb JOIN q USING (sub)
    ),
    score AS (
      SELECT enc.vec_id,
             list_reduce(list(t ORDER BY enc.sub), (a,b) -> a+b) AS adc
      FROM enc JOIN tbl ON enc.sub = tbl.sub AND enc.code_id = tbl.code_id
      GROUP BY enc.vec_id
    )
    SELECT vec_id, adc FROM score ORDER BY adc DESC, vec_id ASC LIMIT {k}
    """


@query("q160_ivf_pq_topk", _ivf_pq_oracle())
def q160_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end (corpus/similarity.py::ivf_pq_topk — Jegou et
    al. 2011's production pairing): coarse-route the query to its
    nearest cell by exact decimal-sum centroid cosine, then ADC-score
    only that cell's PQ codes from the 8x16 inner-product table — the
    100 TB ANN shape where the scan prunes to 1/cells of the corpus
    AND reads m small ints per surviving row. The whole composition
    (routing, encode, table, sorted-fold ADC, rank) is replayed
    relationally, so the routed approximate ranking is hash-pinned —
    a wrong cell, a cross-cell leak, or any scoring drift changes the
    hash."""
    return csim.ivf_pq_topk(
        _t(spark, sf_dir, "embeddings"), query_id=0, k=10, probes=1
    )


@query("q161_repetition_rules", crules.repetition_signals_oracle_sql())
def q161_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules (corpus/rules.py::repetition_signals —
    Rae et al. 2021 appendix A1.1, the n-gram half of the quality
    suite Dolma/RefinedWeb/FineWeb apply): per document, the char
    fraction covered by the most frequent {2,3,4}-gram and by all
    duplicated {5,10}-grams, each gated at Gopher's published ceiling.
    One explode carries every n (array of (n, gram) structs), the only
    shuffle is the map-side-combinable (doc, n, gram) count, and the
    top-gram argmax folds into the same aggregation (min over a
    (-count, gram) struct — no window, deterministic ties). Every
    signal and boolean is hash-pinned against the relational twin."""
    return crules.repetition_signals(_t(spark, sf_dir, "documents"))


@query("q162_lexical_diversity", ctext.lexical_signals_oracle_sql())
def q162_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity diagnostics (corpus/text.py::lexical_signals):
    per-document type-token ratio and word-distribution Shannon
    entropy — the distributional complement to q161's n-gram
    repetition rules (template/looping text scores low on both). Two
    map-side-combinable shuffles; each p·ln p term rounds to 9dp and
    sums as decimal (the q59/q47 order-free recipe), so the entropy
    itself is hash-pinned cross-engine."""
    return ctext.lexical_signals(_t(spark, sf_dir, "documents"))


def _ivf_pq_rerank_oracle(
    m: int = 8, d: int = 8, codes: int = 16, k: int = 10,
    alpha: int = 4, dim: int = 64,
) -> str:
    l2 = (
        f"list_reduce(list_transform(range(1, {d + 1}), "
        f"i -> (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE)) "
        f"* (CAST(svec[i] AS DOUBLE) - CAST(cvec[i] AS DOUBLE))), (x,y) -> x+y)"
    )
    return f"""
    WITH qfull AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    cent AS (
      SELECT label AS cell, list(s ORDER BY dd) AS centroid FROM (
        SELECT label, dd, CAST(SUM(CAST(embedding[dd] AS DECIMAL(27,8))) AS DOUBLE) AS s
        FROM embeddings, range(1, {dim + 1}) t(dd)
        GROUP BY label, dd
      ) GROUP BY label
    ),
    best AS (
      SELECT cell FROM cent, qfull
      ORDER BY {_dd_cos('centroid', 'qe')} DESC, cell ASC
      LIMIT 1
    ),
    cb AS (
      SELECT s.s AS sub, e.vec_id AS code_id,
             e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS cvec
      FROM embeddings e, range(0, {m}) s(s)
      WHERE e.vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {codes})
    ),
    sv AS (
      SELECT e.vec_id, s.s AS sub, e.embedding[s.s*{d}+1 : s.s*{d}+{d}] AS svec
      FROM embeddings e JOIN best ON e.label = best.cell, range(0, {m}) s(s)
    ),
    enc AS (
      SELECT vec_id, sub, code_id FROM (
        SELECT sv.vec_id, sv.sub, cb.code_id,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
                 ORDER BY {l2} ASC, cb.code_id ASC) AS rn
        FROM sv JOIN cb USING (sub)
      ) WHERE rn = 1
    ),
    q AS (
      SELECT s.s AS sub, embedding[s.s*{d}+1 : s.s*{d}+{d}] AS qvec
      FROM embeddings, range(0, {m}) s(s) WHERE vec_id = 0
    ),
    tbl AS (
      SELECT cb.sub, cb.code_id, {_dd_dot('qvec', 'cvec')} AS t
      FROM cb JOIN q USING (sub)
    ),
    score AS (
      SELECT enc.vec_id,
             list_reduce(list(t ORDER BY enc.sub), (a,b) -> a+b) AS adc
      FROM enc JOIN tbl ON enc.sub = tbl.sub AND enc.code_id = tbl.code_id
      GROUP BY enc.vec_id
    ),
    shortlist AS (
      SELECT vec_id, adc FROM score ORDER BY adc DESC, vec_id ASC LIMIT {k * alpha}
    ),
    rr AS (
      SELECT s.vec_id, s.adc, {_dd_cos('e.embedding', 'qe')} AS exact_sim
      FROM shortlist s JOIN embeddings e USING (vec_id), qfull
    )
    SELECT vec_id, adc, exact_sim
    FROM rr ORDER BY exact_sim DESC, vec_id ASC LIMIT {k}
    """


@query("q164_ivf_pq_rerank", _ivf_pq_rerank_oracle())
def q164_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with the exact RE-RANK stage (corpus/similarity.py::
    ivf_pq_topk(rerank=4) — Jegou et al. 2011 SSV): the ADC pass
    shortlists k*4 candidates from the routed cell's codes, their true
    vectors join back by id (shortlist-bounded fetch, never a corpus
    scan), and the final top-10 ranks by exact cosine. The in-query
    assertion pins the published property that motivates the stage:
    re-ranked recall@10 vs the exact brute-force baseline (q124's
    metric) is >= plain-ADC recall@10 — guaranteed by construction,
    since any shortlist member in the exact global top-k survives an
    exact re-rank. The whole composition (routing, encode, ADC
    shortlist, exact-cosine re-rank) is replayed relationally, so the
    final ranking AND both scores per neighbor are hash-pinned."""
    emb = _t(spark, sf_dir, "embeddings")
    rr, shortlist = csim.ivf_pq_topk(
        emb, query_id=0, k=10, probes=1, rerank=4, with_shortlist=True
    )
    rr = rr.localCheckpoint(eager=True)  # bounded (k rows); reused below
    exact_ids = {
        r["vec_id"] for r in csim.cosine_topk(emb, 0, k=10).collect()
    }
    # plain-ADC top-10 = the first 10 shortlist rows by (adc desc, id):
    # same routing, codebook and deterministic ordering as a separate
    # ivf_pq_topk(k=10) call (pinned by test_similarity's equivalence
    # test), read from the ALREADY-PINNED shortlist instead of
    # re-deriving centroids + codebook + encodings (opt r13)
    adc_ids = {
        r["vec_id"]
        for r in shortlist.orderBy(
            F.col("adc").desc(), F.col("vec_id").asc()
        ).limit(10).collect()
    }
    rr_ids = {r["vec_id"] for r in rr.select("vec_id").collect()}
    recall_adc = len(adc_ids & exact_ids)
    recall_rr = len(rr_ids & exact_ids)
    if recall_rr < recall_adc:
        raise AssertionError(
            f"re-rank lost recall: {recall_rr}/10 < ADC {recall_adc}/10"
        )
    return rr


@query("q165_quality_suite", crules.quality_suite_oracle_sql())
def q165_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUSED text-quality suite (corpus/rules.py::quality_suite):
    q67's Gopher word rules + q161's repetition rules + q162's lexical
    diversity, all computed in ONE corpus pass — one split, one explode
    of (n, gram) structs with words as the n=1 family, exactly two
    exchanges (the (doc, n, gram) count and the per-doc fold;
    plan-asserted in tests/test_plans.py). A 100 TB curation run
    computes all signals per read, not per operator. Entropy uses the
    identity H = ln n − (Σ c·ln c)/n so the per-doc token total never
    has to exist before the single aggregation; every signal, boolean
    and the conjunction is hash-pinned against the relational twin of
    the same fused plan."""
    return crules.quality_suite(_t(spark, sf_dir, "documents"))


_NB_POS = (
    "source IN ('src0', 'src1', 'src2', 'src3', 'src4', "
    "'src5', 'src6', 'src7', 'src8', 'src9')"
)
_NB_B = 4096


def _nb_oracle() -> str:
    return f"""
    WITH feats AS (
      SELECT doc_id, {_NB_POS} AS pos,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {_NB_B} AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    cnts AS (SELECT doc_id, pos, b, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3),
    tot AS (
      SELECT SUM(CASE WHEN pos THEN c ELSE 0 END) AS pt,
             SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nt
      FROM cnts
    ),
    dtot AS (
      SELECT SUM(CASE WHEN {_NB_POS} THEN 1 ELSE 0 END) AS pd,
             SUM(CASE WHEN NOT ({_NB_POS}) THEN 1 ELSE 0 END) AS nd
      FROM documents
    ),
    model AS (
      SELECT b, SUM(CASE WHEN pos THEN c ELSE 0 END) AS pc,
                SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nc
      FROM cnts GROUP BY b
    ),
    llr AS (
      SELECT b, round((ln(pc + 1) - ln(CAST(pt + {_NB_B} AS DOUBLE)))
                    - (ln(nc + 1) - ln(CAST(nt + {_NB_B} AS DOUBLE))), 9) AS lr
      FROM model, tot
    ),
    scored AS (
      SELECT cnts.doc_id, cnts.pos,
             SUM(CAST(round(c * lr, 9) AS DECIMAL(28,12))) AS s
      FROM cnts JOIN llr USING (b) GROUP BY 1, 2
    )
    SELECT doc_id, pos AS is_curated,
           round(CAST(s AS DOUBLE)
                 + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9),
                 9) AS score,
           (CAST(s AS DOUBLE)
            + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9)) > 0
             AS pred
    FROM scored, dtot
    """


@query("q167_quality_classifier", _nb_oracle())
def q167_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-vs-crawl quality classifier
    (corpus/curation.py::nb_quality_scores — the GPT-3 data-curation
    filter, Brown et al. 2020 Appendix A, and CCNet's model-based
    quality stage, Wenzek et al. 2020, as a closed-form hashed-unigram
    Naive Bayes): the first ten sources play the curated positive
    class (balanced split, so the prior is ~0 and the sign boundary is
    genuinely exercised — predictions split 73%/54% by class at sf0.01),
    every document gets the NB log-odds of "curated" and a sign
    prediction. Per-document scores are hash-pinned raw (the q162
    determinism recipe: round-9 LLRs/terms, decimal-summed) — any
    smoothing slip, hash drift, or fold-order difference changes every
    score. The model is a 4096-row broadcast no matter the corpus size;
    the corpus shuffles only (id, bucket, count)."""
    from modular_etl_data_platform_spark.corpus import curation as ccur

    return ccur.nb_quality_scores(
        _t(spark, sf_dir, "documents"), _NB_POS, buckets=_NB_B
    )


def _unimax_oracle(n_cap: int = 2, num: int = 3, den: int = 2) -> str:
    cond = (
        f"{n_cap} * n_tokens * (L - i + 1) <= "
        f"CAST(T * {num} // {den} AS BIGINT) - {n_cap} * (P - n_tokens)"
    )
    return f"""
    WITH sizes AS (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    r AS (
      SELECT lang, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, lang) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, lang
                                 ROWS UNBOUNDED PRECEDING) AS P,
             COUNT(*) OVER () AS L,
             SUM(n_tokens) OVER () AS T
      FROM sizes
    ),
    c AS (
      SELECT *,
             MIN(CASE WHEN {cond} THEN 1 ELSE 0 END)
               OVER (ORDER BY n_tokens, lang ROWS UNBOUNDED PRECEDING) = 1
               AS capped
      FROM r
    ),
    f AS (
      SELECT *,
             SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
             SUM(CASE WHEN capped THEN n_tokens ELSE 0 END) OVER () AS Pk
      FROM c
    )
    SELECT lang, n_tokens, capped,
           round(CASE WHEN capped THEN CAST({n_cap} * n_tokens AS DOUBLE)
                 ELSE CAST(CAST(T * {num} // {den} AS BIGINT)
                           - {n_cap} * Pk AS DOUBLE)
                      / GREATEST(L - k, 1) END, 9) AS alloc_tokens,
           round(round(CASE WHEN capped THEN CAST({n_cap} * n_tokens AS DOUBLE)
                 ELSE CAST(CAST(T * {num} // {den} AS BIGINT)
                           - {n_cap} * Pk AS DOUBLE)
                      / GREATEST(L - k, 1) END, 9) / n_tokens, 9) AS epochs
    FROM f
    """


@query("q168_unimax_mixture", _unimax_oracle())
def q168_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-sampling allocation
    (corpus/curation.py::unimax_allocation — Chung et al. 2023):
    budget-constrained uniform allocation with a 2-epoch per-language
    cap, budget = 1.5x total corpus tokens, the paper's water-filling
    in closed form over window prefix sums (no loop). Low-resource
    languages must land capped at exactly 2.0 epochs and the head
    language(s) split the integer remainder — capped flags, integer cap
    allocations and the rounded fair-share division are all hash-pinned.
    The only corpus-sized work is the per-language token count; the
    water-filling windows run over L language rows by construction."""
    from modular_etl_data_platform_spark.corpus import curation as ccur

    return ccur.unimax_allocation(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# One-pass curation flagship: the whole round-10 operator family chained
# over a single cached corpus read
# ---------------------------------------------------------------------------

_Q171_SHARDS = 4


def _q171_oracle() -> str:
    qs = crules.quality_suite_oracle_sql()
    sh3 = cdedup.shingles_duckdb("text", 3)
    n_cap, num, den = 2, 3, 2
    cond = (
        f"{n_cap} * n_tokens * (L - i + 1) <= "
        f"CAST(T * {num} // {den} AS BIGINT) - {n_cap} * (P - n_tokens)"
    )
    return f"""
    WITH RECURSIVE qs AS ({qs}),
    kept1 AS (
      SELECT d.* FROM documents d JOIN qs ON qs.doc_id = d.doc_id
      WHERE qs.passes
    ),
    feats AS (
      SELECT doc_id, {_NB_POS} AS pos,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {_NB_B} AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM kept1)
    ),
    cnts AS (SELECT doc_id, pos, b, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3),
    tot AS (
      SELECT SUM(CASE WHEN pos THEN c ELSE 0 END) AS pt,
             SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nt
      FROM cnts
    ),
    dtot AS (
      SELECT SUM(CASE WHEN {_NB_POS} THEN 1 ELSE 0 END) AS pd,
             SUM(CASE WHEN NOT ({_NB_POS}) THEN 1 ELSE 0 END) AS nd
      FROM kept1
    ),
    model AS (
      SELECT b, SUM(CASE WHEN pos THEN c ELSE 0 END) AS pc,
                SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nc
      FROM cnts GROUP BY b
    ),
    llr AS (
      SELECT b, round((ln(pc + 1) - ln(CAST(pt + {_NB_B} AS DOUBLE)))
                    - (ln(nc + 1) - ln(CAST(nt + {_NB_B} AS DOUBLE))), 9) AS lr
      FROM model, tot
    ),
    scored AS (
      SELECT cnts.doc_id,
             SUM(CAST(round(c * lr, 9) AS DECIMAL(28,12))) AS s
      FROM cnts JOIN llr USING (b) GROUP BY 1
    ),
    nb AS (
      SELECT doc_id,
             round(CAST(s AS DOUBLE)
                   + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9),
                   9) AS score,
             (CAST(s AS DOUBLE)
              + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9)) > 0
               AS pred
      FROM scored, dtot
    ),
    kept2 AS (
      SELECT k.*, nb.score FROM kept1 k JOIN nb USING (doc_id) WHERE nb.pred
    ),
    shb AS (
      SELECT doc_id, sh, list_min(sh) AS bk
      FROM (SELECT doc_id, list_distinct({sh3}) AS sh FROM kept2)
    ),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM shb a JOIN shb b ON a.bk = b.bk AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
    ),
    bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM kept2
      UNION
      SELECT b.src, reach.r FROM bidir b JOIN reach ON b.dst = reach.doc_id
    ),
    clusters AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
    reps AS (
      SELECT k.* FROM clusters c JOIN kept2 k USING (doc_id)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                 ORDER BY k.score DESC, k.doc_id ASC) = 1
    ),
    sizes AS (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM reps GROUP BY lang
    ),
    r AS (
      SELECT lang, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, lang) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, lang
                                 ROWS UNBOUNDED PRECEDING) AS P,
             COUNT(*) OVER () AS L,
             SUM(n_tokens) OVER () AS T
      FROM sizes
    ),
    c AS (
      SELECT *,
             MIN(CASE WHEN {cond} THEN 1 ELSE 0 END)
               OVER (ORDER BY n_tokens, lang ROWS UNBOUNDED PRECEDING) = 1
               AS capped
      FROM r
    ),
    f AS (
      SELECT *,
             SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
             SUM(CASE WHEN capped THEN n_tokens ELSE 0 END) OVER () AS Pk
      FROM c
    ),
    uni AS (
      SELECT lang, n_tokens, capped,
             round(CASE WHEN capped THEN CAST({n_cap} * n_tokens AS DOUBLE)
                   ELSE CAST(CAST(T * {num} // {den} AS BIGINT)
                             - {n_cap} * Pk AS DOUBLE)
                        / GREATEST(L - k, 1) END, 9) AS alloc_tokens,
             round(round(CASE WHEN capped THEN CAST({n_cap} * n_tokens AS DOUBLE)
                   ELSE CAST(CAST(T * {num} // {den} AS BIGINT)
                             - {n_cap} * Pk AS DOUBLE)
                        / GREATEST(L - k, 1) END, 9) / n_tokens, 9) AS epochs
      FROM f
    ),
    pt AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id % {_Q171_SHARDS} AS shard
      FROM reps
    ),
    pb AS (
      SELECT lang,
             CAST(floor(COALESCE(SUM(n_tokens) OVER w, 0) / 512.0)
                  * {_Q171_SHARDS} + shard AS BIGINT) AS bin_id
      FROM pt
      WINDOW w AS (PARTITION BY lang, shard ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    bins AS (SELECT lang, COUNT(DISTINCT bin_id) AS n_bins FROM pb GROUP BY lang),
    cnt2 AS (SELECT lang, COUNT(*) AS n_kept FROM kept2 GROUP BY lang),
    repsn AS (SELECT lang, COUNT(*) AS n_reps FROM reps GROUP BY lang)
    SELECT uni.lang, cnt2.n_kept, repsn.n_reps, uni.n_tokens, uni.capped,
           uni.alloc_tokens, uni.epochs, bins.n_bins
    FROM uni
    JOIN cnt2 USING (lang)
    JOIN repsn USING (lang)
    JOIN bins USING (lang)
    """


@query("q171_curation_pipeline", _q171_oracle())
def q171_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB curation shape END TO END over ONE corpus read: fused
    quality suite (q165) -> NB quality-classifier filter (q167) ->
    near-dup clusters + best-scoring representatives (q49/q104) ->
    UniMax language allocation (q168) -> per-language token-budget
    packing (q51's sorted contiguous-binning windows partitioned by
    language) — every stage
    consuming the SAME cached base projection, so the parquet scan
    happens once no matter how many operators compose (asserted
    in-query on the executed plans: downstream stages read
    InMemoryTableScan, and the base plan holds the only file scan).
    The oracle replays the entire chain relationally — quality
    conjunction, NB LLRs, recursive-CTE components, closed-form
    water-filling, packing windows — so a drift ANYWHERE in the
    composition (a filter pushed wrongly through the classifier, a
    representative chosen by a different tie-break, an allocation fed
    pre-dedup counts) changes the hash. In-query assertions pin the
    non-degeneracy the oracle can't see: the quality gate and the
    classifier each actually drop documents while keeping both label
    classes in play."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", "lang", "source").cache()
    quality = crules.quality_suite(base)
    # pin the quality survivors: kept1 feeds THREE consumers (the NB
    # featurization scan, the kept2 cache fill, the n1 count) and the
    # quality suite upstream of it costs a full corpus fold per
    # evaluation — uncached, the suite ran once per consumer (guide §5:
    # cache a frame reused by several actions; measured 29.8s -> see
    # OPTIMIZATION_r13.md)
    kept1 = base.join(
        quality.filter("passes").select("doc_id"), "doc_id"
    ).cache()
    nb = ccur.nb_quality_scores(kept1, _NB_POS, buckets=_NB_B)
    kept2 = kept1.join(
        nb.filter("pred").select("doc_id", "score"), "doc_id"
    ).cache()
    total = base.count()
    n1 = kept1.count()
    n2 = kept2.count()
    if not (0 < n1 < total):
        raise AssertionError(f"quality gate degenerate: {n1}/{total}")
    if not (0 < n2 < n1):
        raise AssertionError(f"classifier filter degenerate: {n2}/{n1}")
    if "InMemoryTableScan" not in kept2._jdf.queryExecution().executedPlan().toString():
        raise AssertionError("pipeline stages are not reading the cached base")
    # near-dup representatives among the kept docs (q36's block + verify)
    sh = (
        kept2.select(
            "doc_id",
            F.array_distinct(F.expr(cdedup.shingles_sql("text", 3))).alias("sh"),
        )
        .withColumn("bk", F.array_min("sh"))
        .cache()
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    edges = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter((inter.cast("double") / union) >= 0.2)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    clusters = cdedup.connected_components(kept2.select("doc_id"), edges)
    wtop = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    reps = (
        clusters.join(kept2, "doc_id")
        .withColumn("__rn", F.row_number().over(wtop))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .cache()
    )
    uni = ccur.unimax_allocation(reps)
    pt = reps.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.pmod(F.col("doc_id"), F.lit(_Q171_SHARDS)).cast("long").alias("__shard"),
    )
    wp = Window.partitionBy("lang", "__shard").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    cum_before = F.coalesce(
        F.sum("n_tokens").over(wp.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    bins = (
        pt.withColumn(
            "bin_id",
            (F.floor(cum_before / 512) * _Q171_SHARDS + F.col("__shard")).cast(
                "long"
            ),
        )
        .groupBy("lang")
        .agg(F.count_distinct("bin_id").alias("n_bins"))
    )
    cnt2 = kept2.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    repsn = reps.groupBy("lang").agg(F.count(F.lit(1)).alias("n_reps"))
    return (
        uni.join(cnt2, "lang")
        .join(repsn, "lang")
        .join(bins, "lang")
        .select(
            "lang", "n_kept", "n_reps", "n_tokens", "capped",
            "alloc_tokens", "epochs", "n_bins",
        )
    )


# ---------------------------------------------------------------------------
# Streaming curation flagship: the q171 composition running CONTINUOUSLY
# (versioned intake feed -> NB model filter -> cross-batch dedup ->
# per-batch UniMax + packing -> one curated version per micro-batch)
# ---------------------------------------------------------------------------

_Q174_OFF = 10_000_000
_Q174_BIN = 512


def _stream_curation_oracle(intake_sql: str) -> str:
    """Shared relational replay of the streaming-curation composition
    (NB scoring over the full corpus, batch membership from
    ``intake_sql``, global first-occurrence exact dedup, per-batch
    UniMax water-filling, per-(batch, lang) contiguous-binning packing)
    — parameterized on the intake batch layout so q174 and q175 replay
    the identical pipeline over different commit histories."""
    cond = (
        "2 * n_tokens * (L - i + 1) <= "
        "CAST(T * 3 // 2 AS BIGINT) - 2 * (P - n_tokens)"
    )
    return f"""
    WITH feats AS (
      SELECT doc_id, {_NB_POS} AS pos,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {_NB_B} AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    cnts AS (SELECT doc_id, pos, b, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3),
    tot AS (
      SELECT SUM(CASE WHEN pos THEN c ELSE 0 END) AS pt,
             SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nt
      FROM cnts
    ),
    dtot AS (
      SELECT SUM(CASE WHEN {_NB_POS} THEN 1 ELSE 0 END) AS pd,
             SUM(CASE WHEN NOT ({_NB_POS}) THEN 1 ELSE 0 END) AS nd
      FROM documents
    ),
    model AS (
      SELECT b, SUM(CASE WHEN pos THEN c ELSE 0 END) AS pc,
                SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nc
      FROM cnts GROUP BY b
    ),
    llr AS (
      SELECT b, round((ln(pc + 1) - ln(CAST(pt + {_NB_B} AS DOUBLE)))
                    - (ln(nc + 1) - ln(CAST(nt + {_NB_B} AS DOUBLE))), 9) AS lr
      FROM model, tot
    ),
    scored AS (
      SELECT cnts.doc_id,
             SUM(CAST(round(c * lr, 9) AS DECIMAL(28,12))) AS s
      FROM cnts JOIN llr USING (b) GROUP BY 1
    ),
    nb AS (
      SELECT doc_id,
             (CAST(s AS DOUBLE)
              + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9)) > 0
               AS pred
      FROM scored, dtot
    ),
    intake AS ({intake_sql}),
    surv AS (
      SELECT i.* FROM intake i
      JOIN nb ON nb.doc_id = i.doc_id % {_Q174_OFF}
      WHERE nb.pred
    ),
    uniq AS (
      SELECT * FROM surv
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY batch, doc_id) = 1
    ),
    pt AS (
      SELECT batch, lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM uniq
    ),
    pb AS (
      SELECT batch, lang,
             CAST(floor(COALESCE(SUM(n_tokens) OVER w, 0) / {_Q174_BIN}.0)
                  AS BIGINT) AS bin
      FROM pt
      WINDOW w AS (PARTITION BY batch, lang ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    bins AS (
      SELECT batch, lang, COUNT(DISTINCT bin) AS n_bins FROM pb GROUP BY 1, 2
    ),
    sizes AS (
      SELECT batch, lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM pt GROUP BY 1, 2
    ),
    r AS (
      SELECT batch, lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY batch ORDER BY n_tokens, lang) AS i,
             SUM(n_tokens) OVER (PARTITION BY batch ORDER BY n_tokens, lang
                                 ROWS UNBOUNDED PRECEDING) AS P,
             COUNT(*) OVER (PARTITION BY batch) AS L,
             SUM(n_tokens) OVER (PARTITION BY batch) AS T
      FROM sizes
    ),
    c AS (
      SELECT *,
             MIN(CASE WHEN {cond} THEN 1 ELSE 0 END)
               OVER (PARTITION BY batch ORDER BY n_tokens, lang
                     ROWS UNBOUNDED PRECEDING) = 1 AS capped
      FROM r
    ),
    f AS (
      SELECT *,
             SUM(CASE WHEN capped THEN 1 ELSE 0 END)
               OVER (PARTITION BY batch) AS k,
             SUM(CASE WHEN capped THEN n_tokens ELSE 0 END)
               OVER (PARTITION BY batch) AS Pk
      FROM c
    ),
    uni AS (
      SELECT batch, lang, n_tokens, capped,
             round(CASE WHEN capped THEN CAST(2 * n_tokens AS DOUBLE)
                   ELSE CAST(CAST(T * 3 // 2 AS BIGINT) - 2 * Pk AS DOUBLE)
                        / GREATEST(L - k, 1) END, 9) AS alloc_tokens
      FROM f
    ),
    uqc AS (SELECT batch, lang, COUNT(*) AS n_unique FROM uniq GROUP BY 1, 2)
    SELECT uni.batch, uni.lang, uqc.n_unique, uni.n_tokens AS sum_tokens,
           uni.capped, uni.alloc_tokens,
           round(uni.alloc_tokens / uni.n_tokens, 9) AS epochs, bins.n_bins
    FROM uni
    JOIN uqc USING (batch, lang)
    JOIN bins USING (batch, lang)
    """


def _q174_oracle() -> str:
    return _stream_curation_oracle(
        f"""
      SELECT doc_id, text, lang, 0 AS batch FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, text, lang, 1 FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id + {_Q174_OFF}, text, lang, 1 FROM documents
      WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, text, lang, 2 FROM documents WHERE doc_id % 3 = 2
      UNION ALL
      SELECT doc_id + 2 * {_Q174_OFF}, text, lang, 2 FROM documents
      WHERE doc_id % 3 = 1 AND doc_id % 5 = 0
    """
    )


@query("q174_streaming_curation", _q174_oracle())
def q174_streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline running CONTINUOUSLY — the streaming twin
    of the q171 batch flagship (pipeline/corpus.py::
    stream_curate_versioned), the production shape for crawl intake:
    a VERSIONED intake table receives three commits (the third with
    injected cross-batch duplicate texts under fresh doc_ids), and each
    commit drains through one REAL foreachBatch micro-batch that (1)
    scores the batch against an OFFLINE-trained NB model (train once,
    broadcast into every batch — Brown 2020 App. A's curated-vs-crawl
    split), (2) exact-dedups within the batch (deterministic
    keep-min-doc_id) and against the already-CURATED state (the
    accepted corpus is the dedup index), (3) computes the batch's OWN
    UniMax language allocation, (4) packs survivors into per-language
    512-token bins by sorted contiguous binning (packing_plan's
    contiguous-fill approximation of FFD), and (5) publishes ONE curated
    version with a recorded (app, batch_id) transaction. The oracle
    replays the WHOLE composition relationally — NB LLRs over the full
    corpus, batch membership, the global first-occurrence dedup rank,
    per-batch water-filling, packing windows — so a drift anywhere in
    the streaming composition (a batch scored against a retrained
    model, a duplicate leaking across batches, an allocation computed
    over the wrong cohort) changes the hash. In-query assertions pin
    the streaming contracts the oracle can't see: each drain advances
    the curated table by EXACTLY one version, a drain with no new
    intake publishes NOTHING (restart-resume on the checkpoint), a
    REPLAY against a rebuilt checkpoint is a txn-level no-op (Delta's
    foreachBatch idempotence), the txn map records the last batch id,
    and the curated table holds no duplicate fingerprint while being
    strictly smaller than the model-passing intake (the cross-batch
    dedup actually dropped the injected duplicates)."""
    import os
    import shutil

    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
    )
    from modular_etl_data_platform_spark.pipeline.corpus import (
        stream_curate_versioned,
    )
    from modular_etl_data_platform_spark.queries.roundtrip_queries import (
        _pin,
        _scratch,
    )

    scratch = _scratch("q174_streaming_curation", sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # train ONCE and pin the (<= buckets+2 row) model as a local
    # relation: every drain below re-enters stream_curate_versioned,
    # which collects the model at stream definition — unmaterialized,
    # that re-runs nb_train's aggregation tail per drain
    model = ccur.nb_train(docs, _NB_POS, buckets=_NB_B)
    model = spark.createDataFrame(model.collect(), model.schema)
    intake_path = os.path.join(scratch, "intake_v")
    curated_path = os.path.join(scratch, "curated_v")
    ckpt = os.path.join(scratch, "ckpt")
    intake = VersionedTable(spark, intake_path)
    app = "q174_stream"

    def drain():
        q = stream_curate_versioned(
            spark, intake_path, curated_path, model, ckpt,
            nb_buckets=_NB_B, bin_tokens=_Q174_BIN, app_id=app,
        )
        q.awaitTermination(300)

    def dup_slice(mod, off):
        return (
            docs.filter(
                (F.col("doc_id") % 3 == mod) & (F.col("doc_id") % 5 == 0)
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(off))
        )

    curated = VersionedTable(spark, curated_path)
    batches = [
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 == 1).unionByName(
            dup_slice(0, _Q174_OFF)
        ),
        docs.filter(F.col("doc_id") % 3 == 2).unionByName(
            dup_slice(1, 2 * _Q174_OFF)
        ),
    ]
    for i, b in enumerate(batches):
        intake.write(b, mode="append" if i else "overwrite")
        before = curated.current_version() or 0
        drain()  # one intake version -> exactly one micro-batch
        after = curated.current_version()
        if after != before + 1:
            raise AssertionError(
                f"drain {i}: curated advanced {before}->{after}, expected +1"
            )
        if i == 0:
            # replay idempotence: a REBUILT checkpoint replays batch 0
            # (same intake content) against the recorded (app, 0)
            # transaction — the publish must be a txn-level no-op
            # (Delta's foreachBatch idempotence contract)
            replay_ckpt = os.path.join(scratch, "ckpt_replay")
            shutil.rmtree(replay_ckpt, ignore_errors=True)
            q = stream_curate_versioned(
                spark, intake_path, curated_path, model, replay_ckpt,
                nb_buckets=_NB_B, bin_tokens=_Q174_BIN, app_id=app,
            )
            q.awaitTermination(300)
            if curated.current_version() != after:
                raise AssertionError(
                    "replayed batch 0 re-landed despite its recorded "
                    "transaction"
                )
    # restart-resume: a drain with NO new intake publishes nothing
    head = curated.current_version()
    drain()
    if curated.current_version() != head:
        raise AssertionError("idle drain republished a batch")
    # txn map records the last landed batch id
    txn = curated.log.resolve(head).get("txn", {})
    if txn.get(app) != 2:
        raise AssertionError(f"txn map wrong: {txn}")
    cur = curated.read()
    n_rows = cur.count()
    if cur.select("fingerprint").distinct().count() != n_rows:
        raise AssertionError("curated table holds duplicate fingerprints")
    # every injected duplicate must be absent: its original either
    # landed (the anti-join blocks the dupe) or failed the model filter
    # (identical text — the dupe fails identically). A single landed
    # high-id row means the cross-batch dedup leaked.
    n_dupes = intake.read().filter(F.col("doc_id") >= _Q174_OFF).count()
    if n_dupes == 0:
        raise AssertionError("no duplicates were injected — vacuous test")
    if cur.filter(F.col("doc_id") >= _Q174_OFF).count() != 0:
        raise AssertionError("an injected cross-batch duplicate landed")
    return _pin(
        cur.groupBy("batch", "lang").agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("capped").alias("capped"),
            F.max("alloc_tokens").alias("alloc_tokens"),
            F.max("epochs").alias("epochs"),
            F.count_distinct("bin_id").alias("n_bins"),
        )
    )


def _q175_oracle() -> str:
    return _stream_curation_oracle(
        f"""
      SELECT doc_id, text, lang, 0 AS batch FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, text, lang, 1 FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id, text, lang, 2 FROM documents
      WHERE doc_id % 3 = 2 AND doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id, text, lang, 3 FROM documents
      WHERE doc_id % 3 = 2 AND doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + {_Q174_OFF}, text, lang, 3 FROM documents
      WHERE doc_id % 3 = 0 AND doc_id % 7 = 0
    """
    )


@query("q175_streaming_fp_index", _q175_oracle())
def q175_streaming_fp_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming curation pipeline's SCALE contract for cross-batch
    dedup state: the accepted-fingerprint set is a PERSISTED,
    bucket-clustered index (corpus/state_index.py::BucketedStateIndex)
    probed with log-level file skipping — per-batch dedup I/O is
    batch-proportional at any accepted-corpus size, replacing the
    O(corpus)-per-batch full scan the round-12 verdict named as the one
    remaining scale caveat. Four intake commits drain through the REAL
    stream (pipeline/corpus.py::stream_curate_versioned, index mode =
    the default); the fourth is small and carries injected cross-batch
    duplicate texts. In-query assertions pin the contracts the oracle
    can't see, in the q139/q152 opened-file style:

    - the dedup probe for a ONE-DOC batch opens at most one index file
      per append epoch (its single bucket's stats-intersecting files)
      and STRICTLY fewer than half the index's files — asserted against
      the scan's actual ``inputFiles()``, not inferred;
    - the pruned-probe anti-join returns EXACTLY the rows of the naive
      full-scan anti-join against the curated table (index == scan on
      the live state, the semantics-preservation property);
    - the index's fingerprint set EQUALS the curated table's after
      every drain (the txn-ordered maintenance never lags or leaks);
    - each drain advances the curated table exactly one version, the
      txn map records the last batch id, and no injected duplicate
      lands.

    The oracle replays the full composition (NB LLRs, batch
    membership, global first-occurrence dedup, per-batch UniMax,
    contiguous binning) relationally over the four-batch layout."""
    import os

    from modular_etl_data_platform_spark.corpus.state_index import (
        BucketedStateIndex,
    )
    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
    )
    from modular_etl_data_platform_spark.pipeline.corpus import (
        stream_curate_versioned,
    )
    from modular_etl_data_platform_spark.queries.roundtrip_queries import (
        _pin,
        _scratch,
    )

    scratch = _scratch("q175_streaming_fp_index", sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # train ONCE and pin the (<= buckets+2 row) model as a local
    # relation: every drain below re-enters stream_curate_versioned,
    # which collects the model at stream definition — unmaterialized,
    # that re-runs nb_train's aggregation tail per drain
    model = ccur.nb_train(docs, _NB_POS, buckets=_NB_B)
    model = spark.createDataFrame(model.collect(), model.schema)
    intake_path = os.path.join(scratch, "intake_v")
    curated_path = os.path.join(scratch, "curated_v")
    ckpt = os.path.join(scratch, "ckpt")
    intake = VersionedTable(spark, intake_path)
    curated = VersionedTable(spark, curated_path)
    app = "q175_stream"
    n_buckets = 1024

    def drain():
        q = stream_curate_versioned(
            spark, intake_path, curated_path, model, ckpt,
            nb_buckets=_NB_B, bin_tokens=_Q174_BIN, app_id=app,
            dedup_state="index", fp_index_buckets=n_buckets,
        )
        q.awaitTermination(300)

    fpidx = BucketedStateIndex(
        spark,
        curated_path.rstrip("/") + "_fpidx",
        key_cols=["fingerprint"],
        n_buckets=n_buckets,
    )

    def assert_index_matches_curated(tag: str) -> None:
        # the same three contracts as separate count/anti-join actions
        # (row counts equal, no unaccepted fingerprint in the index, no
        # curated fingerprint missing from it), folded into ONE job: a
        # full-outer join of the per-side fingerprint counts yields all
        # four aggregates in a single pass over both tables
        idx_fps = (
            fpidx.table.read()
            .groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("__ni"))
        )
        cur_fps = (
            curated.read()
            .groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("__nc"))
        )
        d = (
            idx_fps.join(cur_fps, "fingerprint", "full_outer")
            .agg(
                F.sum("__ni").alias("n_idx"),
                F.sum("__nc").alias("n_cur"),
                F.count(F.when(F.col("__nc").isNull(), 1)).alias("only_idx"),
                F.count(F.when(F.col("__ni").isNull(), 1)).alias("only_cur"),
            )
            .collect()[0]
        )
        if (d["n_idx"] or 0) != (d["n_cur"] or 0):
            raise AssertionError(f"{tag}: index/curated row counts differ")
        if d["only_idx"] != 0:
            raise AssertionError(f"{tag}: index holds unaccepted fingerprints")
        if d["only_cur"] != 0:
            raise AssertionError(f"{tag}: curated fingerprints missing from index")

    third = F.col("doc_id") % 3
    batches = [
        docs.filter(third == 0),
        docs.filter(third == 1),
        docs.filter((third == 2) & (F.col("doc_id") % 11 != 0)),
        docs.filter((third == 2) & (F.col("doc_id") % 11 == 0)).unionByName(
            docs.filter((third == 0) & (F.col("doc_id") % 7 == 0)).withColumn(
                "doc_id", F.col("doc_id") + F.lit(_Q174_OFF)
            )
        ),
    ]
    for i, b in enumerate(batches[:3]):
        intake.write(b, mode="append" if i else "overwrite")
        before = curated.current_version() or 0
        drain()
        if curated.current_version() != before + 1:
            raise AssertionError(f"drain {i}: expected exactly one new version")
        assert_index_matches_curated(f"after drain {i}")

    # --- the probe contract, q139-style, BEFORE batch 3 drains -------
    # one-doc probe: a single bucket must open at most one file per
    # append epoch and strictly fewer than half the index's files
    one = (
        batches[3]
        .withColumn("fingerprint", F.md5(F.col("text")))
        .orderBy("doc_id")
        .limit(1)
    )
    p = fpidx.probe(one)
    if len(p.buckets) != 1:
        raise AssertionError(f"one-doc probe hit {len(p.buckets)} buckets")
    epochs = fpidx.table.current_version()
    if len(p.files) > epochs:
        raise AssertionError(
            f"one-bucket probe opened {len(p.files)} files over {epochs} "
            "append epochs — files are not bucket-clustered"
        )
    if 2 * len(p.files) >= p.total_files:
        raise AssertionError(
            f"probe opened {len(p.files)}/{p.total_files} files — no real "
            "file skipping"
        )
    opened = {os.path.realpath(f.replace("file:", "")) for f in p.scan.inputFiles()}
    planned = {os.path.realpath(f) for f in p.files}
    if opened != planned:
        raise AssertionError(
            f"probe scan opened {sorted(opened)}, planned {sorted(planned)}"
        )
    # pruned-probe anti-join == naive full-scan anti-join on batch 3
    b3 = batches[3].withColumn("fingerprint", F.md5(F.col("text")))
    via_index = {r.doc_id for r in fpidx.anti_join(b3).select("doc_id").collect()}
    seen = curated.read().select("fingerprint").dropDuplicates()
    via_scan = {
        r.doc_id
        for r in b3.join(seen, "fingerprint", "left_anti").select("doc_id").collect()
    }
    if via_index != via_scan:
        raise AssertionError(
            f"index-probe dedup != full-scan dedup: "
            f"only_index={sorted(via_index - via_scan)[:5]} "
            f"only_scan={sorted(via_scan - via_index)[:5]}"
        )

    # --- drain the duplicate-carrying small batch --------------------
    intake.write(batches[3], mode="append")
    before = curated.current_version()
    drain()
    if curated.current_version() != before + 1:
        raise AssertionError("drain 3: expected exactly one new version")
    assert_index_matches_curated("after drain 3")
    txn = curated.log.resolve(curated.current_version()).get("txn", {})
    if txn.get(app) != 3:
        raise AssertionError(f"txn map wrong: {txn}")
    cur = curated.read()
    if cur.select("fingerprint").distinct().count() != cur.count():
        raise AssertionError("curated table holds duplicate fingerprints")
    n_dupes = intake.read().filter(F.col("doc_id") >= _Q174_OFF).count()
    if n_dupes == 0:
        raise AssertionError("no duplicates were injected — vacuous test")
    if cur.filter(F.col("doc_id") >= _Q174_OFF).count() != 0:
        raise AssertionError("an injected cross-batch duplicate landed")
    return _pin(
        cur.groupBy("batch", "lang").agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("capped").alias("capped"),
            F.max("alloc_tokens").alias("alloc_tokens"),
            F.max("epochs").alias("epochs"),
            F.count_distinct("bin_id").alias("n_bins"),
        )
    )


_Q176_THR = 0.5


def _q176_oracle() -> str:
    """Relational replay of the FULL streaming composition of q176 —
    intake-text NB scoring (left-join + fully-smoothed default LLR,
    exactly nb_apply's contract), per-batch exact dedup (within-batch
    min-id + not-in-accepted), within-batch greedy near-dup
    (keep-lowest over min-shingle blocks at Jaccard >= 0.5), cross-batch
    near-dup against the ACCUMULATED accepted signatures, benchmark
    5-gram decontamination, then the per-batch UniMax + contiguous
    binning tail. The three batches chain as acc_0 -> acc_1 -> acc_2
    (acceptance is sequential state — each batch dedups against exactly
    what earlier batches accepted, the streaming semantics)."""
    sh3 = cdedup.shingle_hashes_duckdb("text", 3)
    gram = ccur.ngram_hashes_duckdb("text", 5)

    def jac(a: str, b: str) -> str:
        return (
            f"CAST(len(list_intersect({a}, {b})) AS DOUBLE) / "
            f"(len({a}) + len({b}) - len(list_intersect({a}, {b})))"
        )

    cond = (
        "2 * n_tokens * (L - i + 1) <= "
        "CAST(T * 3 // 2 AS BIGINT) - 2 * (P - n_tokens)"
    )
    chain = []
    for b in range(3):
        prev = f"acc_{b - 1}" if b else "acc_m1"
        prevk = f"acck_{b - 1}" if b else "acck_m1"
        chain.append(
            f"""
    cand_{b} AS (
      SELECT i.doc_id, i.text, i.lang, i.batch
      FROM intake i JOIN inb ON inb.doc_id = i.doc_id
      WHERE i.batch = {b} AND inb.pred
    ),
    exact_{b} AS (
      SELECT * FROM cand_{b}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    exacc_{b} AS (
      SELECT e.* FROM exact_{b} e
      WHERE md5(e.text) NOT IN (SELECT md5(text) FROM {prev})
    ),
    shg_{b} AS (
      SELECT doc_id, text, lang, batch, sh
      FROM (SELECT *, list_distinct({sh3}) AS sh FROM exacc_{b})
    ),
    kb_{b} AS (
      SELECT doc_id, unnest(list_sort(sh)[1:2]) AS bk FROM shg_{b}
    ),
    nwdrop_{b} AS (
      SELECT DISTINCT ka.doc_id
      FROM kb_{b} ka JOIN kb_{b} kp
        ON kp.bk = ka.bk AND kp.doc_id < ka.doc_id
      JOIN shg_{b} s ON s.doc_id = ka.doc_id
      JOIN shg_{b} p ON p.doc_id = kp.doc_id
      WHERE {jac('p.sh', 's.sh')} >= {_Q176_THR}
    ),
    nw_{b} AS (
      SELECT s.* FROM shg_{b} s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM nwdrop_{b})
    ),
    nadrop_{b} AS (
      SELECT DISTINCT ka.doc_id
      FROM kb_{b} ka
      JOIN nw_{b} s ON s.doc_id = ka.doc_id
      JOIN {prevk} ak ON ak.bk = ka.bk
      JOIN {prev} a ON a.doc_id = ak.doc_id
      WHERE {jac('a.sh', 's.sh')} >= {_Q176_THR}
    ),
    na_{b} AS (
      SELECT s.* FROM nw_{b} s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM nadrop_{b})
    ),
    tgr_{b} AS (SELECT doc_id, unnest({gram}) AS gh FROM na_{b}),
    cont_{b} AS (SELECT DISTINCT t.doc_id FROM tgr_{b} t JOIN bgr USING (gh)),
    dc_{b} AS (
      SELECT s.* FROM na_{b} s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM cont_{b})
    ),
    acc_{b} AS (
      SELECT * FROM {prev}
      UNION ALL
      SELECT batch, doc_id, text, lang, sh FROM dc_{b}
    ),
    acck_{b} AS (
      SELECT * FROM {prevk}
      UNION ALL
      SELECT k.doc_id, k.bk FROM kb_{b} k
      JOIN dc_{b} d ON d.doc_id = k.doc_id
    )"""
        )
    chain_sql = ",".join(chain)
    sql = f"""
    WITH feats AS (
      SELECT doc_id, {_NB_POS} AS pos,
             ('0x' || substr(md5(w), 1, 15))::BIGINT % {_NB_B} AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents)
    ),
    cnts AS (SELECT doc_id, pos, b, COUNT(*) AS c FROM feats GROUP BY 1, 2, 3),
    tot AS (
      SELECT SUM(CASE WHEN pos THEN c ELSE 0 END) AS pt,
             SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nt
      FROM cnts
    ),
    dtot AS (
      SELECT SUM(CASE WHEN {_NB_POS} THEN 1 ELSE 0 END) AS pd,
             SUM(CASE WHEN NOT ({_NB_POS}) THEN 1 ELSE 0 END) AS nd
      FROM documents
    ),
    model AS (
      SELECT b, SUM(CASE WHEN pos THEN c ELSE 0 END) AS pc,
                SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS nc
      FROM cnts GROUP BY b
    ),
    llr AS (
      SELECT b, round((ln(pc + 1) - ln(CAST(pt + {_NB_B} AS DOUBLE)))
                    - (ln(nc + 1) - ln(CAST(nt + {_NB_B} AS DOUBLE))), 9) AS lr
      FROM model, tot
    ),
    dflt AS (
      SELECT round(-ln(CAST(pt + {_NB_B} AS DOUBLE))
                   + ln(CAST(nt + {_NB_B} AS DOUBLE)), 9) AS dlr
      FROM tot
    ),
    intake AS (
      SELECT doc_id, text, lang, 0 AS batch FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, text, lang, 1 FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id + {_Q174_OFF}, text, lang, 1 FROM documents
      WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2 * {_Q174_OFF}, text || ' xq', lang, 1 FROM documents
      WHERE doc_id % 3 = 0 AND doc_id % 7 = 1
      UNION ALL
      SELECT doc_id, text, lang, 2 FROM documents WHERE doc_id % 3 = 2
      UNION ALL
      SELECT doc_id + 3 * {_Q174_OFF}, text || ' xq', lang, 2 FROM documents
      WHERE doc_id % 3 = 1 AND doc_id % 7 = 2
    ),
    iw AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT % {_NB_B} AS b
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM intake)
    ),
    icnts AS (SELECT doc_id, b, COUNT(*) AS c FROM iw GROUP BY 1, 2),
    iscored AS (
      SELECT icnts.doc_id,
             SUM(CAST(round(c * COALESCE(llr.lr, dflt.dlr), 9)
                      AS DECIMAL(28,12))) AS s
      FROM icnts LEFT JOIN llr USING (b), dflt
      GROUP BY 1
    ),
    inb AS (
      SELECT doc_id,
             (CAST(s AS DOUBLE)
              + round(ln(CAST(pd AS DOUBLE)) - ln(CAST(nd AS DOUBLE)), 9)) > 0
               AS pred
      FROM iscored, dtot
    ),
    bgr AS (
      SELECT DISTINCT unnest({gram}) AS gh FROM documents
      WHERE doc_id % 17 = 3
    ),
    acc_m1 AS (
      SELECT CAST(NULL AS BIGINT) AS batch, CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS lang,
             CAST([] AS BIGINT[]) AS sh
      WHERE 1 = 0
    ),
    acck_m1 AS (
      SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS bk
      WHERE 1 = 0
    ),{chain_sql},
    pt2 AS (
      SELECT batch, lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM acc_2
    ),
    pb AS (
      SELECT batch, lang,
             CAST(floor(COALESCE(SUM(n_tokens) OVER w, 0) / {_Q174_BIN}.0)
                  AS BIGINT) AS bin
      FROM pt2
      WINDOW w AS (PARTITION BY batch, lang ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    bins AS (
      SELECT batch, lang, COUNT(DISTINCT bin) AS n_bins FROM pb GROUP BY 1, 2
    ),
    sizes AS (
      SELECT batch, lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM pt2 GROUP BY 1, 2
    ),
    r AS (
      SELECT batch, lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY batch ORDER BY n_tokens, lang) AS i,
             SUM(n_tokens) OVER (PARTITION BY batch ORDER BY n_tokens, lang
                                 ROWS UNBOUNDED PRECEDING) AS P,
             COUNT(*) OVER (PARTITION BY batch) AS L,
             SUM(n_tokens) OVER (PARTITION BY batch) AS T
      FROM sizes
    ),
    c AS (
      SELECT *,
             MIN(CASE WHEN {cond} THEN 1 ELSE 0 END)
               OVER (PARTITION BY batch ORDER BY n_tokens, lang
                     ROWS UNBOUNDED PRECEDING) = 1 AS capped
      FROM r
    ),
    f AS (
      SELECT *,
             SUM(CASE WHEN capped THEN 1 ELSE 0 END)
               OVER (PARTITION BY batch) AS k,
             SUM(CASE WHEN capped THEN n_tokens ELSE 0 END)
               OVER (PARTITION BY batch) AS Pk
      FROM c
    ),
    uni AS (
      SELECT batch, lang, n_tokens, capped,
             round(CASE WHEN capped THEN CAST(2 * n_tokens AS DOUBLE)
                   ELSE CAST(CAST(T * 3 // 2 AS BIGINT) - 2 * Pk AS DOUBLE)
                        / GREATEST(L - k, 1) END, 9) AS alloc_tokens
      FROM f
    ),
    uqc AS (SELECT batch, lang, COUNT(*) AS n_unique FROM acc_2 GROUP BY 1, 2)
    SELECT uni.batch, uni.lang, uqc.n_unique, uni.n_tokens AS sum_tokens,
           uni.capped, uni.alloc_tokens,
           round(uni.alloc_tokens / uni.n_tokens, 9) AS epochs, bins.n_bins
    FROM uni
    JOIN uqc USING (batch, lang)
    JOIN bins USING (batch, lang)
    """
    # DuckDB (<=1.x) inlines plain CTEs per reference; the chained
    # acc_0 -> acc_1 -> acc_2 accumulators are each referenced three
    # times downstream, so inlining re-evaluates the whole NB + dedup
    # head exponentially (minutes on 50 docs, and one parquet open per
    # inlined scan trips EMFILE). MATERIALIZED pins each CTE to one
    # evaluation — the semantics are unchanged. The WINDOW clause's
    # "w AS (" must not match (it is not a CTE).
    import re

    return re.sub(r"(?<!WINDOW )(\b\w+ AS) \(", r"\1 MATERIALIZED (", sql)


@query("q176_streaming_curation_full", _q176_oracle())
def q176_streaming_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming curation twin at FULL q171 stage parity: versioned
    intake feed -> NB model filter (offline-trained, broadcast) ->
    cross-batch EXACT dedup via the bucketed fingerprint index (q175's
    machinery) -> within-batch greedy near-dup + CROSS-BATCH near-dup
    against a persisted, file-pruned SIGNATURE index (DOUBLE-MIN
    blocking: each doc's two smallest hashed shingles are its block
    keys, so a one-token edit always shares a key with its original;
    accepted shingle-hash sets ride as payload and candidates verify by
    exact Jaccard on the STORED sets, never re-reading accepted text) ->
    benchmark 5-gram decontamination (broadcast probe set) -> per-batch
    UniMax -> per-language contiguous binning -> ONE txn-idempotent
    curated version per micro-batch, with BOTH state indexes maintained
    under their own (app#idx, batch) transactions in the same
    foreachBatch. Three commits drain through the real stream; batch 1
    injects exact duplicates (+OFF) and batch 1/2 inject one-token-
    perturbed NEAR duplicates (+2OFF/+3OFF, Jaccard ~0.9 on 3-shingles)
    of earlier batches' docs under fresh ids. The oracle replays the
    ENTIRE sequential composition (intake-text NB scoring incl. the
    default-LLR path for unseen buckets, chained per-batch acceptance
    acc_0 -> acc_1 -> acc_2, greedy block dedup, stored-signature
    verification, gram decontamination, water-filling, packing) — a
    drift anywhere (a batch deduped against the wrong accepted cohort,
    a signature stored post-hoc instead of at acceptance, contamination
    checked pre-dedup) changes the hash. In-query assertions: one
    version per drain, txn map, fingerprint-index == curated
    fingerprints, signature-index ids == curated ids, no exact dup
    landed, near-dups strictly reduced, and no benchmark-contaminated
    original landed."""
    import os

    from modular_etl_data_platform_spark.corpus.state_index import (
        BucketedStateIndex,
    )
    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
    )
    from modular_etl_data_platform_spark.pipeline.corpus import (
        stream_curate_versioned,
    )
    from modular_etl_data_platform_spark.queries.roundtrip_queries import (
        _pin,
        _scratch,
    )

    scratch = _scratch("q176_streaming_curation_full", sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # train ONCE and pin the (<= buckets+2 row) model as a local
    # relation: every drain below re-enters stream_curate_versioned,
    # which collects the model at stream definition — unmaterialized,
    # that re-runs nb_train's aggregation tail per drain
    model = ccur.nb_train(docs, _NB_POS, buckets=_NB_B)
    model = spark.createDataFrame(model.collect(), model.schema)
    benchmark = docs.filter(F.col("doc_id") % 17 == 3).select("text")
    intake_path = os.path.join(scratch, "intake_v")
    curated_path = os.path.join(scratch, "curated_v")
    ckpt = os.path.join(scratch, "ckpt")
    intake = VersionedTable(spark, intake_path)
    curated = VersionedTable(spark, curated_path)
    app = "q176_stream"

    def drain():
        q = stream_curate_versioned(
            spark, intake_path, curated_path, model, ckpt,
            nb_buckets=_NB_B, bin_tokens=_Q174_BIN, app_id=app,
            near_dedup=True, near_threshold=_Q176_THR,
            benchmark=benchmark,
        )
        q.awaitTermination(300)

    third = F.col("doc_id") % 3

    def shifted(pred, off, perturb=False):
        d = docs.filter(pred).withColumn(
            "doc_id", F.col("doc_id") + F.lit(off)
        )
        if perturb:
            d = d.withColumn("text", F.concat(F.col("text"), F.lit(" xq")))
        return d

    batches = [
        docs.filter(third == 0),
        docs.filter(third == 1)
        .unionByName(
            shifted((third == 0) & (F.col("doc_id") % 5 == 0), _Q174_OFF)
        )
        .unionByName(
            shifted(
                (third == 0) & (F.col("doc_id") % 7 == 1),
                2 * _Q174_OFF,
                perturb=True,
            )
        ),
        docs.filter(third == 2).unionByName(
            shifted(
                (third == 1) & (F.col("doc_id") % 7 == 2),
                3 * _Q174_OFF,
                perturb=True,
            )
        ),
    ]
    for i, b in enumerate(batches):
        intake.write(b, mode="append" if i else "overwrite")
        before = curated.current_version() or 0
        drain()
        if curated.current_version() != before + 1:
            raise AssertionError(f"drain {i}: expected exactly one new version")
    txn = curated.log.resolve(curated.current_version()).get("txn", {})
    if txn.get(app) != 2:
        raise AssertionError(f"txn map wrong: {txn}")
    cur = curated.read()
    # state-index integrity: both indexes mirror the accepted state
    fpidx = BucketedStateIndex(
        spark, curated_path.rstrip("/") + "_fpidx", key_cols=["fingerprint"]
    )
    sigidx = BucketedStateIndex(
        spark,
        curated_path.rstrip("/") + "_sigidx",
        key_cols=["bk"],
        payload_cols=["acc_id", "acc_sh"],
    )
    n_cur = cur.count()
    if fpidx.table.read().count() != n_cur:
        raise AssertionError("fingerprint index diverged from curated state")
    sig_rows = sigidx.table.read()
    if (
        sig_rows.select(F.col("acc_id").alias("doc_id"))
        .join(cur.select("doc_id"), "doc_id", "left_anti")
        .count()
        != 0
        or sig_rows.select("acc_id").distinct().count() != n_cur
    ):
        raise AssertionError("signature index diverged from curated state")
    # exact-injected dups never land; near-injected dups strictly reduce
    if cur.filter(
        (F.col("doc_id") >= _Q174_OFF) & (F.col("doc_id") < 2 * _Q174_OFF)
    ).count():
        raise AssertionError("an injected exact duplicate landed")
    n_near_in = intake.read().filter(F.col("doc_id") >= 2 * _Q174_OFF).count()
    n_near_out = cur.filter(F.col("doc_id") >= 2 * _Q174_OFF).count()
    if n_near_in == 0:
        raise AssertionError("no near-duplicates were injected — vacuous test")
    if n_near_out >= n_near_in:
        raise AssertionError(
            f"near-dup stage dropped nothing ({n_near_out}/{n_near_in} landed)"
        )
    # decontamination: no benchmark-overlapping ORIGINAL doc lands
    if cur.filter(
        (F.col("doc_id") < _Q174_OFF) & (F.col("doc_id") % 17 == 3)
    ).count():
        raise AssertionError("a benchmark-contaminated doc landed")
    if cur.filter((F.col("batch") == 2) & (F.col("doc_id") < _Q174_OFF)).count() == 0:
        raise AssertionError("batch 2 accepted nothing — vacuous composition")
    return _pin(
        cur.groupBy("batch", "lang").agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.max("capped").alias("capped"),
            F.max("alloc_tokens").alias("alloc_tokens"),
            F.max("epochs").alias("epochs"),
            F.count_distinct("bin_id").alias("n_bins"),
        )
    )


@query(
    "q177_indexed_incremental_dedup",
    _incremental_dedup_oracle(threshold=LSH_THRESHOLD, max_bucket=LSH_MAX_BUCKET),
)
def q177_indexed_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q60's continuous-crawl dedup with the signature store made a
    PERSISTED, FILE-PRUNED index: the existing corpus's LSH band rows
    (band_id, band_key -> doc_id) live in a BucketedStateIndex built
    across three ingest epochs (three bucket-clustered appends on the
    versioned log), and the NEW batch's band probe opens ONLY the index
    files whose recorded bucket range intersects the batch's band-key
    buckets — the q60 scenario's "signatures in a persisted table"
    made concrete with log-level file skipping, so the per-batch probe
    I/O is batch-proportional at any corpus size. Semantics are
    IDENTICAL to q60 (same bands, same existing-side hot-bucket cap,
    same Jaccard verification over re-shingled candidates) and the
    oracle is q60's verbatim; the in-query assertions pin what the
    oracle can't see: a one-band-row probe opens at most one file per
    ingest epoch and strictly fewer than half the index's files
    (against the scan's actual inputFiles()), and the full probe's
    per-key existing counts applied as the cap match q60's
    QUALIFY-window semantics because every file that could hold a
    probed key is in the pruned scan (same key -> same bucket -> every
    bucket-intersecting file kept)."""
    import os

    from modular_etl_data_platform_spark.corpus.state_index import (
        BucketedStateIndex,
    )
    from modular_etl_data_platform_spark.queries.roundtrip_queries import (
        _pin,
        _scratch,
    )

    scratch = _scratch("q177_indexed_incremental_dedup", sf_dir)
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    new = docs.filter(F.col("doc_id") % 7 == 0)
    existing = docs.filter(F.col("doc_id") % 7 != 0)
    idx = BucketedStateIndex(
        spark,
        os.path.join(scratch, "band_idx"),
        key_cols=["band_id", "band_key"],
        n_buckets=1024,
        payload_cols=["acc_id"],
    )
    # three ingest epochs: the persisted band-key store grows append-only
    for epoch in range(3):
        sl = existing.filter(F.col("doc_id") % 3 == epoch)
        idx.append(
            cdedup.banded_signatures(
                cdedup.minhash_signatures(sl, parallelism=par)
            ).select(
                "band_id", "band_key", F.col("doc_id").alias("acc_id")
            )
        )
    bn = cdedup.banded_signatures(
        cdedup.minhash_signatures(new, parallelism=par)
    ).cache()
    try:
        # --- probe contract (q139/q152 opened-file style) ------------
        one = bn.orderBy("doc_id", "band_id").limit(1)
        p = idx.probe(one)
        if len(p.buckets) != 1:
            raise AssertionError(f"one-row probe hit {len(p.buckets)} buckets")
        epochs = idx.table.current_version()
        if len(p.files) > epochs:
            raise AssertionError(
                f"one-bucket probe opened {len(p.files)} files over "
                f"{epochs} ingest epochs — not bucket-clustered"
            )
        if 2 * len(p.files) >= p.total_files:
            raise AssertionError(
                f"probe opened {len(p.files)}/{p.total_files} files — "
                "no real file skipping"
            )
        opened = {
            os.path.realpath(f.replace("file:", ""))
            for f in p.scan.inputFiles()
        }
        planned = {os.path.realpath(f) for f in p.files}
        if opened != planned:
            raise AssertionError(
                f"probe scan opened {sorted(opened)}, planned {sorted(planned)}"
            )
        # --- the dedup itself, q60 semantics over the pruned probe ---
        full = idx.probe(bn)
        # existing-side hot-bucket cap: per-key counts over the pruned
        # scan are the TRUE bucket sizes (every file that may hold a
        # probed key is kept), so this equals q60's window-side cap
        oversized = (
            full.scan.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > LSH_MAX_BUCKET)
            .select("band_id", "band_key")
        )
        cands = (
            idx.matches(bn)
            .join(F.broadcast(oversized), ["band_id", "band_key"], "left_anti")
            .select(
                F.col("doc_id").alias("id_a"), F.col("acc_id").alias("id_b")
            )
            .dropDuplicates()
            .cache()
        )
        sh_new = new.join(
            F.broadcast(cands.select(F.col("id_a").alias("doc_id")).distinct()),
            "doc_id",
            "left_semi",
        ).select(
            F.col("doc_id").alias("id_a"),
            F.array_distinct(F.expr(cdedup.shingles_sql("text", 3))).alias("sh_a"),
        )
        sh_old = existing.join(
            F.broadcast(cands.select(F.col("id_b").alias("doc_id")).distinct()),
            "doc_id",
            "left_semi",
        ).select(
            F.col("doc_id").alias("id_b"),
            F.array_distinct(F.expr(cdedup.shingles_sql("text", 3))).alias("sh_b"),
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        return _pin(
            cands.join(sh_new, "id_a")
            .join(sh_old, "id_b")
            .withColumn(
                "jaccard",
                inter.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - inter),
            )
            .filter(F.col("jaccard") >= LSH_THRESHOLD)
            .select("id_a", "id_b", "jaccard")
        )
    finally:
        bn.unpersist()
