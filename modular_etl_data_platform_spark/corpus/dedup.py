"""Corpus deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these operators):

- **Exact**: hash-groupBy on a content fingerprint — one shuffle on the
  md5, which is uniformly distributed → no skew. Keep min(doc_id) as the
  canonical representative.
- **MinHash + LSH**: per-row signature computation is a pure projection
  (shingle → k seeded md5 minima). Banding turns the O(n²) all-pairs
  problem into a groupBy on (band_id, band_value) — only documents sharing
  a band bucket are ever paired. At 100 TB: cap bucket sizes (a bucket with
  B docs yields B² candidate pairs; drop or salt buckets over a threshold —
  they're near-identical boilerplate anyway) and dedupe candidates before
  the expensive verify join.
- **SimHash**: one explode + groupBy(doc) to fold token bit-votes; near-dup
  = small Hamming distance. Bit-sliced bucketing (split the 16 bits into
  4 nibbles; candidates must share a nibble) gives the same LSH-style
  candidate bound.
- **Verify**: true n-gram Jaccard only on candidate pairs (never all
  pairs), via ``array_intersect``/``array_union`` on distinct shingles.

All hashes are md5-string based — deterministic and portable to the DuckDB
oracle (engine-native ``xxhash64`` would be faster but not comparable
cross-engine; swap ``_seeded_hash`` for production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared expression builders (Spark SQL + DuckDB SQL twins)
# ---------------------------------------------------------------------------


def shingles_sql(text_col: str, n: int = 3) -> str:
    """Spark SQL expression: word n-gram shingles of ``text_col``.

    Documents shorter than ``n`` words yield ONE partial shingle (the
    whole document) rather than crashing: an unguarded
    ``sequence(0, size(w) - n)`` counts downward for short docs and
    ``slice(w, 0, n)`` throws INVALID_PARAMETER_VALUE.START — the
    ``greatest(.., 0)`` guard matches the sibling helpers
    (curation.py::ngram_hashes_sql, text.py::rolling_fingerprint) and
    the DuckDB twin below."""
    w = f"split({text_col}, ' ')"
    return (
        f"transform(sequence(0, greatest(size({w}) - {n}, 0)), "
        f"i -> concat_ws(' ', slice({w}, i+1, {n})))"
    )


def shingles_duckdb(text_col: str, n: int = 3) -> str:
    w = f"string_split({text_col}, ' ')"
    return (
        f"list_transform(range(0, greatest(len({w}) - {n}, 0) + 1), "
        f"i -> array_to_string({w}[i+1:i+{n}], ' '))"
    )


#: MinHash permutation modulus: 2^31 - 1 (Mersenne prime). Hash values are
#: reduced mod this before the affine permutation, so `a * h + b` stays well
#: under 2^63 — portable to ANSI engines that error on bigint overflow
#: (Spark 4 ANSI mode, DuckDB).
MINHASH_PRIME = 2147483647


def _minhash_perm(seed: int) -> tuple[int, int]:
    """Affine permutation coefficients (a, b) for one MinHash seed.

    mod a prime, any a in [1, p) is a bijection, so each seed yields an
    independent-enough permutation of the single base hash — the classic
    one-hash + k-affine-permutations MinHash construction, 8× cheaper
    than k independent md5 passes over the shingles."""
    return 1000003 * (seed + 1), 7919 * seed + 12345


def shingle_hashes_sql(text_col: str, n: int = 3) -> str:
    """Spark SQL: one 60-bit integer hash per word n-gram shingle
    (md5 prefix, hex→decimal). Computed ONCE; all k MinHash seeds
    derive from it arithmetically."""
    return (
        f"transform({shingles_sql(text_col, n)}, "
        f"s -> cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint))"
    )


def shingle_hashes_duckdb(text_col: str, n: int = 3) -> str:
    return (
        f"list_transform({shingles_duckdb(text_col, n)}, "
        f"s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)"
    )


def _perm_sql(hashes_expr: str, seed: int) -> str:
    a, b = _minhash_perm(seed)
    p = MINHASH_PRIME
    return (
        f"array_min(transform({hashes_expr}, "
        f"h -> pmod({a} * pmod(h, {p}) + {b}, {p})))"
    )


def minhash_sql(text_col: str, seed: int, n: int = 3) -> str:
    return _perm_sql(shingle_hashes_sql(text_col, n), seed)


def minhash_duckdb(text_col: str, seed: int, n: int = 3) -> str:
    a, b = _minhash_perm(seed)
    p = MINHASH_PRIME
    return (
        f"list_min(list_transform({shingle_hashes_duckdb(text_col, n)}, "
        f"h -> ({a} * (h % {p}) + {b}) % {p}))"
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, canonical
    representative = min(id), with the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def fan_out(df: DataFrame, parallelism: int | None) -> DataFrame:
    """Spread a small-but-CPU-expensive input over the cluster.

    Parquet splits by BYTES (maxPartitionBytes), so a corpus whose heavy
    cost is per-row compute (md5 shingles, signatures) can land in ONE
    scan partition and serialize. One round-robin repartition first makes
    the projection scale with cores — the bytes-vs-CPU partitioning
    distinction that matters whenever compute per byte is high.

    ``parallelism=None`` defaults to the cluster's default parallelism:
    the repartition doubles as the materialization BARRIER the minhash
    signature path relies on (see :func:`minhash_signatures`), so it must
    exist even when the caller didn't tune the fan-out."""
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    if parallelism and parallelism > 1:
        return df.repartition(parallelism)
    return df


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    shingle: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document MinHash signature: k affine-permutation minima over a
    single base hash per word shingle.

    Two projections with a repartition barrier between them: the first
    computes the per-shingle md5→int hash array (the only expensive pass,
    distributed by the up-front fan-out), the barrier materializes it so
    Catalyst's projection collapse can't inline the md5 work into each of
    the k output columns, and the second derives the k minima with cheap
    modular arithmetic. The shuffled payload is just the compact hash
    array (8 bytes/shingle), so the barrier stays cheap at scale."""
    hashed = fan_out(df, parallelism).select(
        F.col(id_col), F.expr(shingle_hashes_sql(text_col, shingle)).alias("_hh")
    )
    hashed = fan_out(hashed, parallelism)
    cols = [F.col(id_col)] + [
        F.expr(_perm_sql("_hh", s)).alias(f"mh{s}") for s in range(k)
    ]
    return hashed.select(*cols)



def banded_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Explode a k-hash MinHash signature table into its LSH band rows
    ``(id, band_id, band_key)`` — the join/probe representation shared
    by :func:`incremental_near_dup` and the persisted band-key index
    (``corpus.state_index.BucketedStateIndex`` keyed on
    ``["band_id", "band_key"]``, the continuous-crawl dedup state)."""
    rows = k // bands
    arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(arr).alias("band")).select(
        id_col, "band.band_id", "band.band_key"
    )


def _cap_buckets(exploded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop LSH band buckets with more than ``max_bucket_size`` members —
    the 100 TB guard: a single boilerplate bucket of B documents yields
    B² candidate pairs; members of oversized buckets are near-identical
    template text, so dropping the bucket loses nothing a later band
    won't re-find for genuinely similar pairs.

    Shape: a count aggregate over the band key (map-side combined, so the
    shuffle carries one row per distinct key per partition, not the data)
    yields the FEW oversized keys, which broadcast into a left-anti join.
    The banded table itself is never shuffled to apply the cap — at 100 TB
    the previous global-window form re-shuffled the whole table just to
    count bucket members."""
    if max_bucket_size is None:
        return exploded
    oversized = (
        exploded.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket_size)
        .select("band_id", "band_key")
    )
    return exploded.join(F.broadcast(oversized), ["band_id", "band_key"], "left_anti")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the k-hash signature into ``bands`` buckets; documents sharing
    any band bucket become a candidate pair (id_a < id_b).

    Shape: ONE shuffle of the banded ids — ``groupBy`` the band key,
    ``collect_list`` the member ids, then generate the in-bucket i<j
    pairs JVM-side with a higher-order ``transform``/``slice`` over the
    sorted member array. The previous self-equi-join form shuffled the
    banded table for each join side AND once more for the bucket-size
    window; this computes the signatures once and shuffles them once
    (plus the unavoidable pair-dedup exchange). Never all-pairs: pair
    count per bucket is bounded by ``max_bucket_size``² —
    ``None`` disables the cap; ALWAYS set it on real corpora (an
    uncapped boilerplate mega-bucket concentrates its members into one
    aggregation buffer and B² output pairs).
    """
    rows = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
                    "band_key"
                ),
            )
            for b in range(bands)
        ]
    )
    exploded = sigs.select(F.col(id_col), F.explode(band_structs).alias("band")).select(
        id_col, "band.band_id", "band.band_key"
    )
    # cap BEFORE collect_list: an oversized boilerplate mega-bucket must
    # never be materialized as one array in a single aggregation buffer
    # (arrays cannot spill) — the count agg is map-side combined and the
    # few oversized keys broadcast into an anti-join, so the pre-filter
    # costs one tiny-row shuffle and the bucket build only ever sees
    # bounded buckets. The banded frame is read twice (cap count + bucket
    # build), so cache it — three narrow columns per band row, far
    # smaller than re-deriving the band keys from the signature table.
    # cache() (not localCheckpoint) so the analyzed plan stays visible to
    # the single-shuffle plan pins; lifecycle is LRU like the sig cache —
    # storage blocks evict under memory pressure, so repeated invocations
    # in one session stay bounded.
    if max_bucket_size is not None:
        exploded = exploded.cache()
    exploded = _cap_buckets(exploded, max_bucket_size)
    buckets = (
        exploded.groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_list(id_col)).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    # ids sorted ascending, so pairing element i with every later element
    # yields exactly the id_a < id_b pairs
    pair_expr = (
        "flatten(transform(__ids, (x, i) -> "
        "transform(slice(__ids, i + 2, size(__ids) - i - 1), "
        "y -> named_struct('id_a', x, 'id_b', y))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        # position-based pairing emits (x, x) if an id appears twice in a
        # bucket (duplicate ids in the signature frame); the value filter
        # restores the old self-join's strict a < b semantics
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 3,
    threshold: float = 0.5,
    parallelism: int | None = None,
) -> DataFrame:
    """True n-gram Jaccard on candidate pairs only; keep pairs ≥ threshold.

    |A∩B| and |A∪B| are integers → the ratio is the same double in every
    engine.

    The shingle table is first semi-joined (broadcast) to the ids that
    actually appear in ``pairs`` and cached: candidates are a tiny
    fraction of the corpus, the pruned table is joined twice (id_a and
    id_b sides), and without the cache each side would re-shingle the
    full corpus. Pass an already-cached ``pairs`` or the id-collection
    scan recomputes it.

    The semi-join runs BEFORE the fan-out repartition: the broadcast
    filter is evaluated scan-side, so only the surviving candidate docs
    are ever shuffled — fanning out first would repartition the entire
    corpus text just to score a handful of pairs (the kind of
    full-table shuffle that is invisible at test SF and fatal at
    100 TB).
    """
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .dropDuplicates()
    )
    df = fan_out(df.join(F.broadcast(ids), id_col, "left_semi"), parallelism)
    sh = df.select(
        F.col(id_col),
        F.array_distinct(F.expr(shingles_sql(text_col, shingle))).alias("sh"),
    ).cache()
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return j


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.5,
    parallelism: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end fuzzy dedup: signatures → LSH candidates → Jaccard verify.

    Candidate pairs are cached (the verify stage reads them twice: once
    to collect candidate ids, once for the scoring join). The signature
    frame is NOT cached: since the single-shuffle candidate rewrite,
    only the BANDED frame is read twice — and
    :func:`lsh_candidate_pairs` caches that itself — so signatures flow
    through exactly one downstream pass and a cache there would be pure
    serialization overhead. At 100 TB you would persist signatures to a
    table for reuse across runs; within one run nothing re-reads them."""
    sigs = minhash_signatures(df, id_col, text_col, k, shingle, parallelism)
    cands = lsh_candidate_pairs(sigs, id_col, k, bands, max_bucket_size).cache()
    return jaccard_verify(df, cands, id_col, text_col, shingle, threshold, parallelism)


# ---------------------------------------------------------------------------
# cross-document line/segment dedup (boilerplate removal)
# ---------------------------------------------------------------------------


def line_dedup(
    df: DataFrame,
    min_doc_freq: int = 2,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: segments (lines,
    sentences — ``sep``-delimited) appearing in ≥ ``min_doc_freq``
    DISTINCT documents are dropped from every document; survivors are
    re-joined in original order. Returns (id, clean_text, n_lines_kept),
    one row per input doc (fully-boilerplate docs come back empty, for
    a downstream length filter — never silently dropped).

    Three shuffles, all on uniform keys: explode → distinct-doc count
    per segment, anti-join kept segments (same segment key — AQE
    broadcasts the boilerplate side when small, which it is by
    construction: only segments crossing the frequency threshold),
    regroup by doc. Nothing is ever all-pairs; cost is linear in total
    segment count at any corpus size.
    """
    import re as _re

    arr = F.split(F.col(text_col), _re.escape(sep))
    lines = df.select(F.col(id_col), F.posexplode(arr).alias("pos", "line"))
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("long").alias("n_lines_kept"),
        )
    )


def dedup_lines_within_doc(
    df: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove REPEATED lines within each document, keeping the first
    occurrence in original order (the self-repetition cleanup that
    Gopher's repetition RULES only flag — q67 scores it, this fixes it).
    Complements :func:`line_dedup`, which drops lines frequent ACROSS
    documents.

    Pure per-document projection — ``array_distinct`` preserves
    first-occurrence order over the split array, so this is a zero-
    shuffle map at any corpus size."""
    clean = F.array_join(
        F.array_distinct(F.split(F.col(text_col), sep)), sep
    )
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), clean.alias(text_col)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bit_sql(token_expr: str, bit: int) -> str:
    """±1 vote of a token on simhash bit ``bit``: parity of the (bit+1)-th
    hex char of the token's md5. ascii()%2 is portable to DuckDB."""
    return f"(ascii(substr(md5({token_expr}), {bit + 1}, 1)) % 2) * 2 - 1"


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document SimHash: sum each bit's ±1 token votes; bit set when the
    vote sum ≥ 0. One explode + one groupBy(doc) shuffle."""
    df = fan_out(df, parallelism)
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    aggs = [
        F.sum(F.expr(simhash_bit_sql("tok", b))).alias(f"v{b}") for b in range(bits)
    ]
    votes = tok.groupBy(id_col).agg(*aggs)
    value = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        value = bit if value is None else (value + bit)
    return votes.select(F.col(id_col), value.cast("long").alias("simhash"))


def simhash_hamming_pairs(
    sh: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 16
) -> DataFrame:
    """Near-dup candidates by SimHash: bit-slice the hash into 4 slices —
    any pair within Hamming distance 3 must agree on ≥1 slice (pigeonhole)
    — then verify the true Hamming distance on candidates only."""
    slices = bits // 4
    slice_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("slice_id"),
                F.shiftright(F.col("simhash"), i * slices)
                .bitwiseAND(F.lit((1 << slices) - 1))
                .alias("slice_key"),
            )
            for i in range(4)
        ]
    )
    ex = sh.select(id_col, "simhash", F.explode(slice_arr).alias("s")).select(
        id_col, "simhash", "s.slice_id", "s.slice_key"
    )
    a, b = ex.alias("a"), ex.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.slice_id") == F.col("b.slice_id"))
            & (F.col("a.slice_key") == F.col("b.slice_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Connected components (near-dup pairs -> dedup clusters)
# ---------------------------------------------------------------------------


#: default cap for EXPLICIT broadcast hints of label/edge frames — sized
#: to the executor-memory comfort zone a forced broadcast must fit in,
#: deliberately above spark.sql.autoBroadcastJoinThreshold (10 MB) but
#: far below where a driver/executor OOMs
BROADCAST_CAP_BYTES = 64 * 1024 * 1024


def _broadcast_if_small(
    frame: DataFrame, measured: DataFrame, cap_bytes: int
) -> DataFrame:
    """Attach an explicit broadcast hint to ``frame`` only when its
    estimated materialized size fits ``cap_bytes``.

    The estimate is BYTES, not rows: one aggregate over ``measured`` (an
    already-checkpointed superset of ``frame`` with the same column
    types, so the scan is cheap and never re-runs upstream pipeline)
    sums actual string/binary byte widths plus a boxed-size constant per
    numeric column. A row-count gate (the previous ``<= 2_000_000``)
    passes a frame of wide string ids straight into an executor OOM; a
    byte gate cannot."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, f in enumerate(measured.schema.fields):
        if f.dataType.simpleString() in ("string", "binary"):
            aggs.append(
                (F.coalesce(F.avg(F.octet_length(F.col(f.name))), F.lit(0.0)) + 20.0)
                .alias(f"__w{i}")
            )
        else:
            aggs.append(F.lit(16.0).alias(f"__w{i}"))
    row = measured.agg(*aggs).first()
    est = row["__n"] * sum(row[f"__w{i}"] for i in range(len(measured.schema.fields)))
    return F.broadcast(frame) if est <= cap_bytes else frame


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
    check_every: int = 2,
    broadcast_cap_bytes: int = BROADCAST_CAP_BYTES,
) -> DataFrame:
    """Label each vertex with the MIN vertex id reachable through the
    edge set — the step that turns near-dup PAIRS into dedup GROUPS
    (keep cluster_id, drop the rest).

    Iterative min-label propagation: each round every vertex takes the
    minimum of its own label and its neighbors' labels; converges in
    O(component diameter) rounds (near-dup clusters are shallow — a
    handful of rounds). Min-propagation is monotonic, so the loop chains
    ``check_every`` propagation rounds LAZILY and pays one
    localCheckpoint + one convergence count per span instead of per
    round — halving driver actions and checkpoint writes for the common
    shallow-cluster case without changing the fixpoint (a converged
    labeling is unchanged by extra rounds). Deterministic: min() is
    order-free.

    Scale shape: propagation runs ONLY over vertices that touch an edge
    (≤ 2·|E| rows — near-dup edge sets are orders of magnitude smaller
    than the corpus), so per-round cost is O(|E|), independent of corpus
    size; the full vertex set is joined exactly once at the end, where
    edge-untouched vertices label themselves. Iterating over
    corpus-sized label frames instead costs O(|V|) per round — at 100 TB
    that is the difference between shuffling kilobytes and shuffling the
    corpus diameter-many times.
    """
    # materialize the (small) edge list ONCE: edges usually arrive as the
    # unmaterialized tail of the LSH+verify pipeline, and without a
    # barrier every propagation round would re-run that whole pipeline.
    # Checkpoint the DIRECTED list before symmetrizing — a union of two
    # projections over the unmaterialized edges would run that pipeline
    # once per branch; over the checkpoint, symmetrize is two cheap scans
    directed = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    bidir = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # bidir is symmetric, so src alone covers every edge-touched vertex
    labels = (
        bidir.select(F.col("src").alias(id_col))
        .dropDuplicates()
        .withColumn("cluster_id", F.col(id_col))
        .localCheckpoint(eager=True)
    )
    done = 0
    while done < max_iters:
        span = min(max(check_every, 1), max_iters - done)
        # chain `span` propagation rounds lazily; carry the span-start
        # label as __prev so convergence is a cheap filter on the ONE
        # checkpointed frame — not a second labels-to-labels join
        cur = labels
        for i in range(span):
            neighbor_min = (
                bidir.alias("e")
                .join(cur.alias("l"), F.col("e.dst") == F.col(f"l.{id_col}"))
                .groupBy(F.col("e.src").alias("src"))
                .agg(F.min(F.col("l.cluster_id")).alias("nmin"))
            )
            prev = F.col("l.cluster_id") if i == 0 else F.col("l.__prev")
            cur = (
                cur.alias("l")
                .join(
                    neighbor_min.alias("n"),
                    F.col(f"l.{id_col}") == F.col("n.src"),
                    "left",
                )
                .select(
                    F.col(f"l.{id_col}"),
                    prev.alias("__prev"),
                    F.least(
                        F.col("l.cluster_id"),
                        F.coalesce(F.col("n.nmin"), F.col("l.cluster_id")),
                    ).alias("cluster_id"),
                )
            )
        stepped = cur.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("cluster_id") != F.col("__prev")).count()
        labels = stepped.drop("__prev")
        done += span
        if changed == 0:
            break
    else:
        # budget exhausted with the last span still changing — but that
        # span may have landed EXACTLY on the fixpoint (a diameter ==
        # max_iters component), so verify with one extra propagation
        # round before deciding; raise only on genuine non-convergence
        # rather than return a silently non-fixpoint labeling (same
        # fail-loud convention as connected_components_star)
        neighbor_min = (
            bidir.alias("e")
            .join(labels.alias("l"), F.col("e.dst") == F.col(f"l.{id_col}"))
            .groupBy(F.col("e.src").alias("src"))
            .agg(F.min(F.col("l.cluster_id")).alias("nmin"))
        )
        still_changing = (
            labels.alias("l")
            .join(neighbor_min.alias("n"), F.col(f"l.{id_col}") == F.col("n.src"))
            .filter(F.col("n.nmin") < F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        if still_changing:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                "rounds; raise max_iters or use connected_components_star "
                "(deep chains)"
            )
    # one corpus-sized pass, at the end only: vertices with no edge keep
    # their own id as cluster_id. The labels side is ≤ 2·|E| rows —
    # broadcast it explicitly when its estimated BYTES fit the cap so the
    # corpus never shuffles for this join; above the cap the shuffle join
    # is the right plan anyway (labels projects a checkpointed frame, so
    # measuring it is one cheap scan).
    labels = _broadcast_if_small(labels, labels, broadcast_cap_bytes)
    return (
        vertices.select(F.col(id_col))
        .join(labels, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
    broadcast_cap_bytes: int = BROADCAST_CAP_BYTES,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm): each round rewires every vertex's
    neighbors to the minimum of its closed neighborhood, converging in
    O(log n) rounds on ANY graph shape. Same fixpoint as
    :func:`connected_components` (min-label propagation), which needs
    O(diameter) rounds — use THIS one when components can be deep
    (chains of pairwise near-dups) or degree-skewed (a hub bridging
    millions of boilerplate docs): the star operations hang high-degree
    neighborhoods directly off their minimum, so skew collapses instead
    of propagating one hop per round.

    Each round is two phases of (groupBy-min + rewire) on the edge list —
    two key shuffles per phase, edge count never grows beyond the input
    (rewiring replaces edges, tree edges (min, v) are canonical).
    Convergence: the edge list reaches a fixpoint where every edge is
    (component-min, v); checked by comparing an order-free checksum of
    the edge set between rounds on the checkpointed frame.
    """

    def large_star(e: DataFrame) -> DataFrame:
        # undirected neighborhoods: symmetrize the (possibly directed)
        # edge list, then for each u attach neighbors v > u to
        # min(N(u) ∪ {u})
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates()
        m = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            sym.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient edges small->large, then for each u: neighbors v <= u
        # (and u itself) attach to min(N(u) ∪ {u})
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        m = oriented.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        rewired = (
            oriented.join(m, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(m.select("src", F.col("m").alias("dst")))
        )
        return (
            rewired.filter(F.col("src") != F.col("dst")).dropDuplicates()
        )

    # checkpoint the directed list first (same rationale as
    # connected_components: one upstream-pipeline run, not one per
    # union branch), then symmetrize + dedup into the iteration barrier
    directed = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    bidir = (
        directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    def checksum(e: DataFrame):
        # XOR of row hashes: order-free, overflow-free (the edge list is
        # deduplicated, so XOR over the SET is collision-safe in the
        # ways a sum is not under ANSI overflow rules)
        row = e.agg(
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (row.h, row.n)

    cur = bidir
    prev_sum = checksum(cur)
    converged = False
    for _ in range(max_iters):
        stepped = small_star(large_star(cur)).localCheckpoint(eager=True)
        cur_sum = checksum(stepped)
        cur = stepped
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # fail loudly (the streaming-proof-timeout convention): labels
        # derived from a non-fixpoint edge set can silently assign a
        # vertex a non-component-minimum cluster_id, corrupting every
        # downstream keep/drop decision
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds; raise max_iters (components deeper than expected)"
        )
    # fixpoint edges are (v, component_min); vertices absent from any
    # edge are their own component
    labels = cur.select(
        F.col("src").alias(id_col), F.col("dst").alias("cluster_id")
    ).groupBy(id_col).agg(F.min("cluster_id").alias("cluster_id"))
    # labels ≤ fixpoint edge count: broadcast when the fixpoint edge
    # frame's estimated BYTES fit the cap (same rationale as
    # connected_components) so the vertex frame never shuffles; ``cur``
    # is checkpointed, so the measurement scan is cheap
    labels = _broadcast_if_small(labels, cur, broadcast_cap_bytes)
    return (
        vertices.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )


def incremental_near_dup(
    new_docs: DataFrame,
    existing_sigs: DataFrame,
    existing_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.5,
    parallelism: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus without re-pairing the
    corpus with itself — the continuous-crawl shape: signatures for the
    existing side come from a persisted table (computed once, appended per
    batch), only the new batch is signed fresh, and the LSH band join is
    new×existing only (plus new×new via :func:`minhash_lsh_dedup` if
    wanted). Returns (new_id, existing_id, jaccard ≥ threshold).

    At 100 TB the existing signature table is partitioned by band key, so
    each new batch probes only matching partitions — the batch cost scales
    with the batch, never the corpus. ``max_bucket_size`` drops band
    buckets whose EXISTING-corpus membership exceeds it (a boilerplate
    bucket of B existing docs multiplies every probing new doc by B —
    see :func:`_cap_buckets`).
    """
    new_sigs = minhash_signatures(new_docs, id_col, text_col, k, shingle, parallelism)

    def banded(sigs: DataFrame) -> DataFrame:
        return banded_signatures(sigs, id_col=id_col, k=k, bands=bands)

    cands = (
        banded(new_sigs)
        .alias("n")
        .join(
            _cap_buckets(banded(existing_sigs), max_bucket_size).alias("e"),
            (F.col("n.band_id") == F.col("e.band_id"))
            & (F.col("n.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col(f"n.{id_col}").alias("id_a"),
            F.col(f"e.{id_col}").alias("id_b"),
        )
        .dropDuplicates()
        .cache()
    )
    # shingle ONLY the docs that appear in a candidate pair (semi-join,
    # the jaccard_verify shape): candidates are a tiny fraction of both
    # sides, so verification cost scales with the candidate set — without
    # the prune the ENTIRE existing corpus is re-shingled per batch,
    # which defeats the batch-scaled design at 100 TB. The broadcast HINT
    # is applied only when max_bucket_size bounds the candidate set: with
    # the cap off, a boilerplate band-key flood makes the id sets
    # unbounded, and a FORCED broadcast of an unbounded frame OOMs the
    # driver — leave the uncapped case to AQE, which sizes the join off
    # runtime statistics.
    def _cand_ids(side: str):
        ids = cands.select(F.col(side).alias(id_col)).dropDuplicates()
        return F.broadcast(ids) if max_bucket_size is not None else ids

    sh_new = new_docs.join(_cand_ids("id_a"), id_col, "left_semi").select(
        F.col(id_col).alias("id_a"),
        F.array_distinct(F.expr(shingles_sql(text_col, shingle))).alias("sh_a"),
    )
    sh_old = existing_docs.join(_cand_ids("id_b"), id_col, "left_semi").select(
        F.col(id_col).alias("id_b"),
        F.array_distinct(F.expr(shingles_sql(text_col, shingle))).alias("sh_b"),
    )
    return (
        cands.join(sh_new, "id_a")
        .join(sh_old, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
