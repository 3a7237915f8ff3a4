"""Embedding similarity search over ``array<float>`` columns.

Scale design:

- **Brute-force top-k** (the exactness baseline): cosine against a
  broadcast query vector is a pure projection + TakeOrdered — no shuffle
  of the corpus, linear scan. This is already the right plan for a single
  query at any corpus size; the cost is one pass over the embeddings.
- **IVF-style ANN** (the scale path for many queries / lower latency):
  partition vectors into coarse cells (here: exact elementwise-sum
  centroids per cell), probe only the nearest cell(s). The centroid build
  is one groupBy; the probe prunes the scan to ~1/cells of the data.
  A production variant would k-means the cells and store them
  partitioned-by-cell so probes are partition-pruned at the file level.
- **Random-hyperplane LSH** signatures (:func:`hyperplane_signature`) give
  a shuffle-free bucket key for all-pairs near-dup joins on embeddings —
  same banding trick as MinHash (corpus/dedup.py).

All folds are explicit left-to-right ``F.aggregate`` over doubles —
deterministic, identical to the DuckDB oracle's ``list_reduce``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus.dedup import fan_out


def dot(a: str | Column, b: str | Column) -> Column:
    """Left-to-right fold dot product over two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (a bare
    division would THROW under Spark 4's default ANSI mode the moment a
    padding/failed-encode vector meets a candidate — and NULLs sort last
    under desc, so zero vectors drop out of top-k instead of crashing
    the job or, worse, ranking first the way a NaN would)."""
    den = norm(a) * norm(b)
    return F.when(den != 0, dot(a, b) / den)


def _arrow_cosine(a: str | Column, b: str | Column) -> Column:
    """Vectorized cosine over Arrow batches: one numpy matmul per batch
    instead of a per-element SQL fold — the production scorer for
    candidate-pair volumes (:func:`knn_join` ``arrow_scorer=True``).
    Equal-length non-null vectors assumed (LSH candidates always are).
    Differs from :func:`cosine` only in float summation order."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va, vb):
        import numpy as np
        import pandas as pd

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        # float64 throughout: array<float> inputs would otherwise score
        # in float32 (~1e-7 error vs the SQL fold's double arithmetic)
        A = np.stack(va.to_numpy()).astype(np.float64, copy=False)
        B = np.stack(vb.to_numpy()).astype(np.float64, copy=False)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        zero = den == 0
        if zero.any():
            # SQL-cosine parity for zero-norm vectors: x/0 is NULL under
            # Spark's non-ANSI divide, and NULLs sort LAST under desc —
            # numpy's 0/0=NaN would instead sort FIRST (NaN > any double)
            # and crown a padding vector rank-1. Emit genuine nulls.
            with np.errstate(invalid="ignore", divide="ignore"):
                vals = num / den
            return pd.Series(
                [None if z else float(v) for v, z in zip(vals, zero)],
                dtype="object",
            )
        return pd.Series(num / den)

    return _cos(F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b)


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of one corpus vector (brute-force baseline).

    The query row is broadcast; ties break on ``id_col`` so results are
    total-ordered and engine-portable. The query's norm rides the
    broadcast row (the knn_join convention: the fold runs once, not
    once per corpus row — same deterministic fold, bit-identical
    scores)."""
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"), norm(vec_col).alias("__qn")
    )
    den = norm(vec_col) * F.col("__qn")
    scored = emb.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.when(den != 0, dot(vec_col, "__q") / den).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def centroids_exact(
    emb: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-cell UNNORMALIZED centroid: elementwise exact decimal sum.

    Sums (not means) keep cosine ranking identical (cosine is
    scale-invariant) while avoiding order-dependent float division — the
    centroid is bit-identical regardless of aggregation order or engine.
    """
    per_dim = [
        F.sum(F.element_at(vec_col, d + 1).cast("decimal(27,8)"))
        .cast("double")
        .alias(f"c{d}")
        for d in range(dim)
    ]
    agg = emb.groupBy(cell_col).agg(*per_dim)
    return agg.select(
        F.col(cell_col).alias("cell"),
        F.array(*[F.col(f"c{d}") for d in range(dim)]).alias("centroid"),
    )


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probes: int = 1,
) -> DataFrame:
    """IVF-style ANN: route the query to its nearest coarse cell(s), then
    exact top-k within those cells only. Returns (vec_id, cell, cos_sim).
    The query norm rides the broadcast row (knn_join convention — same
    fold once instead of per scored row, bit-identical scores)."""
    cents = centroids_exact(emb, cell_col, vec_col, dim)
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"), norm(vec_col).alias("__qn")
    )
    best_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("cell", cosine("centroid", "__q").alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), F.col("cell").asc())
        .limit(probes)
    )
    pruned = emb.join(
        F.broadcast(best_cells.select(F.col("cell").alias(cell_col))), cell_col
    )
    den = norm(vec_col) * F.col("__qn")
    scored = pruned.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.col(cell_col).alias("cell"),
        F.when(den != 0, dot(vec_col, "__q") / den).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column — the
    coarse quantizer for a production IVF index (the module docstring's
    "production variant": learned cells instead of a pre-labeled column).

    All-DataFrame: per iteration, assignments come from a crossJoin with
    the BROADCAST k-row centroid table (argmin over k cosine distances —
    k is small by construction), and centroids are recomputed with exact
    decimal elementwise sums (:func:`centroids_exact`'s trick), so every
    iteration is one broadcast projection + one groupBy shuffle of
    (cell, vector). Initialization is the k lowest ``id_col`` vectors —
    deterministic across runs/engines; no RNG. localCheckpoint per
    iteration truncates the growing lineage (same pattern as
    dedup.connected_components). Returns (id, cell) assignments.

    Scale: corpus is never collected; the only driver-side data is the
    k×dim centroid table per iteration. 100 TB corpora train the
    quantizer on a SAMPLE (one .limit/.sample pass) and assign the full
    corpus once with the final centroids — same code path.
    """
    # vector norms ride the checkpointed projection (knn_join
    # convention): the fold runs once per vector per training, not once
    # per (vector, centroid) candidate per iteration — same
    # deterministic fold, bit-identical assignments
    vecs = emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__n")
    ).localCheckpoint(eager=False)
    cents = (
        vecs.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("__seed"), F.col(vec_col))
        .withColumn("cell", F.row_number().over(Window.orderBy("__seed")) - 1)
        .select("cell", F.col(vec_col).alias("centroid"))
    )
    assign = None
    for _ in range(iters):
        # centroid norms materialize in the k-row broadcast relation
        cn = cents.withColumn("__cn", norm("centroid"))
        den = F.col("__n") * F.col("__cn")
        scored = vecs.crossJoin(F.broadcast(cn)).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cell"),
            F.when(den != 0, dot(vec_col, "centroid") / den).alias("__sim"),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("__sim").desc(), F.col("cell").asc()
        )
        assign = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, vec_col, "cell")
            .localCheckpoint(eager=False)
        )
        cents = centroids_exact(assign, "cell", vec_col, dim)
    return assign.select(id_col, "cell")


def build_ivf_index(
    emb: DataFrame,
    path: str,
    cells: DataFrame | None = None,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize the IVF index: embeddings written PARTITIONED BY cell,
    so a probe that routes to ``probes`` cells reads only those cells'
    files — partition pruning at the storage level, the piece q25's
    in-memory form only simulates with a filter. ``cells`` overrides the
    pre-labeled column with learned assignments (:func:`kmeans_cells`).

    Also writes the k-row centroid SIDECAR to ``{path}/_centroids``
    (underscore prefix = invisible to the main parquet scan), so probes
    route without touching the corpus: a probe's pre-step is a k-row
    read, not an O(corpus) centroid recomputation. ``dim`` is inferred
    from the data when not given (one first() at build time)."""
    if cells is not None:
        emb = emb.join(cells, id_col).withColumn("__cell", F.col("cell"))
    else:
        emb = emb.withColumn("__cell", F.col(cell_col))
    labeled = emb.select(F.col(id_col), F.col(vec_col), F.col("__cell").alias("cell"))
    (
        labeled.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    if dim is None:
        row = labeled.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(row["d"]) if row else 0
    (
        centroids_exact(labeled, "cell", vec_col, dim)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "_centroids"))
    )


def ivf_probe_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 5,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Probe the partitioned IVF index: rank cells by centroid similarity
    to the query using the k-row ``_centroids`` sidecar written at build
    time, then scan ONLY the chosen cells. The ``cell IN (...)`` filter
    lands in PartitionFilters, so the scan reads just those directories —
    the file-level pruning that makes IVF sublinear on disk, not only in
    memory (plan- and IO-asserted in tests/test_plans.py /
    tests/test_corpus.py). Pre-sidecar indexes (no ``_centroids`` dir)
    fall back to recomputing centroids from the full index."""
    idx = spark.read.parquet(index_path)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    try:
        cents = spark.read.parquet(os.path.join(index_path, "_centroids"))
    except Exception:
        cents = centroids_exact(idx, "cell", vec_col, dim)
    best = [
        r.cell
        for r in cents.select(
            "cell", cosine("centroid", qlit).alias("s")
        )
        .orderBy(F.col("s").desc(), F.col("cell").asc())
        .limit(probes)
        .collect()
    ]
    pruned = idx.filter(F.col("cell").isin(best))
    # the query-literal norm folds once per row if inlined; hoist it
    # into a 1-row broadcast (knn_join convention, bit-identical)
    qdf = spark.range(1).select(
        qlit.alias("__q"), norm(qlit).alias("__qn")
    )
    den = norm(vec_col) * F.col("__qn")
    scored = pruned.crossJoin(F.broadcast(qdf)).select(
        F.col(id_col),
        F.col("cell"),
        F.when(den != 0, dot(vec_col, "__q") / den).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_append(
    spark,
    index_path: str,
    new_emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a NEW batch of vectors to an existing partitioned IVF index
    without rebuilding it — the continuous-ingest shape (mirrors
    corpus/dedup.py::incremental_near_dup for the signature index).

    Assignment reads ONLY the k-row ``_centroids`` sidecar (broadcast
    argmax over cells — the corpus is never scanned) and the append
    writes only the touched cell directories. Centroids are deliberately
    NOT updated per batch: standard IVF maintenance keeps the coarse
    quantizer fixed between periodic retrains (a retrain is a rebuild),
    so probes stay consistent with the routing the index was built with.
    Batch cost scales with the batch, never the index."""
    cents = spark.read.parquet(os.path.join(index_path, "_centroids"))
    # per-side norms (knn_join convention): one fold per new vector and
    # per centroid instead of per (vector, centroid) candidate —
    # bit-identical assignment scores
    cn = cents.withColumn("__cn", norm("centroid"))
    den = F.col("__n") * F.col("__cn")
    scored = new_emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__n")
    ).crossJoin(
        F.broadcast(cn)
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell"),
        F.when(den != 0, dot(vec_col, "centroid") / den).alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell")
    )
    (
        assigned.repartition("cell")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(index_path)
    )


def ivf_probe_batch(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    probes: int = 1,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the partitioned IVF index for a BATCH of query vectors in
    one pass — the serving shape (:func:`ivf_probe_indexed` is the
    single-query form). Routing: broadcast the k-row centroid sidecar,
    keep each query's ``probes`` best cells; scoring: the routed queries
    (a small batch) BROADCAST into a join against the index on ``cell``,
    so the index is never shuffled and — because ``cell`` is the
    partition column of a broadcast equi-join — dynamic partition
    pruning limits the scan to the routed cells' directories. One
    query-partitioned window takes the top-k.

    ``id_col`` names the index's id column (must match the ``id_col``
    the index was built with — :func:`build_ivf_index`/:func:`ivf_append`
    take the same parameter).

    Returns (query_id, <id_col>, cos_sim, rank), rank 1..≤k per query.
    """
    cents = spark.read.parquet(os.path.join(index_path, "_centroids"))
    # query norms ride the broadcast query batch (knn_join convention):
    # one fold per query instead of one per (index row, query) score —
    # bit-identical scores
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
    )
    wr = Window.partitionBy(query_id_col).orderBy(
        F.col("__csim").desc(), F.col("cell").asc()
    )
    routed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__csim", cosine("__qv", "centroid"))
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= probes)
        .select(query_id_col, "__qv", "__qn", "cell")
    )
    # index-side norm attached BELOW the join (one fold per index row,
    # not per (row, query) score — a row matching several queries would
    # otherwise re-fold per match)
    idx = spark.read.parquet(index_path).withColumn("__n", norm(vec_col))
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    den = F.col("__n") * F.col("__qn")
    return (
        idx.join(F.broadcast(routed), "cell")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.when(den != 0, dot(vec_col, "__qv") / den).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ann_recall_at_k(
    spark,
    index_path: str,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    probes: int = 1,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF index vs exact search, per query — the metric
    a user tunes ``probes``/cell count against (approximate search
    without a measured recall is a guess). Returns
    (query_id, n_found, recall).

    Exact side: the query batch broadcasts into one scored pass over the
    corpus + a query-partitioned top-k window (same tie-break as the
    probe: cos desc, id asc — so recall is deterministic even on ties).
    Approx side: :func:`ivf_probe_batch` (DPP-pruned index scan). The
    comparison joins bare (query_id, id) pairs. Cost: one corpus scan
    for the exact side — recall measurement is an OFFLINE evaluation
    pass over a query SAMPLE, not a serving-path operation; size the
    sample, not the corpus."""
    # per-side norms (knn_join convention): every corpus vector scores
    # against EVERY query in the sample, so folding norms per pair paid
    # |queries|x the per-row cost — attach them once per side below the
    # cross join; same deterministic fold, bit-identical scores
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
    )
    embn = emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__n")
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("__cs").desc(), F.col(id_col).asc()
    )
    den = F.col("__n") * F.col("__qn")
    exact = (
        embn.crossJoin(F.broadcast(q))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.when(den != 0, dot(vec_col, "__qv") / den).alias("__cs"),
        )
        .withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col)
    )
    approx = ivf_probe_batch(
        spark,
        index_path,
        queries,
        k=k,
        probes=probes,
        query_id_col=query_id_col,
        vec_col=vec_col,
        id_col=id_col,
    ).select(query_id_col, id_col)
    hits = approx.join(exact, [query_id_col, id_col], "left_semi")
    found = hits.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_found"))
    return (
        queries.select(query_id_col)
        .join(found, query_id_col, "left")
        .select(
            query_id_col,
            F.coalesce("n_found", F.lit(0)).alias("n_found"),
            (F.coalesce("n_found", F.lit(0)) / F.lit(k)).alias("recall"),
        )
    )


def _plane_weights(plane: int, dim: int) -> list[int]:
    """±1 weight per dimension for one hyperplane: the parity of the first
    hex char of md5('p{plane}|{d}') — bit-identical to the SQL form
    ``(ascii(substr(md5(concat('p{plane}|', d)), 1, 1)) % 2) * 2 - 1``."""
    import hashlib

    return [
        (ord(hashlib.md5(f"p{plane}|{d}".encode()).hexdigest()[0]) % 2) * 2 - 1
        for d in range(dim)
    ]


def hyperplane_signature(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signature: bit j = sign(⟨plane_j, x⟩).

    Plane weights are deterministic ±1 derived from md5 parity (portable,
    reproducible across runs/engines); a production variant would use
    seeded Gaussian planes. Pure projection — no shuffle.

    The weights are CONSTANTS, so they are computed driver-side (same
    md5-parity formula the DuckDB oracle evaluates in SQL) and embedded
    as literal arrays — Catalyst does not constant-fold higher-order
    functions, so an in-plan ``transform(sequence(...), d -> md5(...))``
    would redo planes×dim md5 calls for every row.
    """
    sig = None
    for j in range(planes):
        weights = F.array(*[F.lit(w) for w in _plane_weights(j, dim)])
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                weights,
                lambda x, w: x.cast("double") * w.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return emb.select(F.col(id_col), sig.cast("long").alias("lsh_sig"))


def _banded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    bands: int,
) -> DataFrame:
    """Slice an attached ``lsh_sig`` into ``bands`` (band, key) rows per
    vector — the ONE banding definition shared by the near-dup pair join
    and the k-NN join, and mirrored bit-for-bit by the DuckDB oracles
    (``(sig >> band*width) & mask``)."""
    width = planes // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright("lsh_sig", j * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for j in range(bands)
        ]
    )
    return df.select(id_col, vec_col, F.explode(band_arr).alias("s")).select(
        id_col, vec_col, "s.band", "s.key"
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh_prefilter: bool = True,
    bands: int = 1,
    planes: int = 16,
    dim: int = 64,
    parallelism: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All near-duplicate embedding pairs (cos ≥ threshold, id_a < id_b).

    With ``use_lsh_prefilter`` the self-join is on the hyperplane
    signature, turning O(n²) into bucket-local equi-joins. ``bands=1``
    requires the full signature to agree — near-exact duplicates only;
    ``bands>1`` slices the signature MinHash-banding style (candidates
    share ANY band), trading candidate volume for recall at moderate
    thresholds: P(candidate) = 1-(1-p^(planes/bands))^bands for per-bit
    agreement p = 1-θ/π. Without the prefilter, a full cross self-join
    (only for small n / oracle validation) — fan the probe side out
    first: a nested-loop join's parallelism is its left side's partition
    count, and a small-on-disk embeddings table scans as ONE partition
    (bytes-based splits vs CPU-bound work).

    Sizing for scale: random-pair collision costs n²·P(candidate), so
    band keys must be WIDE on big corpora — at 4-bit keys (16/4) random
    64-dim vectors collide on some band ~23% of the time, which is
    quadratic blowup territory; 8-bit keys (32/4, the knn_join default)
    cut that to ~1.6%. ``max_bucket_size`` is the skew guard on top:
    band buckets larger than it (boilerplate/hub embeddings, exact-dup
    floods) are dropped BEFORE the self-join, capping per-bucket pair
    cost at cap² — same rationale as the MinHash path's cap
    (corpus/dedup.py::_cap_buckets), and at SemDeDup-scale the
    production form additionally partitions by k-means cell
    (kmeans_cells) so comparisons never cross cells.
    """
    base = fan_out(emb.select(F.col(id_col), F.col(vec_col)), parallelism)
    if use_lsh_prefilter:
        sigs = hyperplane_signature(emb, id_col, vec_col, planes=planes, dim=dim)
        base = base.join(sigs, id_col)
        if bands > 1:
            banded = _banded(base, id_col, vec_col, planes, bands).select(
                id_col, "band", "key"
            )
            if max_bucket_size is not None:
                oversized = (
                    banded.groupBy("band", "key")
                    .agg(F.count(F.lit(1)).alias("__bsz"))
                    .filter(F.col("__bsz") > max_bucket_size)
                    .select("band", "key")
                )
                banded = banded.join(
                    F.broadcast(oversized), ["band", "key"], "left_anti"
                )
            a, b = banded.alias("a"), banded.alias("b")
            # dedup (a doc pair can share several bands — identical
            # signatures share ALL of them) on BARE ID PAIRS before the
            # cosine scoring: each candidate is verified once AND the
            # dedup shuffle carries two longs per row, not two ~1 KB
            # vector payloads (the payload-through-dedup shape went 13x
            # super-linear on an 8x near-dup-dense corpus); vectors
            # re-join by id afterwards
            pairs = (
                a.join(
                    b,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                )
                .dropDuplicates()
            )
            # per-vector norms (see knn_join): one fold per corpus row
            # instead of two per candidate, bit-identical scores
            vecs = emb.select(
                F.col(id_col), F.col(vec_col), norm(vec_col).alias("__nrm")
            )
            den = F.col("__na") * F.col("__nb")
            out = (
                pairs.join(
                    vecs.select(
                        F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("__va"),
                        F.col("__nrm").alias("__na"),
                    ),
                    "id_a",
                )
                .join(
                    vecs.select(
                        F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("__vb"),
                        F.col("__nrm").alias("__nb"),
                    ),
                    "id_b",
                )
                .select(
                    "id_a",
                    "id_b",
                    F.when(den != 0, dot("__va", "__vb") / den).alias("cos_sim"),
                )
            )
            return out.filter(F.col("cos_sim") >= threshold)
        else:
            a = base.alias("a")
            b = base.alias("b")
            joined = a.join(
                b,
                (F.col("a.lsh_sig") == F.col("b.lsh_sig"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
    else:
        a = base.alias("a")
        b = base.alias("b")
        joined = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    out = joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cosine(f"a.{vec_col}", f"b.{vec_col}").alias("cos_sim"),
    )
    return out.filter(F.col("cos_sim") >= threshold)


def knn_join(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 32,
    bands: int = 4,
    dim: int = 64,
    parallelism: int | None = None,
    arrow_scorer: bool = False,
) -> DataFrame:
    """Approximate k-NN JOIN: EVERY vector gets its ``k`` most-similar
    neighbors among its LSH-band co-bucketed candidates — the all-pairs
    curation shape (semantic dedup thresholds, curriculum neighbors,
    hard-negative mining) as opposed to the single-probe ANN queries
    (:func:`cosine_topk` / :func:`ivf_topk`).

    Directed output: ``(query_id, neighbor_id, cos_sim, rank)`` with
    ``rank`` 1..≤k per query (ties broken on neighbor id; a vector
    sharing no band bucket yields fewer than k rows — approximate by
    design, recall governed by planes/bands exactly as in
    :func:`embedding_near_dup_pairs`).

    Scale shape: banded signature explode → bucket-local self-equi-join
    (never all-pairs), candidate dedup on BARE ID PAIRS (two longs per
    row — the vectors are re-joined by id after the dedup, so the widest
    shuffle of the pipeline never carries the ~1 KB embedding payloads),
    then ONE window partitioned by query id for the top-k — the same
    per-key pattern as q06's top-n. Defaults give ``planes/bands`` =
    8-bit band keys (256 buckets/band): wider keys than the near-dup
    path's because a k-NN join pays bucket-size² in CANDIDATE COSINES,
    and k-NN wants selective buckets with band-count recall, not high
    per-bucket recall.

    ``arrow_scorer=False`` (default) scores candidates with the
    deterministic left-to-right ``F.aggregate`` fold — bit-exact with
    the DuckDB oracle. ``arrow_scorer=True`` is the production path:
    candidates batch through an Arrow Pandas UDF (one numpy matmul per
    batch, ~10x scorer throughput), trading bit-exact cross-engine
    reproducibility for speed (float64 results differ from the fold only
    in summation order, i.e. last-ulp).
    """
    base = fan_out(emb.select(F.col(id_col), F.col(vec_col)), parallelism).join(
        hyperplane_signature(emb, id_col, vec_col, planes=planes, dim=dim), id_col
    )
    banded = _banded(base, id_col, vec_col, planes, bands).select(
        id_col, "band", "key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
        )
        .dropDuplicates()
    )
    # norms are attached PER VECTOR, not folded per pair: the fold runs
    # once per corpus row instead of twice per candidate (candidates
    # outnumber vectors by orders of magnitude), and the value is the
    # SAME deterministic fold either way, so scores stay bit-identical
    # to the oracle's
    vecs = emb.select(
        F.col(id_col), F.col(vec_col), norm(vec_col).alias("__nrm")
    )
    cands = pairs.join(
        vecs.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__va"),
            F.col("__nrm").alias("__na"),
        ),
        "query_id",
    ).join(
        vecs.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__vb"),
            F.col("__nrm").alias("__nb"),
        ),
        "neighbor_id",
    )
    if arrow_scorer:
        score = _arrow_cosine("__va", "__vb")
    else:
        den = F.col("__na") * F.col("__nb")
        score = F.when(den != 0, dot("__va", "__vb") / den)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("cos_sim", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public paper): semantic
    deduplication by embedding clustering — cluster the corpus, compare
    pairs ONLY within a cluster, and drop every item that has a
    lower-id near-duplicate (cos >= ``threshold``) in its cluster. The
    cluster bound is the whole trick: pairwise cost is sum(c_i^2) over
    cell sizes instead of n^2, and the paper sizes k so cells stay
    small. Returns (id, cell, is_dup) — is_dup=True rows are the ones a
    curation pass removes; the kept set always contains the lowest-id
    member of every duplicate group (deterministic, engine-portable —
    no RNG, no float-order dependence).

    ``cell_col`` plugs in an existing cluster assignment (the paper's
    quantizer is pluggable; a pre-labeled column also lets a relational
    oracle replay the exact semantics). ``cell_col=None`` learns cells
    with :func:`kmeans_cells` (deterministic Lloyd's — the production
    path). ``max_cell_size`` is the hub guard, same rationale as the
    MinHash bucket cap (corpus/dedup.py::_cap_buckets): a degenerate
    mega-cell (embedding collapse, all-zero vectors) would pay cap^2 in
    one join partition — cells past the cap SKIP pair generation and
    keep all their items (conservative: never drops without evidence,
    mirrored by a QUALIFY window count in the oracle).

    Scale shape — the house candidate-pair pattern (same as the MinHash
    bucket build and the k-NN join): the per-cell pairing shuffles BARE
    IDS only (16 bytes/pair, never two embedding vectors per pair row —
    the naive cell self-join ships ~2*dim floats per candidate and its
    GC pressure dominates at any real cell size), the i<j pairs explode
    JVM-side from each cell's sorted id array, and the vectors re-join
    by id for scoring. The drop set is a distinct of matched higher
    ids. At 100 TB the paper's regime holds: k grows with n so cells
    stay ~constant-size, making the whole pass linear-ish in corpus
    size."""
    base = (
        emb.select(
            F.col(id_col), F.col(vec_col), F.col(cell_col).alias("cell")
        )
        if cell_col is not None
        else emb.select(F.col(id_col), F.col(vec_col)).join(
            kmeans_cells(emb, k, iters, id_col, vec_col, dim), id_col
        )
    )
    eligible = base.select("cell", id_col)
    if max_cell_size is not None:
        oversized = (
            eligible.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("__csz"))
            .filter(F.col("__csz") > max_cell_size)
            .select("cell")
        )
        eligible = eligible.join(F.broadcast(oversized), "cell", "left_anti")
    buckets = (
        eligible.groupBy("cell")
        .agg(F.array_sort(F.collect_list(id_col)).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(__ids, (x, i) -> "
        "transform(slice(__ids, i + 2, size(__ids) - i - 1), "
        "y -> named_struct('id_a', x, 'id_b', y))))"
    )
    pairs = (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .filter(F.col("id_a") < F.col("id_b"))
    )
    # norm ONCE per vector as a scalar COLUMN, score pairs with a
    # single dot divided by the two carried norms: Spark's higher-order
    # lambdas are interpreted (no codegen, no subexpression elimination
    # — see the q76 postmortem), so the 3-dot cosine form pays 3x per
    # pair (measured 2.4x slower at 200k pairs). Normalizing the ARRAY
    # would re-evaluate the norm aggregate per element (O(dim^2), the
    # same no-CSE trap) — the scalar-column form computes it once per
    # row and survives projection collapse because the join is a
    # barrier. Zero-norm vectors (cosine undefined) score -inf and
    # never match, instead of tripping ANSI DIVIDE_BY_ZERO.
    vecs = base.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        norm(vec_col).alias("__n"),
    )
    scored = pairs.join(
        vecs.select(
            F.col(id_col).alias("id_a"),
            F.col("__v").alias("__va"),
            F.col("__n").alias("__na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"),
            F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"),
        ),
        "id_b",
    )
    sim = F.when(
        (F.col("__na") != 0) & (F.col("__nb") != 0),
        dot("__va", "__vb") / (F.col("__na") * F.col("__nb")),
    ).otherwise(F.lit(float("-inf")))
    dropped = (
        scored.filter(sim >= F.lit(threshold))
        # id_a < id_b by construction: the HIGHER id of a matching pair
        # is the duplicate; the lowest id of every group always survives
        .select(F.col("id_b").alias(id_col))
        .dropDuplicates()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        base.select(id_col, "cell")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def prototype_prune(
    emb: DataFrame,
    frac: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """SSL-prototype pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws", public paper — the difficulty-based pruning stage D4
    (Tirumala et al. 2023) runs after SemDeDup): cluster the corpus,
    score every item by cosine to its CLUSTER CENTROID
    (prototypicality), and prune the most prototypical ``frac`` of each
    cell — on large corpora the paper's result is that keeping the HARD
    examples (far from the prototype) beats random pruning, so the
    pruned rows are the easy near-prototype redundancy. Returns
    (id, cell, is_pruned); deterministic and engine-portable — exact
    decimal-sum centroids (:func:`centroids_exact`), bit-pinned fold
    order for the cosine, rank ties broken on id.

    ``cell_col`` plugs in an existing assignment (pluggable quantizer,
    same convention as :func:`semdedup`; a pre-labeled column also lets
    a relational oracle replay the exact semantics); ``None`` learns
    cells with :func:`kmeans_cells` (deterministic Lloyd's).

    Scale shape: ONE (cell, dim)-key aggregation for the centroids
    (map-side partial combine; output k x dim rows, always
    broadcastable), one broadcast join to score — the corpus is
    touched exactly twice and nothing wider than (id, cell, score)
    shuffles. The per-cell rank is a window partitioned by cell: cells
    are quantizer-bounded (k grows with n in the paper's regime), so no
    single window partition outgrows an executor — the same balance
    assumption SemDeDup's pair stage already relies on."""
    base = (
        emb.select(
            F.col(id_col), F.col(vec_col), F.col(cell_col).alias("cell")
        )
        if cell_col is not None
        else emb.select(F.col(id_col), F.col(vec_col)).join(
            kmeans_cells(emb, k, iters, id_col, vec_col, dim), id_col
        )
    )
    cents = centroids_exact(base, "cell", vec_col, dim)
    # norms once per row as scalar columns (interpreted lambdas have no
    # CSE — the q76 postmortem); zero-norm vectors score -inf: they are
    # never "prototypical", so they survive pruning (conservative) and
    # ANSI division never throws
    scored = (
        base.withColumn("__n", norm(vec_col))
        .join(
            F.broadcast(cents.withColumn("__cn", norm("centroid"))), "cell"
        )
        .select(
            id_col,
            "cell",
            F.when(
                (F.col("__n") != 0) & (F.col("__cn") != 0),
                dot(vec_col, "centroid") / (F.col("__n") * F.col("__cn")),
            )
            .otherwise(F.lit(float("-inf")))
            .alias("proto_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cell")
    ranked = scored.select(
        id_col,
        "cell",
        F.row_number()
        .over(w.orderBy(F.col("proto_sim").desc(), F.col(id_col).asc()))
        .alias("__rn"),
        F.count(F.lit(1)).over(w).alias("__cn"),
    )
    return ranked.select(
        id_col,
        "cell",
        (F.col("__rn") <= F.floor(F.col("__cn") * F.lit(frac))).alias(
            "is_pruned"
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed ANN codes + asymmetric distance
# ---------------------------------------------------------------------------


def pq_codebook_sampled(
    emb: DataFrame,
    m: int = 8,
    codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """A SAMPLED product-quantization codebook: per subspace, the codes
    are the subvectors of the ``codes`` lowest-id corpus vectors —
    deterministic, engine-portable, and fully relational (so an oracle
    can replay PQ end-to-end; the same pluggable-quantizer convention
    as semdedup/prototype_prune). Production trains
    :func:`pq_codebook_kmeans` instead; both return the same shape:
    (sub, code_id, cvec)."""
    d = dim // m
    sample = emb.orderBy(F.col(id_col).asc()).limit(codes)
    return sample.select(
        F.col(id_col).alias("code_id"),
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
        F.col(vec_col).alias("__v"),
    ).select(
        "sub", "code_id", F.expr(f"slice(__v, sub * {d} + 1, {d})").alias("cvec")
    )


def pq_codebook_kmeans(
    emb: DataFrame,
    m: int = 8,
    codes: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained codebook (Jegou et al. 2011, "Product quantization
    for nearest neighbor search", public paper): per subspace, run
    deterministic Lloyd's over the subvectors and take the exact
    decimal-sum centroids as codes. The loop is over ``m`` subspaces
    (a handful), not data — each iteration inside is the usual
    broadcast-assign + one-shuffle recompute; at 100 TB the codebook
    trains on a sample and the full corpus is encoded once (same
    regime as :func:`kmeans_cells`)."""
    from functools import reduce

    d = dim // m
    parts = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col), F.slice(vec_col, s * d + 1, d).alias("embedding")
        )
        asg = kmeans_cells(sub, k=codes, iters=iters, dim=d)
        cents = centroids_exact(
            sub.join(asg, id_col), "cell", "embedding", d
        )
        parts.append(
            cents.select(
                F.lit(s).alias("sub"),
                F.col("cell").cast("long").alias("code_id"),
                F.col("centroid").alias("cvec"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: per vector per subspace, the L2-nearest code
    (exact index-order fold; ties by code_id) — the corpus compresses
    to ``m`` small ints per vector, a 32x+ index-size reduction at
    dim=64 float vs m=8 byte codes. Returns (id, sub, code).

    Scale shape: the corpus joins a BROADCAST m x codes codebook (tiny
    by construction) and the only shuffle is the (id, sub)-key argmin —
    map-side combinable, output m rows per vector. Raw vectors never
    shuffle; they are sliced in place."""
    d = dim // m
    sub_rows = emb.select(
        F.col(id_col),
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
        F.col(vec_col).alias("__v"),
    ).select(
        id_col, "sub", F.expr(f"slice(__v, sub * {d} + 1, {d})").alias("svec")
    )
    l2 = F.aggregate(
        F.zip_with(
            "svec",
            "cvec",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = sub_rows.join(F.broadcast(codebook), "sub").select(
        id_col, "sub", "code_id", l2.alias("__d")
    )
    return (
        scored.groupBy(id_col, "sub")
        .agg(F.min(F.struct("__d", "code_id")).alias("__b"))
        .select(id_col, "sub", F.col("__b.code_id").alias("code"))
    )


def pq_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 8,
    codes: int = 16,
    dim: int = 64,
    codebook: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by ASYMMETRIC distance computation (ADC,
    Jegou et al. 2011): the query precomputes an m x codes inner-
    product table against the codebook, and every corpus vector scores
    as the sum of m table lookups over its CODES — the raw vectors are
    never touched after encoding, which is the entire point at 100 TB
    (the scan reads m small ints per row, not dim floats;
    :func:`ivf_pq_topk` is that pairing). ``candidates`` restricts the
    SCORED pool (IVF routing) while the query vector and default
    codebook still come from the full corpus.
    Deterministic: the per-vector sum folds its m terms in subspace
    order (the q148 sorted-fold trick, so float addition order is
    engine-pinned), ranks tie on id. Returns (id, adc)."""
    cb = (
        codebook
        if codebook is not None
        else pq_codebook_sampled(emb, m, codes, dim, id_col, vec_col)
    )
    pool = candidates if candidates is not None else emb
    enc = pq_encode(pool, cb, m, dim, id_col, vec_col).withColumnRenamed(
        "code", "code_id"
    )
    d = dim // m
    qsubs = (
        emb.filter(F.col(id_col) == query_id)
        .select(
            F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
            F.col(vec_col).alias("__q"),
        )
        .select("sub", F.expr(f"slice(__q, sub * {d} + 1, {d})").alias("qvec"))
    )
    table = cb.join(F.broadcast(qsubs), "sub").select(
        "sub", "code_id", dot("qvec", "cvec").alias("__t")
    )
    scored = enc.join(F.broadcast(table), ["sub", "code_id"])
    per_vec = scored.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("sub", "__t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__t"],
        ).alias("adc")
    )
    return per_vec.orderBy(F.col("adc").desc(), F.col(id_col).asc()).limit(k)


def ivf_pq_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    probes: int = 1,
    m: int = 8,
    codes: int = 16,
    dim: int = 64,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    rerank: int | None = None,
    with_shortlist: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """IVF-PQ (Jegou et al. 2011, the production pairing): route the
    query to its ``probes`` nearest coarse cells via the exact
    decimal-sum centroids (:func:`ivf_topk`'s routing), then ADC-score
    ONLY those cells' PQ codes (:func:`pq_topk`). At 100 TB this is
    the full ANN scale path in one expression: the coarse filter
    prunes the scan to 1/cells of the corpus (partition-level with
    :func:`build_ivf_index`'s layout), and the fine scorer reads m
    small ints per surviving row instead of dim floats — neither raw
    vectors nor whole cells ever shuffle. Returns (id, adc).

    ``rerank=α`` adds the paper's §V re-ranking stage: the ADC pass
    shortlists ``k·α`` candidates, their TRUE vectors join back by id
    (against the already-routed cells, so the fetch is
    shortlist-bounded, never a corpus scan), and the final top-k ranks
    by exact cosine — ADC's quantization error buys the scan speed,
    the exact re-rank buys the recall back at the cost of reading
    ``k·α`` full vectors. Any shortlist member in the exact global
    top-k necessarily survives re-ranking (at most k-1 vectors
    anywhere score above it), so re-ranked recall@k is ≥ ADC recall@k
    by construction. Returns (id, adc, exact_sim) when re-ranking.

    ``with_shortlist=True`` (re-rank mode only) additionally returns
    the pinned ``k·α`` ADC shortlist as a second frame — its first
    ``k`` rows by (adc desc, id asc) ARE the plain-ADC top-k (same
    routing, same codebook, same deterministic ordering), so a caller
    comparing re-ranked vs plain-ADC rankings reads both from ONE
    routing + encode + ADC pass instead of re-deriving centroids,
    codebook and encodings from scratch (guide §1.2: don't compute
    things twice; pinned via localCheckpoint — k·α rows, the _pin
    convention — so the two consumers share one evaluation)."""
    cents = centroids_exact(emb, cell_col, vec_col, dim)
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    best_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("cell", cosine("centroid", "__q").alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), F.col("cell").asc())
        .limit(probes)
    )
    routed = emb.join(
        F.broadcast(best_cells.select(F.col("cell").alias(cell_col))),
        cell_col,
    )
    adc = pq_topk(
        emb,
        query_id,
        k=k if rerank is None else k * rerank,
        m=m,
        codes=codes,
        dim=dim,
        codebook=codebook,
        id_col=id_col,
        vec_col=vec_col,
        candidates=routed,
    )
    if rerank is None:
        if with_shortlist:
            raise ValueError("with_shortlist requires rerank")
        return adc
    if with_shortlist:
        # pin the k·α-row shortlist so the re-rank fetch and the
        # caller's plain-ADC read share ONE evaluation of the
        # routing + encode + ADC pipeline
        adc = adc.localCheckpoint(eager=True)
    # exact re-rank: true vectors fetched for the k·α shortlist ONLY,
    # from the routed cells (the shortlist is a subset by construction)
    fetched = routed.join(F.broadcast(adc), id_col).select(
        id_col, "adc", F.col(vec_col).alias("__rv")
    )
    reranked = (
        fetched.crossJoin(F.broadcast(q))
        .select(id_col, "adc", cosine("__rv", "__q").alias("exact_sim"))
        .orderBy(F.col("exact_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return (reranked, adc) if with_shortlist else reranked
