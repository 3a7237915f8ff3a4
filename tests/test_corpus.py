from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import dedup as cdedup
from modular_etl_data_platform_spark.corpus import similarity as csim
from modular_etl_data_platform_spark.corpus import text as ctext
from modular_etl_data_platform_spark.corpus.multimodal import (
    attach_binary_payload,
    decode_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "completely different words entirely unrelated content here now", "en"),
        (3, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (4, "der hund ist nicht der die das und mit", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_token_and_subword_count(spark, docs):
    out = {r.doc_id: (r.n, r.s) for r in docs.select(
        "doc_id", ctext.token_count().alias("n"), ctext.subword_count().alias("s")
    ).collect()}
    assert out[0][0] == 9
    # 'completely'(3) 'different'(3) 'words'(2) 'entirely'(2) 'unrelated'(3)
    # 'content'(2) 'here'(1) 'now'(1) = 17
    assert out[2] == (8, 17)


def test_language_id(spark, docs):
    out = {r.doc_id: r.lang_pred for r in docs.select(
        "doc_id", ctext.language_id().alias("lang_pred")
    ).collect()}
    assert out[0] == "en"
    assert out[4] == "de"


def test_exact_dedup(spark, docs):
    out = cdedup.exact_dedup(docs).collect()
    assert len(out) == 4  # 5 docs, one exact dup
    groups = {r.canonical_id: r.n_copies for r in out}
    assert groups[0] == 2  # docs 0 and 3


def test_minhash_identical_docs_equal_signatures(spark, docs):
    sigs = {r.doc_id: tuple(r)[1:] for r in cdedup.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[3]
    assert sigs[0] != sigs[2]


def test_lsh_finds_near_dup_pair(spark, docs):
    pairs = cdedup.minhash_lsh_dedup(docs, threshold=0.4).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 3) in found  # exact dup always survives
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(0, 3)] == 1.0


def test_short_docs_do_not_crash_dedup_stack(spark):
    """Docs with fewer words than the shingle width once crashed every
    shingle consumer (sequence(0, negative) counts DOWN, slice(w, 0, n)
    throws). Short docs now yield ONE partial shingle — same convention
    as ngram_hashes_sql — so the whole stack runs and short identical
    docs still pair up."""
    rows = [
        (0, "hi"),
        (1, "hi"),
        (2, "two words"),
        (3, ""),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = cdedup.minhash_signatures(docs)
    assert sigs.count() == 5  # no crash, no dropped rows
    pairs = cdedup.minhash_lsh_dedup(docs, threshold=0.5).collect()
    assert any((p.id_a, p.id_b) == (0, 1) and p.jaccard == 1.0 for p in pairs)
    inc = cdedup.incremental_near_dup(
        new_docs=docs.filter(F.col("doc_id") == 0),
        existing_sigs=cdedup.minhash_signatures(docs.filter(F.col("doc_id") > 0)),
        existing_docs=docs.filter(F.col("doc_id") > 0),
    ).collect()
    assert any((p.id_a, p.id_b) == (0, 1) for p in inc)


def test_short_doc_shingles_match_duckdb_twin(spark):
    """The Spark and DuckDB shingle expressions must agree on sub-width
    docs (one partial shingle), or dedup oracles diverge on real corpora
    containing short documents."""
    import duckdb

    texts = ["hi", "two words", "", "a b c", "a b c d e"]
    sdf = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        r.sh
        for r in sdf.select(F.expr(cdedup.shingles_sql("text", 3)).alias("sh")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {cdedup.shingles_duckdb('?', 3).replace('?', '$tx$' + t + '$tx$')}"
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_lsh_bucket_cap_kills_hot_bucket_blowup(spark):
    """A boilerplate bucket of B identical docs yields B·(B-1)/2 candidate
    pairs uncapped; with max_bucket_size it must contribute ZERO pairs
    while unrelated near-dup pairs elsewhere survive."""
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit") for i in range(40)]
    distinct = [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 100:
        # identical text shares every band, so survival is deterministic
    ]
    docs = spark.createDataFrame(boiler + distinct, ["doc_id", "text"])
    sigs = cdedup.minhash_signatures(docs).cache()

    uncapped = cdedup.lsh_candidate_pairs(sigs).count()
    assert uncapped >= 40 * 39 // 2  # the blowup is real

    capped = cdedup.lsh_candidate_pairs(sigs, max_bucket_size=10)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in pairs  # small buckets untouched
    assert not any(a < 100 and b < 100 for a, b in pairs)  # hot bucket gone
    assert len(pairs) <= 1 + 2 * 40  # O(N·B), not O(B²)

    # incremental path: hot EXISTING bucket dropped, normal probe survives
    new = docs.filter(F.col("doc_id") == 101)
    existing = docs.filter(F.col("doc_id") != 101)
    inc = cdedup.incremental_near_dup(
        new,
        cdedup.minhash_signatures(existing),
        existing,
        threshold=0.2,
        max_bucket_size=10,
    )
    got = {(r.id_a, r.id_b) for r in inc.collect()}
    assert got == {(101, 100)}


def test_line_dedup_strips_cross_doc_boilerplate(spark):
    rows = [
        (0, "SUBSCRIBE NOW\nunique thought one\nCOPYRIGHT 2024"),
        (1, "SUBSCRIBE NOW\nunique thought two\nCOPYRIGHT 2024"),
        (2, "COPYRIGHT 2024"),  # fully boilerplate -> empty, not dropped
        (3, "entirely original text here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.clean_text, r.n_lines_kept) for r in
           cdedup.line_dedup(docs, min_doc_freq=2, sep="\n").collect()}
    assert out[0] == ("unique thought one", 1)
    assert out[1] == ("unique thought two", 1)
    assert out[2] == ("", 0)
    assert out[3] == ("entirely original text here", 1)
    # order preservation with interleaved boilerplate
    docs2 = spark.createDataFrame(
        [(0, "keep a\nBOILER\nkeep b"), (1, "BOILER")], ["doc_id", "text"]
    )
    out2 = {r.doc_id: r.clean_text for r in
            cdedup.line_dedup(docs2, min_doc_freq=2, sep="\n").collect()}
    assert out2[0] == "keep a\nkeep b"


def test_simhash_hamming(spark, docs):
    sh = cdedup.simhash(docs)
    vals = {r.doc_id: r.simhash for r in sh.collect()}
    assert vals[0] == vals[3]  # identical docs, identical simhash
    pairs = cdedup.simhash_hamming_pairs(sh, max_hamming=3).collect()
    assert any((p.id_a, p.id_b) == (0, 3) and p.hamming == 0 for p in pairs)


@pytest.fixture(scope="module")
def emb(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in base], i % 3))
    # vec 100 = near-identical to vec 0
    first = rows[0][1]
    rows.append((100, [x + 1e-6 for x in first], 0))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")


def test_cosine_topk_finds_near_identical(spark, emb):
    top = csim.cosine_topk(emb, query_id=0, k=3).collect()
    assert top[0].vec_id == 0 and abs(top[0].cos_sim - 1.0) < 1e-9
    assert top[1].vec_id == 100 and top[1].cos_sim > 0.999999


def test_ivf_topk_matches_bruteforce_within_cell(spark, emb):
    ivf = csim.ivf_topk(emb, query_id=0, k=3, dim=8)
    rows = ivf.collect()
    assert rows[0].vec_id == 0
    assert all(r.cell == rows[0].cell for r in rows)


def test_kmeans_cells_deterministic_and_coherent(spark, emb):
    a = {r.vec_id: r.cell for r in csim.kmeans_cells(emb, k=3, iters=3, dim=8).collect()}
    b = {r.vec_id: r.cell for r in csim.kmeans_cells(emb, k=3, iters=3, dim=8).collect()}
    assert a == b  # no RNG anywhere: same data -> same cells
    assert set(a) == {r.vec_id for r in emb.collect()}  # total assignment
    # near-identical vectors must land in the same learned cell
    assert a[0] == a[100]


def test_ivf_index_partition_pruned_probe(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    csim.build_ivf_index(emb, idx)
    qv = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    out = csim.ivf_probe_indexed(spark, idx, [float(x) for x in qv], k=3, probes=1, dim=8)
    rows = out.collect()
    # same results as the in-memory IVF on the same cells
    want = csim.ivf_topk(emb, query_id=0, k=3, dim=8).collect()
    assert [(r.vec_id, r.cell) for r in rows] == [(r.vec_id, r.cell) for r in want]
    # file-level pruning: the cell filter must reach PartitionFilters
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re as _re

    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan


def test_ivf_probe_routes_from_sidecar_not_corpus(spark, emb, tmp_path, monkeypatch):
    """The probe's routing pre-step must be the k-row _centroids sidecar
    written at build time — NOT an O(corpus) centroid recomputation over
    the full index (the sublinearity the partitioned index exists for)."""
    import os

    idx = str(tmp_path / "ivf_sidecar")
    csim.build_ivf_index(emb, idx)
    assert os.path.isdir(os.path.join(idx, "_centroids"))

    def boom(*a, **k):
        raise AssertionError("probe recomputed centroids from the full index")

    monkeypatch.setattr(csim, "centroids_exact", boom)
    qv = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    out = csim.ivf_probe_indexed(spark, idx, [float(x) for x in qv], k=3, probes=1, dim=8)
    assert out.count() == 3


def test_kmeans_index_end_to_end(spark, emb, tmp_path):
    """Learned cells flow into the index: build with kmeans_cells
    assignments, probe, get the near-identical duplicate back."""
    cells = csim.kmeans_cells(emb, k=3, iters=3, dim=8)
    idx = str(tmp_path / "ivf_km")
    csim.build_ivf_index(emb, idx, cells=cells)
    qv = [r.embedding for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    out = csim.ivf_probe_indexed(spark, idx, [float(x) for x in qv], k=2, probes=1, dim=8)
    got = [r.vec_id for r in out.collect()]
    assert got[:2] == [0, 100]


def test_embedding_near_dup_lsh_prefilter_finds_identical(spark, emb):
    exact = {
        (r.id_a, r.id_b)
        for r in csim.embedding_near_dup_pairs(
            emb, threshold=0.999, use_lsh_prefilter=False
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in csim.embedding_near_dup_pairs(
            emb, threshold=0.999, use_lsh_prefilter=True
        ).collect()
    }
    assert (0, 100) in exact
    assert lsh <= exact  # prefilter never invents pairs
    assert (0, 100) in lsh  # ~identical vectors share all hyperplane signs


def test_multimodal_decode_plumbing(spark, docs):
    media = attach_binary_payload(docs, source_col="text", mime="text/plain")
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = decode_images(media, codec="fake")
    rows = decoded.collect()
    assert len(rows) == docs.count()
    r0 = next(r for r in rows if r.doc_id == 0)
    assert r0.byte_len == len("the quick brown fox jumps over the lazy dog")
    assert len(r0.feature) == 4
    # deterministic: identical payloads → identical features
    r3 = next(r for r in rows if r.doc_id == 3)
    assert r0.feature == r3.feature and r0.width == r3.width


def test_multimodal_frame_sampling(spark, docs):
    media = attach_binary_payload(docs, source_col="text", mime="text/plain")
    frames = sample_frames(media, every_n_bytes=10).collect()
    r0 = sorted(
        [f for f in frames if f.doc_id == 0], key=lambda f: f.frame_no
    )
    text = "the quick brown fox jumps over the lazy dog"
    assert len(r0) == (len(text) + 9) // 10
    assert bytes(r0[0].chunk) == text[:10].encode()
    assert r0[1].offset == 10


def test_connected_components_chain_cycle_singleton(spark):
    from modular_etl_data_platform_spark.corpus.dedup import connected_components

    vertices = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2-3, cycle 4-5-6-4, singleton 7
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)],
        "id_a long, id_b long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_connected_components_exhaustion_verifies_before_raising(spark):
    """A component whose diameter consumes the whole round budget must
    still return the correct fixpoint (the exhaustion path verifies with
    one extra propagation round); a genuinely unconverged run raises."""
    from modular_etl_data_platform_spark.corpus.dedup import connected_components

    n = 7  # chain 0-1-...-6: min-label needs 6 rounds to reach vertex 6
    vertices = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            vertices, chain, max_iters=n - 1, check_every=n - 1
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            vertices, chain, max_iters=2, check_every=2
        ).collect()


def test_arrow_cosine_zero_vector_is_null_not_nan(spark):
    """Zero-norm vectors must score NULL under the Arrow scorer (SQL
    divide-by-zero parity) — a NaN would sort FIRST under desc and crown
    a padding vector everyone's rank-1 neighbor."""
    from modular_etl_data_platform_spark.corpus.similarity import (
        _arrow_cosine,
        cosine,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 0.0]), (2, [1.0, 0.0], [3.0, 4.0])],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            _arrow_cosine("a", "b").alias("arrow"),
            cosine("a", "b").alias("sql"),
        ).collect()
    }
    assert rows[1].arrow is None and rows[1].sql is None
    assert abs(rows[2].arrow - 0.6) < 1e-12 and abs(rows[2].sql - 0.6) < 1e-12


def test_incremental_dedup_matches_full_lsh_cross_pairs(spark, docs):
    """incremental_near_dup(new, existing) must find exactly the
    new×existing pairs the full-corpus LSH finds — the persisted-index
    path loses nothing on the cross side."""
    new = docs.filter("doc_id IN (3, 4)")
    existing = docs.filter("doc_id NOT IN (3, 4)")
    existing_sigs = cdedup.minhash_signatures(existing)
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in cdedup.incremental_near_dup(
            new, existing_sigs, existing, threshold=0.4
        ).collect()
    }
    full = {}
    for r in cdedup.minhash_lsh_dedup(docs, threshold=0.4).collect():
        pair = (r.id_a, r.id_b)
        if (r.id_a in (3, 4)) != (r.id_b in (3, 4)):  # cross pairs only
            new_id = r.id_a if r.id_a in (3, 4) else r.id_b
            old_id = r.id_b if r.id_a in (3, 4) else r.id_a
            full[(new_id, old_id)] = r.jaccard
    assert inc == full and (3, 0) in inc  # exact dup of doc 0 found


def test_multimodal_features_feed_similarity_search(spark):
    """Multimodal → ANN loop: stub-extracted payload embeddings plug into
    the similarity operators; identical payloads are exact neighbours."""
    from modular_etl_data_platform_spark.corpus.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(0, "same payload"), (1, "same payload"), (2, "another thing")],
        "doc_id long, text string",
    )
    media = attach_binary_payload(docs, source_col="text", mime="image/png")
    emb = extract_features(media, dim=16)
    pairs = csim.embedding_near_dup_pairs(
        emb, threshold=0.999, id_col="doc_id", use_lsh_prefilter=False
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
    top = csim.cosine_topk(emb, query_id=0, k=2, id_col="doc_id").collect()
    assert [r.doc_id for r in top] == [0, 1]


def test_media_near_dup_finds_identical_payloads(spark):
    """Identical media payloads produce identical feature vectors, share
    every LSH band, and come back as a perceptual near-dup pair; distinct
    payloads at threshold≈1 do not."""
    from modular_etl_data_platform_spark.corpus.multimodal import media_near_dup

    rows = [
        (0, "same-bytes-payload-abcdefgh"),
        (1, "same-bytes-payload-abcdefgh"),  # identical bytes -> dup of 0
        (2, "completely different bytes here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    media = attach_binary_payload(docs, source_col="text", mime="image/png")
    pairs = {(r.id_a, r.id_b): r.cos_sim for r in
             media_near_dup(media, threshold=0.999, dim=16).collect()}
    assert (0, 1) in pairs and abs(pairs[(0, 1)] - 1.0) < 1e-9
    assert all({a, b} == {0, 1} for a, b in pairs)


def test_knn_join_every_vector_ranked(spark, emb):
    """knn_join: the near-identical pair must be each other's rank-1
    neighbor; ranks are contiguous from 1 and capped at k; neighbors are
    never the query itself."""
    out = csim.knn_join(emb, k=3, dim=8).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cos_sim))
    assert by_q[0][0][1] == 100 and by_q[100][0][1] == 0
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        sims = [r[2] for r in rows]
        # rank order must follow similarity order
        assert sims == sorted(sims, reverse=True) or len(set(sims)) < len(sims)


def test_knn_join_arrow_scorer_matches_fold(spark, emb):
    """The Arrow (numpy-batched) production scorer must agree with the
    oracle-parity F.aggregate fold: same candidate set, same neighbor
    sets per query, cosines equal to float tolerance (they differ only
    in summation order)."""
    fold = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in csim.knn_join(emb, k=3, dim=8).collect()
    }
    arrow = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in csim.knn_join(emb, k=3, dim=8, arrow_scorer=True).collect()
    }
    assert set(fold) == set(arrow)
    for key, v in fold.items():
        assert abs(v - arrow[key]) < 1e-9


def test_ivf_append_serves_new_vectors_without_rebuild(spark, emb, tmp_path):
    """ivf_append: vectors appended via sidecar-centroid assignment are
    served by the same partition-pruned probe; untouched cell directories
    keep their original files (no rebuild), and the sidecar is unchanged."""
    import glob as g
    import os

    old = emb.filter(F.col("vec_id") != 100)
    new = emb.filter(F.col("vec_id") == 100)
    idx = str(tmp_path / "ivf_app")
    csim.build_ivf_index(old, idx)
    before = {p: os.path.getmtime(p) for p in g.glob(f"{idx}/cell=*/*.parquet")}
    cents_before = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_centroids").collect())
    )
    csim.ivf_append(spark, idx, new)
    # the near-identical twin of vec 0 must now be retrievable
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    got = [r.vec_id for r in csim.ivf_probe_indexed(spark, idx, qv, k=2, probes=1, dim=8).collect()]
    assert got[:2] == [0, 100]
    # original files untouched (append, not rewrite); sidecar unchanged
    after = {p: os.path.getmtime(p) for p in g.glob(f"{idx}/cell=*/*.parquet")}
    assert before.items() <= after.items()
    assert len(after) > len(before)
    cents_after = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_centroids").collect())
    )
    assert cents_before == cents_after


def test_ivf_batch_probe_prunes_with_dpp(spark, emb, tmp_path):
    """ivf_probe_batch: results match per-query single probes, and the
    index scan carries a dynamic-partition-pruning filter on cell (the
    index is read pruned, never shuffled)."""
    idx = str(tmp_path / "ivf_batch")
    csim.build_ivf_index(emb, idx)
    qs = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = csim.ivf_probe_batch(spark, idx, qs, k=2, probes=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {(r.query_id, r.rank): r.vec_id for r in out.collect()}
    for qid in (0, 7):
        qv = [float(x) for x in emb.filter(F.col("vec_id") == qid).first().embedding]
        single = [
            r.vec_id
            for r in csim.ivf_probe_indexed(spark, idx, qv, k=2, probes=1, dim=8).collect()
        ]
        assert [got[(qid, 1)], got[(qid, 2)]] == single


def test_embedding_near_dup_bucket_cap_drops_flooded_buckets(spark):
    """max_bucket_size must drop over-cap band buckets BEFORE the
    self-join: an exact-dup flood (many copies of one vector) generates
    zero pairs under a cap smaller than the flood, while distinct
    near-dup pairs in small buckets survive."""
    import pyspark.sql.functions as F

    # flood = anti-aligned with plane 0 (bit 0 clear), pair = plane 0's
    # own weights (bit 0 set): their band-0 keys provably differ, so the
    # pair keeps one small bucket regardless of the other planes' signs
    w0 = [float(w) for w in csim._plane_weights(0, 8)]
    rows = [(i, [-w for w in w0]) for i in range(20)]  # 20 identical vectors
    rows += [(100, w0), (101, w0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = csim.embedding_near_dup_pairs(
        emb, threshold=0.99, bands=4, planes=16, dim=8, parallelism=2
    )
    capped = csim.embedding_near_dup_pairs(
        emb, threshold=0.99, bands=4, planes=16, dim=8, parallelism=2,
        max_bucket_size=10,
    )
    got_uncapped = {(r.id_a, r.id_b) for r in uncapped.collect()}
    got_capped = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got_uncapped and len(got_uncapped) > 100
    # the 20-copy flood exceeds the cap in every band -> only the small
    # bucket's pair survives
    assert got_capped == {(100, 101)}


def test_ann_recall_at_k_bounds_and_perfect_probe(spark, emb, tmp_path):
    """recall == 1.0 when the probed cell contains the true neighbors;
    in [0,1] always; every query emits exactly one row even when the
    probe finds nothing from the exact set."""
    idx = str(tmp_path / "ivf_recall")
    csim.build_ivf_index(emb, idx)
    queries = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r.query_id: r for r in csim.ann_recall_at_k(
        spark, idx, emb, queries, k=2, probes=1
    ).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert 0.0 <= r.recall <= 1.0 and r.n_found == round(r.recall * 2)
    # vec 0's top-2 is {0, 100}, both in label cell 0 -> perfect recall
    assert out[0].recall == 1.0


def test_semdedup_drops_higher_id_near_duplicates(spark, emb):
    """SemDeDup on pre-labeled cells: vec 100 (near-identical to vec 0,
    same label) is dropped and vec 0 kept (lowest id of the duplicate
    group survives); drops never cross cells."""
    marked = {r.vec_id: (r.cell, r.is_dup) for r in
              csim.semdedup(emb, threshold=0.999, cell_col="label").collect()}
    assert marked[100][1] is True and marked[0][1] is False
    assert sum(1 for _, d in marked.values() if d) == 1  # only the planted dup
    # cross-cell twin: same vector, DIFFERENT label must survive
    import pyspark.sql.functions as F

    twin = emb.unionByName(
        emb.filter("vec_id = 0").select(
            F.lit(200).alias("vec_id"), "embedding", F.lit(99).alias("label")
        )
    )
    m2 = {r.vec_id: r.is_dup for r in
          csim.semdedup(twin, threshold=0.999, cell_col="label").collect()}
    assert m2[200] is False  # never compared across cells


def test_semdedup_learned_cells_and_hub_cap(spark, emb):
    """The kmeans path: near-identical vectors land in one learned cell
    and the higher id is dropped. The hub guard: with max_cell_size
    below every cell's size, NO pairs are generated — every item kept
    (conservative, mirrors the MinHash bucket cap contract)."""
    marked = {r.vec_id: r.is_dup for r in
              csim.semdedup(emb, threshold=0.999, k=3, iters=3, dim=8).collect()}
    assert marked[100] is True and marked[0] is False
    capped = csim.semdedup(
        emb, threshold=0.0, cell_col="label", max_cell_size=1
    )
    assert capped.filter("is_dup").count() == 0
    assert capped.count() == emb.count()  # capped cells keep all items


def test_prototype_prune_drops_nearest_to_centroid_per_cell(spark, emb):
    """SSL-prototype pruning: per cell, exactly floor(frac * n) items
    are pruned, the pruned ones are the HIGHEST-cosine-to-centroid
    (most prototypical), and a zero-norm vector is never pruned."""
    import pyspark.sql.functions as F

    with_zero = emb.unionByName(
        spark.createDataFrame(
            [(300, [0.0] * 8, 0)],
            "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
        )
    )
    marked = csim.prototype_prune(
        with_zero, frac=0.3, cell_col="label", dim=8
    )
    rows = marked.collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    assert set(by_cell) == {0, 1, 2}
    for cell, items in by_cell.items():
        assert sum(r.is_pruned for r in items) == int(len(items) * 0.3)
    zero = next(r for r in rows if r.vec_id == 300)
    assert zero.is_pruned is False  # -inf prototypicality survives
    # the pruned set is exactly the top-scoring prefix: recompute scores
    cents = csim.centroids_exact(
        with_zero.withColumnRenamed("label", "cell"), "cell", "embedding", 8
    )
    scored = (
        with_zero.join(
            F.broadcast(cents), with_zero.label == cents.cell
        )
        .select(
            "vec_id",
            "label",
            csim.cosine("embedding", "centroid").alias("s"),
        )
        .collect()
    )
    score = {r.vec_id: (r.s if r.s is not None else float("-inf")) for r in scored}
    for cell, items in by_cell.items():
        ordered = sorted(
            items, key=lambda r: (-score[r.vec_id], r.vec_id)
        )
        cut = int(len(items) * 0.3)
        assert all(r.is_pruned for r in ordered[:cut])
        assert not any(r.is_pruned for r in ordered[cut:])


def test_prototype_prune_learned_cells(spark, emb):
    """The kmeans quantizer path: the planted near-duplicate pair (0,
    100) is the densest neighborhood, so at a small prune fraction at
    least one of the two prototypical twins goes — and totals hold."""
    marked = csim.prototype_prune(emb, frac=0.25, k=3, iters=3, dim=8)
    rows = marked.collect()
    assert len(rows) == emb.count()
    assert 0 < sum(r.is_pruned for r in rows) < len(rows)


def test_pq_encode_compresses_and_adc_ranks_near_duplicates(spark, emb):
    """PQ over the 8-dim fixture (m=2 subspaces of 4): every vector gets
    one code per subspace, the codebook vectors encode to THEMSELVES
    (L2 = 0), and ADC top-k puts the planted near-duplicate of vec 0 in
    the top ranks — the compressed scoring preserves the neighborhood
    the raw cosine finds."""
    cb = csim.pq_codebook_sampled(emb, m=2, codes=8, dim=8)
    assert cb.count() == 16  # 2 subspaces x 8 codes
    enc = csim.pq_encode(emb, cb, m=2, dim=8)
    assert enc.count() == emb.count() * 2
    own = {
        (r.vec_id, r.sub): r.code
        for r in enc.filter("vec_id < 8").collect()
    }
    for (vid, _sub), code in own.items():
        assert code == vid  # a sampled code is its own nearest code
    top = csim.pq_topk(emb, query_id=0, k=5, m=2, codes=8, dim=8).collect()
    ids = [r.vec_id for r in top]
    assert 0 in ids and 100 in ids  # query + its near-identical twin
    adcs = [r.adc for r in top]
    assert adcs == sorted(adcs, reverse=True)


def test_pq_kmeans_codebook_trains_and_scores(spark, emb):
    """The trained-codebook path (Lloyd's per subspace): same shape as
    the sampled codebook, encodes the whole corpus, and ADC with it
    still surfaces the planted near-duplicate pair together."""
    cb = csim.pq_codebook_kmeans(emb, m=2, codes=4, iters=2, dim=8)
    rows = cb.collect()
    assert {r.sub for r in rows} == {0, 1}
    assert all(len(r.cvec) == 4 for r in rows)
    # the near-identical pair is indistinguishable at this coarseness:
    # identical codes per subspace, hence identical ADC (the twin ranks
    # directly behind the lower ids sharing its codes — correct PQ
    # semantics, ties are an id-ordered artifact of quantization)
    enc = csim.pq_encode(emb, cb, m=2, dim=8)
    codes_of = {
        (r.vec_id, r.sub): r.code
        for r in enc.filter("vec_id IN (0, 100)").collect()
    }
    assert codes_of[(0, 0)] == codes_of[(100, 0)]
    assert codes_of[(0, 1)] == codes_of[(100, 1)]
    top = csim.pq_topk(
        emb, query_id=0, k=5, m=2, dim=8, codebook=cb
    ).collect()
    assert top[0].vec_id == 0  # ties break on id; the query leads
    adc = {r.vec_id: r.adc for r in csim.pq_topk(
        emb, query_id=0, k=emb.count(), m=2, dim=8, codebook=cb
    ).collect()}
    assert adc[100] == adc[0]  # same codes -> identical ADC score


def test_ivf_pq_routes_then_scores_within_cell_only(spark, emb):
    """IVF-PQ: every scored candidate comes from the query's routed
    cell, and the twin pair (0, 100) — same cell, near-identical —
    both survive the coarse filter and rank together."""
    out = csim.ivf_pq_topk(
        emb, query_id=0, k=50, probes=1, m=2, codes=8, dim=8
    ).collect()
    ids = {r.vec_id for r in out}
    cells = {r[1] for r in emb.select("vec_id", "label").collect() if r[0] in ids}
    assert cells == {0}  # query 0's label cell only
    assert 0 in ids and 100 in ids
    # probes=3 widens the pool to every cell in the fixture
    wide = csim.ivf_pq_topk(
        emb, query_id=0, k=100, probes=3, m=2, codes=8, dim=8
    ).collect()
    assert len(wide) == emb.count()


def test_ivf_pq_with_shortlist_matches_separate_calls(spark, emb):
    """The with_shortlist fast path (one routing + encode + ADC pass
    feeding both rankings) is value-identical to the two separate
    calls it replaces: the shortlist's first k rows by (adc desc, id)
    ARE plain ivf_pq_topk(k)'s rows, and the re-ranked frame matches
    the plain rerank call row-for-row."""
    rr, sl = csim.ivf_pq_topk(
        emb, query_id=0, k=5, probes=1, m=2, codes=8, dim=8,
        rerank=3, with_shortlist=True,
    )
    plain_adc = csim.ivf_pq_topk(
        emb, query_id=0, k=5, probes=1, m=2, codes=8, dim=8
    ).collect()
    sl_top = (
        sl.orderBy(F.col("adc").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    )
    assert [(r.vec_id, r.adc) for r in sl_top] == [
        (r.vec_id, r.adc) for r in plain_adc
    ]
    plain_rr = csim.ivf_pq_topk(
        emb, query_id=0, k=5, probes=1, m=2, codes=8, dim=8, rerank=3
    ).collect()
    assert [(r.vec_id, r.adc, r.exact_sim) for r in rr.collect()] == [
        (r.vec_id, r.adc, r.exact_sim) for r in plain_rr
    ]
    # shortlist size is k*rerank (enough candidates reach the re-rank)
    assert sl.count() == 15
    with pytest.raises(ValueError, match="with_shortlist"):
        csim.ivf_pq_topk(
            emb, query_id=0, k=5, m=2, codes=8, dim=8, with_shortlist=True
        )


def test_repetition_signals_flag_looping_docs(spark):
    """Gopher repetition rules: a 2-gram loop trips the top-2gram
    ceiling, a repeated 5-gram phrase trips the dup-5gram ceiling, a
    non-repetitive doc passes everything, and a doc shorter than every
    n yields all-zero signals (strict grams — no partials)."""
    from modular_etl_data_platform_spark.corpus import rules as crules

    loop2 = " ".join(["la la"] * 20)                      # one dominant 2-gram
    phrase = "the quick brown fox jumps"
    dup5 = " ".join([phrase] * 4 + ["completely unrelated tail words here"])
    # long enough that one 2-gram's chars are a small fraction (the
    # formula correctly flags SHORT docs as top-heavy — any single
    # 2-gram of a 10-word doc covers >20% of its characters)
    clean = " ".join(f"word{i:02d}" for i in range(60))
    docs = spark.createDataFrame(
        [(0, loop2), (1, dup5), (2, clean), (3, "solo")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in crules.repetition_signals(docs).collect()}
    assert out[0].top_2gram_frac > 0.20 and out[0].rule_top_2gram is False
    assert out[0].passes is False
    assert out[1].dup_5gram_frac > 0.15 and out[1].rule_dup_5gram is False
    assert out[2].passes is True
    assert out[2].dup_5gram_frac == 0.0  # nothing duplicated
    assert out[3].top_2gram_frac == 0.0  # shorter than every n
    assert out[3].passes is True
    # the fraction definition: count x gram chars / doc chars, capped
    assert 0.0 <= out[0].top_2gram_frac <= 1.0


def test_lexical_signals_entropy_and_ttr(spark):
    """Entropy/TTR semantics: a uniform-unique doc hits max entropy
    (ln n) and TTR 1; a single repeated word scores 0 on both counts
    (entropy 0, TTR -> 0); a one-word doc is entropy 0, TTR 1."""
    import math

    from modular_etl_data_platform_spark.corpus import text as ctext

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),          # 4 unique words
            (1, "x x x x x x x x"),  # one word repeated
            (2, "solo"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ctext.lexical_signals(docs).collect()}
    assert out[0].n_tokens == 4 and out[0].n_types == 4
    assert out[0].ttr == 1.0
    assert abs(out[0].entropy - math.log(4)) < 1e-6
    assert out[1].n_types == 1 and out[1].entropy == 0.0
    assert out[1].ttr == 0.125
    assert out[2].n_tokens == 1 and out[2].entropy == 0.0 and out[2].ttr == 1.0
