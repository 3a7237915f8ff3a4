"""Empirical scale probe: replicate the sf0.1 corpus Nx in a scratch dir
and measure how the corpus-heavy operators scale with input size.

The small-SF tests prove correctness; this probes the SHAPE claims in
SCALE.md — an operator whose runtime grows super-linearly with input
size has a hidden all-pairs/quadratic stage that 100 TB would amplify.
Replicas perturb each document with a per-replica token so replicated
docs are near- (not exact-) duplicates: LSH buckets fill with
cross-replica candidates and CC clusters deepen — deliberately
adversarial for the dedup family. Embeddings replicate exactly (worst
case for k-NN bucket density).

The verdict compares TWO SCALED sizes (Nx vs 2Nx), not 1x vs Nx: at
sf0.1 the 1x runtime is dominated by fixed planning/driver overhead, so
a 1x-denominator ratio reads OK for genuinely super-linear operators
(inflated denominator) and SUPERLINEAR for linear ones when t1x is tiny.
Doubling from an already-scaled base cancels the constant term: linear
work doubles (ratio ≈ 2), a quadratic stage quadruples (ratio ≈ 4); the
threshold sits at 3. The 1x time is still printed as context.

Usage: python tools/scale_probe.py [N] [query ...]   (default N=4,
probes Nx and 2Nx). Writes scratch under /tmp, prints one line per query
with the three runtimes and the 2Nx/Nx ratio.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q17_text_stats",
    "q22_minhash_lsh_pairs",
    "q49_dedup_clusters",
    "q50_decontamination",
    "q60_incremental_dedup",
    "q63_line_dedup",
    "q76_semantic_dedup",
    "q99_knn_join",
    "q101_dedup_clusters_star",
    "q119_repeated_ngram_spans",
    "q120_ngram_dedup_clean",
    "q122_incremental_ngram_dedup",
    "q127_merge_incident_windows",
    "q128_interval_join_attribution",
    "q129_zorder_write_prune",
    "q130_deterministic_shuffle",
    "q131_outside_incident_windows",
    # round-9 additions: prototype pruning (centroid agg + window),
    # PQ encode+ADC, the IVF-PQ composition, and the repetition rules
    # (the (doc, n, gram) count is the only shuffle)
    "q158_prototype_pruning",
    "q159_pq_adc_topk",
    "q160_ivf_pq_topk",
    "q161_repetition_rules",
    # round-10: the exact re-rank adds a k·α-row shortlist-bounded
    # vector fetch on top of q160 — the doubling ratio must stay in
    # q160's class (the shortlist is constant-size, so the re-rank
    # join contributes O(1) regardless of corpus size)
    "q164_ivf_pq_rerank",
    # round-10: the fused quality suite — one explode over all six
    # gram families; the (doc, n, gram) count is the only data-sized
    # shuffle, so the doubling ratio must stay in q161's class
    "q165_quality_suite",
    # round-10 session 3: the NB classifier featurizes once and
    # broadcasts a fixed 4096-row model — both training aggregation and
    # scoring fold are linear in corpus tokens, so the doubling ratio
    # must stay ~2 (the model/broadcast is constant-size by design)
    "q167_quality_classifier",
    # round-11: the composed one-pass curation flagship — every stage
    # is linear over the surviving docs (quality explode, NB fold,
    # blocked near-dup pairs, language-row windows, packing windows),
    # so the doubling ratio must stay ~2 with the fixed per-stage job
    # overhead amortizing AWAY as the corpus grows (sub-2 expected)
    "q171_curation_pipeline",
]

BASE = "/root/testdata/sf0.1"


def build_scaled(spark, n: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    OFF = 10_000_000
    scaled_docs = None
    scaled_emb = None
    for i in range(n):
        d = docs.select(
            (F.col("doc_id") + F.lit(i * OFF)).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
        )
        e = emb.select(
            (F.col("vec_id") + F.lit(i * OFF)).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        scaled_docs = d if scaled_docs is None else scaled_docs.unionByName(d)
        scaled_emb = e if scaled_emb is None else scaled_emb.unionByName(e)
    scaled_docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    scaled_emb.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    # events (interval family, q127/q128): replicas keep their original
    # timestamps — deliberately adversarial for the interval ops, since
    # the pre-merge trigger-window count grows with N while the merged
    # windows stay span-bounded, so the probe measures the join side.
    # orders (z-order family, q129): keys offset per replica.
    from modular_etl_data_platform_spark.queries.catalog import _t

    events = _t(spark, BASE, "events")
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    scaled_ev, scaled_ord = None, None
    for i in range(n):
        ev = events.select(
            (F.col("event_id") + F.lit(i * OFF)).alias("event_id"),
            (F.col("user_id") + F.lit(i * OFF)).alias("user_id"),
            *[c for c in events.columns if c not in ("event_id", "user_id")],
        )
        od = orders.select(
            (F.col("o_orderkey") + F.lit(i * OFF)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(i * OFF)).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        scaled_ev = ev if scaled_ev is None else scaled_ev.unionByName(ev)
        scaled_ord = od if scaled_ord is None else scaled_ord.unionByName(od)
    scaled_ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    scaled_ord.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = sys.argv[2:] or DEFAULT_QUERIES

    from modular_etl_data_platform_spark.session import get_spark
    from modular_etl_data_platform_spark.queries.catalog import QUERIES

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    scratches = {}
    for factor in (n, 2 * n):
        scratch = os.path.join(tempfile.gettempdir(), f"sfscale_x{factor}")
        if os.path.exists(scratch):
            shutil.rmtree(scratch)
        os.makedirs(scratch)
        t0 = time.time()
        build_scaled(spark, factor, scratch)
        print(f"built {factor}x corpus in {time.time() - t0:.1f}s at {scratch}")
        scratches[factor] = scratch

    # warm codegen on the smallest available sf so first-compile latency
    # doesn't pollute the measurements
    warm = "/root/testdata/sf0.001"
    QUERIES["q22_minhash_lsh_pairs"](
        spark, warm if os.path.isdir(warm) else BASE
    ).collect()

    for name in only:
        fn = QUERIES[name]
        t0 = time.time()
        n1 = fn(spark, BASE).count()
        t1x = time.time() - t0
        t0 = time.time()
        rows_n = fn(spark, scratches[n]).count()
        tn = time.time() - t0
        t0 = time.time()
        rows_2n = fn(spark, scratches[2 * n]).count()
        t2n = time.time() - t0
        # doubling an already-scaled input cancels fixed overhead: linear
        # ≈ 2, quadratic ≈ 4; 3 splits them
        ratio = t2n / tn if tn > 0 else float("inf")
        verdict = "OK" if ratio <= 3.0 else "SUPERLINEAR"
        print(
            f"{name}: 1x {t1x:.2f}s ({n1} rows) | {n}x {tn:.2f}s ({rows_n} rows) "
            f"| {2 * n}x {t2n:.2f}s ({rows_2n} rows) "
            f"| doubling ratio {ratio:.2f} -> {verdict}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
