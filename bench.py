"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "runs": N, "round_totals": [...], "loadavg_start": [...], "loadavg_end": [...]}

Each query is executed to completion (collect) so the measured time covers
scan + shuffle + aggregation, not just plan construction.

Measurement process (round-8): the whole headline set runs
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and each query reports its
MEDIAN — a single pass on a shared machine is one bad GC pause or one
concurrent pytest away from a 2-3x phantom regression (round 7's
artifact recorded 110s where a clean rerun measured 53s). The host's
loadavg at start and end rides in the JSON so a contaminated run is
self-identifying instead of silently becoming the round's perf record.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_star_join_revenue",
    "q05_dedup_latest",
    "q06_window_topn_per_customer",
    "q10_scd2_versions",
    "q11_asof_join",
    "q13_uniqueness_audit",
    "q16_set_ops",
    "q22_minhash_lsh_pairs",
    "q28_fact_pit_load",
    "q42_sessionization",
    "q47_tfidf_top_terms",
    "q49_dedup_clusters",
    "q50_decontamination",
    "q55_skewed_distinct_count",
    "q60_incremental_dedup",
    "q99_knn_join",
    # heavy streaming/state/multimodal/rollup paths: correctness-proven in
    # round 5 — timed here so a wall-time regression in a real
    # writeStream run, stateful sessionizer, Arrow decode pipeline, or
    # incremental rollup maintenance is visible round-over-round.
    # (The warmup section pre-runs the stateful sessionizer at sf0.001 so
    # these measure the operator, not streaming-engine/Python-worker
    # cold-start.)
    "q100_stream_sessions",
    "q113_stream_cdc_state",
    "q115_multimodal_pipeline",
    "q116_incremental_rollup",
    # round-6 operator families: substring dedup (batch + incremental)
    # and the ANN recall evaluation pass
    "q120_ngram_dedup_clean",
    "q122_incremental_ngram_dedup",
    "q124_ann_recall",
    # round-6 late additions: binned interval join (range join without
    # an equi key) and the Morton-curve z-ordered write+pruned-read
    "q128_interval_join_attribution",
    "q129_zorder_write_prune",
    # round-7 storage layer: file-pruned versioned MERGE (commit cost
    # O(batch) + stats carry-forward) and the medallion silver path on
    # versioned storage — wall-time regressions in the manifest/commit
    # machinery show up here round-over-round
    "q132_pruned_upsert",
    "q135_versioned_silver_medallion",
    # round-8 storage layer: the checkpointed commit log (delta commits
    # + checkpoint replay + pointer-based head resolution) and the
    # watermark-file-pruned versioned silver pass — wall-time
    # regressions in log resolution or pruning show up here
    "q139_versioned_incremental_silver",
    "q141_checkpointed_log_time_travel",
    # round-8 late additions: merge-on-read DELETE via deletion vectors
    # (sidecar write + anti-join read + CDF over a dv-only commit) and
    # the DV-backed MERGE (no-rewrite upsert: PK-column scan + batch)
    "q145_deletion_vectors",
    "q146_dv_merge",
    # SemDeDup: within-cluster pairwise cosine (the cluster bound is
    # what keeps the pass off the n^2 cliff — worth timing per round)
    "q147_semdedup",
    # DSIR: full-corpus hashed-ngram featurization (linear by design;
    # a regression here means the explode/groupBy path fattened)
    "q148_dsir_selection",
    # round-8 DML surface: predicate UPDATE both strategies (phase-1
    # predicate-column scan + rewrite vs DV sidecar + image landing)
    # and replaceWhere (one-file rewrite under the prune hint) — the
    # write-amplification contracts these exist for are what's timed
    "q149_update_where",
    "q150_replace_where",
    # round-8 session-3: bloom-index point lookup (sidecar build cost +
    # probe-time log resolution are what's timed) and the full MERGE
    # clause surface (one full-outer-join pass for five clauses)
    "q152_bloom_point_lookup",
    "q153_merge_clauses",
    # generated columns: write-side compute+validate and the
    # UPDATE-recompute path (Observation-riding checks are what's timed)
    "q155_generated_columns",
    # clustered-table maintenance: the declared-layout compact + the
    # multi-column pruned read over the maintained table
    "q156_clustered_table_maintenance",
    # round-9: the format-API read path (pushdown planning + bloom
    # probing through the public spark.read reader), SSL-prototype
    # pruning over embeddings, and PQ/ADC approximate top-k — wall-time
    # regressions in the Python-data-source planner or the
    # centroid/codebook passes show up here round-over-round
    "q157_format_api_versioned_read",
    "q158_prototype_pruning",
    "q159_pq_adc_topk",
    "q160_ivf_pq_topk",
    # round-9 late additions: the n-gram repetition rules (one explode
    # + one count shuffle over every n) and the entropy/TTR diagnostics
    "q161_repetition_rules",
    "q162_lexical_diversity",
    # round-10: the streaming row-level change feed (real writeStream
    # drain of a six-version DML history), IVF-PQ with the exact
    # re-rank stage, and the FUSED quality suite — whose time should
    # undercut the q67+q161+q162 sum it replaces (one read, one
    # explode, two exchanges)
    "q163_stream_change_feed",
    "q164_ivf_pq_rerank",
    "q165_quality_suite",
    # round-10 session 3: the NB quality classifier (featurize-once +
    # 4096-row broadcast model — the scoring join and per-doc decimal
    # fold are what's timed) and the UniMax allocation (the per-language
    # token count is the only corpus-sized work)
    "q167_quality_classifier",
    "q168_unimax_mixture",
    # round-11: the PK-hash-sharded change-feed classification (a giant
    # MERGE fanning out across bounded-memory diff tasks), the mirror's
    # real Delta CDF round trip (CDC write + code-disjoint foreign
    # read), and the one-pass curation flagship (quality suite -> NB
    # filter -> dedup representatives -> UniMax -> packing over ONE
    # cached corpus read — the composition cost is what's timed)
    "q169_sharded_change_feed",
    "q170_mirror_change_feed",
    "q171_curation_pipeline",
    # the row-group-split format read (one big DV-carrying file across
    # many bounded tasks — the planner + per-shard DV offset cost)
    "q172_split_file_read",
    # round 12: write-time CDC (a giant MERGE's feed served from
    # recorded _change_data files — the DML's combined data+CDC landing
    # plus a zero-re-read stream drain is what's timed) and the
    # STREAMING curation flagship (the q171 composition as five real
    # foreachBatch drains: NB broadcast filter, cross-batch dedup,
    # per-batch UniMax + packing, txn-idempotent versions)
    "q173_recorded_cdc",
    "q174_streaming_curation",
    # round 13: the dedup-state scale fix and the full-parity streaming
    # twin — q175 times the bucketed-fingerprint-index path (probe must
    # stay batch-proportional: three drains + a file-pruned probe whose
    # opened-file count is asserted in-query), q176 the complete
    # composition (near-dup signature index with stored-shingle
    # verification, broadcast decontamination) over three drains; both
    # stream-machinery-bound, so wall time here tracks the foreachBatch
    # + commit protocol cost, not data volume
    "q175_streaming_fp_index",
    "q176_streaming_curation_full",
    # the batch twin of the index family: q60's continuous-crawl dedup
    # with the band-key store persisted + file-pruned (3 epoch appends
    # + the probe; wall time tracks the commit/probe machinery)
    "q177_indexed_incremental_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from modular_etl_data_platform_spark.session import get_spark
    from modular_etl_data_platform_spark.queries.catalog import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with the flagship, and the corpus
    # codegen path (md5 + higher-order lambdas compile once per session)
    # with the LSH query at the SMALLEST sf — steady-state timings, not
    # first-compile latency, are what scale to a long-lived cluster
    QUERIES["q01_pricing_summary"](spark, sf_dir).collect()
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    QUERIES["q22_minhash_lsh_pairs"](
        spark, warm_sf if os.path.isdir(warm_sf) else sf_dir
    ).collect()
    # warm the streaming engine + the Arrow/pandas Python-worker pool at
    # the smallest sf: the first stateful streaming query otherwise pays
    # ~10s of engine init + 32 worker cold-starts that have nothing to do
    # with the measured operator
    QUERIES["q100_stream_sessions"](
        spark, warm_sf if os.path.isdir(warm_sf) else sf_dir
    ).collect()

    # one UNTIMED pass over the whole headline first: per-query codegen
    # compiles once per plan shape per session, and a cold first pass
    # otherwise drags every median up ~20% (observed round totals
    # 120/102/85s — run 1 measures compilation, not the operators).
    # Steady-state is the number that scales to a long-lived cluster.
    if os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0":
        for name in HEADLINE:
            spark.catalog.clearCache()
            QUERIES[name](spark, sf_dir).collect()

    # clean-by-construction gate (round-9): rounds 7 and 8 both recorded
    # artifacts under sustained external load (phantom 2-3x regressions a
    # judge-clean rerun erased). Instead of merely self-identifying via
    # loadavg, WAIT — bounded attempts — for the 1-minute loadavg to drop
    # below the threshold before starting the timed rounds; if the
    # machine never idles, say so explicitly in the artifact.
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_GATE", "1.0"))
    gate_tries = int(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_TRIES", "6"))
    gate_sleep = float(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_SLEEP", "30"))
    waited = 0
    while os.getloadavg()[0] >= gate and waited < gate_tries:
        waited += 1
        print(
            f"loadavg {os.getloadavg()[0]:.2f} >= {gate}, waiting "
            f"{gate_sleep:.0f}s ({waited}/{gate_tries})",
            file=sys.stderr,
        )
        time.sleep(gate_sleep)
    machine_never_idle = os.getloadavg()[0] >= gate

    load_start = os.getloadavg()
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    round_totals: list[float] = []
    for _ in range(runs):
        total = 0.0
        for name in HEADLINE:
            # clean slate per query: cached frames from a previous query
            # (signature/shingle caches, streaming memory sinks) otherwise
            # pile up across the session, and by the ~20th query GC
            # pressure inflates measurements 2-3x — the timing then
            # reflects the session's history, not the query
            spark.catalog.clearCache()
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.collect()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            total += dt
        round_totals.append(round(total, 3))
    timings = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs": runs,
                "round_totals": round_totals,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "loadavg_gate": gate,
                "loadavg_waits": waited,
                "machine_never_idle": machine_never_idle,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
