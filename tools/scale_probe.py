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


def cdf_probe() -> None:
    """The change-feed I/O model, measured: vary a MERGE's diff size at
    FIXED ``diff_partition_bytes`` and report, per diff size,

    - the DERIVED path's planned shard count and its total-read model
      ``nshards x changed_bytes`` (every shard re-reads every changed
      file and keeps its 1/nshards hash slice) — the round-11 verdict's
      changed²/target curve, visible as model bytes growing with the
      SQUARE of the diff;
    - the RECORDED path's (write-time CDC) total-read: the cdc files'
      bytes, read once — linear in the diff by construction;
    - wall time for draining each path through the reader's own
      partitions()/read() protocol (same code a trigger runs).

    Usage: python tools/scale_probe.py cdf [target_bytes]
    (default target 256 KiB so the fan-out engages at sf0.1 sizes).
    """
    import json as _json

    import pyarrow  # noqa: F401  (executor-side read path)

    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        _commit_name,
    )
    from modular_etl_data_platform_spark.queries.catalog import QUERIES  # noqa: F401
    from modular_etl_data_platform_spark.session import get_spark
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        _VersionedChangeFeedStreamReader,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    target = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 18
    spark = get_spark("cdf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("s"),
        F.col("o_totalprice").alias("p"),
    )
    # RANGE-clustered diffs (k below a moving cutoff): the base lands as
    # 16 key-ordered files, so the MERGE's stats prune rewrites only the
    # intersecting prefix — changed bytes then actually GROW with the
    # diff, which is what makes the two curves distinguishable
    kmin, kmax = orders.agg(F.min("k"), F.max("k")).first()

    def drain(reader, v):
        t0 = time.time()
        parts = reader.partitions({"version": v - 1}, {"version": v})
        rows = 0
        for p in parts:
            for b in reader.read(p):
                rows += b.num_rows
        return len(parts), rows, time.time() - t0

    print(
        f"# diff_partition_bytes={target}; derived model bytes = "
        "nshards x changed (each shard re-reads all changed files)"
    )
    for pct in (5, 10, 20, 40, 80):
        for recorded in (False, True):
            scratch = os.path.join(
                tempfile.gettempdir(),
                f"cdfprobe_{pct}_{'rec' if recorded else 'der'}",
            )
            if os.path.exists(scratch):
                shutil.rmtree(scratch)
            vt = VersionedTable(spark, scratch, stats_columns=["k"])
            vt.write(orders.repartitionByRange(16, "k").sortWithinPartitions("k"))
            if recorded:
                vt.enable_change_data_feed(["k"])
            cutoff = kmin + (kmax - kmin) * pct // 100
            src = orders.filter(F.col("k") <= cutoff).withColumn(
                "p", F.col("p") + F.lit(1)
            )
            v = vt.merge(src, ["k"])
            rec = _json.loads(vt.log.store.read(_commit_name(v)))
            prev_m, cur_m = vt.log.resolve(v - 1), vt.log.resolve(v)
            old_set, new_set = set(prev_m["files"]), set(cur_m["files"])
            changed = sum(
                sz
                for f, sz in {**prev_m["sizes"], **cur_m["sizes"]}.items()
                if (f in old_set) != (f in new_set)
            )
            schema = StructType(
                list(vt.read().schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
            rd = _VersionedChangeFeedStreamReader(
                scratch, schema, 0, ["k"], diff_partition_bytes=target
            )
            nparts, rows, secs = drain(rd, v)
            if recorded:
                total_read = sum(e["size"] for e in rec.get("cdc", []))
                model = f"recorded: read {total_read:>12,} B once"
            else:
                nshards = max(1, -(-changed // target))
                total_read = nshards * changed
                model = (
                    f"derived:  read {total_read:>12,} B "
                    f"({nshards} shards x {changed:,} changed)"
                )
            print(
                f"diff {pct:>2}%  {model}  parts={nparts:<4} "
                f"rows={rows:<8} drain {secs:6.2f}s"
            )
    spark.stop()


def cdc_files_probe() -> None:
    """Recorded-CDC file-count hygiene under a MANY-SMALL-DML workload
    (the round-12 verdict's advisory #3, measured): one CDC-enabled
    table takes N tiny update-class commits (alternating small upserts
    and predicate updates, each touching a handful of rows) and the
    probe reports, every 10 commits,

    - `_change_data` files + bytes of RETAINED history (from the commit
      records — what a feed replay can be asked to read),
    - the same from a disk walk (orphans would diverge),
    - average cdc file size (the tiny-file signature),
    - wall time to drain the FULL recorded feed through the reader's
      partitions()/read() protocol (does a long small-DML history slow
      the feed linearly in commits, as the model says, or worse?).

    Then a checkpoint + vacuum(0) truncates history and the probe
    reports what survives — retention is the only reclaim path for cdc
    files, so the before/after numbers bound the steady-state cost.

    Usage: python tools/scale_probe.py cdcfiles [n_commits]
    """
    import json as _json

    import pyarrow  # noqa: F401

    from modular_etl_data_platform_spark.operators.versioned import (
        VersionedTable,
        _commit_name,
    )
    from modular_etl_data_platform_spark.session import get_spark
    from modular_etl_data_platform_spark.streaming.versioned_source import (
        _VersionedChangeFeedStreamReader,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("cdc-files-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = os.path.join(tempfile.gettempdir(), "cdcfiles_probe")
    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
    )
    vt = VersionedTable(spark, scratch, stats_columns=["k"])
    vt.write(orders.repartitionByRange(8, "k").sortWithinPartitions("k"))
    vt.enable_change_data_feed(["k"])
    base_v = vt.current_version()
    kmin = orders.agg(F.min("k")).first()[0]

    def recorded_cdc(lo: int, hi: int):
        files = bytes_ = 0
        for v in range(lo, hi + 1):
            for e in _json.loads(vt.log.store.read(_commit_name(v))).get(
                "cdc", []
            ):
                files += 1
                bytes_ += e["size"]
        return files, bytes_

    def disk_cdc():
        files = bytes_ = 0
        root = os.path.join(scratch, "_change_data")
        for dirpath, _dirs, names in os.walk(root):
            for nm in names:
                files += 1
                bytes_ += os.path.getsize(os.path.join(dirpath, nm))
        return files, bytes_

    def drain_secs():
        schema = StructType(
            list(vt.read().schema.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
                StructField("_commit_timestamp", TimestampType()),
            ]
        )
        rd = _VersionedChangeFeedStreamReader(scratch, schema, 0, ["k"])
        t0 = time.time()
        parts = rd.partitions(
            {"version": base_v}, {"version": vt.current_version()}
        )
        rows = 0
        for p in parts:
            for b in rd.read(p):
                rows += b.num_rows
        return len(parts), rows, time.time() - t0

    print(
        "# many-small-DML cdc hygiene: 8-row upserts / 1-key updates on "
        f"a CDC-enabled table (base {base_v} versions)"
    )
    for i in range(n_commits):
        if i % 2 == 0:
            batch = spark.createDataFrame(
                [(int(kmin + 4 * i + j), float(i)) for j in range(8)],
                "k long, p double",
            )
            vt.upsert(batch, primary_keys=["k"])
        else:
            vt.update_where(
                {"p": "p + 1"},
                f"k = {int(kmin + 4 * i)}",
                prune=("k", int(kmin + 4 * i), int(kmin + 4 * i)),
            )
        if (i + 1) % 10 == 0:
            rf, rb = recorded_cdc(base_v + 1, vt.current_version())
            df_, db = disk_cdc()
            nparts, rows, secs = drain_secs()
            avg = rb // max(rf, 1)
            print(
                f"commits {i + 1:>3}  recorded cdc {rf:>4} files "
                f"{rb:>10,} B (avg {avg:>6,} B)  disk {df_:>4}/{db:>10,} B  "
                f"full-feed drain parts={nparts:<4} rows={rows:<7} "
                f"{secs:5.2f}s"
            )
    # retention is the reclaim path: truncate history, vacuum, re-count
    vt.log.write_checkpoint(vt.log.resolve(vt.current_version()))
    vt.vacuum(keep_last=1, file_retention_seconds=0.0)
    rf, rb = recorded_cdc(vt.current_version(), vt.current_version())
    df_, db = disk_cdc()
    print(
        f"after vacuum(retain=1): recorded-at-head cdc {rf} files; "
        f"disk {df_} files / {db:,} B"
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "cdf":
        cdf_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "cdcfiles":
        cdc_files_probe()
        return
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
