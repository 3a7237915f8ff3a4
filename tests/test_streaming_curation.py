"""Streaming curation composition (pipeline/corpus.py::
stream_curate_versioned — the q171 batch flagship running continuously):
versioned intake feed → NB model filter → cross-batch exact dedup →
per-batch UniMax + sorted contiguous binning → one curated version per micro-batch
with a recorded (app, batch_id) transaction.

q174 oracle-pins the full composition against DuckDB; this file pins
the streaming machinery on a small synthetic corpus:

- cross-batch dedup: a text re-submitted in a later batch under a new
  doc_id never re-lands; within-batch dups keep the min doc_id;
- the NB filter actually drops the negative-class-looking docs;
- exactly-once under checkpoint rebuild (replay of batch 0 is a
  txn-level no-op) and under restart with no new data;
- per-batch UniMax epochs ride the rows and differ across batches
  (each batch's own allocation, not a global one);
- packing bins respect the per-language token budget.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import curation as ccur
from modular_etl_data_platform_spark.operators.versioned import VersionedTable
from modular_etl_data_platform_spark.pipeline.corpus import (
    stream_curate_versioned,
)

_B = 64


def _docs(spark):
    rows = []
    for i in range(40):
        good = i % 2 == 0
        # curated-looking docs share a vocabulary; crawl-looking docs
        # another — the NB split is then learnable from unigrams
        words = (
            ["alpha", "beta", "gamma", f"tok{i}"] * 3
            if good
            else ["zzz", "spam", "junk", f"tok{i}"] * 3
        )
        rows.append(
            (i, " ".join(words), "en" if i % 3 else "fr",
             "src0" if good else "crawl")
        )
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


@pytest.fixture()
def setup(spark, tmp_path):
    docs = _docs(spark)
    model = ccur.nb_train(docs, "source = 'src0'", buckets=_B)
    intake = VersionedTable(spark, os.path.join(str(tmp_path), "intake"))
    curated_path = os.path.join(str(tmp_path), "curated")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain(checkpoint=None):
        q = stream_curate_versioned(
            spark,
            intake.path,
            curated_path,
            model,
            checkpoint or ckpt,
            nb_buckets=_B,
            bin_tokens=24,
            app_id="t",
        )
        q.awaitTermination(120)

    return docs, intake, VersionedTable(spark, curated_path), drain, tmp_path


def test_cross_batch_dedup_and_nb_filter(spark, setup):
    docs, intake, curated, drain, _ = setup
    intake.write(docs.filter("doc_id < 20"))
    drain()
    v1_rows = curated.read().count()
    # only the positive-class (even-id) docs survive the model filter
    assert v1_rows == 10
    # batch 2: new docs + RE-SUBMISSIONS of batch-1 texts under new ids
    resub = docs.filter("doc_id < 20 AND doc_id % 4 = 0").withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000)
    )
    intake.write(
        docs.filter("doc_id >= 20").unionByName(resub), mode="append"
    )
    drain()
    cur = curated.read()
    assert curated.current_version() == 2
    # resubmitted texts never re-landed
    assert cur.filter("doc_id >= 1000").count() == 0
    assert cur.count() == 20  # 10 new survivors, 0 dups
    fps = cur.select("fingerprint").collect()
    assert len({r[0] for r in fps}) == len(fps)


def test_within_batch_dedup_keeps_min_doc_id(spark, setup):
    docs, intake, curated, drain, _ = setup
    base = docs.filter("doc_id = 0")
    twin = base.withColumn("doc_id", F.lit(7000).cast("long"))
    intake.write(base.unionByName(twin))
    drain()
    got = curated.read().select("doc_id").collect()
    assert [r[0] for r in got] == [0]


def test_replay_and_idle_restart_are_noops(spark, setup):
    docs, intake, curated, drain, tmp_path = setup
    intake.write(docs.filter("doc_id < 20"))
    drain()
    assert curated.current_version() == 1
    # rebuilt checkpoint: batch 0 replays, txn (t, 0) already landed
    replay = os.path.join(str(tmp_path), "ckpt2")
    shutil.rmtree(replay, ignore_errors=True)
    drain(checkpoint=replay)
    assert curated.current_version() == 1
    # idle restart on the original checkpoint: nothing new, nothing lands
    drain()
    assert curated.current_version() == 1
    assert curated.log.resolve(1).get("txn", {}).get("t") == 0


def test_per_batch_unimax_and_packing(spark, setup):
    docs, intake, curated, drain, _ = setup
    intake.write(docs.filter("doc_id < 20"))
    drain()
    intake.write(docs.filter("doc_id >= 20"), mode="append")
    drain()
    cur = curated.read()
    # epochs are a per-(batch, lang) constant and the batches' language
    # mixes differ, so at least one lang gets different epochs per batch
    per = {
        (r["batch"], r["lang"]): r["epochs"]
        for r in cur.select("batch", "lang", "epochs").distinct().collect()
    }
    assert len(per) == len(
        cur.select("batch", "lang").distinct().collect()
    )  # constant within (batch, lang)
    # packing: no bin exceeds the 24-token budget except singleton bins
    # (contiguous binning leaves an oversized doc alone in its bin)
    bins = (
        cur.groupBy("batch", "lang", "bin_id")
        .agg(
            F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    )
    for r in bins:
        assert r["t"] <= 24 or r["n"] == 1


def _rand_docs(spark, rng, n_start, n):
    rows = []
    vocab_good = ["alpha", "beta", "gamma", "delta"]
    vocab_bad = ["zzz", "spam", "junk", "noise"]
    for i in range(n_start, n_start + n):
        good = rng.random() < 0.6
        base = vocab_good if good else vocab_bad
        words = [rng.choice(base) for _ in range(rng.randrange(6, 18))]
        rows.append(
            (i, " ".join(words), rng.choice(["en", "fr", "de"]),
             "src0" if good else "crawl")
        )
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_index_mode_equals_scan_mode_on_random_histories(spark, tmp_path):
    """The bucketed-index dedup and the legacy full-scan dedup accept
    IDENTICAL rows over random multi-batch histories with organic
    cross-batch duplicate texts (short random texts collide across
    batches by construction) — the probe's file pruning is invisible to
    semantics, batch by batch, end to end through the real stream."""
    import random

    rng = random.Random(175)
    all_docs = _rand_docs(spark, rng, 0, 90)
    model = ccur.nb_train(all_docs, "source = 'src0'", buckets=_B)
    paths = {
        m: {
            "intake": os.path.join(str(tmp_path), m, "intake"),
            "curated": os.path.join(str(tmp_path), m, "curated"),
            "ckpt": os.path.join(str(tmp_path), m, "ckpt"),
        }
        for m in ("index", "scan")
    }
    cuts = [0, 30, 55, 62, 90]  # uneven batches, incl. a small one
    for b in range(len(cuts) - 1):
        batch = all_docs.filter(
            (F.col("doc_id") >= cuts[b]) & (F.col("doc_id") < cuts[b + 1])
        )
        for m in ("index", "scan"):
            VersionedTable(spark, paths[m]["intake"]).write(
                batch, mode="append" if b else "overwrite"
            )
            q = stream_curate_versioned(
                spark,
                paths[m]["intake"],
                paths[m]["curated"],
                model,
                paths[m]["ckpt"],
                nb_buckets=_B,
                bin_tokens=24,
                app_id="tp",
                dedup_state=m,
                fp_index_buckets=16,
            )
            q.awaitTermination(120)
        a = VersionedTable(spark, paths["index"]["curated"]).read()
        b_ = VersionedTable(spark, paths["scan"]["curated"]).read()
        cols = sorted(a.columns)
        rows_a = sorted(map(tuple, a.select(*cols).collect()))
        rows_b = sorted(map(tuple, b_.select(*cols).collect()))
        assert rows_a == rows_b, f"batch {b}: index-mode != scan-mode"
    assert rows_a  # the history actually accepted something


def test_index_crash_window_recovery(spark, tmp_path, monkeypatch):
    """Crash INSIDE the documented window — after the curated commit,
    before the index append: the replayed batch must no-op the curated
    write, land the missing index append, and the next batch's dedup
    must still drop cross-batch duplicates (the index caught back up to
    the curated state)."""
    from modular_etl_data_platform_spark.corpus import state_index

    docs = _docs(spark)
    model = ccur.nb_train(docs, "source = 'src0'", buckets=_B)
    intake = VersionedTable(spark, os.path.join(str(tmp_path), "intake"))
    curated_path = os.path.join(str(tmp_path), "curated")
    curated = VersionedTable(spark, curated_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain():
        q = stream_curate_versioned(
            spark, intake.path, curated_path, model, ckpt,
            nb_buckets=_B, bin_tokens=24, app_id="tc",
        )
        q.awaitTermination(120)

    real_append = state_index.BucketedStateIndex.append
    boom = {"armed": True}

    def flaky_append(self, df, txn_app_id=None, txn_version=None):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash between commit and index append")
        return real_append(
            self, df, txn_app_id=txn_app_id, txn_version=txn_version
        )

    monkeypatch.setattr(state_index.BucketedStateIndex, "append", flaky_append)
    intake.write(docs.filter("doc_id < 20"))
    # batch 0's foreachBatch dies AFTER the curated commit; the failed
    # stream surfaces the injected error through awaitTermination
    with pytest.raises(Exception, match="injected crash"):
        drain()
    assert curated.current_version() == 1  # commit landed before the crash
    fpidx = state_index.BucketedStateIndex(
        spark, curated_path + "_fpidx", key_cols=["fingerprint"]
    )
    assert not fpidx.exists()  # the index append never happened
    drain()  # replay: curated no-op, index catches up
    assert curated.current_version() == 1
    assert fpidx.exists()
    assert (
        fpidx.table.read().count()
        == curated.read().select("fingerprint").distinct().count()
    )
    # and cross-batch dedup still holds for the NEXT batch
    resub = docs.filter("doc_id < 20 AND doc_id % 4 = 0").withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000)
    )
    intake.write(resub, mode="append")
    drain()
    assert curated.read().filter("doc_id >= 1000").count() == 0


def _near_setup(spark, tmp_path, benchmark=None):
    docs = _docs(spark)
    model = ccur.nb_train(docs, "source = 'src0'", buckets=_B)
    intake = VersionedTable(spark, os.path.join(str(tmp_path), "intake"))
    curated_path = os.path.join(str(tmp_path), "curated")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain():
        q = stream_curate_versioned(
            spark, intake.path, curated_path, model, ckpt,
            nb_buckets=_B, bin_tokens=24, app_id="tn",
            near_dedup=True, near_threshold=0.5, benchmark=benchmark,
        )
        q.awaitTermination(120)

    return docs, intake, VersionedTable(spark, curated_path), drain


def test_stream_near_dedup_cross_batch(spark, tmp_path):
    """A later batch's lightly-perturbed copies of accepted texts (one
    appended token — Jaccard ~0.9 on 3-shingles) are dropped by the
    signature-index probe; genuinely new texts still land."""
    docs, intake, curated, drain = _near_setup(spark, tmp_path)
    intake.write(docs.filter("doc_id < 20"))
    drain()
    accepted_v1 = {r.doc_id for r in curated.read().select("doc_id").collect()}
    assert accepted_v1  # the NB filter kept the positive class
    # perturbed twins of ACCEPTED docs under fresh ids + one new doc
    twins = (
        docs.filter(F.col("doc_id").isin([i for i in accepted_v1]))
        .withColumn("doc_id", F.col("doc_id") + F.lit(2000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" perturb")))
    )
    fresh = spark.createDataFrame(
        [(3000, "omega psi chi phi upsilon tau sigma rho", "en", "src0")],
        "doc_id long, text string, lang string, source string",
    )
    intake.write(twins.unionByName(fresh), mode="append")
    drain()
    cur = curated.read()
    landed_twins = cur.filter(
        (F.col("doc_id") >= 2000) & (F.col("doc_id") < 3000)
    ).count()
    assert landed_twins == 0, "a perturbed near-dup of accepted state landed"
    assert cur.filter("doc_id = 3000").count() == 1  # new text still lands


def test_stream_near_dedup_within_batch_keeps_lowest(spark, tmp_path):
    docs, intake, curated, drain = _near_setup(spark, tmp_path)
    base = docs.filter("doc_id = 0")
    near_twin = base.withColumn("doc_id", F.lit(5000).cast("long")).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz"))
    )
    intake.write(base.unionByName(near_twin))
    drain()
    got = sorted(r.doc_id for r in curated.read().select("doc_id").collect())
    assert got == [0]  # greedy keep-lowest dropped the higher-id twin


def test_stream_decontamination(spark, tmp_path):
    docs = _docs(spark)
    # benchmark = the full text of one positive-class doc: every doc
    # sharing a 5-gram with it (itself and its near-copies) must drop
    bench = docs.filter("doc_id = 2").select("text")
    _, intake, curated, drain = _near_setup(spark, tmp_path, benchmark=bench)
    intake.write(docs.filter("doc_id < 20"))
    drain()
    cur = curated.read()
    assert cur.filter("doc_id = 2").count() == 0, "contaminated doc landed"
    assert cur.count() > 0  # the stage didn't nuke the whole batch


def test_index_compaction_bounds_files(spark, tmp_path):
    """With ``index_compact_every``, a long drain history keeps the
    fingerprint index's file count bounded (re-clustered on bucket
    every N batches) while dedup semantics are untouched — without it
    the probe's opened-file bound grows with stream age."""
    docs = _docs(spark)
    model = ccur.nb_train(docs, "source = 'src0'", buckets=_B)
    intake = VersionedTable(spark, os.path.join(str(tmp_path), "intake"))
    curated_path = os.path.join(str(tmp_path), "curated")
    curated = VersionedTable(spark, curated_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain():
        q = stream_curate_versioned(
            spark, intake.path, curated_path, model, ckpt,
            nb_buckets=_B, bin_tokens=24, app_id="tcpt",
            fp_index_buckets=16,
            index_compact_every=2, index_compact_target=2,
        )
        q.awaitTermination(120)

    from modular_etl_data_platform_spark.corpus import state_index

    for b in range(6):  # 6 batches; compaction fires after 2, 4, 6
        lo, hi = b * 6, b * 6 + 6
        batch = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}")
        if b == 4:
            # re-submit batch 0's texts under new ids — must still dedup
            batch = batch.unionByName(
                docs.filter("doc_id < 6").withColumn(
                    "doc_id", F.col("doc_id") + F.lit(9000)
                )
            )
        intake.write(batch, mode="append" if b else "overwrite")
        drain()

    fpidx = state_index.BucketedStateIndex(
        spark, curated_path + "_fpidx", key_cols=["fingerprint"], n_buckets=16
    )
    head = fpidx.table.log.resolve(fpidx.table.current_version())
    # compacted at batch 6 -> exactly the target file count at head
    assert len(head["files"]) <= 2, head["files"]
    # semantics: resubmitted dups never landed, index mirrors curated
    assert curated.read().filter("doc_id >= 9000").count() == 0
    assert (
        fpidx.table.read().select("fingerprint").distinct().count()
        == curated.read().count()
    )
