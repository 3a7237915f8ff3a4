"""Streaming curation composition (pipeline/corpus.py::
stream_curate_versioned — the q171 batch flagship running continuously):
versioned intake feed → NB model filter → cross-batch exact dedup →
per-batch UniMax + FFD packing → one curated version per micro-batch
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
    # (FFD puts an oversized doc alone in its bin)
    bins = (
        cur.groupBy("batch", "lang", "bin_id")
        .agg(
            F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")
        )
        .collect()
    )
    for r in bins:
        assert r["t"] <= 24 or r["n"] == 1
