"""Curriculum ordering (corpus/curation.py::curriculum_order) and
semantic dedup composition (q76)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus import curation as ccur


def test_curriculum_buckets_and_interleave(spark):
    rows = [(i, i * 7 % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    out = ccur.curriculum_order(df).collect()
    assert len(out) == 200
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    # ~equal-sized decile buckets
    assert len(by_bucket) == 10
    assert all(15 <= len(v) <= 25 for v in by_bucket.values())
    # within a bucket, rank follows difficulty then id
    for rs in by_bucket.values():
        rs = sorted(rs, key=lambda r: r.rank_in_bucket)
        diffs = [(r.n_chars, r.doc_id) for r in rs]
        assert diffs == sorted(diffs)
    # ascending interleave_key round-robins the buckets: among the first
    # 10 keys every bucket appears exactly once
    first = sorted(out, key=lambda r: r.interleave_key)[:10]
    assert sorted(r.bucket for r in first) == list(range(10))
    # interleave keys are unique (a loader can ORDER BY it)
    keys = [r.interleave_key for r in out]
    assert len(set(keys)) == len(keys)


def test_curriculum_no_global_single_partition_window(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("n_chars")
    )
    plan = ccur.curriculum_order(df)._jdf.queryExecution().executedPlan().toString()
    # the scale-killer would be ntile()/percent_rank() over an empty
    # partitionBy (a SinglePartition window over the whole corpus); the
    # only window here must be partitioned by bucket
    import re

    assert not re.search(r"(?<![a-z_])ntile\(", plan)
    assert "percent_rank" not in plan
    assert "windowspecdefinition(bucket" in plan
