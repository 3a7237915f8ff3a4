"""BucketedStateIndex: the persisted, file-pruned key index that makes
cross-batch streaming dedup batch-bounded (corpus/state_index.py).

Pinned contracts:
- anti_join/matches agree EXACTLY with the naive full-scan joins on
  random multi-batch histories (the probe's file pruning is invisible
  to semantics);
- the probe opens only bucket-intersecting files, and for a small batch
  that is a strict subset of the index's files;
- appends are txn-idempotent (a replayed (app, batch) is a no-op);
- compact re-clusters without changing probe results.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from modular_etl_data_platform_spark.corpus.state_index import BucketedStateIndex


def _docs(spark, ids_texts):
    return spark.createDataFrame(
        [(i, t) for i, t in ids_texts], "doc_id long, text string"
    )


@pytest.fixture()
def fpidx(spark, tmp_path):
    return BucketedStateIndex(
        spark,
        str(tmp_path / "fpidx"),
        key_cols=["fingerprint"],
        n_buckets=64,
        files_per_append=4,
    )


def _fp(df):
    return df.withColumn("fingerprint", F.md5(F.col("text")))


def test_anti_join_passthrough_on_empty_index(spark, fpidx):
    batch = _fp(_docs(spark, [(1, "a"), (2, "b")]))
    assert not fpidx.exists()
    out = fpidx.anti_join(batch)
    assert out.columns == batch.columns
    assert out.count() == 2


def test_anti_join_drops_seen_keys(spark, fpidx):
    b0 = _fp(_docs(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")]))
    fpidx.append(b0.select("fingerprint"))
    b1 = _fp(_docs(spark, [(10, "alpha"), (11, "delta"), (12, "beta")]))
    got = sorted(r.doc_id for r in fpidx.anti_join(b1).collect())
    assert got == [11]


def test_matches_returns_payload(spark, tmp_path):
    idx = BucketedStateIndex(
        spark,
        str(tmp_path / "sig"),
        key_cols=["band_id", "band_key"],
        n_buckets=32,
        payload_cols=["doc_id"],
    )
    rows = spark.createDataFrame(
        [(0, "k1", 100), (1, "k1", 100), (0, "k2", 200)],
        "band_id int, band_key string, doc_id long",
    )
    idx.append(rows)
    batch = spark.createDataFrame(
        [(0, "k1", 7), (0, "kX", 8)], "band_id int, band_key string, new_id long"
    )
    got = sorted(
        (r.new_id, r.doc_id) for r in idx.matches(batch).collect()
    )
    assert got == [(7, 100)]


def test_matches_raises_on_missing_index(spark, tmp_path):
    idx = BucketedStateIndex(
        spark, str(tmp_path / "none"), key_cols=["k"], payload_cols=["v"]
    )
    batch = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(FileNotFoundError):
        idx.matches(batch)


def test_probe_prunes_files(spark, fpidx):
    # three appends x 4 range-partitioned files each -> 12 narrow files;
    # a 2-key batch touches <= 2 buckets -> <= 2 files per append epoch
    for epoch in range(3):
        batch = _fp(
            _docs(spark, [(epoch * 100 + i, f"doc-{epoch}-{i}") for i in range(200)])
        )
        fpidx.append(batch.select("fingerprint"))
    small = _fp(_docs(spark, [(9001, "probe-one"), (9002, "probe-two")]))
    p = fpidx.probe(small)
    assert p.total_files >= 6
    assert len(p.files) < p.total_files  # real pruning happened
    assert len(p.files) <= 2 * 3  # <= n_batch_buckets files per epoch
    # and the pruned scan is still EXACT for the anti-join
    assert fpidx.anti_join(small).count() == 2
    seen = _fp(_docs(spark, [(9100, "doc-1-5")]))
    assert fpidx.anti_join(seen).count() == 0


def test_probe_empty_batch(spark, fpidx):
    fpidx.append(_fp(_docs(spark, [(1, "x")])).select("fingerprint"))
    empty = _fp(_docs(spark, []))
    p = fpidx.probe(empty)
    assert p.files == [] and p.buckets == []
    assert fpidx.anti_join(empty).count() == 0


def test_append_txn_idempotent(spark, fpidx):
    b = _fp(_docs(spark, [(1, "a"), (2, "b")])).select("fingerprint")
    v1 = fpidx.append(b, txn_app_id="app", txn_version=0)
    v2 = fpidx.append(b, txn_app_id="app", txn_version=0)  # replay
    assert v2 == v1
    assert fpidx.table.read().count() == 2
    fpidx.append(
        _fp(_docs(spark, [(3, "c")])).select("fingerprint"),
        txn_app_id="app",
        txn_version=1,
    )
    assert fpidx.table.read().count() == 3


def test_index_probe_equals_full_scan_on_random_histories(spark, tmp_path):
    """Property: over random multi-batch histories with engineered
    cross-batch duplicates, the pruned-probe anti-join accepts EXACTLY
    the same rows as the naive full-scan anti-join, batch by batch."""
    rng = random.Random(13)
    vocab = [f"text-{i}" for i in range(40)]
    for trial in range(3):
        idx = BucketedStateIndex(
            spark,
            str(tmp_path / f"prop{trial}"),
            key_cols=["fingerprint"],
            n_buckets=rng.choice([1, 16, 256]),
            files_per_append=rng.choice([1, 3]),
        )
        seen_texts: set[str] = set()
        next_id = 0
        for batch_no in range(4):
            ids_texts = []
            for _ in range(rng.randrange(1, 25)):
                ids_texts.append((next_id, rng.choice(vocab)))
                next_id += 1
            batch = _fp(_docs(spark, ids_texts)).dropDuplicates(["fingerprint"])
            got = idx.anti_join(batch)
            got_texts = sorted(r.text for r in got.collect())
            want = sorted({t for _, t in ids_texts} - seen_texts)
            assert got_texts == want, (
                f"trial {trial} batch {batch_no}: probe != full-scan"
            )
            if got_texts:
                idx.append(got.select("fingerprint"))
            seen_texts.update(t for _, t in ids_texts)


def test_compact_preserves_probe_semantics(spark, fpidx):
    for epoch in range(3):
        b = _fp(_docs(spark, [(epoch * 10 + i, f"t-{epoch}-{i}") for i in range(8)]))
        fpidx.append(b.select("fingerprint"))
    probe_batch = _fp(_docs(spark, [(900, "t-1-3"), (901, "new-one")]))
    before = sorted(r.doc_id for r in fpidx.anti_join(probe_batch).collect())
    fpidx.compact(target_files=2)
    after = sorted(r.doc_id for r in fpidx.anti_join(probe_batch).collect())
    assert before == after == [901]
    assert len(fpidx.table.log.resolve(fpidx.table.current_version())["files"]) <= 2
