"""Property-based upsert tests: random batch sequences MERGEd into a
parquet table must equal the dict model (last write per key wins,
unmatched rows survive), partitioned or not, including the
partition-scoped fast path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modular_etl_data_platform_spark.operators.upsert import upsert_parquet

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # key
        st.integers(min_value=1, max_value=3),   # partition value
        st.integers(min_value=0, max_value=999), # payload
    ),
    min_size=1,
    max_size=12,
)
batches = st.lists(rows, min_size=1, max_size=4)


def _dedup_batch(batch):
    """upsert_parquet expects one row per PK per batch; keep the last."""
    d = {}
    for k, day, v in batch:
        d[k] = (k, day, v)
    return list(d.values())


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(bs=batches, partitioned=st.booleans())
def test_upsert_matches_dict_model(spark, tmp_path_factory, bs, partitioned):
    path = str(tmp_path_factory.mktemp("upsert_prop") / "t")
    model: dict[int, tuple] = {}
    part = ["day"] if partitioned else None
    # partition-scoped path requires partition cols ⊆ PK; model that by
    # making the PK (k, day) when partitioned
    pks = ["k", "day"] if partitioned else ["k"]
    for batch in bs:
        batch = _dedup_batch(batch) if not partitioned else list(
            {(k, d): (k, d, v) for k, d, v in batch}.values()
        )
        df = spark.createDataFrame(batch, "k int, day int, v int")
        upsert_parquet(spark, df, path, pks, partition_by=part)
        for k, d, v in batch:
            model[(k, d) if partitioned else k] = (k, d, v)
    got = {
        ((r.k, r.day) if partitioned else r.k): (r.k, r.day, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == model
