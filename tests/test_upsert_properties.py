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


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EXTRA_COLS = st.lists(
    st.sampled_from(["m1", "m2", "m3"]), unique=True, max_size=2
)


@given(
    t_extra=_EXTRA_COLS,
    b_extra=_EXTRA_COLS,
    t_keys=st.sets(st.integers(0, 6), min_size=1),
    b_keys=st.sets(st.integers(0, 6), min_size=1),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_evolve_schema_merge_is_union_schema_and_lossless(
    spark, t_extra, b_extra, t_keys, b_keys
):
    """For ANY pair of overlapping schemas: the evolved merge carries the
    union of columns; batch rows win on key collision with their values
    intact; surviving target rows keep theirs; columns a side never had
    are null there."""
    from modular_etl_data_platform_spark.operators.upsert import merge_dataframes

    def frame(keys, extras, tag):
        cols = "k long, v string" + "".join(f", {c} long" for c in extras)
        rows = [tuple([k, f"{tag}{k}"] + [k * 10 + i for i in range(len(extras))]) for k in sorted(keys)]
        return spark.createDataFrame(rows, cols)

    target = frame(t_keys, t_extra, "t")
    batch = frame(b_keys, b_extra, "b")
    merged = merge_dataframes(target, batch, ["k"], evolve_schema=True)

    assert set(merged.columns) == {"k", "v", *t_extra, *b_extra}
    got = {r["k"]: r.asDict() for r in merged.collect()}
    assert set(got) == t_keys | b_keys
    for k, row in got.items():
        src_extras, tag = (b_extra, "b") if k in b_keys else (t_extra, "t")
        assert row["v"] == f"{tag}{k}"
        for c in {*t_extra, *b_extra}:
            if c in src_extras:
                assert row[c] == k * 10 + src_extras.index(c)
            else:
                assert row[c] is None
