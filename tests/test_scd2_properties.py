"""Property-based SCD2 tests (SURVEY §5.4): random update sequences applied
in incremental batches must always satisfy the Gold invariants (C7,
reference: config/gold/schema/README.md:345-357), agree with the one-pass
history build, and be idempotent under batch replay."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modular_etl_data_platform_spark.operators.scd2 import (
    HIGH_DATE,
    apply_scd_type2,
)

BASE = dt.datetime(2024, 1, 1)
HIGH = dt.datetime.fromisoformat(HIGH_DATE.replace(" ", "T"))

# a random history: {key -> [(hour, value), ...]} with unique hours per key;
# values include None to exercise the null-safe hash
values = st.sampled_from(["A", "B", "C", None])
key_history = st.lists(
    st.tuples(st.integers(min_value=0, max_value=29), values),
    min_size=1,
    max_size=8,
    unique_by=lambda tv: tv[0],
)
histories = st.dictionaries(
    st.integers(min_value=1, max_value=3), key_history, min_size=1, max_size=3
)
n_batches = st.integers(min_value=1, max_value=3)


def _mkdf(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, updated_timestamp timestamp"
    )


def _expected_versions(hist):
    """Pure-Python model: per key, order by time, collapse consecutive
    equal values → the expected (value, valid_from) version chain."""
    out = {}
    for k, tvs in hist.items():
        chain = []
        for hour, v in sorted(tvs):
            if not chain or chain[-1][0] != v:
                chain.append((v, BASE + dt.timedelta(hours=hour)))
        out[k] = chain
    return out


def _check_invariants(rows):
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in vs if r.is_current) == 1, f"key {k}: ≠1 current"
        assert vs[-1].is_current and vs[-1].valid_to == HIGH
        for r in vs:
            assert r.valid_from < r.valid_to, f"key {k}: empty/negative interval"
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, f"key {k}: gap/overlap"
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
    # surrogate keys are unique and dense
    sks = sorted(r.surrogate_key for r in rows)
    assert sks == list(range(1, len(rows) + 1))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(hist=histories, nb=n_batches, data=st.data())
def test_scd2_incremental_matches_model(spark, hist, nb, data):
    # partition each key's events into nb contiguous time slices → batches
    all_events = sorted(
        (hour, k, v) for k, tvs in hist.items() for hour, v in tvs
    )
    cut_points = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=30), min_size=nb - 1, max_size=nb - 1
        ).map(sorted)
    )
    bounds = [0, *cut_points, 31]
    dim = None
    last_batch = None
    for lo, hi in zip(bounds, bounds[1:]):
        batch = [
            (k, v, BASE + dt.timedelta(hours=hour))
            for hour, k, v in all_events
            if lo <= hour < hi
        ]
        if not batch:
            continue
        last_batch = batch
        dim = apply_scd_type2(
            dim, _mkdf(spark, batch), keys=["k"], type2_cols=["attr"]
        )
        dim = spark.createDataFrame(dim.collect(), dim.schema)  # materialize

    assert dim is not None
    rows = dim.collect()
    _check_invariants(rows)

    # the incremental result equals the pure-Python one-pass model
    got = {}
    for r in sorted(rows, key=lambda r: (r.k, r.valid_from)):
        got.setdefault(r.k, []).append((r.attr, r.valid_from))
    assert got == _expected_versions(hist)

    # replaying the last batch is a no-op
    replay = apply_scd_type2(
        dim, _mkdf(spark, last_batch), keys=["k"], type2_cols=["attr"]
    )
    replay_rows = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in replay.collect()
    }
    orig_rows = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in rows
    }
    assert replay_rows == orig_rows
