"""Property-based tests for the round-2 scale operators: scalable
surrogate-key assignment (numbering == global ROW_NUMBER for arbitrary
data), sharded packing invariants, and line-dedup conservation laws."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    keys=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    start=st.integers(min_value=0, max_value=10**9),
    buckets=st.sampled_from([1, 2, 7]),
)
@SLOW
def test_assign_surrogate_keys_equals_global_row_number(spark, keys, start, buckets):
    from modular_etl_data_platform_spark.operators.scd2 import assign_surrogate_keys

    df = spark.createDataFrame([(k,) for k in keys], "bk long")
    out = assign_surrogate_keys(df, ["bk"], "sk", start=start, buckets=buckets)
    got = {r.bk: r.sk for r in out.collect()}
    want = {bk: start + i + 1 for i, bk in enumerate(sorted(keys))}
    assert got == want


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=30),
    shards=st.sampled_from([2, 3, 5]),
)
@SLOW
def test_sharded_packing_invariants(spark, tokens, shards):
    """Per-shard packing: within every shard the stream is contiguous
    longest-first; bin ids never collide across shards."""
    from modular_etl_data_platform_spark.corpus import curation as ccur

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    plan = ccur.packing_plan(df, capacity=64, shards=shards).collect()
    assert sorted(r.doc_id for r in plan) == list(range(len(tokens)))
    by_shard: dict[int, list] = {}
    for r in plan:
        assert r.shard_id == r.doc_id % shards
        assert r.bin_id % shards == r.shard_id  # shard-disjoint bin spaces
        by_shard.setdefault(r.shard_id, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.tokens_before)
        offset = 0
        for r in rows:
            assert r.tokens_before == offset
            assert r.bin_id == (offset // 64) * shards + r.shard_id
            offset += r.n_tokens
        lengths = [r.n_tokens for r in rows]
        assert lengths == sorted(lengths, reverse=True)


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "FOOTER"])
doc_texts = st.lists(
    st.lists(words, min_size=1, max_size=5).map("\n".join), min_size=1, max_size=8
)


@given(texts=doc_texts, freq=st.sampled_from([2, 3]))
@SLOW
def test_line_dedup_conservation(spark, texts, freq):
    """Line dedup never invents lines, keeps every doc, and drops exactly
    the lines whose distinct-doc frequency crosses the threshold."""
    from modular_etl_data_platform_spark.corpus.dedup import line_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(df, min_doc_freq=freq).collect()}
    assert set(out) == set(range(len(texts)))

    doc_freq: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for line in t.split("\n"):
            doc_freq.setdefault(line, set()).add(i)
    boiler = {ln for ln, ds in doc_freq.items() if len(ds) >= freq}
    for i, t in enumerate(texts):
        expect = [ln for ln in t.split("\n") if ln not in boiler]
        assert out[i].clean_text == "\n".join(expect)
        assert out[i].n_lines_kept == len(expect)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)), max_size=40
    ),
)
@SLOW
def test_star_cc_matches_bfs_ground_truth(spark, edges):
    """BOTH CC algorithms label every vertex with its component's
    minimum id — checked against a driver-side BFS for arbitrary small
    graphs (self-loops, duplicates, singletons included). The min-label
    variant runs through its edge-touched-vertices-only propagation and
    final vertex join (the round-5 rewrite), so the shared fixpoint is
    property-pinned for both."""
    import collections

    from modular_etl_data_platform_spark.corpus.dedup import (
        connected_components,
        connected_components_star,
    )

    n = 25
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    truth = {}
    for s in range(n):
        if s in truth:
            continue
        seen, stack = {s}, [s]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(seen)
        for v in seen:
            truth[v] = m
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    e = (
        spark.createDataFrame(edges, "id_a LONG, id_b LONG")
        if edges
        else spark.createDataFrame([], "id_a LONG, id_b LONG")
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components_star(verts, e).collect()
    }
    assert got == truth
    got_minlabel = {
        r.doc_id: r.cluster_id for r in connected_components(verts, e).collect()
    }
    assert got_minlabel == truth


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30), min_size=2, max_size=12
    ),
    cap=st.sampled_from([None, 3]),
)
@SLOW
def test_lsh_candidate_pairs_match_reference_banding(spark, texts, cap):
    """The single-shuffle pair generator must emit exactly the pairs the
    banding definition implies: group docs by each band's key tuple, drop
    over-cap buckets, pair every co-bucketed id_a < id_b. Checked against
    a driver-side reference over arbitrary (including duplicate) texts."""
    import collections

    from modular_etl_data_platform_spark.corpus.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    sigs = minhash_signatures(docs, k=8, parallelism=2)
    rows = {r.doc_id: [r[f"mh{s}"] for s in range(8)] for r in sigs.collect()}
    buckets = collections.defaultdict(list)
    for did, mh in rows.items():
        for b in range(4):
            key = tuple(mh[b * 2 : b * 2 + 2])
            buckets[(b, key)].append(did)
    expect = set()
    for members in buckets.values():
        if cap is not None and len(members) > cap:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                expect.add((ms[i], ms[j]))
    got = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, max_bucket_size=cap).collect()
    }
    assert got == expect
