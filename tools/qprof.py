"""Per-phase wall-time profiler for a single catalog query.

Usage: python tools/qprof.py <query_name> [sf_dir]

Wraps the hot engine internals (VersionedTable write/land/publish/read,
CommitLog.resolve/publish, BucketedStateIndex probe/append/anti_join/
matches, stream drains) with timing accumulators, runs the query once,
and prints a sorted per-call-site breakdown (total seconds, call count).
Purely an observation harness — nothing in the engine changes.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])
_TLS = threading.local()


class _Stack:
    """Thread-local call stack (foreachBatch bodies run on the stream
    execution thread, not the main thread)."""

    def append(self, tag):
        if not hasattr(_TLS, "stack"):
            _TLS.stack = []
        _TLS.stack.append(tag)

    def pop(self):
        _TLS.stack.pop()

    def __bool__(self):
        return bool(getattr(_TLS, "stack", None))

    def __getitem__(self, i):
        return _TLS.stack[i]


STACK = _Stack()


def wrap(cls, name: str, label: str | None = None):
    orig = getattr(cls, name)
    tag = label or f"{cls.__name__}.{name}"

    def timed(*a, **kw):
        STACK.append(tag)
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            dt = time.time() - t0
            STACK.pop()
            ACC[tag][0] += dt
            ACC[tag][1] += 1
            # attribute to self-time only at top level of our wrappers:
            # nested wrapped calls subtract below
            if STACK:
                ACC[STACK[-1]][0] -= dt

    setattr(cls, name, timed)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from modular_etl_data_platform_spark.corpus import curation as ccur
    from modular_etl_data_platform_spark.corpus.state_index import (
        BucketedStateIndex,
    )
    from modular_etl_data_platform_spark.operators.versioned import (
        CommitLog,
        VersionedTable,
    )
    from modular_etl_data_platform_spark.queries.catalog import QUERIES
    from modular_etl_data_platform_spark.session import get_spark

    for meth in ("write", "_land_files", "_publish", "read", "upsert",
                 "merge", "compact"):
        wrap(VersionedTable, meth)
    for meth in ("resolve", "publish", "current_version"):
        wrap(CommitLog, meth)
    for meth in ("probe", "append", "anti_join", "matches",
                 "_batch_buckets", "compact"):
        wrap(BucketedStateIndex, meth)
    def mk(orig, tag):
        def timed(*a, **kw):
            STACK.append(tag)
            t0 = time.time()
            try:
                return orig(*a, **kw)
            finally:
                dt = time.time() - t0
                STACK.pop()
                ACC[tag][0] += dt
                ACC[tag][1] += 1
                if STACK:
                    ACC[STACK[-1]][0] -= dt

        return timed

    import modular_etl_data_platform_spark.corpus.curation as cur_mod
    import modular_etl_data_platform_spark.corpus.dedup as ded_mod
    import modular_etl_data_platform_spark.corpus.rules as rules_mod

    for mod, label, fns in (
        (cur_mod, "curation", ("nb_train", "nb_apply", "unimax_allocation",
                               "decontaminate", "nb_quality_scores",
                               "packing_plan")),
        (ded_mod, "dedup", ("connected_components", "minhash_lsh_dedup")),
        (rules_mod, "rules", ("quality_suite",)),
    ):
        for fn in fns:
            if hasattr(mod, fn):
                setattr(mod, fn, mk(getattr(mod, fn), f"{label}.{fn}"))

    # time the stream drain (start -> awaitTermination) via pipeline
    import modular_etl_data_platform_spark.pipeline.corpus as pc

    orig_scv = pc.stream_curate_versioned

    def timed_scv(*a, **kw):
        t0 = time.time()
        q = orig_scv(*a, **kw)
        ACC["stream.define+start"][0] += time.time() - t0
        ACC["stream.define+start"][1] += 1

        orig_await = q.awaitTermination

        def timed_await(*aa, **kk):
            t1 = time.time()
            r = orig_await(*aa, **kk)
            ACC["stream.drain(await)"][0] += time.time() - t1
            ACC["stream.drain(await)"][1] += 1
            return r

        q.awaitTermination = timed_await
        return q

    pc.stream_curate_versioned = timed_scv
    # queries import stream_curate_versioned by name at call time
    import modular_etl_data_platform_spark.queries.corpus_queries as cq  # noqa

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_QPROF_WARM", "1") != "0":
        # untimed warm pass (codegen compile, streaming-engine and
        # Python-worker cold start) — bench.py's methodology; reset the
        # accumulators so the printed breakdown is the steady state
        QUERIES[name](spark, sf_dir).collect()
        spark.catalog.clearCache()
        ACC.clear()
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    rows = df.collect()
    total = time.time() - t0
    print(f"\n=== {name} @ {sf_dir}: {total:.2f}s total, {len(rows)} rows ===")
    print(f"{'phase':<38}{'self-sec':>10}{'calls':>8}")
    acc = sorted(ACC.items(), key=lambda kv: -kv[1][0])
    accounted = 0.0
    for tag, (sec, cnt) in acc:
        accounted += sec
        print(f"{tag:<38}{sec:>10.2f}{cnt:>8}")
    print(f"{'(accounted)':<38}{accounted:>10.2f}")
    print(f"{'(unaccounted driver/query code)':<38}{total - accounted:>10.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
