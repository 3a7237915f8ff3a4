"""bench.py methodology for a subset of queries: warm pass + median of N.

Usage: python tools/minibench.py q174_streaming_curation [q176_...] [-- sf_dir]
Env: SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sf_dir = next(
        (a for a in sys.argv[1:] if a.startswith("/")),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    from modular_etl_data_platform_spark.queries.catalog import QUERIES
    from modular_etl_data_platform_spark.session import get_spark

    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_pricing_summary"](spark, sf_dir).collect()
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    QUERIES["q22_minhash_lsh_pairs"](spark, warm_sf).collect()
    QUERIES["q100_stream_sessions"](spark, warm_sf).collect()
    for name in names:  # untimed warm pass (codegen compile)
        spark.catalog.clearCache()
        QUERIES[name](spark, sf_dir).collect()
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            samples[name].append(round(time.time() - t0, 3))
    med = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    print(json.dumps({"queries": med, "samples": samples,
                      "total": round(sum(med.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
