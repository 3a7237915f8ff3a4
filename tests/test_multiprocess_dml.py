"""Multi-PROCESS torture at the DML layer (the round-12 verdict's #3):
real ``VersionedTable.upsert`` / ``update_where`` / ``delete_where``
from N independent OS processes — each with its OWN SparkSession — all
racing one CDC-enabled table.

``test_multiprocess_occ.py`` pins the log-claim contract with fake
paths; this file closes the gap between log-level and DML-level
concurrency evidence:

- every process's every commit lands (versions come out contiguous —
  the DML writers' internal rebase loops absorb every lost race);
- the upserts' (txn_app_id, txn_version) pairs land exactly once;
- the final table state equals a serial per-worker replay (workers own
  disjoint key ranges, so cross-worker order cannot matter — a lost
  update, a rebase that reused stale merged files, or a double-applied
  retry all diverge);
- every update-class commit carries a recorded ``cdc`` slice
  (write-time CDC holds under concurrency, not just single-writer).

Workers use tiny frames and ``local[2]`` sessions, so the wall cost is
Spark startup, not data.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from modular_etl_data_platform_spark.operators.versioned import (
    VersionedTable,
    _commit_name,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_N_WORKERS = 3
_KEYS_PER_WORKER = 8

_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[3])
root, w = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"dml_worker_{w}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from modular_etl_data_platform_spark.operators.versioned import VersionedTable

t = VersionedTable(spark, root, stats_columns=["k"])
lo = w * 100
keys = list(range(lo, lo + 8))

# op 0: whole-range upsert (updates every seeded row)
t.upsert(
    spark.createDataFrame([(k, 10) for k in keys], "k long, val long"),
    primary_keys=["k"],
    txn_app_id=f"w{w}",
    txn_version=0,
)
# op 1: partial upsert (even keys only)
t.upsert(
    spark.createDataFrame(
        [(k, 20) for k in keys if k % 2 == 0], "k long, val long"
    ),
    primary_keys=["k"],
    txn_app_id=f"w{w}",
    txn_version=1,
)
# op 2: predicate UPDATE on this worker's range
t.update_where(
    {"val": "val + 1"},
    f"k >= {lo} AND k < {lo + 8} AND k % 3 = 0",
)
# op 3: predicate DELETE of one key
t.delete_where(f"k = {lo + 7}")
print("done", w)
spark.stop()
"""


def test_multiprocess_dml_torture(spark, tmp_path):
    root = str(tmp_path / "dml_table")
    t = VersionedTable(spark, root, stats_columns=["k"])
    seed = [
        (w * 100 + i, -1)
        for w in range(_N_WORKERS)
        for i in range(_KEYS_PER_WORKER)
    ]
    t.write(spark.createDataFrame(seed, "k long, val long"))  # v1
    t.enable_change_data_feed(["k"])  # v2 (metadata commit, no cdc rows)
    base_version = t.current_version()

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, str(w), _REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for w in range(_N_WORKERS)
    ]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]

    # every DML commit landed; versions contiguous (no lost claim)
    head = t.current_version()
    assert head == base_version + 4 * _N_WORKERS
    assert t.log.versions() == list(range(1, head + 1))

    # upsert transactions landed exactly once per worker
    txn = t.log.resolve(head).get("txn", {})
    for w in range(_N_WORKERS):
        assert txn.get(f"w{w}") == 1, txn

    # final state == serial per-worker replay (disjoint key ranges)
    expected = {}
    for w in range(_N_WORKERS):
        lo = w * 100
        for i in range(_KEYS_PER_WORKER):
            k = lo + i
            val = 10  # op 0
            if k % 2 == 0:
                val = 20  # op 1
            if k % 3 == 0:
                val += 1  # op 2
            if i == 7:
                continue  # op 3 deleted it
            expected[k] = val
    got = {
        r.k: r.val for r in t.read().select("k", "val").collect()
    }
    assert got == expected

    # write-time CDC held under concurrency: every update-class commit
    # carries a recorded cdc slice (list, possibly explicit-empty)
    for v in range(base_version + 1, head + 1):
        rec = json.loads(t.log.store.read(_commit_name(v)))
        assert "cdc" in rec, f"version {v} has no recorded change data"
        assert isinstance(rec["cdc"], list)

    # and the change feed's NET endpoint diff over the whole DML range
    # agrees with the replay: every seeded key was either updated to
    # its final value or deleted (key 7 of each range); nothing else
    feed = t.table_changes(base_version, head, primary_keys=["k"])
    net = {r["k"]: (r["_change_type"], r["val"]) for r in feed.collect()}
    for w in range(_N_WORKERS):
        lo = w * 100
        for i in range(_KEYS_PER_WORKER):
            k = lo + i
            if i == 7:
                assert net.get(k, (None, None))[0] == "delete", net.get(k)
            else:
                assert net.get(k) == ("update_postimage", expected[k]), (
                    k,
                    net.get(k),
                )
    assert len(net) == _N_WORKERS * _KEYS_PER_WORKER
