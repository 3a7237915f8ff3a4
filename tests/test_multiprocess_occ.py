"""Multi-PROCESS optimistic-concurrency torture for the commit log.

tests/test_commit_log.py pins the OCC interleavings deterministically
through the LogStore seam (including the conditional-PUT S3 mapping) —
all in ONE process. This file pins the real filesystem: N independent
OS processes (``subprocess``, fresh interpreters — no fork-inherited
state, no shared caches) hammer one ``FileSystemLogStore`` table with a
mix of delta-form appends and full-list rewrites, each retrying
``ConcurrentWriteError`` by rebasing on the new head, exactly like the
DML writers. The put-if-absent claim is ``open(O_CREAT|O_EXCL)`` — the
property under test is that the OS-level claim serializes ALL commits
with no lost update, across process boundaries:

- versions come out contiguous 1..N_total (every claim landed exactly
  one version; no gaps, no double-claims);
- every worker operation's id appears in exactly ONE commit record
  (exactly-once: a lost race that silently dropped or double-applied a
  commit would break this);
- the resolved head state equals an independent add/remove replay of
  the raw records (the fold and the records can't disagree);
- checkpoints written mid-race (interval 5 → many flatten points under
  contention) still resolve correctly.

Spark-free: CommitLog publishes fake file paths (size/stat lookups
degrade gracefully), so the whole torture runs in seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog,
    _commit_name,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, random, sys
sys.path.insert(0, sys.argv[4])
from modular_etl_data_platform_spark.operators.versioned import (
    CommitLog, ConcurrentWriteError,
)

root, wid, n_ops = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
log = CommitLog(path=root, checkpoint_interval=5)
rng = random.Random(wid)
schema = json.dumps({"type": "struct", "fields": []})
mine = []
for i in range(n_ops):
    op_id = f"w{wid}:{i}"
    fake = f"/fake/w{wid}_{i}.parquet"
    while True:
        base = log.current_version() or 0
        try:
            prior = log.resolve(base) if base else {"files": []}
            rewrite = base and i % 4 == 3 and any(
                f in set(prior["files"]) for f in mine
            )
            if rewrite:
                # full-list rewrite: drop one of MY earlier files and
                # land a replacement (never touches another worker's
                # data — content conflicts are the DML layer's job;
                # this exercises the remove-bearing record path)
                victim = next(
                    f for f in mine if f in set(prior["files"])
                )
                files = [f for f in prior["files"] if f != victim] + [fake]
                log.publish(
                    files, schema, {"mode": "rewrite", "op": op_id},
                    base, {},
                )
            else:
                log.publish(
                    None, schema, {"mode": "append", "op": op_id},
                    base, {}, add=[fake],
                )
            mine.append(fake)
            break
        except ConcurrentWriteError:
            continue
print("done", wid)
"""


def test_multiprocess_occ_torture(tmp_path):
    root = str(tmp_path / "occ_table")
    os.makedirs(os.path.join(root, "_versions"), exist_ok=True)
    n_workers, n_ops = 6, 15
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, str(w), str(n_ops), _REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for w in range(n_workers)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    log = CommitLog(path=root, checkpoint_interval=5)
    head = log.current_version()
    total = n_workers * n_ops
    # every claim landed exactly one contiguous version
    assert head == total
    assert log.versions() == list(range(1, total + 1))

    # exactly-once: each op id in exactly one record; replay the raw
    # records independently of the fold
    ops = []
    files: set[str] = set()
    for v in range(1, head + 1):
        rec = json.loads(log.store.read(_commit_name(v)))
        ops.append(rec["op"])
        files.difference_update(rec.get("remove", []))
        files.update(rec.get("add", []))
    assert len(ops) == total and len(set(ops)) == total

    resolved = log.resolve(head)
    assert set(resolved["files"]) == files
    # every rebase preserved all OTHER workers' surviving appends: each
    # worker's last op always survives (nothing later removes it)
    for w in range(n_workers):
        assert any(f"/fake/w{w}_" in f for f in resolved["files"])
    # checkpoints were actually written under contention and resolve
    assert log.checkpoints(), "no checkpoint landed at interval 5"
    mid = log.checkpoints()[-1]
    assert set(log.resolve(mid)["files"]) <= files | {
        f for v in range(1, head + 1)
        for f in json.loads(log.store.read(_commit_name(v))).get("remove", [])
    }
