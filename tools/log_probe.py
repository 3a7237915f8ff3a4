"""Empirical commit-log probe: is the log layer O(batch) at depth?

Spark-free (synthetic file paths through CommitLog directly — the data
plane would drown the log's microseconds in write time): publishes
``N`` append-style commits into a FileSystemLogStore-backed log, each
adding 2 files with stats, and measures

- per-commit publish wall time, early window vs late window — a log
  that re-serializes the table inventory per commit (round 7's design)
  grows linearly with depth; the delta log must stay flat;
- commit record bytes, first vs last — O(files changed), not O(table);
- COLD head resolution + snapshot resolution time at full depth — the
  checkpoint + pointer path, which must be bounded by
  checkpoint_interval, not by N.

Usage: python tools/log_probe.py [N] [FILES_PER_COMMIT]
(defaults 1000 / 2; prints one JSON line so the numbers can be pasted
into SCALE.md verbatim). FILES_PER_COMMIT lets the probe reach the
10^5-10^6-FILE design point without 10^5+ sequential commits — the
cold-open fold cost is driven by file count, not commit count, so 500
commits x 2000 files measures the same fold a long-lived table pays.

Also measured at full depth (round 10): WARM-REOPEN resolution — a
second fresh CommitLog instance resolving the same head, the shape a
process pays when every new table handle re-folds (this is what the
process-level snapshot cache exists to make O(1)) — and the REBASE
fold (one more delta folded onto a warm state), which must stay
O(changed) regardless of table size.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modular_etl_data_platform_spark.operators.versioned import (  # noqa: E402
    CommitLog,
    _checkpoint_name,
    _checkpoint_part_name,
    _commit_name,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    fpc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    root = tempfile.mkdtemp(prefix="log_probe_")
    try:
        log = CommitLog(path=root)
        files: list[str] = []
        publish_times: list[float] = []
        rec_sizes: list[int] = []
        for i in range(1, n + 1):
            new = [
                f"{root}/files/batch{i:06d}/part-{j}.parquet"
                for j in range(fpc)
            ]
            files.extend(new)
            stats = {f: {"k": [i, i]} for f in new}
            t0 = time.perf_counter()
            log.publish(files, '{"type":"struct","fields":[]}', {"mode": "append"}, i - 1, stats)
            publish_times.append(time.perf_counter() - t0)
            rec_sizes.append(len(log.store.read(_commit_name(i))))

        def window(xs, lo, hi):
            return round(statistics.mean(xs[lo:hi]) * 1e3, 3)

        w = min(50, n // 4)
        interval = log.checkpoint_interval
        # split plain delta commits from the 1-in-interval commits that
        # also write the (amortized-O(table)) checkpoint sidecar
        plain = [t for i, t in enumerate(publish_times, 1) if i % interval]
        ckpt = [t for i, t in enumerate(publish_times, 1) if not i % interval]
        cold = CommitLog(path=root)  # fresh instance: no warm state cache
        t0 = time.perf_counter()
        head = cold.current_version()
        t_head = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = cold.resolve(head)
        t_resolve = time.perf_counter() - t0
        # warm reopen: ANOTHER fresh instance in the same process — the
        # every-new-table-handle shape; with the process-level snapshot
        # cache this is a stat + dict hit, not a refold
        warm = CommitLog(path=root)
        t0 = time.perf_counter()
        warm.resolve(head)
        t_warm_reopen = time.perf_counter() - t0
        # rebase fold: one more small delta onto the warm state — must
        # be O(changed) at any depth
        extra = [f"{root}/files/extra/part-{j}.parquet" for j in range(2)]
        log.publish(
            files + extra,
            '{"type":"struct","fields":[]}',
            {"mode": "append"},
            head,
            {f: {"k": [0, 0]} for f in extra},
        )
        t0 = time.perf_counter()
        warm.resolve(head + 1)
        t_rebase = time.perf_counter() - t0
        # delta-form publish (add=...) at full depth — the streaming
        # sink's commit shape: no full-list set diff, layered state
        # fold; must be O(batch) at any table size (round 11)
        extra2 = [f"{root}/files/extra2/part-{j}.parquet" for j in range(2)]
        t0 = time.perf_counter()
        log.publish(
            None,
            '{"type":"struct","fields":[]}',
            {"mode": "append"},
            head + 1,
            {f: {"k": [0, 0]} for f in extra2},
            add=extra2,
        )
        t_delta_publish = time.perf_counter() - t0
        # adversarial tiny-append LOOKUP DEPTH (round 12): with
        # checkpointing effectively disabled, the copy-on-write state
        # stacks layers until the _MAX_STATE_LAYERS=64 flatten guard.
        # Measure a worst-case membership probe (a BASE file, so the
        # bisect misses every overlay before hitting the bottom layer)
        # and a sizes lookup through the ChainMap, at max depth vs after
        # flattening — the regression tripwire for the guard itself.
        from modular_etl_data_platform_spark.operators.versioned import (
            _state_layer_depth,
        )

        deep_root = tempfile.mkdtemp(prefix="log_probe_deep_")
        try:
            deep = CommitLog(path=deep_root, checkpoint_interval=10**9)
            deep.publish(
                files, '{"type":"struct","fields":[]}', {"mode": "append"},
                0, {},
            )
            for i in range(70):  # > _MAX_STATE_LAYERS: guard must engage
                add = [f"{deep_root}/files/tiny{i}/part-0.parquet"]
                deep.publish(
                    None, '{"type":"struct","fields":[]}',
                    {"mode": "append"}, i + 1, {}, add=add,
                )
            # deepest state the guard permits: the commit just before
            # the 64-layer flatten point (depth grows 1 per tiny append)
            depths = {
                v: _state_layer_depth(deep.resolve(v))
                for v in range(2, deep.current_version() + 1)
            }
            worst_v = max(depths, key=depths.get)
            worst_depth = depths[worst_v]
            deep_state = deep.resolve(worst_v)
            depth_after_guard = depths[deep.current_version()]
            assert depth_after_guard < worst_depth, "flatten guard inert"
            probe_file = files[0]  # bottom layer: worst bisect path
            reps = 20_000
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = probe_file in deep_state["files"]
                _ = deep_state["sizes"].get(probe_file)
            t_deep_lookup = (time.perf_counter() - t0) / reps
            flat = CommitLog._materialize_state(deep_state)
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = probe_file in flat["files"]
                _ = flat["sizes"].get(probe_file)
            t_flat_lookup = (time.perf_counter() - t0) / reps
        finally:
            shutil.rmtree(deep_root, ignore_errors=True)
        # the round-9 parquet checkpoint, measured in isolation at full
        # depth: write cost, on-disk bytes (meta vs columnar parts), and
        # a paths-only projection — the read shape a consumer that needs
        # no stats pays (parquet column pruning; the single-JSON design
        # forced a full parse)
        t0 = time.perf_counter()
        log.write_checkpoint(state)
        t_ckpt_write = time.perf_counter() - t0
        meta = json.loads(log.store.read(_checkpoint_name(head)))
        nparts = meta.get("parts", 0)
        part_bytes = sum(
            len(log.store.read_bytes(_checkpoint_part_name(head, i)))
            for i in range(nparts)
        )
        import io

        import pyarrow.parquet as pq

        t0 = time.perf_counter()
        npaths = sum(
            len(
                pq.read_table(
                    io.BytesIO(
                        log.store.read_bytes(_checkpoint_part_name(head, i))
                    ),
                    columns=["path"],
                )
            )
            for i in range(nparts)
        )
        t_paths_only = time.perf_counter() - t0
        assert npaths == len(state["files"])
        print(
            json.dumps(
                {
                    "commits": n,
                    "table_files_at_end": len(state["files"]),
                    "publish_ms_early": window(publish_times, 0, w),
                    "publish_ms_late": window(publish_times, n - w, n),
                    "delta_commit_ms_early": window(plain, 0, w),
                    "delta_commit_ms_late": window(plain, len(plain) - w, len(plain)),
                    "checkpoint_commit_ms_last": round(ckpt[-1] * 1e3, 3) if ckpt else None,
                    "record_bytes_first": rec_sizes[0],
                    "record_bytes_last": rec_sizes[-1],
                    "cold_head_resolution_ms": round(t_head * 1e3, 3),
                    "cold_snapshot_resolve_ms": round(t_resolve * 1e3, 3),
                    "warm_reopen_resolve_ms": round(t_warm_reopen * 1e3, 3),
                    "rebase_fold_ms": round(t_rebase * 1e3, 3),
                    "delta_publish_ms": round(t_delta_publish * 1e3, 3),
                    "layered_worst_depth": worst_depth,
                    "layered_depth_after_guard": depth_after_guard,
                    "lookup_us_at_worst_depth": round(t_deep_lookup * 1e6, 2),
                    "lookup_us_flat": round(t_flat_lookup * 1e6, 2),
                    "checkpoints": len(cold.checkpoints()),
                    "checkpoint_write_ms": round(t_ckpt_write * 1e3, 3),
                    "checkpoint_meta_bytes": len(json.dumps(meta)),
                    "checkpoint_parts": nparts,
                    "checkpoint_part_bytes": part_bytes,
                    "checkpoint_paths_only_read_ms": round(
                        t_paths_only * 1e3, 3
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
