"""transformWithStateInPandas sessionizer (streaming/incremental.py).

The Spark 4 stateful API needs google.protobuf for its state-server wire
format; that package is absent in this sandbox, so the end-to-end test
importorskips — the documented environment gap, same pattern as
test_delta_merge.py. Anywhere protobuf IS present, the TWS sessionizer
runs for real and must emit exactly the sessions the GroupState form
emits (both share the `_merge_event_time_sessions` core, which the
always-running tests below pin directly).
"""

from __future__ import annotations

import datetime as dt
import json

import pandas as pd
import pytest

from modular_etl_data_platform_spark.streaming.incremental import (
    _has_tws_runtime,
    _merge_event_time_sessions,
    sessionize_events_event_time,
    sessionize_events_event_time_best,
)

GAP_MS = 60 * 60_000  # 1 hour


def _ts(minute):
    return pd.Timestamp(2024, 1, 1) + pd.Timedelta(minutes=minute)


def _batch(*minutes_values):
    return pd.DataFrame(
        {"ts": [_ts(m) for m, _ in minutes_values],
         "value": [v for _, v in minutes_values]}
    )


# -- pure core: always runs -------------------------------------------------

def test_merge_core_splits_on_gap_and_chains_open_session():
    closed, cur = _merge_event_time_sessions(
        _batch((0, 1.0), (30, 2.0), (120, 4.0)), None, GAP_MS
    )
    assert [c[2:] for c in closed] == [[2, 3.0]]  # first session: 2 events
    assert closed[0][0] == _ts(0) and closed[0][1] == _ts(30)
    assert cur == [_ts(120), _ts(120), 1, 4.0]

    # an out-of-order batch BEFORE the open session extends backwards
    closed2, cur2 = _merge_event_time_sessions(
        _batch((100, 8.0)), cur, GAP_MS
    )
    assert closed2 == []
    assert cur2 == [_ts(100), _ts(120), 2, 12.0]


def test_merge_core_bridging_event_merges_neighbor_sessions():
    closed, cur = _merge_event_time_sessions(
        _batch((0, 1.0), (150, 2.0)), None, GAP_MS
    )
    assert len(closed) == 1 and cur[0] == _ts(150)
    # bridging events within the 60-min gap chain 0..150 into ONE session
    closed, cur = _merge_event_time_sessions(
        _batch((0, 1.0), (50, 2.0), (100, 4.0), (150, 8.0)), None, GAP_MS
    )
    assert closed == [] and cur == [_ts(0), _ts(150), 4, 15.0]


def test_best_selector_matches_runtime_availability(spark, tmp_path):
    """In this sandbox (no protobuf) `best` must resolve to the
    GroupState implementation and produce a runnable streaming plan."""
    assert not _has_tws_runtime()
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).json(str(src))
    df = sessionize_events_event_time_best(stream, gap_minutes=60)
    assert df.isStreaming
    assert set(df.columns) == {
        "user_id", "session_start", "session_end", "n_events", "total_value"
    }


# -- end-to-end TWS: runs wherever protobuf exists --------------------------

@pytest.mark.skipif(not _has_tws_runtime(), reason="google.protobuf absent: transformWithStateInPandas state server cannot start in this sandbox")
def test_tws_sessionizer_matches_groupstate_sessionizer(spark, tmp_path):
    from modular_etl_data_platform_spark.streaming.incremental import (
        sessionize_events_event_time_tws,
    )

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, 1.0), (1, 30, 2.0), (1, 200, 4.0),   # user 1: 2 sessions
        (2, 10, 8.0), (2, 400, 16.0),               # user 2: 2 sessions
    ]
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(
                {"user_id": u,
                 "ts": (base + dt.timedelta(minutes=m)).isoformat(),
                 "value": v}
            )
            for u, m, v in rows
        )
    )

    def run(sessionizer, name):
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).json(str(src))
        q = (
            sessionizer(stream, gap_minutes=60, watermark="36500 days")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            tuple(r)
            for r in spark.table(name)
            .select("user_id", "session_start", "session_end", "n_events", "total_value")
            .collect()
        }

    got_tws = run(sessionize_events_event_time_tws, "tws_sessions")
    got_gs = run(sessionize_events_event_time, "gs_sessions")
    assert got_tws == got_gs and len(got_tws) >= 2
