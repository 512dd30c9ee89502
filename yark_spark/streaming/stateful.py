"""Custom stateful streaming operators via applyInPandasWithState
(north-star: 'applyInPandasWithState for custom stateful operators').

Implemented: per-user watch-session tracking with richer semantics than
session_window gives — a session closes after a gap, and the state carries
(session_start, last_seen, n_events, distinct-video count) so the emitted
record is a full session summary. State is per-key and timeout-driven via
EventTimeTimeout: a key times out when the WATERMARK passes its
last_seen + gap, which works identically in continuous runs and
drain-everything (availableNow) runs. ProcessingTimeTimeout would busy-loop
micro-batches under availableNow waiting for wall-clock time — event-time
timeouts are the only deterministic choice here.

Scale notes: state lives in the state store keyed by user — the shuffle is
on user_id only; each micro-batch touches only keys present in the batch
plus expiring timeouts.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("n_videos", LongType()),
        StructField("status", StringType()),  # 'open' | 'closed'
    ]
)

#: state tuple: (start_epoch_us, last_epoch_us, n_events, video_set_json)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("videos", StringType()),
    ]
)

GAP_SECONDS = 30 * 60


def _session_tracker(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Emit one row per closed session; keep the open session in state."""
    import json

    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n_events, videos = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n_events],
                "n_videos": [len(json.loads(videos))],
                "status": ["closed"],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("watched")
    if state.exists:
        start_us, last_us, n_events, videos = state.get
        vids = set(json.loads(videos))
    else:
        start_us, last_us, n_events, vids = None, None, 0, set()

    out = []
    for _, r in rows.iterrows():
        t_us = int(r["watched"].value // 1_000)
        if last_us is not None and t_us - last_us > GAP_SECONDS * 1_000_000:
            out.append((start_us, last_us, n_events, len(vids)))  # close previous
            start_us, n_events, vids = t_us, 0, set()
        if start_us is None:
            start_us = t_us
        last_us = t_us
        n_events += 1
        vids.add(r["video"])

    import json as _json

    state.update((start_us, last_us, n_events, _json.dumps(sorted(vids))))
    # event-time timeout: fire when the watermark passes last_seen + gap
    state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)

    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out],
                "n_events": [n for _, _, n, _ in out],
                "n_videos": [v for _, _, _, v in out],
                "status": ["closed"] * len(out),
            }
        )


def track_sessions(events: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """events(user_id long, video string, watched timestamp) stream →
    closed-session summaries. The watermark both bounds late data and
    drives session-timeout firing."""
    # ship this module BY VALUE: the tracker is module-level (testable), so
    # cloudpickle would otherwise serialize it by reference and every
    # Python worker would need yark_spark importable (true only when the
    # driver's cwd/sys.path reaches the repo)
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass
    return events.withWatermark("watched", watermark_delay).groupBy(
        "user_id"
    ).applyInPandasWithState(
        _session_tracker,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
