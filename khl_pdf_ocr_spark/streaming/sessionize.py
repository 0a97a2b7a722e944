"""Custom stateful streaming operators.

The engine's batch sessionization (``__spark_entry__.queries()
['events_sessionize']``) re-expressed for unbounded streams:

- ``streaming_sessionize``  — per-user gap sessionization with
  ``applyInPandasWithState``: state = the open session (start, end,
  count); a new event either extends it or closes it (gap > threshold)
  and the CLOSED session is emitted.  Idle state times out via
  ``GroupStateTimeout.ProcessingTimeTimeout`` so abandoned users flush.
- ``streaming_windowed_counts`` — watermarked tumbling-window
  aggregation: late events beyond the watermark are dropped, finalized
  windows emit exactly once in append mode.

Both consume the (event_id, ts, user_id, event_type, value, props)
stream shape of the ``events`` table.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_sessionize", "streaming_windowed_counts", "SESSION_OUT_SCHEMA"]

SESSION_OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                      "session_end timestamp, n_events bigint")
_STATE_SCHEMA = "session_start timestamp, session_end timestamp, n_events bigint"


def _sessionize_group(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState,
                      gap_sec: int = 1800, idle_timeout_ms: int = 30_000):
    """Merge this micro-batch's events into the open session; emit every
    session closed by a gap; keep the trailing session open in state."""
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id], "session_start": [start],
                                "session_end": [end], "n_events": [int(n)]})
        return

    ts_all = []
    for pdf in pdfs:
        ts_all.extend(pdf["ts"].tolist())
    ts_all.sort()

    closed = []
    if state.exists:
        start, end, n = state.get
    else:
        start = end = None
        n = 0

    for t in ts_all:
        if start is None:
            start, end, n = t, t, 1
        elif (t - end).total_seconds() > gap_sec:
            closed.append((start, end, n))
            start, end, n = t, t, 1
        else:
            # a late cross-batch event may precede the stored bounds —
            # extend, never shrink, the session interval
            start = min(start, t)
            end = max(end, t)
            n += 1

    if start is not None:
        state.update((start, end, int(n)))
        state.setTimeoutDuration(idle_timeout_ms)

    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [c[0] for c in closed],
            "session_end": [c[1] for c in closed],
            "n_events": [int(c[2]) for c in closed],
        })


def streaming_sessionize(events: DataFrame, *, gap_sec: int = 1800,
                         idle_timeout_ms: int = 30_000) -> DataFrame:
    """events stream → closed-session stream (append mode)."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_sec, idle_timeout_ms)

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn,
                                    outputStructType=SESSION_OUT_SCHEMA,
                                    stateStructType=_STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def streaming_windowed_counts(events: DataFrame, *, window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup: (window_start, event_type,
    n_events, sum_value); late data beyond the watermark is dropped."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))
