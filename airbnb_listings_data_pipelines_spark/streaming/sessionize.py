"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

This is the pattern for operators Spark's built-in streaming aggregates
can't express (SURVEY §2.9 extension; the batch twin is
queries/streaming_batch.q23): per-key state carried across micro-batches,
Arrow-batched pandas logic, event-time timeouts evicting idle state.

Semantics: events for a user belong to one session while consecutive gaps
are <= ``gap`` seconds. Sessions closed *within* the data are emitted as
they are detected; the trailing open session per user is held in state and
emitted when the event-time watermark passes its timeout (state eviction —
bounded memory at any scale).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, closed_by string"
)
STATE_SCHEMA = "start_us long, last_us long, n long"


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            s_start, s_last, s_n = state.get
        else:
            s_start, s_last, s_n = ts_us[0], ts_us[0], 0  # no events counted yet

        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if s_n > 0 and t - s_last > gap_us:
                closed.append((s_start, s_last, s_n))
                s_start, s_last, s_n = t, t, 1
            else:
                s_last = max(s_last, t)
                s_n += 1
        state.update((s_start, s_last, s_n))
        state.setTimeoutTimestamp(s_last // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(a, unit="us") for a, _, _ in closed],
                    "session_end": [pd.Timestamp(b, unit="us") for _, b, _ in closed],
                    "n_events": [c for _, _, c in closed],
                    "closed_by": ["gap"] * len(closed),
                }
            )

    return fn


def sessionize(events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour") -> DataFrame:
    """Stateful sessionization over a streaming events DataFrame (must have
    ``ts`` timestamp and ``user_id``)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
