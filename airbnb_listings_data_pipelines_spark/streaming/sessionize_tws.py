"""Gap sessionization on Spark 4's transformWithState API.

``transformWithStateInPandas`` is the successor to
``applyInPandasWithState`` (sessionize.py): an object-oriented
StatefulProcessor with named state variables and first-class event-time
timers instead of a single state tuple + one timeout slot. Same semantics
here as sessionize.sessionize — consecutive events of a user belong to one
session while gaps are <= ``gap_seconds``; in-data closes emit immediately
(closed_by='gap'), the trailing open session is held in a ValueState and
emitted when the watermark passes its timer (closed_by='timeout', bounded
state at any scale).

tests/test_sessionize.py asserts BOTH implementations produce identical
sessions on the same input — two independent stateful engines
cross-checking each other and the batch gaps-and-islands ground truth.

Runtime dependency note: transformWithState's Python worker talks to the
JVM state store through a protobuf-based state-server protocol, so
EXECUTING this operator requires ``google.protobuf`` on the Python path
(import of this module does not). In containers without protobuf (this
sandbox) the cross-check test skips with that reason and
``sessionize.sessionize`` (applyInPandasWithState, no protobuf needed)
remains the fully-exercised sessionizer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo, TimerValues
from pyspark.sql.types import LongType, StructField, StructType

from .sessionize import OUTPUT_SCHEMA

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _emit(user_id, start_us: int, last_us: int, n: int, closed_by: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "closed_by": [closed_by],
        }
    )


class SessionProcessor(StatefulProcessor):
    def __init__(self, gap_seconds: int):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if self.session.exists():
            s_start, s_last, s_n = self.session.get()
            # one logical timeout per key: drop the stale timer before
            # arming the new one (the old API's setTimeoutTimestamp did
            # this implicitly)
            for t_ms in self.handle.listTimers():
                self.handle.deleteTimer(t_ms)
        else:
            s_start, s_last, s_n = ts_us[0], ts_us[0], 0

        for t in ts_us:
            if s_n > 0 and t - s_last > self.gap_us:
                yield _emit(user_id, s_start, s_last, s_n, "gap")
                s_start, s_last, s_n = t, t, 1
            else:
                s_last = max(s_last, t)
                s_n += 1
        self.session.update((s_start, s_last, s_n))
        self.handle.registerTimer(s_last // 1000 + self.gap_ms)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self.session.exists():
            s_start, s_last, s_n = self.session.get()
            self.session.clear()
            yield _emit(user_id, s_start, s_last, s_n, "timeout")

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Sessionize a streaming events DataFrame (``ts`` timestamp,
    ``user_id``) via transformWithStateInPandas."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
