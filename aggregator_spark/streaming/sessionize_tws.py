"""Sessionization on the transformWithStateInPandas API (Spark 4's
successor to applyInPandasWithState): typed per-key ValueState, event-
time timers, and a StatefulProcessor lifecycle. Same semantics as
``streaming/sessionize.py`` — gap-closed sessions emit immediately,
the trailing open session emits when an event-time timer fires after
last_event + gap.

Kept alongside the applyInPandasWithState version deliberately: both
stateful APIs are part of the engine's surface, and the two
implementations cross-check each other in tests.

NOTE: the TWS runtime requires ``google.protobuf`` (its state server
protocol); in environments without it the test module skips and the
applyInPandasWithState implementation is the supported path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = "start_us long, end_us long, n_events long"


class SessionProcessor(StatefulProcessor):
    """Gap-based sessionizer; state = (start_us, end_us, n_events)."""

    def __init__(self, gap_seconds: int = 1800):
        self._gap_us = gap_seconds * 1_000_000
        self._gap_ms = gap_seconds * 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", STATE_SCHEMA)

    def _emit(self, user_id, start_us, end_us, n):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        user_id = key[0]
        times: list[int] = []
        for pdf in rows:
            times.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        times.sort()

        if self._session.exists():
            cur_start, cur_end, cur_n = self._session.get()
        else:
            cur_start, cur_end, cur_n = times[0], times[0] - 1, 0

        for t_us in times:
            if t_us - cur_end > self._gap_us and cur_n > 0:
                yield self._emit(user_id, cur_start, cur_end, cur_n)
                cur_start, cur_end, cur_n = t_us, t_us, 1
            else:
                cur_end = max(cur_end, t_us)
                cur_start = min(cur_start, t_us)
                cur_n += 1

        self._session.update((cur_start, cur_end, cur_n))
        # replace any pending timer with last_event + gap (ms)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(cur_end // 1000 + self._gap_ms)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._session.exists():
            start_us, end_us, n = self._session.get()
            self._session.clear()
            yield self._emit(key[0], start_us, end_us, n)

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream → append-mode closed sessions via
    transformWithStateInPandas with event-time timers."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .transformWithStateInPandas(
            SessionProcessor(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
