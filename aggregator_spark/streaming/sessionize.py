"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the designated extension point for operators
Structured Streaming lacks natively — SURVEY.md §2.9).

Semantics match the batch ``q_sessionize`` (analytics_queries.py): a
session is a maximal run of a user's events where consecutive gaps are
<= ``gap_seconds``. Sessions fully closed *within* a micro-batch (a
later event in the same batch starts a new session) are emitted
immediately; the trailing open session is kept in state and emitted by
event-time timeout once the watermark passes last_event + gap.

State per key = one (start, end, n_events) triple — O(1) regardless of
session length, the property that makes this sustainable at 100 TB/day
(contrast holding raw events per user). Late events inside the
watermark extend/merge the open session; events later than the
watermark are dropped upstream by the watermark operator, identical to
every other stateful op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# epoch-microsecond bounds + count; timestamps kept integral in state to
# avoid tz round-trips through the state serializer
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        user_id = key[0]

        def emit(start_us: int, end_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield emit(start_us, end_us, n)
            return

        # gather this batch's event times (µs, sorted)
        times: list[int] = []
        for pdf in pdf_iter:
            times.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
        times.sort()

        if state.exists:
            cur_start, cur_end, cur_n = state.get
        else:
            # zero-width sentinel just before the first event; the loop
            # below counts every event including the first
            cur_start, cur_end, cur_n = times[0], times[0] - 1, 0

        for t_us in times:
            if t_us - cur_end > gap_us and cur_n > 0:
                # closed within the batch — emit immediately
                yield emit(cur_start, cur_end, cur_n)
                cur_start, cur_end, cur_n = t_us, t_us, 1
            else:
                cur_end = max(cur_end, t_us)
                cur_start = min(cur_start, t_us)
                cur_n += 1

        state.update((cur_start, cur_end, cur_n))
        # close the open session when event-time passes end + gap
        state.setTimeoutTimestamp(cur_end // 1000 + gap_seconds * 1000)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """events stream → append-mode stream of closed sessions
    (user_id, session_start, session_end, n_events)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
