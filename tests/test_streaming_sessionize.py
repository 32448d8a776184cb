"""Stateful streaming sessionization (applyInPandasWithState) — the
custom-operator extension point. Verified against the batch definition:
gap-closed sessions are emitted with exact bounds and counts."""

from __future__ import annotations

import datetime

import pytest

from aggregator_spark.schemas import EVENTS
from aggregator_spark.streaming.sessionize import sessionize_stream

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _mk(event_id, minutes, user_id):
    return (
        event_id,
        T0 + datetime.timedelta(minutes=minutes),
        user_id,
        "click",
        1.0,
        "{}",
    )


@pytest.fixture
def session_rows(spark, tmp_path):
    """Two users; user 7 has two sessions split by a 60-min gap (> 30-min
    session gap); user 8 one session. A far-future flush event advances
    the watermark so timed-out sessions emit."""
    batch1 = [
        _mk(1, 0, 7),
        _mk(2, 10, 7),
        _mk(3, 20, 7),
        _mk(4, 80, 7),   # 60-min gap → new session
        _mk(5, 85, 7),
        _mk(6, 0, 8),
    ]
    flush = [_mk(99, 60 * 24, 999)]  # next day: watermark passes everything

    src = str(tmp_path / "events_stream")
    spark.createDataFrame(batch1, EVENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(flush, EVENTS).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM sessions_out").collect()


def test_sessions_emitted(spark, session_rows):
    by_user = {}
    for r in session_rows:
        by_user.setdefault(r["user_id"], []).append(r)

    u7 = sorted(by_user.get(7, []), key=lambda r: r["session_start"])
    assert len(u7) == 2, f"user 7 should have 2 closed sessions: {u7}"
    s1, s2 = u7
    assert s1["session_start"] == T0
    assert s1["session_end"] == T0 + datetime.timedelta(minutes=20)
    assert s1["n_events"] == 3
    assert s2["session_start"] == T0 + datetime.timedelta(minutes=80)
    assert s2["n_events"] == 2

    u8 = by_user.get(8, [])
    assert len(u8) == 1
    assert u8[0]["n_events"] == 1
    assert u8[0]["session_start"] == u8[0]["session_end"] == T0
