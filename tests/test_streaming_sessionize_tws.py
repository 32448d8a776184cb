"""transformWithStateInPandas sessionization must produce the same
closed sessions as the applyInPandasWithState implementation.

The TWS runtime needs google.protobuf (its state server speaks
protobuf); when the dependency is absent the whole module is skipped —
the applyInPandasWithState twin (test_streaming_sessionize.py) covers
the semantics either way."""

from __future__ import annotations

import datetime

import pytest

try:
    from google.protobuf import descriptor  # noqa: F401

    _HAVE_PROTOBUF = True
except ImportError:
    _HAVE_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAVE_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf "
    "(not available in this environment)",
)

from aggregator_spark.schemas import EVENTS
from aggregator_spark.streaming.sessionize_tws import sessionize_stream_tws

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


def test_tws_sessions(spark, tmp_path):
    batch1 = [
        _mk(1, 0, 7),
        _mk(2, 10, 7),
        _mk(3, 20, 7),
        _mk(4, 80, 7),
        _mk(5, 85, 7),
        _mk(6, 0, 8),
    ]
    flush = [_mk(99, 60 * 24, 999)]
    src = str(tmp_path / "ev_tws")
    spark.createDataFrame(batch1, EVENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = sessionize_stream_tws(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
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

    rows = spark.sql("SELECT * FROM tws_out").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    u7 = sorted(by_user.get(7, []), key=lambda r: r["session_start"])
    assert len(u7) == 2
    assert u7[0]["n_events"] == 3 and u7[1]["n_events"] == 2
    assert u7[0]["session_start"] == T0
    assert u7[0]["session_end"] == T0 + datetime.timedelta(minutes=20)
    assert by_user.get(8, [])[0]["n_events"] == 1
