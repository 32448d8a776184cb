"""Stream-stream attribution join: time-bounded, watermarked, verified
against the exact expected pair set."""

from __future__ import annotations

import datetime

from aggregator_spark.schemas import EVENTS
from aggregator_spark.streaming.joins import attribution_join

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _mk(event_id, minutes, user_id, etype):
    return (
        event_id,
        T0 + datetime.timedelta(minutes=minutes),
        user_id,
        etype,
        1.0,
        "{}",
    )


def test_attribution_join(spark, tmp_path):
    rows = [
        _mk(1, 0, 7, "click"),
        _mk(2, 30, 7, "click"),
        _mk(3, 45, 7, "purchase"),   # attributes clicks 1 and 2
        _mk(4, 200, 7, "click"),
        _mk(5, 290, 7, "purchase"),  # click 4 is 90 min before → outside 1h
        _mk(6, 10, 8, "click"),      # other user, no purchase
    ]
    src = str(tmp_path / "events_join")
    spark.createDataFrame(rows, EVENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = attribution_join(stream, attribution="1 hour", watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_join"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == {(3, 1), (3, 2)}


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static broadcast enrichment: every micro-batch row picks
    up the dimension snapshot's attributes; unmatched rows survive with
    NULLs (UPDATE-FROM keep-on-no-match analog). No watermark needed —
    the static side holds no state."""
    from aggregator_spark.streaming.joins import static_enrich

    rows = [_mk(1, 0, 7, "click"), _mk(2, 5, 8, "view"), _mk(3, 9, 99, "click")]
    src = str(tmp_path / "events_enrich")
    spark.createDataFrame(rows, EVENTS).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    dim = spark.createDataFrame(
        [(7, "alice", "gold"), (8, "bob", "basic")],
        "user_id long, name string, segment string",
    )

    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = static_enrich(stream, dim)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["event_id"]: (r["name"], r["segment"])
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    assert got == {
        1: ("alice", "gold"),
        2: ("bob", "basic"),
        3: (None, None),  # user 99 not in the dim: kept, not dropped
    }
