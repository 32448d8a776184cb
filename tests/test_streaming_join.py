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


def test_attribution_join_matches_batch_interval_join(spark, tmp_path):
    """Family consistency: the watermarked stream-stream attribution
    join produces exactly the pairs the BATCH interval join does on
    the same log (inclusive-both-ends attribution window == interval
    join's half-open window nudged +1us on the upper bound)."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.asof import interval_join

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    src = str(tmp_path / "events_attr_parity")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).parquet(src)
    q = (
        attribution_join(stream, attribution="1 hour", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_parity_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_parity"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attr_parity_out").collect()
    }

    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = {
        (r["purchase_id"], r["r_click_id"])
        for r in interval_join(
            purchases,
            clicks,
            on="user_id",
            left_time="ts",
            right_time="click_ts",
            right_cols=["click_id"],
            lower_seconds=-3600,
            upper_seconds=0.000001,  # half-open +1us == inclusive <=
        ).collect()
    }
    assert got == want and len(want) > 0
