"""Streaming windowed approximate percentiles: percentile_approx (the
mergeable Greenwald-Khanna sketch) must work inside a watermarked
streaming window aggregation and agree with the identical batch
aggregation over the same data — pinning that the batch quantile
surface carries over to streams unchanged."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aggregator_spark.schemas import EVENTS

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _mk(event_id, minutes, value):
    return (
        event_id,
        T0 + datetime.timedelta(minutes=minutes),
        event_id % 5,
        "click",
        float(value),
        "{}",
    )


def _agg(df):
    return df.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.percentile_approx("value", [0.5, 0.95], 1000).alias("qs"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        F.col("w.start").alias("ws"), "qs", "cnt"
    )


def test_streaming_percentile_matches_batch(spark, tmp_path):
    rows = [_mk(i, i % 120, (i * 37) % 500) for i in range(600)]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, EVENTS).coalesce(2).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    q = (
        _agg(stream.withWatermark("ts", "10 minutes"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_q")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["ws"]: (list(r["qs"]), r["cnt"])
        for r in spark.sql("SELECT * FROM stream_q").collect()
    }
    want = {
        r["ws"]: (list(r["qs"]), r["cnt"])
        for r in _agg(spark.read.parquet(src)).collect()
    }
    assert got == want
    assert len(want) == 2  # two hourly windows
