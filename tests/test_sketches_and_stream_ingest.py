"""HLL sketch merge invariants + scanlog-source → streaming-ingest
integration (the custom stream feeding the stage-1 streaming twin)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aggregator_spark.operators.sketches import (
    daily_user_sketches,
    monthly_distinct_users,
)
from aggregator_spark.schemas import load_testdata
from aggregator_spark.streaming.ingest import streaming_daily_counts
from aggregator_spark.streaming.scanlog_source import (
    batch_rows,
    register_scanlog_source,
)

SF = "/root/testdata/sf0.001"


def test_sketch_merge_equals_direct_sketch(spark):
    """union(daily sketches) must estimate EXACTLY what one sketch over
    the whole month estimates — merge is register-max, lossless."""
    events = load_testdata(spark, SF, "events")
    merged = {
        (r["month"], r["est_users"])
        for r in monthly_distinct_users(events).collect()
    }
    direct = {
        (r["month"], r["est_users"])
        for r in events.groupBy(
            F.date_trunc("month", "ts").cast("date").alias("month")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            )
            .cast("long")
            .alias("est_users")
        )
        .collect()
    }
    assert merged == direct


def test_sketch_estimate_near_exact(spark):
    events = load_testdata(spark, SF, "events")
    est = {r["day"]: r["est_users"] for r in daily_user_sketches(events).collect()}
    exact = {
        r["day"]: r["n"]
        for r in events.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(2, 0.05 * n)


def test_scanlog_stream_feeds_daily_ingest(spark, tmp_path):
    """Custom streaming source → watermark+window ingest must equal the
    batch recompute over the same deterministic rows."""
    register_scanlog_source(spark)
    stream = (
        spark.readStream.format("scanlog")
        .option("rows_per_batch", "80")
        .option("max_batches", "3")
        .load()
    )
    agg = streaming_daily_counts(stream, watermark="0 seconds")
    out: list = []
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(
            lambda df, bid: (out.clear(), out.extend(map(tuple, df.collect())))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = [
        r
        for b in range(3)
        for r in batch_rows(b, 80, datetime.date(2016, 8, 5))
    ]
    batch_df = spark.createDataFrame(
        rows, "date timestamp, ip string, risk int, asn long, country string"
    )
    expected = {
        tuple(r)
        for r in batch_df.groupBy(
            F.date_trunc("day", "date").alias("date"),
            "risk",
            "asn",
            "country",
        )
        .agg(F.approx_count_distinct("ip").alias("count"))
        .collect()
    }
    assert set(out) == expected


def test_cms_counters_streaming_equals_batch(spark, tmp_path):
    """The Count-Min counter build is pure relational ops (explode +
    additive agg), so the SAME function runs unchanged on a stream
    (complete output mode — the sink holds the current counter table)
    and must equal the batch build over the same rows (the mergeable-
    sketch contract, incl. accumulation across two micro-batches)."""
    from aggregator_spark.operators.sketches import cms_build

    events = load_testdata(spark, SF, "events").select("event_id", "user_id")
    src = str(tmp_path / "cms_stream")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("event_id long, user_id long").parquet(
        src
    )
    q = (
        cms_build(stream, "user_id")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        second.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_out").collect()
    }
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(events, "user_id").collect()
    }
    assert got == want
