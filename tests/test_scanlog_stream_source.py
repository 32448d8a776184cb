"""Custom streaming source (SimpleDataSourceStreamReader): the scanlog
stream must emit exactly the deterministic batch_rows() content across
micro-batches, terminate when caught up, and survive checkpoint restart
without duplicating or losing rows."""

from __future__ import annotations

import datetime

from aggregator_spark.streaming.scanlog_source import (
    batch_rows,
    register_scanlog_source,
)


def test_stream_emits_deterministic_batches(spark, tmp_path):
    register_scanlog_source(spark)
    out: list = []
    q = (
        spark.readStream.format("scanlog")
        .option("rows_per_batch", "50")
        .option("max_batches", "3")
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: out.extend(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # availableNow snapshots only the first prefetched simple-reader
    # batch; processAllAvailable drains until read() reports caught-up
    q.processAllAvailable()
    q.stop()
    expected = [
        row
        for b in range(3)
        for row in batch_rows(b, 50, datetime.date(2016, 8, 5))
    ]
    assert sorted(out) == sorted(expected)
    assert len(out) == 150


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    register_scanlog_source(spark)
    ckpt = str(tmp_path / "ckpt2")
    seen: list = []

    def run(max_batches: int):
        q = (
            spark.readStream.format("scanlog")
            .option("rows_per_batch", "20")
            .option("max_batches", str(max_batches))
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: seen.extend(
                    tuple(r) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(2)  # first run consumes batches 0..1
    n_first = len(seen)
    assert n_first == 40
    run(4)  # restart with more data available: only batches 2..3 are new
    expected = [
        row
        for b in range(4)
        for row in batch_rows(b, 20, datetime.date(2016, 8, 5))
    ]
    assert sorted(seen) == sorted(expected)  # no dup, no loss
