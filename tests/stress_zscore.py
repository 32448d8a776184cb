"""10M-event stress for the expanding z-score operator: uniform-key
wall/shuffle, plus the 90%-one-key skew comparison of the plain form
(whole hot key on ONE task) vs ``expanding_zscore_bucketed``
(per-task input bounded by the key's per-bucket rows) — SCALE.md
stress table.

Not a pytest — run ad hoc: ``python tests/stress_zscore.py [n_events]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import last_stage_id, max_task_duration_ms, shuffle_totals

N_USERS = 1_000_000
SPAN_S = 30 * 24 * 3600


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from aggregator_spark.operators.anomaly import expanding_zscore
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="zscore-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/zscore_stress_events"
    spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_USERS)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(SPAN_S))
        ).alias("ts"),
        (
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)).cast("double")
            / 100.0
        ).alias("value"),
    ).write.mode("overwrite").parquet(path)
    events = spark.read.parquet(path)
    print(f"events={n} users={N_USERS}")

    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    out = expanding_zscore(events)
    row = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("is_anomaly").cast("long")).alias("anomalies"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    rd1, wr1 = shuffle_totals(spark)
    print(
        f"expanding_zscore: {dt:.1f}s  rows={row['rows']}"
        f"  anomalies={row['anomalies']}"
        f"  shuffle_read={(rd1-rd0)/1e9:.2f}GB"
        f"  shuffle_write={(wr1-wr0)/1e9:.2f}GB"
    )

    # 90%-one-key skew: plain puts the hot user's whole history on one
    # task; bucketed bounds per-task input by the per-bucket rows
    from aggregator_spark.operators.anomaly import expanding_zscore_bucketed

    n_skew = n // 2
    skew_path = "/tmp/zscore_stress_skewed"
    coin = F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100))
    spark.range(n_skew).select(
        F.col("id").alias("event_id"),
        F.when(coin < 90, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_USERS)) + 1)
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(SPAN_S))
        ).alias("ts"),
        (
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)).cast("double")
            / 100.0
        ).alias("value"),
    ).write.mode("overwrite").parquet(skew_path)
    skewed = spark.read.parquet(skew_path)

    sums = {}
    for name, df in (
        ("plain@90%-one-key", expanding_zscore(skewed)),
        (
            "bucketed@90%-one-key",
            expanding_zscore_bucketed(skewed, bucket_seconds=3600),
        ),
    ):
        stage0 = last_stage_id(spark) + 1
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("is_anomaly").cast("long")).alias("anomalies"),
            F.sum("n_prior").alias("np"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        worst_ms, _ = max_task_duration_ms(spark, min_stage_id=stage0)
        sums[name] = (row["rows"], row["anomalies"], row["np"])
        print(
            f"{name}: {dt:.1f}s  max_task={worst_ms/1000:.1f}s"
            f"  rows={row['rows']} anomalies={row['anomalies']}"
        )
    assert len(set(sums.values())) == 1, sums
    print("equality: OK", next(iter(sums.values())))
    spark.stop()


if __name__ == "__main__":
    main()
