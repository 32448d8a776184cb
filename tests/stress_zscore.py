"""10M-event stress for the expanding z-score operator and the
interval-join catalog shape (SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_zscore.py [n_events]``.

Shape under test: one window exchange on the key, O(1) state per row
— the naive per-key range self-join would be quadratic in the hot
key. Uniform keys here (the skew remedy for windows is the same
time-bucketing as asof_join_bucketed, measured in stress_asof.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import shuffle_totals

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
    spark.stop()


if __name__ == "__main__":
    main()
