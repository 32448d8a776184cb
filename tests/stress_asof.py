"""Skew stress for the as-of join (SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_asof.py [n_left]``.

Distribution: 90% of left AND right rows carry ONE key (a hyper-hot
device), the rest spread over 1000 keys — the documented worst case for
the plain union-window formulation, whose per-key window puts the whole
hot key on one task. The bucketed variant windows on (key, hour bucket)
with per-bucket carry-in, so the hot key spreads over ~n_buckets tasks.

Reports wall time, max single-task duration (the straggler measure),
and shuffle volume for both variants, then asserts result equality.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import last_stage_id, max_task_duration_ms, shuffle_totals

HOT_FRAC = 0.9
N_KEYS = 1000
SPAN_HOURS = 24 * 30  # 30 days of events


def synth(spark, n: int, id_offset: int):
    """Deterministic skewed (k, t, id) rows: xxhash64-driven hot-key
    coin flip and uniform timestamps over the span."""
    base = spark.range(n).select((F.col("id") + id_offset).alias("rid"))
    coin = F.pmod(F.xxhash64("rid", F.lit(1)), F.lit(100))
    key = F.when(coin < int(HOT_FRAC * 100), F.lit(0)).otherwise(
        F.pmod(F.xxhash64("rid", F.lit(2)), F.lit(N_KEYS)) + 1
    )
    secs = F.pmod(F.xxhash64("rid", F.lit(3)), F.lit(SPAN_HOURS * 3600))
    return base.select(
        F.col("rid"),
        key.alias("k"),
        F.timestamp_seconds(F.lit(1704067200) + secs).alias("t"),
    )


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_right = n_left // 5

    from aggregator_spark.operators.asof import asof_join, asof_join_bucketed
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="asof-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    lpath, rpath = "/tmp/asof_stress_left", "/tmp/asof_stress_right"
    synth(spark, n_left, 0).write.mode("overwrite").parquet(lpath)
    # right must be unique per (k, t): dedup keeping max id
    synth(spark, n_right, 10**9).groupBy("k", "t").agg(
        F.max("rid").alias("rid")
    ).write.mode("overwrite").parquet(rpath)
    left = spark.read.parquet(lpath)
    right = spark.read.parquet(rpath)
    print(f"left={n_left} right~{n_right} hot_frac={HOT_FRAC}")

    kw = dict(on="k", left_time="t", right_time="t", right_cols=["rid", "t"])
    sums = {}
    for name, df in (
        ("plain", asof_join(left, right, **kw)),
        ("bucketed", asof_join_bucketed(left, right, bucket_seconds=3600, **kw)),
    ):
        stage0 = last_stage_id(spark) + 1
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        out = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("asof_rid")).alias("s"),
        )
        row = out.collect()[0]
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        worst_ms, _ = max_task_duration_ms(spark, min_stage_id=stage0)
        sums[name] = (row["n"], row["s"])
        print(
            f"{name}: {dt:.1f}s  max_task={worst_ms/1000:.1f}s"
            f"  shuffle_read={(rd1-rd0)/1e9:.2f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.2f}GB"
        )

    assert sums["plain"] == sums["bucketed"], sums
    print("equality: OK", sums["plain"])
    spark.stop()


if __name__ == "__main__":
    main()
