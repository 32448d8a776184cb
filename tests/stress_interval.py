"""Scale stress for the interval (bounded time-range) join
(SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_interval.py [n_left]``.

Compares operators/asof.py:interval_join (bucketed equi-join on
(key, time bucket)) against the NAIVE formulation Spark plans for a
plain inequality join — a per-key theta join that degenerates into a
nested loop over each key group. Same 90%-one-key skew shape as the
as-of stress: the naive form must compare the hot key's left rows
against ALL its right rows (quadratic in the hot key); the bucketed
form only pairs rows whose buckets align.

Both variants aggregate to (pair count, checksum) and must be equal.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import last_stage_id, max_task_duration_ms, shuffle_totals

HOT_FRAC = 0.9
N_KEYS = 1000
SPAN_HOURS = 24 * 30
WINDOW_S = 30  # right rows in [left_t - 30s, left_t): ~10 matches
# per hot-key row at 1M — pair volume stays linear-ish; the cost
# asymmetry under test is comparisons, not output size


def synth(spark, n: int, id_offset: int):
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
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_right = n_left

    from aggregator_spark.operators.asof import interval_join
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="interval-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    lpath, rpath = "/tmp/interval_stress_left", "/tmp/interval_stress_right"
    synth(spark, n_left, 0).write.mode("overwrite").parquet(lpath)
    synth(spark, n_right, 10**9).withColumnRenamed("t", "rt").write.mode(
        "overwrite"
    ).parquet(rpath)
    left = spark.read.parquet(lpath)
    right = spark.read.parquet(rpath)
    print(f"left={n_left} right={n_right} hot_frac={HOT_FRAC} window={WINDOW_S}s")

    bucketed = interval_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="rt",
        right_cols=["rid"],
        lower_seconds=-WINDOW_S,
        upper_seconds=0,
    ).select(F.col("rid").alias("lid"), F.col("r_rid").alias("rrid"))

    # the naive form enumerates the hot key group quadratically
    # (0.9n × 0.9n comparisons inside one join group) — run it at a
    # capped size, with the bucketed form at the SAME size for the
    # equality assert, plus the bucketed form at full size to show it
    # keeps scaling where the naive form cannot be run at all
    n_naive = min(n_left, 100_000)
    lsmall = left.filter(F.col("rid") < n_naive)
    rsmall = right.filter(F.col("rid") - 10**9 < n_naive)
    bucketed_small = interval_join(
        lsmall, rsmall, on="k", left_time="t", right_time="rt",
        right_cols=["rid"], lower_seconds=-WINDOW_S, upper_seconds=0,
    ).select(F.col("rid").alias("lid"), F.col("r_rid").alias("rrid"))
    naive_small = lsmall.alias("L").join(
        rsmall.alias("R"),
        (F.col("L.k") == F.col("R.k"))
        & (F.col("R.rt") >= F.col("L.t") - F.expr(f"INTERVAL {WINDOW_S} SECOND"))
        & (F.col("R.rt") < F.col("L.t")),
        "inner",
    ).select(F.col("L.rid").alias("lid"), F.col("R.rid").alias("rrid"))

    sums = {}
    for name, df in (
        (f"bucketed@{n_left}", bucketed),
        (f"bucketed@{n_naive}", bucketed_small),
        (f"naive@{n_naive}", naive_small),
    ):
        stage0 = last_stage_id(spark) + 1
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("lid") + F.col("rrid")).alias("s"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        worst_ms, _ = max_task_duration_ms(spark, min_stage_id=stage0)
        sums[name] = (row["n"], row["s"])
        print(
            f"{name}: {dt:.1f}s  max_task={worst_ms/1000:.1f}s"
            f"  shuffle_read={(rd1-rd0)/1e9:.2f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.2f}GB"
        )

    assert sums[f"bucketed@{n_naive}"] == sums[f"naive@{n_naive}"], sums
    print("equality: OK", sums[f"bucketed@{n_naive}"])
    spark.stop()


if __name__ == "__main__":
    main()
