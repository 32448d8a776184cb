"""Open-vocabulary stress for the Misra-Gries heavy hitters
(SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_heavy_hitters.py [n]``.

Distribution: half the stream is 100 hot tokens (the true heavy
hitters), half is a long uniform tail over ~n/8 DISTINCT junk tokens —
the open-vocabulary regime (URLs, ids, typos) where the naive plan's
shuffle carries one partial-count row per distinct token per partition,
while the MG plan's shuffle carries only O(partitions × k) candidate
strings plus the (tiny) exact recount of candidates.

Reports wall time and shuffle volume for the naive full group-count
plan vs the two-pass MG plan, then asserts identical results.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import shuffle_totals

N_HOT = 100
K_OUT = 400  # bar: cnt > n/400; hot tokens sit at ~n/200 each


def synth(spark, n: int):
    """Deterministic half-hot / half-open-tail token stream."""
    base = spark.range(n)
    coin = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2))
    hot = F.concat(
        F.lit("hot_"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_HOT))
    )
    # tail ids drawn from a domain of n/8 values: ~n/8 distinct junk
    # tokens appearing ~4 times each (n/2 draws over n/8 values)
    tail = F.concat(
        F.lit("tail_"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(max(n // 8, 1))),
    )
    return base.select(
        F.when(coin == 0, hot).otherwise(tail).alias("token")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000_000

    from aggregator_spark.operators.heavy_hitters import heavy_hitters
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="hh-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/hh_stress_tokens"
    synth(spark, n).write.mode("overwrite").parquet(path)
    items = spark.read.parquet(path)
    print(f"n={n} hot={N_HOT} tail_domain~{n // 8} k_out={K_OUT}")

    def naive(items):
        total = items.agg(F.count(F.lit(1)).alias("n_total"))
        return (
            items.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * K_OUT > F.col("n_total"))
            .select("token", "cnt")
        )

    results = {}
    for name, df in (
        ("naive_groupcount", naive(items)),
        ("mg_two_pass", heavy_hitters(items, "token", k_out=K_OUT)),
    ):
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        rows = df.collect()
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        results[name] = sorted((r["token"], r["cnt"]) for r in rows)
        print(
            f"{name}: {dt:.1f}s  rows={len(rows)}"
            f"  shuffle_read={(rd1-rd0)/1e9:.3f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.3f}GB"
        )

    assert results["naive_groupcount"] == results["mg_two_pass"]
    print("equality: OK", len(results["mg_two_pass"]), "heavy hitters")
    spark.stop()


if __name__ == "__main__":
    main()
