"""Hot-group stress for the distributed ranking family: 90% of rows in
ONE group (the crawl-scale "one source is most of the corpus" shape).
The plain percent_rank window drags the hot group onto a single task;
``percent_rank_bucketed`` bounds per-task input by (tie-group,
id-range) — identical doubles, measured straggler difference.
Scores are 8 discrete levels (the quality-score regime: ties are the
common case, so the id-range split inside a tie-group is what bounds
the task, not the score split).

Not a pytest — run ad hoc: ``python tests/stress_rankdist.py [n_rows]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from stress_util import last_stage_id, max_task_duration_ms

N_GROUPS = 10


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

    from aggregator_spark.operators.rankdist import percent_rank_bucketed
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="rankdist-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/rankdist_stress_docs"
    coin = F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100))
    spark.range(n).select(
        F.col("id"),
        F.when(coin < 90, F.lit("hot"))
        .otherwise(
            F.concat(
                F.lit("g"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_GROUPS - 1))
                .cast("string"),
            )
        )
        .alias("g"),
        (
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(8)).cast("double")
            / 10.0
        ).alias("s"),
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    print(f"rows={n} groups={N_GROUPS} (90% in one)")

    w = Window.partitionBy("g").orderBy(F.col("s").desc_nulls_last(), "id")
    plain = df.select("id", F.percent_rank().over(w).alias("pct"))
    bucketed = percent_rank_bucketed(df, "g", "s", "id").select(
        "id", "pct_rank"
    )

    outs = {}
    for name, out in (("plain@90%-one-group", plain),
                      ("bucketed@90%-one-group", bucketed)):
        stage0 = last_stage_id(spark) + 1
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        worst_ms, worst_tasks = max_task_duration_ms(
            spark, min_stage_id=stage0
        )
        outs[name] = out
        print(f"{name}: {dt:.1f}s  max_task={worst_ms/1000:.1f}s")

    t0 = time.perf_counter()
    mism = (
        outs["plain@90%-one-group"]
        .join(
            outs["bucketed@90%-one-group"].withColumnRenamed(
                "pct_rank", "pct_b"
            ),
            "id",
        )
        .filter(F.col("pct") != F.col("pct_b"))
        .count()
    )
    print(
        f"equality: mismatches={mism} ({time.perf_counter()-t0:.1f}s)"
    )
    assert mism == 0
    spark.stop()


if __name__ == "__main__":
    main()
