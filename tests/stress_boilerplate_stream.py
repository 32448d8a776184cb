"""Stress probe: the streaming boilerplate monitor's per-wave fold
cost must be BATCH-proportional, not corpus-proportional — the whole
point of maintaining the segment-df relation as summed deltas is that
a day's arrival costs a day's segmentation, however large the archive
has grown.

Method: feed a fixed-size wave (one sf0.1 documents copy, ~50k docs)
into a store that already holds K prior waves, for growing K; time
(a) the micro-batch fold and (b) the served rewrite of the WAVE
against the full accumulated df relation. (a) must stay ~flat in K;
(b) grows only with the served relation's aggregate (distinct
segments), not with raw corpus text.

Usage: python tests/stress_boilerplate_stream.py [n_waves]
(defaults 8). Run alone — no concurrent Spark sessions (the sweep
discipline from SCALE.md).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from aggregator_spark.schemas import load_testdata  # noqa: E402
from aggregator_spark.streaming.boilerplate_stream import (  # noqa: E402
    boilerplate_micro_batch,
    served_rewrite,
    served_seg_df,
)


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = load_testdata(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    root = tempfile.mkdtemp(prefix="boiler_stress_") + "/store"
    print(f"wave size: {n} docs; {n_waves} waves into {root}")
    for k in range(n_waves):
        # shift ids AND prefix every token with a wave tag (the
        # make_sf1 copy-letter discipline) so waves are disjoint
        # documents whose segments never collide cross-wave — the
        # served distinct-segment relation genuinely grows per wave,
        # while each wave keeps sf0.1's WITHIN-wave duplicate
        # structure for the df counts
        wave = docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", "(^| )", f"$1w{k}").alias("text"),
        )
        t0 = time.time()
        boilerplate_micro_batch(wave, k, root)
        fold_s = time.time() - t0
        t0 = time.time()
        df_rows = served_seg_df(spark, root).count()
        serve_agg_s = time.time() - t0
        t0 = time.time()
        served_rewrite(spark, root, wave).write.format("noop").mode(
            "overwrite"
        ).save()
        rewrite_s = time.time() - t0
        print(
            f"wave {k}: fold {fold_s:6.2f}s  served-df rows {df_rows}"
            f" ({serve_agg_s:5.2f}s)  wave-rewrite {rewrite_s:6.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
