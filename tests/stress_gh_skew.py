"""Hot-gram straggler probe for the gh skew guard (r14, VERDICT r13
what's-wrong #3) — not a pytest, run ad hoc:

    python tests/stress_gh_skew.py [n_docs ...]

Corpus: ``hot_frac`` of the docs are EXACTLY one shared 16-word
boilerplate header (one gram, df = hot_frac x n_docs — the hot key);
the rest are 24 unique words (df = 1 grams). The fixture corpus cannot
manufacture this shape (max df = 4 at sf0.1), which is why the guard
is measured here instead of in the bench.

For each form (window default vs AGGREGATOR_SPARK_GH_SKEW_SAFE=1) and
each scale, reports the wall time of ``dup_span_stats`` and
``dedup_span_rewrite`` plus the MAX SINGLE-TASK duration
(stress_util.max_task_duration_ms) — the straggler measure: the window
form's max task holds every occurrence of the hot gram on one reducer
and grows linearly with its df; the skew-safe form's per-gh reduction
partial-combines map-side, so its max task tracks the uniform
partition size."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from stress_util import max_task_duration_ms

HOT_FRAC = 0.9


def corpus(spark, n_docs: int):
    header = " ".join(f"h{i}" for i in range(16))
    cut = int(n_docs * HOT_FRAC)
    tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"w{j}_"), F.col("id")) for j in range(24)]
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < cut, F.lit(header))
            .otherwise(tail)
            .alias("text"),
        )
        .localCheckpoint(eager=True)  # generation excluded from timing
    )


def main(scales: list[int]) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from aggregator_spark.operators.dedup import (
        dedup_span_rewrite,
        dup_span_stats,
    )
    from aggregator_spark.session import get_spark

    spark = get_spark(
        "gh-skew-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    for n in scales:
        docs = corpus(spark, n)
        for form, env in (("window", "0"), ("skewsafe", "1")):
            os.environ["AGGREGATOR_SPARK_GH_SKEW_SAFE"] = env
            for op_name, op in (
                ("dup_span_stats", dup_span_stats),
                ("dedup_span_rewrite", dedup_span_rewrite),
            ):
                floor = sc.parallelize([0]).count() or 0  # bump stage id
                import json as _json
                import urllib.request as _rq

                base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
                stages = _json.load(_rq.urlopen(f"{base}/stages"))
                min_sid = max((s["stageId"] for s in stages), default=0) + 1
                t0 = time.time()
                op(docs).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                worst_ms, _ = max_task_duration_ms(spark, min_sid)
                print(
                    f"n={n} hot_df={int(n*HOT_FRAC)} {form:8s} "
                    f"{op_name:18s} wall={wall:6.2f}s "
                    f"max_task={worst_ms/1000:6.2f}s",
                    flush=True,
                )
        docs.unpersist()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [200_000, 600_000])
