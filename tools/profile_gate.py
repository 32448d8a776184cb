"""Phase profile of the quality gate (guide §1: measure first).

Times, in one warm session with the noop sink, the gate's members
separately and composed, so the r14 fuse decision (VERDICT r13 item 4:
re-evaluate the gate gram-pass fusion at sf1) rests on measured phase
costs rather than the sf0.1 estimate:

  quality   — gopher_metrics + lang_id (JVM column exprs over the scan)
  contam    — contamination_flags(docs, benchmark_probes(docs), n=8)
              (Arrow 8-gram pass + broadcast probe join)
  spans     — dup_span_stats(docs, n=16) (Arrow 16-gram pass + window)
  gate      — corpus_keep_flags(docs) (all three joined)

Usage: python tools/profile_gate.py [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aggregator_spark.session import get_spark  # noqa: E402
from aggregator_spark.testdata_queries import load_testdata  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    import pyspark.sql.functions as F

    from aggregator_spark import llm_queries as L
    from aggregator_spark.operators import dedup as D
    from aggregator_spark.operators import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    docs.count()  # warm footers/scan

    def quality(d):
        m = X.gopher_metrics(F.col("text"))
        return d.select(
            "doc_id",
            m["gopher_pass"].alias("gopher_pass"),
            X.lang_id(F.col("text")).alias("lang_pred"),
        )

    def unfused_gate():
        # the r13 three-subtree composition (pre-fuse corpus_keep_flags)
        q = quality(docs)
        contam = X.contamination_flags(
            docs, L.benchmark_probes(docs), n=L.DECONTAM_N
        ).select("doc_id", "contaminated")
        spans = D.dup_span_stats(docs, n=L.DUP_SPAN_N).select(
            "doc_id", "dup_frac"
        )
        return (
            q.join(contam, "doc_id")
            .join(spans, "doc_id")
            .select(
                "doc_id",
                "gopher_pass",
                "lang_pred",
                "contaminated",
                "dup_frac",
                (
                    F.col("gopher_pass")
                    & (F.col("lang_pred") != "und")
                    & ~F.col("contaminated")
                    & (F.col("dup_frac") <= L.DUP_FRAC_MAX)
                ).alias("keep"),
            )
        )

    # "gate_unfused" is the inline three-subtree composition and
    # "gate" the shipped corpus_keep_flags — IDENTICAL trees after the
    # r14 fuse rejection (during the evaluation the fused candidate
    # temporarily lived in corpus_keep_flags; its numbers are recorded
    # in OPTIMIZATION_r14.md §Item 4). Keeping both phases lets a
    # re-run confirm they still coincide.
    phases = {
        "quality": lambda: quality(docs),
        "contam": lambda: X.contamination_flags(
            docs, L.benchmark_probes(docs), n=L.DECONTAM_N
        ),
        "spans": lambda: D.dup_span_stats(docs, n=L.DUP_SPAN_N),
        "gate_unfused": unfused_gate,
        "gate": lambda: L.corpus_keep_flags(docs),
    }
    for name, fn in phases.items():
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(f"profile_gate:{name}")
            fn().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(
            f"{name:8s} " + " ".join(f"{t:6.2f}" for t in ts),
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
