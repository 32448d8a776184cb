"""Large-corpus stress for the late round-6 text operators: BM25
postings+scoring, DSIR weights, bigram LM scoring, duplicated-span
rewrite (SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_text2.py [n_docs]``.

Corpus model: the bounded-branching token walk from stress_graph.py
(vocabulary-bounded adjacency), with every 1000th document an exact
copy of doc 0 so the span rewrite has real cross-document duplicates
to excise. Reports wall time and shuffle totals per operator via the
Spark status REST API.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_graph import synth_docs
from stress_util import shuffle_totals

BM25_STRESS_QUERIES = [(0, "t17 t119"), (1, "t5 t35 t245"), (2, "t9999")]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from aggregator_spark.operators.corpus import bigram_logprob, dsir_weights
    from aggregator_spark.operators.dedup import dedup_span_rewrite
    from aggregator_spark.operators.retrieval import bm25_postings, bm25_score
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="text2-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/text2_stress_docs"
    base = synth_docs(spark, n_docs)
    dup0 = base.filter(F.col("doc_id") == 0).select("text")
    docs = base.withColumn(
        "text",
        F.when(
            (F.col("doc_id") % 1000 == 0) & (F.col("doc_id") > 0),
            F.lit(dup0.collect()[0]["text"]),
        ).otherwise(F.col("text")),
    )
    docs.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    print(f"docs={n_docs} (every 1000th a copy of doc 0)")

    postings_path = "/tmp/text2_stress_postings"

    def run(name, thunk):
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        print(
            f"{name}: {dt:.1f}s  shuffle_read={(rd1-rd0)/1e9:.2f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.2f}GB"
        )

    run(
        "bm25_postings_build",
        lambda: bm25_postings(docs)
        .write.mode("overwrite")
        .parquet(postings_path),
    )
    postings = spark.read.parquet(postings_path)
    run(
        "bm25_score(3 queries, stats recomputed)",
        lambda: bm25_score(postings, BM25_STRESS_QUERIES)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # ingest-rolled stats: df + scalars from parquet, the way
    # sources/bm25_index.py serves them
    from aggregator_spark.operators.retrieval import bm25_stats

    dfreq_built, scalars_built = bm25_stats(postings)
    dfreq_built.write.mode("overwrite").parquet("/tmp/text2_stress_df")
    scalars_built.write.mode("overwrite").parquet("/tmp/text2_stress_sc")
    dfreq = spark.read.parquet("/tmp/text2_stress_df")
    scalars = spark.read.parquet("/tmp/text2_stress_sc")
    run(
        "bm25_score(3 queries, indexed stats)",
        lambda: bm25_score(
            postings, BM25_STRESS_QUERIES, dfreq=dfreq, scalars=scalars
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    run(
        "dsir_weights",
        lambda: dsir_weights(docs, target_filter=F.col("doc_id") % 7 == 0)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    run(
        "bigram_logprob",
        lambda: bigram_logprob(docs)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    # reuse the catalog's PMI query over the synthetic corpus by
    # swapping the loader it closed over (imported into the module
    # namespace, so patch THERE)
    def pmi_run():
        import aggregator_spark.analytics_queries10 as aq10

        orig = aq10.load_testdata
        try:
            aq10.load_testdata = lambda spark_, sf_dir_, *t: docs
            aq10.q_pmi_collocations(spark, "unused").write.format(
                "noop"
            ).mode("overwrite").save()
        finally:
            aq10.load_testdata = orig

    run("pmi_collocations", pmi_run)

    run(
        "dedup_span_rewrite",
        lambda: dedup_span_rewrite(docs)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
