"""Combined-cost stress for the COMPOSED corpus-preparation pipeline
(`corpus_prepare_e2e`: quality gate → fuzzy dedup → span removal →
chunk → pack) — SCALE.md stress table.

Not a pytest — run ad hoc:
``python tests/stress_corpus_prepare.py [n_docs]`` (default 500_000).

Corpus: deterministic 30-word texts over a 5k-word vocabulary, with
the failure modes each stage exists for, at realistic rates:
- ~1% of docs are verbatim copies of another doc (fuzzy-dedup load),
- ~10% share one of 20 verbatim 16-word boilerplate headers
  (span-removal load — the header is excised everywhere but its first
  occurrence),
- ~2% are 5-word shorts (Gopher length floor drops them).

Reports wall time and total shuffle read/write for the single
composed action, plus stage-semantics sanity counts (quality drops,
fuzzy drops, span-rewritten docs, packed chunks). The question this
answers for 100 TB: does chaining the stages multiply their shuffle
budgets or just add them (it adds — each stage's shuffle is keyed and
sized by ITS input, and the checkpointed keep-list keeps the quality
gate from running twice)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import shuffle_totals

VOCAB = 5_000
WORDS = 64  # Gopher floor is 50 words
HEADER_WORDS = 16
N_HEADERS = 20
MARKERS = ("the", "of", "and", "a")  # every 6th word: passes lang_id


def synth_docs(spark, n: int):
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # ~1% verbatim duplicate of doc_id % 997; ~2% short docs
    src_id = F.when(
        F.col("doc_id") % 100 == 37, F.col("doc_id") % 997
    ).otherwise(F.col("doc_id"))
    n_words = F.when(F.col("doc_id") % 50 == 11, F.lit(5)).otherwise(
        F.lit(WORDS)
    )
    words = [
        F.when(
            F.lit(i) < n_words,
            F.lit(MARKERS[(i // 6) % 4])
            if i % 6 == 0
            else F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(src_id, F.lit(i)), F.lit(VOCAB)),
            ),
        )
        for i in range(WORDS)
    ]
    body = F.concat_ws(" ", *words)  # concat_ws skips NULL slots
    # ~10%: prepend one of N_HEADERS shared 16-word boilerplate headers
    header_id = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("h")), F.lit(10))
    hwords = [
        F.concat(
            F.lit("hdr"),
            F.pmod(F.col("doc_id"), F.lit(N_HEADERS)),
            F.lit("x"),
            F.lit(i),
        )
        for i in range(HEADER_WORDS)
    ]
    text = F.when(
        header_id == 0, F.concat_ws(" ", F.concat_ws(" ", *hwords), body)
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from aggregator_spark.llm_queries import corpus_prepare
    from aggregator_spark.operators.dedup import lsh_buckets
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="stress-corpus-prepare",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    buckets = lsh_buckets(docs)  # the ingest-time index, built inline

    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    out = corpus_prepare(docs, buckets)
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    rd1, wr1 = shuffle_totals(spark)
    print(
        f"corpus_prepare @ {n} docs: {wall:.1f}s wall, "
        f"shuffle read {(rd1 - rd0) / 1e9:.2f} GB / "
        f"write {(wr1 - wr0) / 1e9:.2f} GB"
    )

    n_chunks = out.count()
    n_docs_out = out.select("doc_id").distinct().count()
    print(f"packed chunks: {n_chunks}, surviving docs: {n_docs_out} / {n}")
    spark.stop()


if __name__ == "__main__":
    main()
