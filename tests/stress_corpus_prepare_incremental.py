"""Batch-proportionality stress for the INCREMENTAL corpus-preparation
job (`corpus_prepare_incremental`: gate the batch → fuzzy dedup vs the
persisted survivor index → span/chunk/pack the batch) — SCALE.md
stress table.

Not a pytest — run ad hoc:
``python tests/stress_corpus_prepare_incremental.py [n_docs] [batch_mod]``
(defaults 400_000 and 41 → a ~2.4% daily batch).

Same synthetic corpus as tests/stress_corpus_prepare.py (verbatim
duplicates, shared boilerplate headers, Gopher-short docs). The
previous run's artifacts — survivor doc ids + their LSH buckets + the
benchmark probe set — are built UNTIMED and round-tripped through
parquet, exactly what ``sources/prepared_index.py`` persists. The
timed comparison:

  incremental  = the batch job reading the persisted artifacts
  full re-prep = ``corpus_prepare`` over the whole corpus

The question this answers for 100 TB: is the steady-state daily cost
proportional to the BATCH (plus one hash join against the index),
not to the corpus?
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_corpus_prepare import synth_docs
from stress_util import shuffle_totals


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    batch_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 41
    import tempfile

    from aggregator_spark.llm_queries import (
        JACCARD_THRESHOLD,
        benchmark_probes,
        corpus_keep_flags,
        corpus_prepare,
        corpus_prepare_incremental,
    )
    from aggregator_spark.operators.dedup import (
        lsh_buckets,
        minhash_dedup_keep,
        span_gram_hashes,
    )
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="stress-corpus-prepare-incr",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    is_new = F.col("doc_id") % batch_mod == 0
    existing = docs.filter(~is_new)
    batch = docs.filter(is_new).localCheckpoint(eager=True)
    n_batch = batch.count()

    # ---- previous run's artifacts, built untimed, persisted like
    # sources/prepared_index.py does
    scratch = tempfile.mkdtemp(prefix="stress_prep_incr_")
    keep_ids = (
        corpus_keep_flags(existing)
        .filter("keep")
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    ebuckets = lsh_buckets(existing)
    fz = minhash_dedup_keep(
        existing.join(keep_ids, "doc_id"),
        threshold=JACCARD_THRESHOLD,
        buckets=ebuckets.join(keep_ids, "doc_id", "semi"),
    )
    survivors = fz.filter("keep").select("doc_id")
    ebuckets.join(survivors, "doc_id", "semi").write.mode(
        "overwrite"
    ).parquet(os.path.join(scratch, "survivor_buckets"))
    benchmark_probes(existing).write.mode("overwrite").parquet(
        os.path.join(scratch, "probes")
    )
    span_gram_hashes(docs.join(survivors, "doc_id")).write.mode(
        "overwrite"
    ).parquet(os.path.join(scratch, "span_grams"))
    survivor_buckets = spark.read.parquet(
        os.path.join(scratch, "survivor_buckets")
    )
    probes = spark.read.parquet(os.path.join(scratch, "probes"))
    span_grams = spark.read.parquet(os.path.join(scratch, "span_grams"))
    survivor_docs = docs.join(
        survivor_buckets.select("doc_id").distinct(), "doc_id"
    ).select("doc_id", "text")
    n_surv = survivor_buckets.select("doc_id").distinct().count()

    # ---- timed: the incremental batch job
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    out = corpus_prepare_incremental(
        batch, survivor_docs, survivor_buckets, probes, is_new,
        span_grams=span_grams,
    )
    out.write.format("noop").mode("overwrite").save()
    wall_incr = time.perf_counter() - t0
    rd1, wr1 = shuffle_totals(spark)
    print(
        f"incremental @ batch {n_batch} vs {n_surv} survivors: "
        f"{wall_incr:.1f}s wall, shuffle read {(rd1 - rd0) / 1e9:.2f} GB"
        f" / write {(wr1 - wr0) / 1e9:.2f} GB"
    )

    # ---- timed: full re-preparation of the whole corpus
    buckets = lsh_buckets(docs)
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    full = corpus_prepare(docs, buckets)
    full.write.format("noop").mode("overwrite").save()
    wall_full = time.perf_counter() - t0
    rd1, wr1 = shuffle_totals(spark)
    print(
        f"full re-prep @ {n} docs: {wall_full:.1f}s wall, "
        f"shuffle read {(rd1 - rd0) / 1e9:.2f} GB"
        f" / write {(wr1 - wr0) / 1e9:.2f} GB"
    )
    print(
        f"ratio incremental/full: {wall_incr / wall_full:.3f} "
        f"(batch fraction {n_batch / n:.3f})"
    )
    n_chunks = out.count()
    print(f"incremental packed chunks: {n_chunks}")
    spark.stop()


if __name__ == "__main__":
    main()
