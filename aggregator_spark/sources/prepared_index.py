"""Ingest-time PREPARED-CORPUS index: the artifacts a steady-state
incremental corpus-preparation job reads when a new crawl batch lands.

A daily 100-TB pipeline does not re-prepare its whole corpus per
batch: the previous run persisted (a) the LSH bucket rows of the docs
that SURVIVED preparation (quality gate + fuzzy dedup over the
existing corpus) and (b) the benchmark decontamination probe set. The
arriving batch then pays only batch-proportional work: gate the batch
against the persisted probes, sign the batch, join its buckets against
the survivor bucket table (existing×existing never compared —
``operators/dedup.py:minhash_dedup_incremental``), and span/chunk/pack
the kept batch docs.

This module materializes both artifacts via the shared content-stamped
cache over the EXISTING slice (doc_id % NEW_BATCH_MOD != 0 — the same
batch convention as ``dedup_incremental``). Everything is a
deterministic (md5) function of the text, so serving from the cache is
bit-identical to recomputing and the DuckDB oracle of the incremental
entry needs no knowledge of it — it rebuilds the survivor set from the
raw corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

INDEX_TABLES = ("survivor_buckets", "probes", "span_grams")


def prepared_cache_dir(sf_dir: str) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "prepared",
        code_modules=(
            "aggregator_spark.llm_queries",
            "aggregator_spark.operators.dedup",
            "aggregator_spark.operators.text",
            "aggregator_spark.sources.minhash_index",
            "aggregator_spark.sources.prepared_index",
        ),
    )


def cached_prepared_index(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Materialize the previous run's survivor bucket table + probe
    set once per (sf_dir, content stamp, pipeline code), reuse after.
    Returns {"survivor_buckets", "probes"}."""
    from aggregator_spark.sources.stamped_cache import (
        materialize_cached_tables,
    )

    def build(out: str) -> None:
        from concurrent.futures import ThreadPoolExecutor

        from aggregator_spark.llm_queries import (
            JACCARD_THRESHOLD,
            NEW_BATCH_MOD,
            benchmark_probes,
            corpus_keep_flags,
        )
        from aggregator_spark.operators.dedup import minhash_dedup_keep
        from aggregator_spark.schemas import load_testdata
        from aggregator_spark.sources.minhash_index import (
            cached_minhash_buckets,
        )

        docs = load_testdata(spark, sf_dir, "documents")
        existing = docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
        # probes is a plain scan+filter+distinct of the raw existing
        # slice — no checkpoint, no component loop — so its write can
        # start NOW and overlap the whole serial gate→fuzzy chain
        # below (guide §2.6; safe since r13's `_ckpt_ids` made every
        # checkpointing loop track its own blocks instead of diffing
        # the global persistent-RDD set)
        from aggregator_spark.operators.dedup import span_gram_hashes

        pool = ThreadPoolExecutor(max_workers=3)
        try:
            probes_fut = pool.submit(
                lambda: benchmark_probes(existing)
                .write.mode("overwrite")
                .parquet(os.path.join(out, "probes"))
            )
            # the previous full run, replayed over the existing corpus
            # only: quality keep-list -> fuzzy dedup among the
            # survivors (corpus_prepare stages 1-2,
            # llm_queries.corpus_prepare)
            keep_ids = (
                corpus_keep_flags(existing)
                .filter("keep")
                .select("doc_id")
                .localCheckpoint(eager=True)
            )
            ebuckets = cached_minhash_buckets(spark, sf_dir).filter(
                F.col("doc_id") % NEW_BATCH_MOD != 0
            )
            fz = minhash_dedup_keep(
                existing.join(keep_ids, "doc_id"),
                threshold=JACCARD_THRESHOLD,
                buckets=ebuckets.join(keep_ids, "doc_id", "semi"),
            )
            survivors = fz.filter("keep").select(
                "doc_id"
            ).localCheckpoint(eager=True)
            # survivor_buckets and span_grams are INDEPENDENT writes
            # over parquet scans + the checkpoints materialized ABOVE —
            # overlap them with each other and with the still-running
            # probes write (guide §2.6). Each write owns its table dir;
            # _ensure_built commits the generation only after every
            # future resolves, so failure semantics are unchanged.
            # span_grams (r8): the survivor corpus's word-16-gram hash
            # index — lets the batch job remove spans the ARCHIVE
            # already holds, not just within-batch repeats; at 100 TB
            # this table is the span analogue of the bucket index
            # (stored bucketed by gh).
            futures = [
                probes_fut,
                pool.submit(
                    lambda: ebuckets.join(survivors, "doc_id", "semi")
                    .write.mode("overwrite")
                    .parquet(os.path.join(out, "survivor_buckets"))
                ),
                pool.submit(
                    lambda: span_gram_hashes(
                        docs.join(survivors, "doc_id")
                    )
                    .write.mode("overwrite")
                    .parquet(os.path.join(out, "span_grams"))
                ),
            ]
            for f in futures:
                f.result()
        finally:
            pool.shutdown(wait=True)

    return materialize_cached_tables(
        spark, prepared_cache_dir(sf_dir), build, INDEX_TABLES
    )


def cached_survivor_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-bucket member of the index (builds the whole index if
    cold) — the bench ingest hook (key ``corpus_prepared_index_build``)."""
    return cached_prepared_index(spark, sf_dir)["survivor_buckets"]
