"""Ingest-time BM25 inverted index materialization: postings +
document-frequency table + corpus scalars, built together in ONE
atomic cache generation.

Same ingest/query split as the MinHash bucket index
(``minhash_index.py``): tokenizing the corpus and counting term/
document frequencies is the once-per-ingest cost of a search system;
queries then probe the postings with a broadcast query-term list and
read df/avgdl from the precomputed tables — raw text is never
re-tokenized and the vocabulary is never re-aggregated per query (at
warehouse scale, recomputing df per query is a full index scan).

Determinism: every table is a pure function of the text (word
tokenizer in operators/text.py), so a query served from the cache is
bit-identical to one recomputing — the DuckDB oracle needs no
knowledge of the cache. Content stamps re-mint the key when the
driver regenerates testdata or the tokenizer/builder code changes;
the three tables rename into place as one directory, so readers never
see postings from one generation with stats from another.

At 100 TB: the postings table is written bucketed by term so the
query-term probe join is co-located; per ingest batch it appends, and
df / n_docs / summed-dl roll up from per-batch partial aggregates
(all plain additive aggregates — see operators/retrieval.py:
bm25_stats).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

INDEX_TABLES = ("postings", "dfreq", "scalars")


def bm25_cache_dir(sf_dir: str) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "bm25index",
        extra="words",
        code_modules=(
            "aggregator_spark.operators.retrieval",
            "aggregator_spark.operators.text",
            "aggregator_spark.sources.bm25_index",
        ),
    )


def cached_bm25_index(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Materialize the three index tables over the documents table
    once per (sf_dir, content stamp, tokenizer code), reuse after.
    Returns {"postings", "dfreq", "scalars"}."""
    from aggregator_spark.operators.retrieval import bm25_postings, bm25_stats
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import (
        materialize_cached_tables,
    )

    def build(out: str) -> None:
        docs = load_testdata(spark, sf_dir, "documents")
        postings = bm25_postings(docs)
        postings.write.mode("overwrite").parquet(
            os.path.join(out, "postings")
        )
        # stats derive from the postings JUST WRITTEN (read back, not
        # recomputed from text — the same lineage a warehouse rollup
        # has); the two rollups are independent reads of the stored
        # table, so their jobs overlap (guide §2.6 — no checkpoints
        # involved, plain parquet-in/parquet-out)
        from aggregator_spark.parallel import run_jobs

        stored = spark.read.parquet(os.path.join(out, "postings"))
        dfreq, scalars = bm25_stats(stored)
        run_jobs([
            lambda: dfreq.write.mode("overwrite").parquet(
                os.path.join(out, "dfreq")
            ),
            lambda: scalars.write.mode("overwrite").parquet(
                os.path.join(out, "scalars")
            ),
        ])

    return materialize_cached_tables(
        spark, bm25_cache_dir(sf_dir), build, INDEX_TABLES
    )


def cached_bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings member of the index (builds the whole index if cold) —
    the bench ingest hook."""
    return cached_bm25_index(spark, sf_dir)["postings"]
