"""Ingest-time BM25 postings (inverted index) materialization.

Same ingest/query split as the MinHash bucket index
(``minhash_index.py``): tokenizing the corpus and counting term
frequencies is the once-per-ingest cost of a search system; queries
then touch only the (doc_id, dl, term, tf) postings table — document
frequency and the corpus scalars are cheap aggregates over it, raw
text is never re-tokenized per query.

Determinism: postings are a pure function of the text (word tokenizer
in operators/text.py), so a query served from the cache is
bit-identical to one recomputing — the DuckDB oracle needs no
knowledge of the cache. Content stamps re-mint the key when the
driver regenerates testdata or the tokenizer/builder code changes.

At 100 TB: the postings table is written bucketed by term so the
query-term probe join is co-located; per ingest batch it appends, and
df/avgdl roll up incrementally from per-batch partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bm25_cache_dir(sf_dir: str) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "bm25postings",
        extra="words",
        code_modules=(
            "aggregator_spark.operators.retrieval",
            "aggregator_spark.operators.text",
            "aggregator_spark.sources.bm25_index",
        ),
    )


def cached_bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize ``bm25_postings`` over the documents table once per
    (sf_dir, content stamp, tokenizer code), reuse after."""
    from aggregator_spark.operators.retrieval import bm25_postings
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import materialize_cached

    def build(out: str) -> None:
        docs = load_testdata(spark, sf_dir, "documents")
        bm25_postings(docs).write.mode("overwrite").parquet(out)

    return materialize_cached(spark, bm25_cache_dir(sf_dir), build)
