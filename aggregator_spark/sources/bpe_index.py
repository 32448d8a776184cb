"""Ingest-time BPE dictionary materialization: the learned merge
table and the final word→symbols states, built together in one atomic
cache generation.

Tokenizer training is the canonical train-once artifact of an LLM
pipeline — every encode pass reuses the dictionary, it never
retrains. Both tables are deterministic functions of the corpus (the
trainer's argmax is totally ordered), so serving from the cache is
bit-identical to retraining — the DuckDB oracle needs no knowledge of
the cache (cache-vs-fresh equality pytest-pinned alongside the other
ingest caches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aggregator_spark.operators.bpe import BPE_MERGES

INDEX_TABLES = ("merges", "dict")


def bpe_cache_dir(sf_dir: str, n_merges: int = BPE_MERGES) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "bpedict",
        extra=f"m{n_merges}",
        code_modules=(
            "aggregator_spark.operators.bpe",
            "aggregator_spark.operators.text",
            "aggregator_spark.sources.bpe_index",
        ),
    )


def cached_bpe_index(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> dict[str, DataFrame]:
    """Train once per (sf_dir, content stamp, trainer code); returns
    {"merges", "dict"}."""
    from aggregator_spark.operators.bpe import bpe_train_full
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import (
        materialize_cached_tables,
    )

    def build(out: str) -> None:
        docs = load_testdata(spark, sf_dir, "documents")
        merges, states = bpe_train_full(docs, n_merges)
        merges.write.mode("overwrite").parquet(os.path.join(out, "merges"))
        states.write.mode("overwrite").parquet(os.path.join(out, "dict"))

    return materialize_cached_tables(
        spark, bpe_cache_dir(sf_dir, n_merges), build, INDEX_TABLES
    )


def cached_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-table member (trains if cold) — the bench ingest hook."""
    return cached_bpe_index(spark, sf_dir)["merges"]
