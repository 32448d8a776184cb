"""Ingest-time LSH signature index materialization.

Same ingest/query split as ``ivf_index.py``: the multi-table hyperplane
signatures (one L×b matmul over the corpus + vector norms) are an
offline ANN index-build cost, not a per-query cost. Materialized via
the shared content-stamped cache (``stamped_cache.py``); queries pay
only the bucket join + exact re-rank. The LSH geometry (n_tables,
planes_per_table, n_dims) is part of the cache key, and
``ann_topk_lsh`` validates the signature width of a passed index, so a
stale-geometry index can't silently corrupt multiprobe bucketing.

At 100 TB: the index row is (id, vec, vnorm, sigs[L]) — the vectors
ride along so the re-rank needs no join back to the corpus; for very
wide embeddings store (id, vnorm, sigs) instead and co-bucket with the
embedding table on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def lsh_cache_dir(
    sf_dir: str,
    n_tables: int = 12,
    planes_per_table: int = 5,
    n_dims: int = 64,
) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "embeddings.parquet",
        "lsh",
        extra=f"{n_tables}x{planes_per_table}x{n_dims}",
        # builder-code stamp: signature logic lives in similarity.py
        # (lsh_signature_index/_plane_weight) and this module
        code_modules=(
            "aggregator_spark.operators.similarity",
            "aggregator_spark.sources.lsh_index",
        ),
    )


def cached_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    n_tables: int = 12,
    planes_per_table: int = 5,
    n_dims: int = 64,
) -> DataFrame:
    """Materialize ``lsh_signature_index`` once per (sf_dir, source
    content stamp, LSH params), reuse after."""
    from aggregator_spark.operators.similarity import lsh_signature_index
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import materialize_cached

    def build(out: str) -> None:
        emb = load_testdata(spark, sf_dir, "embeddings")
        lsh_signature_index(
            emb,
            n_tables=n_tables,
            planes_per_table=planes_per_table,
            n_dims=n_dims,
        ).write.mode("overwrite").parquet(out)

    return materialize_cached(
        spark,
        lsh_cache_dir(sf_dir, n_tables, planes_per_table, n_dims),
        build,
    )
