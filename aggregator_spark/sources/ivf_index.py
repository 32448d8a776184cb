"""Ingest-time IVF index materialization for ANN queries.

``ann_topk_ivf``'s dominant cost is the coarse-quantizer k-means fit —
one corpus pass per Lloyd round. Like JSON parsing (see
``variant_ingest.py``), that is an INGEST cost, not a query cost: real
ANN systems build the IVF index offline once and amortize it across
every query. This module materializes the (id, cluster) assignment via
the shared content-stamped cache (``stamped_cache.py``), so queries pay
only the centroid broadcast + nprobe-routed candidate join.

At 100 TB: the assignment table is one narrow (id, int) column pair —
co-partitionable with the embedding table (bucket both by id) so the
join adds no shuffle on the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def build_ivf_assignment(
    embeddings: DataFrame,
    out_path: str,
    kmeans_rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Fit the coarse quantizer and persist (id, cluster) — the
    one-and-only k-means pass in the index's lifetime."""
    from aggregator_spark.operators.similarity import kmeans_fit

    assignment = kmeans_fit(
        embeddings, iterations=kmeans_rounds, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col), F.col("assigned").alias("cluster"))
    assignment.write.mode("overwrite").parquet(out_path)
    return out_path


def ivf_cache_dir(sf_dir: str, kmeans_rounds: int = 1) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "embeddings.parquet",
        "ivf",
        extra=f"r{kmeans_rounds}",
        # builder-code stamp: kmeans_fit lives in similarity.py
        code_modules=(
            "aggregator_spark.operators.similarity",
            "aggregator_spark.sources.ivf_index",
        ),
    )


def cached_ivf_assignment(
    spark: SparkSession, sf_dir: str, kmeans_rounds: int = 1
) -> DataFrame:
    """Materialize once per (sf_dir, source content stamp, rounds),
    reuse after; regenerated testdata invalidates the index."""
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.stamped_cache import materialize_cached

    def build(out: str) -> None:
        build_ivf_assignment(
            load_testdata(spark, sf_dir, "embeddings"),
            out,
            kmeans_rounds=kmeans_rounds,
        )

    return materialize_cached(
        spark, ivf_cache_dir(sf_dir, kmeans_rounds), build
    )
