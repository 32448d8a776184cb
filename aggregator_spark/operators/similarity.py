"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact cosine top-k — the correctness
  baseline. Query side broadcast, corpus streamed: no shuffle of the
  corpus, one window per query for the top-k cut.
- ``ann_topk_lsh``: random-hyperplane LSH scale path — deterministic
  pseudo-planes derived from md5 (no RNG state), bucket on sign
  signature, exact re-rank within bucket ∪ probe-adjacent buckets.

Cosines are rounded to 6 decimals BEFORE ranking so rank order (and the
DuckDB oracle comparison) is independent of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a, b):
    """Sequential fold — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank); ties break on
    neighbor_id so the result is a deterministic set.
    """
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    )
    queries = base
    if query_ids is not None:
        queries = base.filter(F.col(id_col).isin(query_ids))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    c = base.select(F.col(id_col).alias("neighbor_id"), F.col("vec").alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim: int):
    """Deterministic pseudo-random weight in [-0.5, 0.5): md5 of the
    (plane, dim) pair → first 6 hex digits → uniform fraction."""
    h = F.md5(F.lit(f"plane{plane}_dim{dim}").cast("binary"))
    return (
        F.conv(F.substring(h, 1, 6), 16, 10).cast("double") / F.lit(16777216.0)
        - 0.5
    )


def lsh_signature(vec, n_planes: int, n_dims: int):
    """Sign-bit signature string of projections onto n_planes
    deterministic hyperplanes."""
    bits = []
    for p in range(n_planes):
        proj = None
        for d in range(n_dims):
            term = vec[d] * _plane_weight(p, d)
            proj = term if proj is None else proj + term
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 3,
    n_planes: int = 8,
    n_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing the LSH
    bucket with the query (single-probe), exact cosine re-rank inside.
    At scale the bucket join replaces the full cross product — shuffle
    O(n) instead of O(n·q)."""
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("sig", lsh_signature(F.col("vec"), n_planes, n_dims))
    queries = base
    if query_ids is not None:
        queries = base.filter(F.col(id_col).isin(query_ids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("sig").alias("qsig"),
    )
    scored = (
        base.join(F.broadcast(q), F.col("sig") == F.col("qsig"))
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cosine", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).
    Brute-force form; the LSH signature is the scale path (bucket first,
    then exact check within buckets)."""
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("vec").alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
