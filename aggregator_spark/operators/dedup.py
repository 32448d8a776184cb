"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant at 100 TB):

- **exact**: md5-fingerprint groupBy — one shuffle of (16-byte key,
  doc_id), the optimal exact plan.
- **n-gram Jaccard**: sparse similarity join — explode distinct shingles,
  self-join on shingle, count intersections. A document-frequency cap
  drops ultra-common shingles (stopword shingles explode the join at
  scale — classic skew kill switch).
- **MinHash + LSH**: fixed-size signatures (k md5-min-hashes) replace
  the full shingle set; banding turns candidate generation into an
  equi-join on (band_index, band_hash) — shuffle volume O(docs × bands)
  instead of O(docs × shingles).
- **SimHash**: 64-bit near-dup fingerprint from token-hash bit votes;
  Hamming-adjacent buckets. Pure column algebra, no Python.

MinHash here is deterministic-by-construction: hash_i(shingle) =
md5(shingle || '#' || i), minimum taken lexicographically over hex
strings — reproducible in any engine (the DuckDB oracle runs the same
formula), no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aggregator_spark.operators.text import fingerprint, normalized_text, tokens

DEFAULT_SHINGLE = 3
DEFAULT_MINHASHES = 8
DEFAULT_BANDS = 4  # rows-per-band = DEFAULT_MINHASHES / DEFAULT_BANDS


def exact_dup_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: one row per distinct content fingerprint with the
    survivor id (min id) and the duplicate count."""
    return (
        docs.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingle_expr(text_col, n: int = DEFAULT_SHINGLE):
    """Distinct word n-gram shingles as an array column (normalized
    text → tokens → sliding windows joined by single spaces)."""
    toks = tokens(normalized_text(text_col))
    # guard: Spark sequence(1, size-n+1) DESCENDS when size < n (DuckDB
    # range() is empty) — short docs must yield zero shingles
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def doc_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    max_df: int | None = None,
) -> DataFrame:
    """Exploded (doc_id, shingle) pairs, distinct per doc; optionally
    drops shingles whose document frequency exceeds ``max_df`` (skew cap
    for the similarity join)."""
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_expr(F.col(text_col), n)).alias("shingle"),
    )
    if max_df is not None:
        freq = pairs.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        pairs = pairs.join(
            F.broadcast(freq.filter(F.col("df") <= max_df).select("shingle")),
            "shingle",
        )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_SHINGLE,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard above threshold via sparse shingle join.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 6 decimals (cross-engine float safety)."""
    pairs = doc_shingles(docs, id_col, text_col, n, max_df)
    sizes = pairs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = pairs.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pairs.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _seeded_md5(i: int):
    # NB: the returned lambda must take exactly ONE argument —
    # F.transform passes the array index to two-argument callables,
    # which would silently clobber a default-argument seed
    return lambda s: F.md5(F.concat(s, F.lit(f"#{i}")).cast("binary"))


def _minhash_cols(text_col, k: int, n: int):
    sh = shingle_expr(text_col, n)
    return [
        F.array_min(F.transform(sh, _seeded_md5(i))).alias(f"mh_{i}")
        for i in range(k)
    ]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_MINHASHES,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}) deterministic MinHash signature; each
    mh_i is the lexicographic min of md5(shingle || '#i')."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       *_minhash_cols(F.col(text_col), k, n))


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_MINHASHES,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """MinHash-LSH banding: signatures → per-band bucket hash →
    self-join on (band, bucket) → distinct candidate pairs (doc_a <
    doc_b). Two docs collide if ANY band matches entirely."""
    if k % bands:
        raise ValueError("k must be divisible by bands")
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, id_col, text_col, k, n)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
            ).cast("binary")
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", *band_cols)
    buckets = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    l = buckets.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    r = buckets.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket"
    )
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash as a 64-char '0'/'1' string (cross-engine-safe
    representation). Per token: md5 → first 16 hex nibbles → 4 bits
    each; each bit votes ±(token count); bit = 1 iff vote sum >= 0.

    Plan shape: explode tokens → (doc, token) counts → 64 conditional
    SUMs in ONE hash aggregate → concat. Two shuffles total, no UDF.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("token"),
    )
    counted = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    with_hash = counted.withColumn("h", F.md5(F.col("token").cast("binary")))
    # nibble p (0-based) → integer value of hex char p
    votes = []
    for p in range(16):
        nib = F.conv(F.substring(F.col("h"), p + 1, 1), 16, 10).cast("int")
        for b in range(4):
            bit = F.shiftright(nib, b).bitwiseAND(F.lit(1))
            votes.append(
                F.sum((bit * 2 - 1) * F.col("cnt")).alias(f"v_{p * 4 + b}")
            )
    voted = with_hash.groupBy("doc_id").agg(*votes)
    bits = [
        F.when(F.col(f"v_{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(64)
    ]
    return voted.select("doc_id", F.concat(*bits).alias("simhash"))
