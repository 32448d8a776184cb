"""Catalog entries over the ingest-time index ARTIFACTS themselves.

The bench keys ``bm25_index_build`` / ``dedup_bucket_index_build`` /
``ann_ivf_index_build`` / ``bpe_dict_build`` time the one-off ingest
cost of each index; these entries give the built artifacts their own
driver CORRECTNESS rows (VERDICT r7 item 3): every index is a
deterministic (md5/argmax-total-ordered) function of the corpus, so
its CONTENTS are oracle-able — the DuckDB twin REBUILDS the table from
the raw corpus and must hash-match the parquet the cache serves. That
closes the loop the cache-vs-fresh pytest pins started: a stale,
truncated, or mis-keyed cache generation now fails the driver gate,
not just the local suite.

Beyond-reference surface (the reference, cybergreen-net/aggregator
main.py, has no search/dedup/tokenizer indexes); the ingest/serve
split itself is the 100-TB posture — see sources/*_index.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def q_bm25_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted BM25 postings table (sources/bm25_index.py):
    one (doc_id, dl, term, tf) row per distinct term per document,
    read from the content-stamped cache (building it if cold — the
    bench key ``bm25_index_build`` times that build)."""
    from aggregator_spark.sources.bm25_index import cached_bm25_postings

    p = cached_bm25_postings(spark, sf_dir)
    return p.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        "term",
        F.col("tf").cast("long").alias("tf"),
    )


def q_dedup_bucket_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted MinHash-LSH bucket table
    (sources/minhash_index.py): (doc_id, band, bucket) rows serving
    the whole MinHash dedup family; zero-shingle docs are absent by
    contract (no shingle evidence)."""
    from aggregator_spark.sources.minhash_index import cached_minhash_buckets

    b = cached_minhash_buckets(spark, sf_dir)
    return b.select("doc_id", F.col("band").cast("int").alias("band"), "bucket")


def q_ann_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVF coarse-quantizer assignment
    (sources/ivf_index.py): (vec_id, cluster) after the single offline
    Lloyd round, the routing table ``ann_topk_ivf`` probes."""
    from aggregator_spark.sources.ivf_index import cached_ivf_assignment

    a = cached_ivf_assignment(spark, sf_dir)
    return a.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster")
    )


def q_bpe_dict_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted BPE encoding dictionary (sources/bpe_index.py):
    (word, state, freq) — every corpus word with its post-merge symbol
    state (sentinel-delimited) and corpus frequency. ``bpe_merges``
    rows the learned MERGE TABLE; this rows the other member of the
    artifact, the table ``bpe_encode_docs`` joins per token."""
    from aggregator_spark.sources.bpe_index import cached_bpe_index

    d = cached_bpe_index(spark, sf_dir)["dict"]
    return d.select("word", "state", F.col("freq").cast("long").alias("freq"))


def q_prepared_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted benchmark probe set of the prepared-corpus index
    (sources/prepared_index.py): the first 8-gram of every 97th
    EXISTING-corpus doc — the table every arriving batch's
    contamination gate joins against. Read from the cache, rebuilt by
    the oracle from the raw existing slice."""
    from aggregator_spark.sources.prepared_index import cached_prepared_index

    return cached_prepared_index(spark, sf_dir)["probes"]


INDEX_QUERIES = {
    "prepared_probes": q_prepared_probes,
    "bm25_index_postings": q_bm25_index_postings,
    "dedup_bucket_index": q_dedup_bucket_index,
    "ann_ivf_index": q_ann_ivf_index,
    "bpe_dict_states": q_bpe_dict_states,
}
