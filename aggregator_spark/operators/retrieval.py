"""Corpus retrieval scoring: BM25 — the lexical ranking function a
training-data pipeline uses for retrieval-based data selection and
decontamination-by-search (find the corpus documents matching a probe
query, then audit/remove/upweight them).

Okapi BM25 with the standard parameters (k1=1.2, b=0.75):

    score(d, q) = sum_{t in q} idf(t) * tf * (k1+1)
                                / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

Scale shape: the per-doc term-frequency table is the only corpus-sized
intermediate, and the tiny query-term list joins INTO it (broadcast),
so only matching postings survive — the classic term-at-a-time
scoring join; document-frequency stats are computed once per corpus
and join on the term key; the two corpus scalars (N, avgdl) broadcast
as a 1-row aggregate. Top-k per query is a window over candidates
(cardinality ≤ matching docs × queries), never a global sort. Ranking
ties: scores are rounded to 6 decimals FIRST and doc_id breaks ties,
so the cut is total and engine-independent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

BM25_K1 = 1.2
BM25_B = 0.75
TOP_K = 5


def bm25_search(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> DataFrame:
    """Top-k BM25 matches per probe query: (query_id, doc_id, rank,
    score) with score rounded to 6 decimals; rank 1-based by
    (rounded score desc, doc_id asc). Queries are (id, text) pairs —
    tokenized with the same word tokenizer as the corpus."""
    from aggregator_spark.operators.text import word_tokens

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("ts")
    )
    tf = (
        toks.select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size("ts")) / F.count(F.lit(1))
        ).alias("avgdl"),
    )

    qterms = spark.createDataFrame(
        [
            (qid, term)
            for qid, qtext in queries
            for term in dict.fromkeys(qtext.lower().split())
        ],
        "query_id int, term string",
    )

    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms), "term").select("term", "df")), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", F.col("rank").cast("int"), "score")
    )
