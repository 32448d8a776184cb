"""Corpus retrieval scoring: BM25 — the lexical ranking function a
training-data pipeline uses for retrieval-based data selection and
decontamination-by-search (find the corpus documents matching a probe
query, then audit/remove/upweight them).

Okapi BM25 with the standard parameters (k1=1.2, b=0.75):

    score(d, q) = sum_{t in q} idf(t) * tf * (k1+1)
                                / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

Split ingest/query the way a search system is: ``bm25_postings`` is
the tokenize-and-count pass (the expensive, once-per-corpus part —
materialized at ingest via sources/bm25_index.py, the inverted-index
analog of the MinHash bucket index); ``bm25_score`` serves queries
from the postings table alone — document frequency and the corpus
scalars are cheap aggregates OVER POSTINGS, raw text is never touched
at query time.

Scale shape: the postings table is the only corpus-sized intermediate,
and the tiny query-term list joins INTO it (broadcast), so only
matching postings survive — the classic term-at-a-time scoring join;
at warehouse scale the postings table is written bucketed by term so
that join is co-located. Top-k per query is a window over candidates
(cardinality ≤ matching docs × queries), never a global sort. Ranking
ties: scores are rounded to 6 decimals FIRST and doc_id breaks ties,
so the cut is total and engine-independent.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

BM25_K1 = 1.2
BM25_B = 0.75
TOP_K = 5

_QTOKEN = re.compile(r"[a-z0-9]+")


def query_terms(qtext: str) -> list[str]:
    """Query-side tokenization — the SAME token alphabet as the
    corpus tokenizer (word_tokens: lowercase [a-z0-9]+ runs), so a
    punctuated query like "spark-join" matches the postings for
    "spark" and "join" instead of silently matching nothing.
    Duplicates dropped (BM25 sums per distinct query term)."""
    return list(dict.fromkeys(_QTOKEN.findall(qtext.lower())))


def bm25_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (doc_id, dl, term, tf) — one row per
    distinct term per document, dl = document token count. This is the
    ingest pass; everything BM25 needs derives from it."""
    from aggregator_spark.operators.text import word_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("ts")
    )
    return (
        toks.select(
            "doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_stats(postings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(document-frequency table, 1-row corpus scalars) derived from a
    postings table — the other two members of the index. Both are
    plain additive/distinct aggregates, so per-ingest-batch partials
    roll up exactly (df adds, n_docs adds, avgdl from summed dl)."""
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus scalars from postings: docs = distinct doc rows, dl is
    # repeated per (doc, term) so take it once per doc. sum_dl is kept
    # alongside the derived avgdl so stored scalar rows from disjoint
    # ingest batches MERGE exactly (n_docs and sum_dl add; avgdl
    # re-derives) — pinned by test
    per_doc = postings.select("doc_id", "dl").distinct()
    scalars = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    return dfreq, scalars


def bm25_score(
    postings: DataFrame,
    queries: Sequence[tuple[int, str]],
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
    dfreq: DataFrame | None = None,
    scalars: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 matches per probe query over a postings table:
    (query_id, doc_id, rank, score) with score rounded to 6 decimals;
    rank 1-based by (rounded score desc, doc_id asc). Queries are
    (id, text) pairs, tokenized with ``query_terms`` (same alphabet
    as the corpus tokenizer).

    Pass the precomputed ``dfreq``/``scalars`` from the ingest-time
    index to skip the full-postings aggregates — at warehouse scale
    recomputing df per query is a full index scan."""
    spark = postings.sparkSession
    if dfreq is None or scalars is None:
        built = bm25_stats(postings)
        dfreq = dfreq if dfreq is not None else built[0]
        scalars = scalars if scalars is not None else built[1]

    qterms = spark.createDataFrame(
        [
            (qid, term)
            for qid, qtext in queries
            for term in query_terms(qtext)
        ],
        "query_id int, term string",
    )

    # prune df to the DISTINCT probe terms: joining the per-(query,
    # term) table here would duplicate a term shared by two queries
    # and double-count every posting's contribution
    qterm_df = dfreq.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(qterm_df), "term")
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


def bm25_search(
    docs: DataFrame,
    queries: Sequence[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = TOP_K,
) -> DataFrame:
    """One-shot form: build postings inline and score (the cached
    ingest path is sources/bm25_index.py:cached_bm25_postings)."""
    return bm25_score(
        bm25_postings(docs, id_col, text_col), queries, k1, b, top_k
    )
