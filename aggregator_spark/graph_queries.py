"""Graph analytics over the corpus word-adjacency graph: TextRank
(PageRank keyword extraction, fixed unrolled iterations) and triangle
counting — the two classic distributed-graph shapes, expressed as pure
DataFrame joins/aggregates so both engines compute bit-comparable
results.

Graph definition (shared by both queries and their oracles): nodes are
the corpus vocabulary (lower + non-alphanumeric split); a directed edge
(a -> b) exists iff the bigram "a b" occurs anywhere (distinct,
unweighted); the undirected edge set is the distinct {a, b} with a < b.

Scale design: every step is a keyed join/aggregate on the term column —
no driver-side iteration state beyond the unrolled plan. At real scale
the iterative form lives in ``operators/components.py``-style loops
with ``localCheckpoint`` per round (see dedup_components); here the
fixed 3-round unroll keeps lineage bounded AND lets DuckDB mirror it
as a CTE chain (the same oracle strategy as ``kmeans_fit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.schemas import load_testdata

DAMPING = 0.85
PR_ROUNDS = 3


def _tokens(text_col="text"):
    # single shared tokenizer (operators/text.py) — the oracles depend
    # on every text-family query splitting identically
    from aggregator_spark.operators.text import word_tokens

    return word_tokens(F.col(text_col) if isinstance(text_col, str) else text_col)


def _directed_edges(docs: DataFrame) -> DataFrame:
    toks = docs.select(_tokens().alias("t")).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("src"),
                    F.element_at("t", i + 1).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pairs.filter(F.col("src") != F.col("dst")).distinct()


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scores over the documents table — see
    ``textrank_scores`` for the algorithm and scale shape."""
    docs = load_testdata(spark, sf_dir, "documents")
    return textrank_scores(docs)


def textrank_scores(docs: DataFrame) -> DataFrame:
    """TextRank keyword scores: PageRank (d=0.85, 3 unrolled rounds,
    uniform init, dangling mass not redistributed — documented shared
    semantics) over the word-adjacency digraph.

    Scale shape: each round is edges ⋈ rank (keyed on term) →
    sum-by-dst → left join back onto nodes; out-degree is a tiny
    vocabulary-sized dim the optimizer broadcasts. The graph itself is
    VOCABULARY-bounded — corpus growth adds edge-extraction (explode +
    distinct) work linearly but the per-round join state stays O(V).
    Rounding happens ONCE at the end, so per-round FP stays full
    precision on both engines; per-dst contribution sums are short
    (≤ degree), keeping round(.,6) safely above partial-merge reorder
    error.
    """
    edges = _directed_edges(docs)
    nodes = (
        edges.select(F.col("src").alias("term"))
        .union(edges.select("dst"))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    rank = nodes.crossJoin(F.broadcast(n)).select(
        "term", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(PR_ROUNDS):
        contrib = (
            edges.join(rank, edges.src == rank.term)
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        rank = (
            nodes.join(contrib, nodes.term == contrib.dst, "left")
            .crossJoin(F.broadcast(n))
            .select(
                "term",
                (
                    (1.0 - DAMPING) / F.col("n_nodes")
                    + F.lit(DAMPING) * F.coalesce("c", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return rank.select("term", F.round("pr", 6).alias("pr"))


def q_cooccur_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the documents word-adjacency graph — see
    ``triangle_count`` for the algorithm and scale shape."""
    docs = load_testdata(spark, sf_dir, "documents")
    return triangle_count(docs)


def triangle_count(docs: DataFrame) -> DataFrame:
    """Triangle count of the undirected word-adjacency graph via the
    ordered 3-way self-join e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c
    (each triangle counted exactly once).

    Scale shape: the a<b orientation halves the edge list and caps the
    join fan-out (the standard degree-orientation trick's cheap cousin);
    joins are keyed equi-joins Catalyst plans as hash joins, and the
    final count collapses map-side. Like TextRank, the joined graph is
    vocabulary-bounded; corpus size only grows the linear edge-extract.
    """
    d = _directed_edges(docs)
    und = (
        d.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


GRAPH_QUERIES = {
    "textrank_keywords": q_textrank_keywords,
    "cooccur_triangles": q_cooccur_triangles,
}


def q_hll_monthly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable HLL sketch rollup (rows-only check — estimates
    are engine-specific): daily user sketches union-merged to monthly
    distinct estimates without rescanning the fact. See
    ``operators/sketches.py`` for the lossless-merge invariant test.
    """
    from aggregator_spark.operators.sketches import monthly_distinct_users

    return monthly_distinct_users(load_testdata(spark, sf_dir, "events"))


GRAPH_QUERIES["hll_monthly_users"] = q_hll_monthly_users
