"""Semantic checks for the LLM-pipeline operators beyond oracle parity:
the testdata corpus contains planted near-duplicates — the dedup family
must actually find them, and the approximate paths must agree with the
exact baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from aggregator_spark.operators.dedup import (
    exact_dup_clusters,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from aggregator_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_lsh,
)
from aggregator_spark.schemas import load_testdata


def test_exact_dedup_on_planted_dups(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world foo"),
            (2, "Hello   world foo"),  # same after normalization
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    clusters = {r["keep_id"]: r["n_docs"] for r in exact_dup_clusters(docs).collect()}
    assert clusters == {1: 2, 3: 1}


def test_ngram_jaccard_finds_planted_near_dups(spark, sf_dir):
    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert len(pairs) >= 1, "corpus has planted near-dups; none found"
    assert all(r["doc_a"] < r["doc_b"] for r in pairs)


def test_lsh_recall_of_high_jaccard_pairs(spark, sf_dir):
    # banding with 4 bands of 2 rows: p(collide) = 1-(1-j^2)^4;
    # at jaccard >= 0.9 that's > 0.999 — every such pair must surface
    docs = load_testdata(spark, sf_dir, "documents")
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    candidates = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    assert true_pairs, "expected at least one >=0.9 planted pair"
    missed = true_pairs - candidates
    assert not missed, f"LSH missed near-identical pairs: {missed}"


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    docs = load_testdata(spark, sf_dir, "documents")
    near = ngram_jaccard_pairs(docs, threshold=0.9).collect()
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in sims.values())
    for r in near:
        a, b = sims[r["doc_a"]], sims[r["doc_b"]]
        hamming = sum(x != y for x, y in zip(a, b))
        # near-dups sit far below the ~32-bit expectation of random pairs
        # (count-weighted SimHash on short docs is noisy; 12 observed)
        assert hamming <= 16, (r["doc_a"], r["doc_b"], hamming)


def test_ann_lsh_subset_of_bruteforce_scores(spark, sf_dir):
    emb = load_testdata(spark, sf_dir, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_topk_bruteforce(emb, query_ids=[0, 1], k=50).collect()
    }
    approx = ann_topk_lsh(emb, query_ids=[0, 1], k=3).collect()
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        # LSH candidates score identically to the exact scorer
        if key in exact:
            assert exact[key] == r["cosine"]
