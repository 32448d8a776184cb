"""Round-11 property pins.

- corpus_prepare_union_e2e: the composed pipeline with the
  union-candidate dedup must (a) be structurally identical to the
  hand-composed chain (gate → fuzzy_dedup_keep_union → span → chunk →
  pack), (b) keep a SUBSET of the base pipeline's documents — union
  edges are a superset of LSH-only edges over the same survivors, so
  components only merge and survivors only shrink — and (c) the seam
  must demonstrably engage the SimHash family (crafted reorder pair).
- ann_topk_ivfpq: routing recall against the full-ADC yardstick plus
  distance identity on shared pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _doc_set(df) -> set[int]:
    return {
        r["doc_id"] for r in df.select("doc_id").distinct().collect()
    }


def test_union_e2e_docs_subset_of_base_e2e(spark):
    """Union edges ⊇ LSH edges over the same survivors ⇒ components
    only merge ⇒ the union pipeline's documents ⊆ the base pipeline's.
    On the driver fixtures the sets coincide (the quality gate already
    removed the small-edit copies SimHash would add — the union's
    strictness evidence lives at the standalone operator,
    test_llm_ops' union-keep ⊂ single-family pins), so the seam's
    liveness is pinned at the PLAN level: the union plan must carry
    the SimHash candidate stages the base plan lacks."""
    from aggregator_spark.llm_queries import (
        q_corpus_prepare_e2e,
        q_corpus_prepare_union_e2e,
    )

    base = _doc_set(q_corpus_prepare_e2e(spark, SF))
    union = _doc_set(q_corpus_prepare_union_e2e(spark, SF))
    assert union <= base


def test_fuzzy_union_seam_engages_simhash_family(spark):
    """The seam's liveness, pinned where it is observable: a crafted
    pair in the complementary-recall region — the SAME token bag
    REORDERED (SimHash is order-insensitive: Hamming 0; shingles are
    order-sensitive: Jaccard ~0, LSH-invisible) — must pass the
    LSH-only stage untouched and be merged by the union stage.
    keep_ids passes all docs through the gate; buckets come from the
    docs themselves."""
    from aggregator_spark.llm_queries import (
        JACCARD_THRESHOLD,
        corpus_prepare_kept_docs,
    )
    from aggregator_spark.operators import dedup as D

    toks = [f"tok{i}" for i in range(60)]
    a = " ".join(toks)
    b = " ".join(reversed(toks))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "completely unrelated text about rivers")],
        "doc_id long, text string",
    )
    buckets = D.lsh_buckets(docs)
    keep_ids = docs.select("doc_id")

    def kept(fuzzy_union):
        return _doc_set(
            corpus_prepare_kept_docs(
                docs, buckets, keep_ids=keep_ids, fuzzy_union=fuzzy_union
            )
        )

    lsh_only = kept(False)
    union = kept(True)
    assert union < lsh_only, (
        f"union {union} not a strict subset of lsh-only {lsh_only} — "
        "the fuzzy_union seam did not engage the SimHash family"
    )
    assert union == {1, 3} and lsh_only == {1, 2, 3}
    # sanity: the pair really is LSH-invisible at the threshold
    sh = D.verified_jaccard_pairs(
        docs,
        D.lsh_candidate_pairs(docs, buckets=buckets),
        "doc_id",
        "text",
        D.DEFAULT_SHINGLE,
        JACCARD_THRESHOLD,
    )
    assert sh.count() == 0


def test_union_e2e_matches_hand_composed_chain(spark):
    """The fuzzy_union seam must produce the same rows as composing
    the stages by hand (the topp/ppl structural-parity precedent)."""
    from aggregator_spark.llm_queries import (
        DUP_SPAN_N,
        JACCARD_THRESHOLD,
        _mh_buckets,
        corpus_keep_flags,
        q_corpus_prepare_union_e2e,
    )
    from aggregator_spark.operators import corpus as C, dedup as D
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, SF, "documents")
    keep_ids = (
        corpus_keep_flags(docs).filter("keep").select("doc_id")
    ).localCheckpoint(eager=True)
    survivors = docs.join(keep_ids, "doc_id")
    fuzzy = D.fuzzy_dedup_keep_union(
        survivors,
        threshold=JACCARD_THRESHOLD,
        buckets=_mh_buckets(spark, SF).join(keep_ids, "doc_id"),
    )
    kept = docs.join(
        fuzzy.filter("keep").select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    rewritten = D.dedup_span_rewrite(kept, n=DUP_SPAN_N)
    nonempty = rewritten.filter(F.length("clean_text") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    hand = C.pack_sequences(C.doc_chunks(nonempty))
    got = q_corpus_prepare_union_e2e(spark, SF)
    assert got.exceptAll(hand).count() == 0
    assert hand.exceptAll(got).count() == 0


def test_ivfpq_routing_recall_vs_full_adc(spark):
    """Routing evidence for the oracled IVF-PQ composition, against
    the right yardstick: the FULL ADC scan (same L2-over-codes metric
    — ``ann_topk``'s cosine ranks a different neighbor set entirely,
    so it can't isolate routing). nprobe=3 of 10 cells must recover a
    healthy fraction of the unrouted ADC top-k, and for every pair
    both return, the distance must be IDENTICAL (routing only drops
    candidates; it can never change a kept distance). Deterministic
    plan + fixture, so the floor is a stable pin."""
    from aggregator_spark.llm_queries import (
        ANN_K,
        q_ann_topk_ivfpq,
        q_pq_adc_topk,
    )

    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in q_pq_adc_topk(spark, SF).collect()
    }
    routed = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in q_ann_topk_ivfpq(spark, SF).collect()
    }
    n_queries = len({q for q, _ in full})
    recall = len(full.keys() & routed.keys()) / (n_queries * ANN_K)
    assert recall >= 0.5, f"ivfpq routing recall@{ANN_K}: {recall}"
    for pair in full.keys() & routed.keys():
        assert full[pair] == routed[pair], pair
