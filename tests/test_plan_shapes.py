"""Physical-plan regression tests — pins the properties that make the
queries scale (100 TB story): predicate pushdown reaching the parquet
scan, column pruning in ReadSchema, broadcast joins on dim tables,
map-side partial aggregation, and no accidental sort-merge joins or
cartesian products where a broadcast is intended.

These catch silent plan regressions (e.g. a cast blocking pushdown, a
dropped broadcast hint falling back to SMJ) that row-level correctness
tests can never see.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry_mod.queries()

    def explain(name: str) -> str:
        df = qs[name](spark, SF)
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    return explain


def test_q6_pushdown_and_pruning(plans):
    p = plans("tpch_q6")
    # all five predicates reach the scan
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity,24.0)" in p
    # only the 4 referenced columns are read (of 11)
    assert "Output [4]" in p
    # map-side partial aggregation before the single-partition exchange
    assert "partial_sum" in p


def test_q1_column_pruning(plans):
    p = plans("tpch_q1")
    assert "PushedFilters" in p and "LessThanOrEqual(l_shipdate" in p
    # 7 of 11 lineitem columns read
    assert "Output [7]" in p
    assert "partial_sum" in p


def test_q5_broadcasts_dims(plans):
    p = plans("tpch_q5")
    # customer/nation/region broadcast; only lineitem⋈orders may shuffle
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    # region filter pushed into its scan
    assert "EqualTo(r_name,ASIA)" in p


def test_amplified_counts_broadcast_join(plans):
    p = plans("amplified_counts")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_missing_users_anti_join_broadcast(plans):
    p = plans("missing_users")
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_semi_join_is_semi(plans):
    p = plans("tpch_q4_semi")
    assert "LeftSemi" in p
    # orders date range pushed to scan
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_band_join_is_bnlj_broadcast(plans):
    # non-equi band join must be a broadcast nested-loop, never a
    # cartesian shuffle
    p = plans("value_bands")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_cube_uses_expand(plans):
    p = plans("cube_month")
    assert "Expand" in p
    assert "partial_count" in p or "partial_sum" in p


def test_daily_counts_two_exchanges(plans):
    # dedup (5-col distinct) + group-count + total-order sort: exactly
    # three exchanges (hash, hash, range) — anything more is a
    # regression
    p = plans("daily_counts")
    assert p.count("+- Exchange") + p.count(":- Exchange") <= 3
    assert "rangepartitioning" in p or "RangePartitioning" in p


def test_q19_keeps_hash_join(plans):
    # disjunctive predicates share the partkey equi-condition — Catalyst
    # must still pick a broadcast HASH join, not nested-loop
    p = plans("tpch_q19_disjunctive")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q13_outer_join_broadcast(plans):
    # customer ⋈ orders LEFT OUTER: the filtered orders side is the
    # build side; histogram = two hash aggregates
    p = plans("tpch_q13_custdist")
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "LeftOuter" in p
    assert "partial_count" in p


def test_q21_no_cartesian(plans):
    # the decorrelated multi-EXISTS must stay equi-join based
    p = plans("tpch_q21_waiting")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_kmeans_assign_arrow_reassignment(plans):
    # centroids are O(k x dim), collected and closed over; the corpus
    # side runs one Arrow-vectorized pass — no join, no corpus-side
    # key shuffle (the only exchange is scatter's round-robin)
    p = plans("kmeans_assign")
    assert "MapInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "hashpartitioning" not in p.lower()


def test_stratified_sample_no_shuffle(plans):
    # pure filter: no Exchange anywhere in the plan
    p = plans("stratified_sample")
    assert "Exchange" not in p


def test_capped_shingles_blocklist_broadcast(plans):
    # the df > max_df blocklist joins as a broadcast anti-join; the
    # keep-set (~whole vocabulary) must NOT be the broadcast side
    p = plans("ngram_jaccard_capped")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_bloom_probe_is_scan_side_codegen(plans):
    # the bloom probe must be plain bit arithmetic in the fact-side
    # filter (runs inside codegen before any exchange), not a join
    p = plans("bloom_prefiltered_join")
    assert "element_at" in p and "shiftleft" in p
    assert "CartesianProduct" not in p


def test_funnel_stage_filters_pushed(plans):
    p = plans("funnel_stages")
    # each stage's event_type equality reaches its parquet scan
    assert "EqualTo(event_type,view)" in p
    assert "EqualTo(event_type,click)" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "CartesianProduct" not in p


def test_top_bigrams_distributed_topk(plans):
    p = plans("top_bigrams")
    # top-20 must compile to a per-partition top-k merge, not a global sort
    assert "TakeOrderedAndProject" in p
    assert "partial_count" in p


def test_tfidf_no_cartesian_blowup(plans):
    p = plans("tfidf_top_terms")
    # N-docs scalar joins via broadcast nested loop on 1 row, never a
    # shuffled cartesian; ranking window partitions by doc_id
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_value_histogram_constant_shuffle(plans):
    p = plans("value_histogram")
    # partial aggregate collapses each task to <=10 bin rows pre-shuffle
    assert "partial_count" in p and "partial_sum" in p


def test_vocab_edit_pairs_hash_join_on_deletion_keys(plans):
    p = plans("vocab_edit_pairs")
    # SymSpell blocking: candidates come from a HASH equi-join on the
    # deletion-neighborhood key — never an O(V^2) nested loop
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashJoin" in p
    assert "levenshtein" in p


def test_snapshot_diff_single_scan(plans):
    p = plans("snapshot_diff")
    # both snapshot windows come from ONE events scan (conditional agg);
    # formatted explain prints each node twice (tree + details)
    assert p.count("Scan parquet") == 2


def test_textrank_broadcasts_scalar_and_outdeg(plans):
    p = plans("textrank_keywords")
    # N-nodes scalar and out-degree dim ride broadcasts; the iterative
    # rank joins stay keyed — no cartesian blowup anywhere in 3 rounds
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_hll_monthly_single_scan(plans):
    p = plans("hll_monthly_users")
    # sketch rollup reads the fact exactly once (node appears twice in
    # formatted explain: tree + details)
    assert p.count("Scan parquet") == 2
    assert "hll_union_agg" in p or "HllUnionAgg" in p or "hll" in p.lower()


def test_embedding_near_dup_is_distributed(plans):
    # the default near-dup path is the blocked block-pair replication
    # join: the pair kernel runs as a grouped applyInPandas on executors
    # (FlatMapGroupsInPandas), never a corpus collect() to the driver —
    # round 1's broadcast form OOMs the driver at real scale
    p = plans("embedding_near_dup")
    assert "FlatMapGroupsInPandas" in p
    # replication is a single explode + ONE shuffle on (b1, b2)
    assert "Generate" in p
    assert p.count("Exchange") <= 2  # tree + details of the one exchange


def test_decontaminate_broadcasts_probes(plans):
    # the probe set is benchmark-sized: it must ride a broadcast hash
    # join (map-side filter over the exploded grams), never a
    # shuffle/sort-merge of the corpus gram stream or a cartesian
    p = plans("decontaminate_docs")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p.split("BroadcastHashJoin")[0]


# ---- round-6 operators ----


def test_accuracy_gate_is_broadcast_not_cartesian(plans):
    # the one-row accuracy gate rides a broadcast nested-loop join
    # (1-row build side) — never a CartesianProduct, and the assert
    # survives in the plan (not pruned; see operators/accuracy.py)
    for name in ("approx_distinct_daily", "approx_quantiles_daily"):
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" in p, name
        # assert_true lowers to raise_error inside the gate filter
        assert "raise_error" in p, name


def test_asof_bucketed_windows_on_key_and_bucket(plans):
    # the carry-forward window must partition on (key, bucket) — the
    # skew spread this operator exists for — and no cartesian anywhere
    p = plans("asof_click_purchase_bucketed")
    assert "CartesianProduct" not in p
    assert "__k" in p and "__b" in p
    # per-bucket summary aggregates partially before its exchange
    assert "partial_" in p or "HashAggregate" in p


def test_video_frames_no_shuffle(plans):
    # encode → demux → sample is a pure per-row pipeline: zero
    # exchanges before the final sort for output determinism
    p = plans("video_frames")
    body = p.split("Sort")[0]  # everything feeding the output sort
    assert "CartesianProduct" not in p
    assert "Exchange" not in body or "rangepartitioning" in body.lower()


def test_ann_gate_keeps_bucket_routing(plans):
    # the recall gate must not change the LSH candidate plan: bucket
    # equi-join on the signature index, no cartesian, no sort-merge of
    # the corpus
    p = plans("ann_topk_lsh")
    assert "CartesianProduct" not in p
    assert "raise_error" in p


def test_temperature_mix_broadcasts_rates(plans):
    """The corpus side never shuffles: the per-stratum aggregate is the
    only hash exchange besides the single-partition totals; the rate
    table joins back by broadcast."""
    p = plans("temperature_mix")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_semantic_dedup_no_cartesian(plans):
    """SemDeDup's within-cluster pair comparison must be an equi-join
    on the cluster id (hash-partitionable), never an all-pairs
    cartesian/broadcast-nested-loop over the corpus."""
    p = plans("semantic_dedup")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_dedup_fuzzy_keep_bucketed_not_allpairs(plans):
    """The end-to-end dedup pipeline stays banded: candidate generation
    joins on (band, bucket) and verification on the shingle key — no
    cartesian anywhere in the composed plan."""
    p = plans("dedup_fuzzy_keep")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_dedup_incremental_semi_joins_batch_buckets(spark, plans):
    """Incremental dedup's candidate join must restrict the left side
    to the NEW batch's buckets (semi join against new ids) — never a
    full bucket self-join — and stay equi-keyed (no cartesian). The
    candidate stage is asserted directly (the composed query
    localCheckpoints it, which hides its plan behind the RDD scan);
    the composed plan is still checked for cartesian-freedom."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.dedup import (
        lsh_candidate_pairs_incremental,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, SF, "documents").select(
        "doc_id", "text", (F.col("doc_id") % 5 == 0).alias("is_new")
    )
    cand = lsh_candidate_pairs_incremental(
        docs, docs.filter("is_new").select("doc_id")
    )
    cp = spark._jvm.PythonSQLUtils.explainString(
        cand._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in cp
    assert "CartesianProduct" not in cp

    p = plans("dedup_incremental")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_heavy_bigrams_broadcast_recount(plans):
    """The exact recount joins the item stream against BROADCAST
    candidates; the only wide shuffle left is the candidate-filtered
    partial-aggregated group-count."""
    p = plans("heavy_bigrams")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_containment_sparse_shingle_join(plans):
    """Containment rides the same sparse shingle equi-join as the
    jaccard baseline — no cartesian pair enumeration."""
    p = plans("ngram_containment_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_regr_single_aggregate(plans):
    """The regression is ONE map-side-partial hash aggregate over the
    fact — no window, no join, no second shuffle of raw rows."""
    p = plans("regr_value_by_type")
    assert "HashAggregate" in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    # exactly one exchange pair for the groupBy (plus AQE reads)
    assert p.count("+- Exchange") <= 2


def test_interval_join_is_equi_not_nested_loop(plans):
    """The bounded time-range join compiles to an EQUI join on
    (key, time bucket) with the range predicate inside it — never a
    nested-loop/cartesian per-key cross product (what a plain
    inequality join would plan as). The probe-side bucket explode is
    the Generate."""
    p = plans("clicks_before_purchase")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "Generate" in p  # probe replicated to its ≤2 buckets


def test_zscore_single_window_exchange(plans):
    """Expanding moments are ONE hash exchange on the key feeding one
    Window — no self-join, no second shuffle of raw events."""
    p = plans("zscore_outliers")
    assert "Window" in p
    assert "Join" not in p
    assert p.count("+- Exchange") == 1


def test_span_rewrite_hash_joins_only(plans):
    """Span removal: gram-hash stats attach via ONE window over gh
    (r13 — the groupBy+join-back re-shuffled the gram stream), covered
    positions mark the token stream with a LeftOuter flag join (the
    same aggregation then yields n_tokens AND the kept rebuild — the
    old LeftAnti form re-tokenized the corpus a third time for
    n_tokens), and the rebuild aggregate (ObjectHashAggregate carries
    the collect_list) — no cartesian anywhere, raw text shuffles only
    for the rebuild."""
    p = plans("dedup_span_rewrite")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "LeftOuter" in p
    assert "Window" in p
    assert "ObjectHashAggregate" in p


def test_bigram_logprob_only_scalar_bnlj(plans):
    """The LM joins are hash joins on their natural keys; the single
    BroadcastNestedLoopJoin is the 1-row corpus total (same shape as
    unigram_logprob) — never a vocab-sized nested loop."""
    p = plans("bigram_logprob")
    assert "CartesianProduct" not in p
    # count tree nodes, not the detail-section repeats
    assert p.count("+- BroadcastNestedLoopJoin") == 1


def test_cms_build_single_scan(plans):
    """The depth replication is an in-row explode (Generate), not a
    union of per-row scans — exactly two events scans total (counter
    build + true counts; the probe keys reuse the distinct)."""
    p = plans("cms_user_counts")
    assert "Union" not in p
    assert "Generate" in p
    assert "CartesianProduct" not in p


def test_bm25_topk_is_group_limit(plans):
    """The per-query top-k cut compiles to WindowGroupLimit (rank
    pushdown) — candidates are pruned before the final window, never a
    global sort of all scored docs."""
    p = plans("bm25_search")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    # the only nested loop is the broadcast 1-row scalars
    assert p.count("+- BroadcastNestedLoopJoin") == 1


def test_dsir_model_broadcast(plans):
    """The n_buckets-sized ratio model broadcasts back over the token
    stream (corpus text never shuffles); the 1-row totals are the only
    nested loop."""
    p = plans("dsir_weights")
    assert "CartesianProduct" not in p
    assert p.count("+- BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in p


def test_semantic_decontaminate_broadcast_probe_scan(plans):
    """Probes broadcast (BNLJ build side); the per-vector max partial-
    aggregates map-side BEFORE the only corpus exchange."""
    p = plans("semantic_decontaminate")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "partial_max" in p


def test_pmi_distributed_topk(plans):
    """Top-50 compiles to TakeOrderedAndProject (per-partition top-k
    merge, not a global sort); unigram joins stay hash joins; the only
    nested loops are the 1-row scalar broadcasts (p_total x n_total
    assembly + the join back over candidates)."""
    p = plans("pmi_collocations")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert p.count("+- BroadcastNestedLoopJoin") <= 2


def test_zscore_bucketed_windows_on_key_and_bucket(plans):
    """The skew-hardened z-score's running-moment window partitions by
    (key, time bucket), with the carry-in computed on the buckets-sized
    summary — no cartesian, no join back to raw history."""
    p = plans("zscore_outliers_bucketed")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # two windows: the local (key, bucket) running moments and the
    # per-key cumulative carry over the bucket summary
    assert p.count("+- Window") == 2
    assert "partial_count" in p or "partial_sum" in p  # summary partials


def test_rrf_pool_broadcast_never_shuffles_corpus(plans):
    """The RRF re-ranker joins the top-20 pool (explicit broadcast)
    against the quality column — the corpus side must not shuffle for
    the join, and both rank cuts compile to WindowGroupLimit."""
    p = plans("bm25_rrf_rerank")
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p
    # no sort-merge join anywhere: pool and fusion tables are tiny
    assert "SortMergeJoin" not in p


def test_waterfill_aggregates_before_windows(plans):
    """Water-filling runs its windows on the strata summary only: the
    corpus reduces through a partial-aggregated groupBy FIRST; the
    single-partition windows see strata-sized input."""
    p = plans("mix_waterfill")
    assert "partial_sum" in p  # map-side combine on the token masses
    assert "CartesianProduct" not in p
    # ordering, actually asserted: formatted-explain node ids count up
    # from the scan, so the partial-aggregate's node id must be SMALLER
    # than every Window's — the windows consume the strata summary, not
    # the corpus
    blocks = re.split(r"\n(?=\(\d+\) )", p)

    def node_ids(pred):
        out = []
        for b in blocks:
            m = re.match(r"\((\d+)\) (.+)", b)
            if m and pred(m.group(2)):
                out.append(int(m.group(1)))
        return out

    agg_ids = node_ids(lambda h: "HashAggregate" in h)
    win_ids = node_ids(lambda h: h.strip().startswith("Window"))
    assert agg_ids and win_ids
    assert min(agg_ids) < min(win_ids)


def test_pack_efficiency_partial_aggs(plans):
    p = plans("pack_efficiency")
    assert "partial_sum" in p
    assert "CartesianProduct" not in p


def test_cluster_sizes_reuses_component_checkpoint(plans):
    """The histogram runs on the components output: the plan seen from
    the final query is two aggregations over the checkpointed labels —
    no shingle pipeline re-run, no cartesian."""
    p = plans("dedup_cluster_sizes")
    assert "CartesianProduct" not in p
    assert "partial_count" in p


def test_corpus_prepare_composed_plan_is_clean(plans):
    """The composed pipeline's final plan: hash joins only, no
    row-at-a-time Python, chunker is the Arrow-batched mapInPandas."""
    p = plans("corpus_prepare_e2e")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p  # mapInPandas compiles to MapInPandas
    assert "MapInPandas" in p
