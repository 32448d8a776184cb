"""Per-key shuffle-WRITE budgets for the bench (VERDICT r7 item 4).

Wall-clock drifts with machine load; shuffle bytes are a property of
the PLAN. bench.py measures per-key shuffle read/write bytes (Spark
status REST API, stage deltas) and records them in BENCH_DETAIL.json;
``check_budgets`` then compares the sf0.1 run against the caps below,
so a plan regression — a new exchange, a lost broadcast, a filter that
stopped pushing down — fails loudly at bench time instead of drifting
wall-clock across rounds.

Caps are measured sf0.1 values (round 8) with ~2.5× headroom: loose
enough to survive driver testdata regeneration (content changes, same
scale), tight enough that an extra corpus-sized exchange (typically
5–100× on these keys) trips them. Keys without a cap are recorded but
not gated. The complementary SCALE-INDEPENDENT gate is
tests/test_shuffle_budgets.py, which pins exchange COUNTS per plan via
plans/lint.plan_report — that one runs in the suite at sf0.001.
"""

from __future__ import annotations

# measured shuffle write at sf0.1 (round-8 run, BENCH_DETAIL.json
# "shuffle"), cap = ~2.5x measured, floor 8 MB so tiny keys don't flap
# on layout; keys under 2 MB measured stay ungated (recorded only)
SHUFFLE_WRITE_BUDGET_MB: dict[str, float] = {
    "ann_ivf_index_build": 8.0,
    "ann_topk_ivf": 8.0,
    "ann_topk_lsh": 22.6,
    "asof_click_purchase_bucketed": 10.9,
    "bpe_encode_docs": 20.5,
    "corpus_keep_list": 19.6,
    "corpus_prepare_e2e": 76.0,
    "corpus_prepare_incremental": 18.6,
    "corpus_prepared_index_build": 26.4,
    "corpus_train_split_e2e": 76.0,
    "daily_type_jaccard": 8.0,
    "dedup_bucket_index_build": 8.0,
    "dedup_cluster_sizes": 13.3,
    "dedup_span_rewrite": 18.0,
    "dup_span_stats": 19.6,
    "embedding_near_dup": 9.4,
    "heavy_bigrams": 8.0,
    "kmeans_assign": 8.0,
    "kmeans_fit": 10.2,
    "minhash_signatures": 8.0,
    "ngram_containment_pairs": 26.0,
    "ngram_jaccard_capped": 12.8,
    "ngram_jaccard_pairs": 26.0,
    "semantic_dedup": 8.0,
    "session_window_native": 8.0,
    "sessionize": 8.0,
    "tfidf_top_terms": 8.0,
    "tpch_q16_supplier_cnt": 24.2,
    "tpch_q21_waiting": 55.5,
    "tpch_q2_min_supp": 16.0,
    "zscore_outliers": 9.7,
    "zscore_outliers_bucketed": 16.1,
}


def check_budgets(
    shuffle_mb: dict[str, float],
    sf: float,
    budgets: dict[str, float] | None = None,
) -> list[str]:
    """Violation strings for every budgeted key whose measured shuffle
    write exceeds its cap — empty when clean or when the run is not
    the sf0.1 reference scale (budgets are scale-specific)."""
    if abs(sf - 0.1) > 1e-9:
        return []
    budgets = SHUFFLE_WRITE_BUDGET_MB if budgets is None else budgets
    out = []
    for key, cap in sorted(budgets.items()):
        got = shuffle_mb.get(key)
        if got is not None and got > cap:
            out.append(
                f"{key}: shuffle write {got:.1f} MB > budget {cap:.1f} MB"
            )
    return out
