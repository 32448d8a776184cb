"""Per-key shuffle-WRITE budgets for the bench (VERDICT r7 item 4).

Wall-clock drifts with machine load; shuffle bytes are a property of
the PLAN. bench.py measures per-key shuffle read/write bytes (Spark
status REST API, stage deltas) and records them in BENCH_DETAIL.json;
``check_budgets`` then compares the sf0.1 run against the caps below,
so a plan regression — a new exchange, a lost broadcast, a filter that
stopped pushing down — fails loudly at bench time instead of drifting
wall-clock across rounds.

Caps (round 9) cover EVERY bench key: per key, the measured sf0.1
shuffle write is the MAX of the driver's independent round-8 run and
the round-9 local run, the cap is 1.5× that with a 2 MB floor (layout/
compression noise on tiny keys sits well under the floor; an extra
corpus-sized exchange — typically 5–100× on the keys that matter —
still trips it). Attribution-coupled families are capped on their SUM
instead (``BUDGET_GROUPS``, enforced by the same ``check_budgets``);
the derived coverage pin is tests/test_shuffle_budgets.py::
test_every_bench_key_budgeted. Enforcement is ON by default in bench.py since r9
(SPARK_GRAFT_ENFORCE_SHUFFLE=0 to disable). The complementary
SCALE-INDEPENDENT gate is tests/test_shuffle_budgets.py, which pins
exchange COUNTS per plan via plans/lint.plan_report — that one runs in
the suite at sf0.001.
"""

from __future__ import annotations

# cap = 1.5x max(driver r8 run, local r9 run) sf0.1 shuffle write,
# floor 2 MB; every key budgeted
SHUFFLE_WRITE_BUDGET_MB: dict[str, float] = {
    "amplified_counts": 2.0,
    "ann_ivf_index": 2.0,
    "ann_ivf_index_build": 3.1,
    "ann_lsh_index_build": 2.0,
    "ann_topk": 2.0,
    "ann_topk_ivf": 4.4,
    "ann_topk_ivfpq": 8.3,  # r11 third wave: 5.55 MB measured sf0.1
    "ann_topk_lsh": 13.6,
    "approx_distinct_daily": 2.0,
    "approx_quantiles_daily": 2.0,
    # r12 second wave: audio signatures, same tiny-node shape as the
    # image keys — floors
    "audio_fingerprint": 2.0,
    "audio_near_dup_keep": 2.0,
    "asof_click_purchase": 2.8,
    "asof_click_purchase_bucketed": 6.6,
    "bigram_logprob": 2.0,
    "bloom_prefiltered_join": 2.0,
    "boilerplate_stats": 2.0,  # r9 late: floor (0.69 MB measured)
    "bm25_index_build": 3.0,
    "bm25_index_postings": 2.0,
    "bm25_rrf_rerank": 2.0,
    "bm25_search": 2.0,
    "bpe_dict_build": 2.0,
    "bpe_dict_states": 2.0,
    "bpe_encode_docs": 12.3,
    "bpe_fertility": 2.0,  # r9 fourth wave: floor (0.11 MB measured)
    "bpe_merges": 2.0,
    "calendar_funcs": 2.0,
    "clean_text": 2.0,
    "clicks_before_purchase": 2.0,
    "cms_user_counts": 2.0,
    "cohort_retention": 2.0,
    "cooccur_triangles": 2.0,
    "corpus_drift_js": 2.0,
    "corpus_keep_list": 11.8,
    "corpus_prepare_e2e": 45.6,
    "corpus_prepare_incremental": 12.0,
    # r9 fourth wave: 1.5x the 36.3 MB local measure (the e2e's 30.4 MB
    # plus the line stage's segment-df + rebuild shuffles)
    "corpus_prepare_line_e2e": 54.5,
    # r9 fourth wave: 1.5x the 4.15 MB measure — the top-10% gate
    # shrinks the kept corpus, so every downstream stage shuffles less
    # than the base e2e
    "corpus_prepare_topp_e2e": 6.2,
    # r10 sixth wave: topp plan shape, but the gate keeps 2/3 of docs
    # (thirds per language) vs topp's top fraction, so every
    # downstream stage shuffles ~2.7x topp's survivor volume, plus
    # the LM scoring joins (25.7 MB measured; 1.5x cap)
    "corpus_prepare_ppl_e2e": 38.5,
    # r11 second wave: 31.3 MB measured sf0.1 — the base e2e's LSH
    # stages plus the SimHash family over the same survivors
    "corpus_prepare_union_e2e": 47.0,
    # r11 fourth wave: 30.5 MB measured sf0.1 (base-e2e stages + the
    # rollup/rank tail)
    "corpus_prepare_shard_e2e": 45.7,
    # r11 fifth wave: gate 0.45 MB / e2e 8.2 MB measured sf0.1 (the
    # DSIR gate keeps 25%/source, so the e2e's survivor volume sits
    # between topp's 10% and ppl's 67%)
    "corpus_prepare_dsir_e2e": 12.3,
    "dsir_gate": 2.0,
    "heaps_law_points": 2.0,  # r11 sixth wave: floor
    "zorder_layout_keys": 5.9,  # r11 sixth wave: 3.9 MB measured sf0.1
    "corpus_shard_emit": 2.0,  # r11 first wave: floor (1.2 MB measured)
    "corpus_prepare_semantic_e2e": 50.5,
    "corpus_prepared_index_build": 14.1,
    "corpus_train_split_e2e": 45.6,
    "cube_grouping_id": 2.0,
    "cube_month": 2.0,
    "cube_quarter": 2.0,
    "cube_week": 2.0,
    "cube_year": 2.0,
    "curriculum_ablation": 13.4,
    "curriculum_bins": 2.0,
    "daily_counts": 2.0,
    "daily_type_jaccard": 3.1,
    "contamination_by_source": 2.0,  # r10: floor (0.01 MB measured)
    # r10: floor (0.29 MB measured — two-level-carry summary relations)
    "quality_percentile_continuous": 2.0,
    "decontaminate_docs": 2.0,
    "dedup_batch_sign": 2.0,
    "dedup_bloom_ingest": 2.0,  # r10 fifth wave: floor
    # r13: streaming media store — per-wave folds of tiny signature
    # relations (provisional caps, tightened after the r13 measure)
    "media_store_build": 8.0,
    "served_media_near_dup": 4.0,
    "dedup_bucket_index": 2.0,
    "dedup_bucket_index_build": 3.4,
    "dedup_cluster_sizes": 8.0,
    "dedup_components": 2.0,
    "dedup_components_star": 2.0,
    "dedup_exact": 2.0,
    # dedup_fuzzy_keep / dedup_keep_best / dedup_incremental /
    # dedup_incremental_serve: capped as GROUPS, see BUDGET_GROUPS
    "dedup_span_rewrite": 10.8,
    "deterministic_sample": 2.0,
    "dim_date": 2.0,
    "distinct_users_daily": 2.0,
    "doc_chunks": 2.0,
    "doc_fingerprint": 2.0,
    "dod_change": 2.0,
    "dq_report": 2.3,
    "dsir_weights": 2.0,
    "dup_span_stats": 11.7,
    "embedding_near_dup": 5.7,
    "embedding_normalize": 2.0,
    "embedding_quantize": 2.0,
    "eval_split_quota": 2.0,
    "full_outer_reconcile": 2.0,
    "funnel_stages": 2.0,
    "gap_fill_daily": 2.0,
    "geomean_value": 2.0,
    "gopher_quality": 2.0,
    "grouping_sets_daily": 2.0,
    "heavy_bigrams": 3.0,
    "hll_monthly_users": 2.0,
    # r12 first wave: image signatures are (long, 64-char string) and
    # the banding/components run on ≤256 distinct-signature nodes —
    # floors (measured sf0.1: ≤0.5 MB each)
    "image_dhash": 2.0,
    "image_near_dup_pairs": 2.0,
    "image_near_dup_keep": 2.0,
    "incremental_daily_counts": 2.0,
    "interval_overlap_join": 2.8,
    "json_props": 2.0,
    "json_struct": 2.0,
    "kmeans_assign": 3.1,
    "kmeans_fit": 6.1,
    "label_centroids": 2.0,
    "lang_id": 2.0,
    "line_dedup_rewrite": 2.8,  # r9 late: 1.5x the 1.88 MB local measure
    "lateral_topk_orders": 2.0,
    "latest_event_per_user": 2.0,
    "map_user_type_counts": 2.0,
    "media_archive_features": 2.0,  # r10 tenth wave: floor (scan -> decode)
    "media_features": 2.0,
    "median_value": 2.0,
    "minhash_est_accuracy": 8.8,
    "minhash_lsh_pairs": 2.0,
    "minhash_signatures": 3.4,
    "missing_users": 2.0,
    "mix_waterfill": 2.0,
    "mode_event_type": 2.0,
    "ngram_containment_pairs": 15.6,
    "ngram_jaccard_capped": 7.7,
    "ngram_jaccard_pairs": 15.6,
    "ngram_novelty": 8.7,
    "pack_efficiency": 2.0,
    "pack_sequences": 2.0,
    "perplexity_gate": 2.0,  # r10 fifth wave: floor
    "shard_manifest": 2.0,  # r11 first wave: floor (1.2 MB measured)
    "shard_mixing_report": 2.0,  # r11 seventh wave: floor (1.2 MB)
    "pii_redact": 2.0,
    "pivot_daily": 2.0,
    "pmi_collocations": 2.0,
    "pq_adc_topk": 5.3,  # r10: 1.5x the 3.5 MB measure
    "pq_encode": 2.0,  # r10: floor (1.2 MB measured)
    "lang_id_confusion": 2.0,  # r10 seventh wave: floor
    "length_percentiles_exact": 2.0,  # r10 eighth wave: floor
    "prepared_probes": 2.0,
    "priority_sample": 2.0,  # r10 fifth wave: floor
    "priority_sample_per_source": 2.0,  # r10 seventh wave: floor
    "profile_events": 2.0,
    "quality_percentile": 2.0,  # r9 fourth wave: floor (0.04 MB measured)
    "quality_percentile_bucketed": 2.0,  # floor (0.17 MB measured)
    "rank_analytics": 2.0,
    "regr_value_by_type": 2.0,
    "repaired_user_dim": 2.0,
    "repetition_metrics": 2.0,
    "rolling_7d_avg": 2.0,
    "rollup_orders": 2.0,
    "salted_type_counts": 2.0,
    "scd2_merge": 2.0,
    "semantic_decontaminate": 2.0,
    "semantic_dedup": 4.4,
    "semantic_dedup_capped": 4.4,
    "session_window_native": 3.0,
    "sessionize": 3.0,
    "set_ops_users": 2.0,
    "simhash64": 2.0,
    "simhash_near_dup": 3.9,
    "sliding_halfhour": 2.0,
    "snapshot_diff": 2.0,
    "span_rewrite_incremental": 5.2,
    "stats_by_type": 2.0,
    "stratified_sample": 2.0,
    "string_funcs": 2.0,
    "temperature_mix": 2.0,
    "text_quality": 2.0,
    "textrank_keywords": 2.0,
    "tfidf_top_terms": 4.5,
    "token_stats": 2.0,
    "top_bigrams": 2.0,
    "top_events_per_type": 2.0,
    "top_tokens": 2.0,
    "tpch_q1": 2.0,
    "tpch_q10_returns": 2.0,
    "tpch_q11_important_stock": 2.0,
    "tpch_q12_priority": 2.0,
    "tpch_q13_custdist": 2.0,
    "tpch_q14_promo": 2.0,
    "tpch_q15_top_supplier": 2.0,
    "tpch_q16_supplier_cnt": 14.5,
    "tpch_q17_small_qty": 2.0,
    "tpch_q18_big_orders": 2.5,
    "tpch_q19_disjunctive": 2.0,
    "tpch_q20_nested_in": 2.0,
    "tpch_q21_waiting": 33.5,
    "tpch_q22_idle": 2.0,
    "tpch_q2_min_supp": 9.6,
    "tpch_q3": 2.0,
    "tpch_q4_semi": 2.0,
    "tpch_q5": 2.0,
    "tpch_q6": 2.0,
    "tpch_q7_nation_pairs": 2.0,
    "tpch_q8_market_share": 2.0,
    "tpch_q9_profit": 2.0,
    "tumbling_hourly": 2.0,
    "type_entropy": 2.0,
    "unigram_logprob": 2.0,
    "video_near_dup_keep": 2.0,  # r12 third wave: hub-star edges, tiny
    "unpivot_daily": 2.0,
    "user_type_arrays": 2.0,
    "value_bands": 2.0,
    "warclite_scan": 2.0,  # r10 ninth wave: floor (splits -> one agg)
    "value_histogram": 2.0,
    "variant_ingest": 2.0,
    "variant_json_stats": 2.0,
    "variant_json_stats_materialized": 2.0,
    "video_frames": 2.0,
    "vocab_growth": 2.0,  # r9 fourth wave: floor (0.02 MB measured)
    "vocab_edit_pairs": 2.0,
    "weekday_bitmap": 2.0,
    "window_value_funcs": 2.0,
    "zscore_outliers": 5.8,
    "zscore_outliers_bucketed": 9.6,
}


# Attribution-coupled key families, capped on their SUM (r9): these
# pairs share eagerly-materialized sub-plans (the localCheckpoint'ed
# candidate/batch tables), and across r9 full runs a member's
# measured bytes flapped between its FULL plan cost (~5.4 MB — the
# value the r8 caps were derived from) and a stage-skipped ~1.4 MB,
# with bytes also moving between the pair members run-to-run. A
# per-key cap flaps on that variance; the group cap is sized at 1.5×
# the SUM OF FULL plan costs (the deterministic upper bound — skips
# only ever lower a measurement) and still trips on a real plan
# regression: one extra corpus-sized exchange adds ~5 MB per member
# (measured sums 6.9–10.8 MB vs caps ~16 MB; a regression lands >21).
BUDGET_GROUPS: list[tuple[tuple[str, ...], float]] = [
    (("dedup_incremental", "dedup_incremental_serve"), 16.7),
    # r10: the union keep and the family-overlap report share the
    # eagerly-materialized LSH candidate + component sub-plans with the
    # pair (measured flap: union standalone 10.3 MB vs 2.6 in a family
    # run), so both join the group; cap = 1.5 x (10.8 pair full-cost
    # sum + 10.3 union standalone + 2.3 overlap standalone)
    (
        (
            "dedup_fuzzy_keep",
            "dedup_keep_best",
            "dedup_fuzzy_keep_union",
            "dedup_family_overlap",
        ),
        35.1,
    ),
]


def check_budgets(
    shuffle_mb: dict[str, float],
    sf: float,
    budgets: dict[str, float] | None = None,
    groups: list[tuple[tuple[str, ...], float]] | None = None,
) -> list[str]:
    """Violation strings for every budgeted key whose measured shuffle
    write exceeds its cap (grouped keys compared as a sum) — empty
    when clean or when the run is not the sf0.1 reference scale
    (budgets are scale-specific)."""
    if abs(sf - 0.1) > 1e-9:
        return []
    budgets = SHUFFLE_WRITE_BUDGET_MB if budgets is None else budgets
    groups = BUDGET_GROUPS if groups is None else groups
    out = []
    for key, cap in sorted(budgets.items()):
        got = shuffle_mb.get(key)
        if got is not None and got > cap:
            out.append(
                f"{key}: shuffle write {got:.1f} MB > budget {cap:.1f} MB"
            )
    for keys, cap in groups:
        present = [k for k in keys if shuffle_mb.get(k) is not None]
        if not present:
            continue
        got = sum(shuffle_mb[k] for k in present)
        if got > cap:
            out.append(
                f"{'+'.join(keys)}: shuffle write {got:.1f} MB "
                f"> group budget {cap:.1f} MB"
            )
    return out
