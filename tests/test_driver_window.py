"""The driver's correctness gate grades the FIRST 50 ``queries()``
entries. That window is a deliberate, rotated artifact
(testdata_queries.DRIVER_WINDOW): rounds 1–4 accumulated driver rows
for 82 of 116 catalog entries; round 5's window is the §2-parity block
(green every round) + the 34 entries that had never received a driver
row + one re-pin per previously-green family. Everything in the window
is oracled except the three approx/sketch entries that are rows-only by
design.
"""

from __future__ import annotations

from aggregator_spark.testdata_queries import (
    DRIVER_WINDOW,
    DRIVER_WINDOW_ROWS_ONLY,
)

# Catalog entries with a driver CORRECTNESS row in rounds 1–4 (union of
# CORRECTNESS_r0{1..4}.json keys). The round-5 window must cover the
# complement so every catalog entry has external verification.
PREVIOUSLY_CHECKED = {
    "daily_counts", "amplified_counts", "incremental_daily_counts",
    "bloom_prefiltered_join", "dim_date", "missing_users",
    "repaired_user_dim", "cube_week", "cube_month", "cube_quarter",
    "cube_year", "dedup_exact", "minhash_signatures", "minhash_lsh_pairs",
    "dedup_components", "dedup_components_star", "ngram_jaccard_capped",
    "ngram_jaccard_pairs", "simhash64", "kmeans_assign", "kmeans_fit",
    "label_centroids", "embedding_normalize", "embedding_quantize",
    "ann_topk", "embedding_near_dup", "tfidf_top_terms", "clean_text",
    "gopher_quality", "pii_redact", "stratified_sample", "unigram_logprob",
    "top_bigrams", "vocab_edit_pairs", "pack_sequences", "doc_chunks",
    "token_stats", "text_quality", "lang_id", "doc_fingerprint",
    "sessionize", "tpch_q12_priority", "profile_events",
    "session_window_native", "tumbling_hourly", "sliding_halfhour",
    "latest_event_per_user", "asof_click_purchase", "top_events_per_type",
    "tpch_q1",
}


def test_driver_window_is_first_50():
    import __spark_entry__ as m

    names = list(m.queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == DRIVER_WINDOW
    # no entry lost in the reorder
    assert len(names) == len(set(names))


def test_driver_window_oracled_except_rows_only():
    import __spark_entry__ as m

    osql = m.oracle_sql()
    missing = [
        n
        for n in DRIVER_WINDOW
        if n not in osql and n not in DRIVER_WINDOW_ROWS_ONLY
    ]
    assert missing == [], f"driver-window queries without oracle: {missing}"
    # and the rows-only set really has no oracle (else it should shrink)
    stale = [n for n in DRIVER_WINDOW_ROWS_ONLY if n in osql]
    assert stale == [], f"rows-only entries that now have oracles: {stale}"


def test_window_covers_every_never_checked_entry():
    import __spark_entry__ as m

    never_checked = set(m.queries()) - PREVIOUSLY_CHECKED
    outside = never_checked - set(DRIVER_WINDOW)
    assert outside == set(), (
        f"catalog entries that would still have no driver row: {outside}"
    )
