"""The driver's correctness gate grades the FIRST 50 ``queries()``
entries. That window is a deliberate artifact (testdata_queries.
DRIVER_WINDOW): §2-parity + the whole LLM-pipeline family + the round-1
hardened queries, every one of them with a DuckDB oracle so all 50 get
the full rows/schema/hash check rather than a rows-only fallback.
"""

from __future__ import annotations

from aggregator_spark.testdata_queries import DRIVER_WINDOW


def test_driver_window_is_first_50():
    import __spark_entry__ as m

    names = list(m.queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == DRIVER_WINDOW
    # no entry lost in the reorder
    assert len(names) == len(set(names))


def test_driver_window_fully_oracled():
    import __spark_entry__ as m

    osql = m.oracle_sql()
    missing = [n for n in DRIVER_WINDOW if n not in osql]
    assert missing == [], f"driver-window queries without oracle: {missing}"


def test_llm_family_inside_window():
    llm_ops = {
        "dedup_exact",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "dedup_components",
        "ngram_jaccard_capped",
        "simhash64",
        "kmeans_assign",
        "kmeans_fit",
        "embedding_normalize",
        "embedding_quantize",
        "ann_topk",
        "embedding_near_dup",
        "tfidf_top_terms",
        "clean_text",
        "gopher_quality",
        "pii_redact",
        "pack_sequences",
        "doc_chunks",
        "stratified_sample",
        "unigram_logprob",
        "token_stats",
        "text_quality",
        "lang_id",
        "doc_fingerprint",
    }
    assert llm_ops <= set(DRIVER_WINDOW)
