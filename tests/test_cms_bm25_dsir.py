"""Semantics of the deterministic Count-Min sketch (guarantee +
mergeability), BM25 ranking, and DSIR importance weights. Oracle
hash-matches run in test_entry_oracle; these pin the properties the
hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from aggregator_spark.operators.corpus import dsir_weights
from aggregator_spark.operators.retrieval import bm25_search
from aggregator_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_and_collides(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    counters = cms_build(events, "user_id", width=16)  # force collisions
    probes = events.select("user_id").where(
        F.col("user_id").isNotNull()
    ).distinct()
    est = cms_estimate(counters, probes, "user_id", width=16)
    true = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    rows = est.join(true, "user_id").collect()
    assert rows
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)  # CMS bound
    # width 16 over ~dozens of keys MUST collide somewhere
    assert any(r["est_cnt"] > r["true_cnt"] for r in rows)


def test_cms_counters_merge_exactly(spark):
    """Summing per-partition counter tables == building over the union
    — the mergeable-sketch contract (what per-day pre-aggregation
    relies on)."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(half_a, "user_id")
        .unionByName(cms_build(half_b, "user_id"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_build(events, "user_id")
    a = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in full.collect()}
    assert a == b


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),  # high tf for both terms
            (2, "spark filter scan merge"),  # one term
            (3, "window sort batch line"),  # no term
            (4, "spark join"),  # both terms, shortest doc
        ],
        "doc_id long, text string",
    )
    got = bm25_search(docs, [(0, "spark join")], top_k=3).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in got}
    # docs without any query term never appear
    assert 3 not in {r["doc_id"] for r in got}
    # both-term docs outrank the single-term doc
    assert set(by_rank[k] for k in (1, 2)) == {1, 4}
    assert by_rank[3] == 2
    # scores strictly ordered by rank
    scores = [r["score"] for r in sorted(got, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_dsir_prefers_target_like_docs(spark):
    # target docs speak vocab A, others vocab B; a fresh A-speaking
    # doc must weigh higher than a B-speaking one
    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma delta alpha beta", "en"))
    for i in range(10, 20):
        rows.append((i, "uno dos tres cuatro uno dos", "es"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(
            docs, target_filter=F.col("lang") == "en"
        ).collect()
    }
    assert got[0] > got[15]  # target-like beats non-target-like
    # weights are per-token sums: every en doc identical, every es doc
    # identical (same token multiset)
    assert len({got[i] for i in range(10)}) == 1
    assert len({got[i] for i in range(10, 20)}) == 1


# ---------------------------------------------------------------- bpe


def test_bpe_greedy_overlap_and_learning_order(spark):
    from aggregator_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaa aaa bc bc bc")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=3).collect()]
    # words: aaa(x2), bc(x3). pair counts round 1: (a,a)=4 (two per
    # "aaa" — overlapping positions BOTH count), (b,c)=3
    assert got[0] == (1, "a", "a", "aa", 4)
    # greedy left-to-right application: |a|a|a| -> |aa|a| (NOT |a|aa|),
    # so round 2 sees (aa,a)=2 and (b,c)=3 -> (b,c) wins
    assert got[1] == (2, "b", "c", "bc", 3)
    assert got[2] == (3, "aa", "a", "aaa", 2)


def test_bpe_encode_reconstructs_words(spark):
    from aggregator_spark.operators.bpe import bpe_encode, bpe_train_full

    docs = spark.createDataFrame(
        [(1, "the theme then"), (2, "theme theme the")],
        "doc_id long, text string",
    )
    merges, states = bpe_train_full(docs, n_merges=4)
    enc = {r["doc_id"]: r for r in bpe_encode(docs, states).collect()}
    # symbols concatenate back to the original tokens, in order
    assert enc[1]["encoded"].replace(" ", "") == "thethemethen"
    assert enc[1]["n_tokens"] == 3
    # merging strictly reduces (or preserves) symbol count vs chars
    assert enc[1]["n_symbols"] < len("thethemethen")
    # 'th'/'the' family should be learned from this corpus
    merged = {r["merged"] for r in merges.collect()}
    assert "th" in merged or "he" in merged


def test_bpe_even_run_merges_every_pair(spark):
    # the doubled-sentinel form: 'aaaa' + merge (a,a) -> [aa, aa];
    # a single-sentinel replace would under-merge to [aa, a, a]
    from aggregator_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=2).collect()]
    assert got[0] == (1, "a", "a", "aa", 9)  # 3 overlapping pairs x 3
    # round 2 must see [aa, aa] per word -> pair (aa, aa) x 3
    assert got[1] == (2, "aa", "aa", "aaaa", 3)


def test_bpe_degenerate_corpus_oracle_parity(spark, tmp_path):
    # fewer learnable pairs than n_merges: the Spark trainer stops
    # early; the unrolled oracle must pass states through the empty
    # rounds (LEFT JOIN guard), not cascade to an empty dictionary
    import duckdb

    from aggregator_spark.operators.bpe import bpe_encode, bpe_train_full
    from aggregator_spark.oracles_analytics10 import (
        _bpe_encode_sql,
        _bpe_merges_sql,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab x"), (2, "ab x x")], "doc_id long, text string"
    )
    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")

    merges, states = bpe_train_full(docs, n_merges=8)
    got_merges = sorted(tuple(r) for r in merges.collect())
    want_merges = sorted(map(tuple, con.sql(_bpe_merges_sql(8)).fetchall()))
    assert got_merges == want_merges
    assert len(got_merges) == 1  # only (a,b) is learnable

    got_enc = sorted(tuple(r) for r in bpe_encode(docs, states).collect())
    want_enc = sorted(map(tuple, con.sql(_bpe_encode_sql(8)).fetchall()))
    assert got_enc == want_enc
    assert len(got_enc) == 2  # every doc present despite early stop
    con.close()


def test_cms_estimate_handles_absent_probe_keys(spark):
    from aggregator_spark.operators.sketches import cms_build, cms_estimate

    build = spark.createDataFrame(
        [(i,) for i in range(20)], "k long"
    )
    counters = cms_build(build, "k", width=64)
    probes = spark.createDataFrame(
        [(5,), (999_999,)], "k long"
    )
    est = {r["k"]: r["est_cnt"] for r in cms_estimate(
        counters, probes, "k", width=64
    ).collect()}
    assert est[5] >= 1  # present key: CMS lower bound holds
    # absent key must appear in the output; with 20 keys over 4x64
    # cells a fully-colliding absent key is all but impossible, so
    # the min sees an empty (zero) cell
    assert est[999_999] == 0


def test_bm25_shared_term_across_queries_not_double_counted(spark):
    from aggregator_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [(1, "spark scan"), (2, "spark merge"), (3, "sort batch")],
        "doc_id long, text string",
    )
    solo = {
        (r["doc_id"]): r["score"]
        for r in bm25_search(docs, [(0, "spark")]).collect()
    }
    shared = bm25_search(docs, [(0, "spark"), (1, "spark")]).collect()
    for r in shared:
        assert r["score"] == solo[r["doc_id"]]
    # punctuated query text tokenizes like the corpus side
    hyph = bm25_search(docs, [(0, "spark-merge")]).collect()
    assert {r["doc_id"] for r in hyph} == {1, 2}


def test_bm25_index_tables_roll_up_across_batches(spark):
    """The ingest-index claim: postings/df/scalars from disjoint
    batches merge into exactly the full-corpus tables (df and n_docs/
    sum_dl add; avgdl re-derives) — what incremental ingest relies on."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.retrieval import (
        bm25_postings,
        bm25_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    pa, pb = bm25_postings(half_a), bm25_postings(half_b)
    full_df, full_sc = bm25_stats(bm25_postings(docs))

    dfa, sca = bm25_stats(pa)
    dfb, scb = bm25_stats(pb)
    merged_df = (
        dfa.unionByName(dfb).groupBy("term").agg(F.sum("df").alias("df"))
    )
    assert sorted(map(tuple, merged_df.collect())) == sorted(
        map(tuple, full_df.collect())
    )
    a, b = sca.collect()[0], scb.collect()[0]
    want = full_sc.collect()[0]
    n = a["n_docs"] + b["n_docs"]
    s = a["sum_dl"] + b["sum_dl"]
    assert (n, s) == (want["n_docs"], want["sum_dl"])
    assert s / n == want["avgdl"]  # same division shape re-derives it


def test_semantic_flags_total_under_empty_probe_set(spark):
    from pyspark.sql import functions as F

    from aggregator_spark.operators.similarity import (
        semantic_contamination_flags,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 8)],  # no multiple of 20
        "vec_id long, embedding array<float>",
    )
    got = semantic_contamination_flags(emb, probe_mod=20).collect()
    assert len(got) == 7  # every non-probe vector present
    assert all(r["max_probe_cosine"] is None for r in got)
    assert all(r["contaminated"] is False for r in got)


def test_dedup_incremental_served_equals_self_contained(spark, tmp_path):
    # the bench accounting split (dedup_batch_sign +
    # dedup_incremental_serve) must not change results: a persisted
    # batch bucket table is bit-identical to signing the batch fresh
    # (deterministic md5 construction)
    from aggregator_spark.llm_queries import (
        dedup_incremental_batch_buckets,
        q_dedup_incremental,
        q_dedup_incremental_served,
    )

    sf = "/root/testdata/sf0.001"
    p = str(tmp_path / "batch_buckets")
    dedup_incremental_batch_buckets(spark, sf).write.parquet(p)
    served = q_dedup_incremental_served(spark, sf, spark.read.parquet(p))
    got = {tuple(r) for r in served.collect()}
    want = {tuple(r) for r in q_dedup_incremental(spark, sf).collect()}
    assert got == want
    assert len(got) > 0


def _mass_docs(spark, masses):
    rows = [
        (i, " ".join(["t"] * m), f"s{i}") for i, m in enumerate(masses)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_waterfill_small_strata_kept_whole(spark):
    from aggregator_spark.operators.corpus import token_budget_waterfill

    # total 1000, budget 500: the two small strata fit under the water
    # level and keep everything; the big one clips to 470
    docs = _mass_docs(spark, [10, 20, 970])
    got = {
        r["stratum"]: (r["mass_tokens"], r["allocated_tokens"])
        for r in token_budget_waterfill(docs, budget_frac=0.5).collect()
    }
    assert got == {"s0": (10, 10), "s1": (20, 20), "s2": (970, 470)}


def test_waterfill_remainder_distribution_exact(spark):
    from aggregator_spark.operators.corpus import token_budget_waterfill

    # total 21, budget 10: level 3, base 3+3+3=9, remainder 1 goes to
    # the FIRST capped stratum in (mass, stratum) order — sums to the
    # budget exactly
    docs = _mass_docs(spark, [7, 7, 7])
    rows = token_budget_waterfill(docs, budget_frac=10 / 21).collect()
    allocs = {r["stratum"]: r["allocated_tokens"] for r in rows}
    assert sum(allocs.values()) == 10
    assert allocs == {"s0": 4, "s1": 3, "s2": 3}


def test_waterfill_budget_covers_everything(spark):
    from aggregator_spark.operators.corpus import token_budget_waterfill

    docs = _mass_docs(spark, [5, 9])
    rows = token_budget_waterfill(docs, budget_frac=1.0).collect()
    assert all(r["allocated_tokens"] == r["mass_tokens"] for r in rows)
    assert all(r["rate_micro"] == 1_000_000 for r in rows)
