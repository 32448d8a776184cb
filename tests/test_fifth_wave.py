"""Round-10 fifth wave semantic pins (analytics_queries11):

- perplexity_gate equals the plain per-language NTILE(3) window built
  here from scratch (non-tautological expected values);
- priority_sample equals a driver-side exact-integer brute force of
  Duffield/Lund/Thorup priorities (set, order, threshold estimator);
- dedup_bloom_ingest equals the plain exact anti-join AND genuinely
  exercises both bloom paths (maybe and definite-miss), with the
  no-false-negative contract checked on real data;
- membership_col agrees with bloom_probe (the refactor-parity pin).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from aggregator_spark.analytics_queries11 import (
    INGEST_BLOOM_K,
    INGEST_BLOOM_M,
    PRIORITY_SAMPLE_K,
    _U32,
    q_dedup_bloom_ingest,
    q_perplexity_gate,
    q_priority_sample,
)
from aggregator_spark.schemas import load_testdata

SF = "/root/testdata/sf0.001"


def test_perplexity_gate_matches_plain_window(spark, sf_dir):
    from aggregator_spark.operators.corpus import bigram_logprob

    docs = load_testdata(spark, sf_dir, "documents")
    nll = bigram_logprob(docs).join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.col("nll").asc(), "doc_id")
    t = F.ntile(3).over(w)
    plain = {
        r["doc_id"]: tuple(r)
        for r in nll.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "nll",
            F.when(t == 1, "head")
            .when(t == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            (t <= 2).alias("keep"),
        ).collect()
    }
    got = {
        r["doc_id"]: tuple(r)
        for r in q_perplexity_gate(spark, sf_dir).collect()
    }
    assert got == plain
    # the gate really splits: all three buckets occupied, keep = ~2/3
    buckets = {v[4] for v in got.values()}
    assert buckets == {"head", "middle", "tail"}
    kept = sum(1 for v in got.values() if v[5])
    assert abs(kept / len(got) - 2 / 3) < 0.05, (kept, len(got))


def test_perplexity_gate_head_is_lower_nll(spark, sf_dir):
    """Within a language every head nll <= every tail nll — the gate
    keeps the FLUENT side (the CCNet orientation), not the other."""
    rows = q_perplexity_gate(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["nll"]
        )
    for lang, b in by_lang.items():
        if "head" in b and "tail" in b:
            assert max(b["head"]) <= min(b["tail"]), lang


def test_priority_sample_matches_exact_brute_force(spark, sf_dir):
    import hashlib

    docs = load_testdata(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rows = docs.collect()
    pri = []
    for r in rows:
        h = int(
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16
        )
        q = (int(r["n_chars"]) * _U32) // (h + 1)
        pri.append((q, r["doc_id"], r["source"], int(r["n_chars"])))
    pri.sort(key=lambda t: (-t[0], t[1]))
    k = PRIORITY_SAMPLE_K
    tau = pri[k][0] if len(pri) > k else 0
    expected = {
        d: (s, w, q, rk + 1, max(w, tau))
        for rk, (q, d, s, w) in enumerate(pri[:k])
    }
    got = {
        r["doc_id"]: (
            r["source"],
            r["weight"],
            r["priority"],
            r["rk"],
            r["est_weight"],
        )
        for r in q_priority_sample(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == min(k, len(pri))


def test_dedup_bloom_ingest_equals_plain_anti_join(spark, sf_dir):
    from aggregator_spark.analytics_queries11 import _prefix_fp
    from aggregator_spark.llm_queries import NEW_BATCH_MOD

    docs = load_testdata(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
        .select(_prefix_fp(F.col("text")).alias("fp"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0).select(
        "doc_id", _prefix_fp(F.col("text")).alias("fp")
    )
    dup_ids = {
        r["doc_id"]
        for r in batch.join(corpus, "fp", "left_semi").collect()
    }
    expected = {
        r["doc_id"]: r["doc_id"] not in dup_ids for r in batch.collect()
    }
    got = {
        r["doc_id"]: r["is_new"]
        for r in q_dedup_bloom_ingest(spark, sf_dir).collect()
    }
    assert got == expected
    assert not all(got.values()), "no duplicate in the batch — fixture dead"


def test_bloom_paths_both_exercised_and_no_false_negatives(spark, sf_dir):
    """The definite-miss fast path must carry real traffic (else the
    entry silently degenerates to the plain join) and every true dup
    must be bloom-positive (false negatives are impossible)."""
    from aggregator_spark.analytics_queries11 import _prefix_fp
    from aggregator_spark.llm_queries import NEW_BATCH_MOD
    from aggregator_spark.operators.runtime_filter import (
        build_bloom_words,
        membership_col,
    )

    docs = load_testdata(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
        .select(_prefix_fp(F.col("text")).alias("fp"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0).select(
        "doc_id", _prefix_fp(F.col("text")).alias("fp")
    )
    words = build_bloom_words(
        corpus, "fp", m_bits=INGEST_BLOOM_M, k_hashes=INGEST_BLOOM_K
    )
    marked = batch.withColumn(
        "maybe",
        membership_col(
            F.col("fp"), words, m_bits=INGEST_BLOOM_M,
            k_hashes=INGEST_BLOOM_K,
        ),
    ).collect()
    maybe = {r["doc_id"] for r in marked if r["maybe"]}
    miss = {r["doc_id"] for r in marked if not r["maybe"]}
    assert maybe and miss, (len(maybe), len(miss))
    dup_ids = {
        r["doc_id"]
        for r in batch.join(corpus, "fp", "left_semi").collect()
    }
    assert dup_ids <= maybe, "bloom false negative — impossible by design"


def test_membership_col_agrees_with_bloom_probe(spark):
    """bloom_probe was refactored alongside membership_col — the
    filter form and the column form must pick the same rows."""
    from aggregator_spark.operators.runtime_filter import (
        bloom_probe,
        build_bloom_words,
        membership_col,
    )

    keys = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    dim = spark.range(0, 100, 3).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    words = build_bloom_words(dim, "k", m_bits=4096, k_hashes=3)
    via_probe = {
        r["k"] for r in bloom_probe(keys, "k", words, 4096, 3).collect()
    }
    via_col = {
        r["k"]
        for r in keys.filter(
            membership_col(F.col("k"), words, 4096, 3)
        ).collect()
    }
    assert via_probe == via_col
    assert {f"k{i}" for i in range(0, 100, 3)} <= via_col


def test_corpus_prepare_ppl_e2e_respects_the_gate(spark, sf_dir):
    """Sixth wave: every doc in the perplexity-gated pipeline's output
    passed the gate, and the gate genuinely bites (some base-pipeline
    docs are absent) — the composition is the gate, not a no-op."""
    from aggregator_spark.llm_queries import (
        q_corpus_prepare_e2e,
        q_corpus_prepare_ppl_e2e,
    )

    kept = {
        r["doc_id"]
        for r in q_perplexity_gate(spark, sf_dir)
        .filter("keep")
        .select("doc_id")
        .collect()
    }
    out_docs = {
        r["doc_id"]
        for r in q_corpus_prepare_ppl_e2e(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert out_docs <= kept
    base_docs = {
        r["doc_id"]
        for r in q_corpus_prepare_e2e(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert base_docs - kept, "perplexity gate never disagreed with base"


def test_priority_sample_per_source_matches_brute_force(spark, sf_dir):
    import hashlib

    from aggregator_spark.analytics_queries11 import (
        PRIORITY_PER_SOURCE_K,
        q_priority_sample_per_source,
    )

    rows = (
        load_testdata(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in rows:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        q = (int(r["n_chars"]) * _U32) // (h + 1)
        by_src.setdefault(r["source"], []).append(
            (q, r["doc_id"], int(r["n_chars"]))
        )
    k = PRIORITY_PER_SOURCE_K
    expected = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tau = items[k][0] if len(items) > k else 0
        for rk, (q, d, w) in enumerate(items[:k]):
            expected[d] = (src, w, q, rk + 1, max(w, tau))
    got = {
        r["doc_id"]: (
            r["source"], r["weight"], r["priority"], r["rk"],
            r["est_weight"],
        )
        for r in q_priority_sample_per_source(spark, sf_dir).collect()
    }
    assert got == expected
    # every source is represented (stratified, not global)
    assert {v[0] for v in got.values()} == set(by_src)


def test_lang_id_confusion_is_a_proper_confusion_matrix(spark, sf_dir):
    from aggregator_spark.analytics_queries11 import q_lang_id_confusion

    rows = q_lang_id_confusion(spark, sf_dir).collect()
    n_docs = load_testdata(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_lang: dict[str, float] = {}
    for r in rows:
        assert r["is_match"] == (r["lang"] == r["lang_pred"])
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["share"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)
    # the detector is non-trivial on this corpus: some mass on the
    # diagonal and at least one off-diagonal cell (else the report is
    # a tautology of the gold column)
    assert any(r["is_match"] for r in rows)
    assert any(not r["is_match"] for r in rows)


def test_length_percentiles_exact_matches_python_replay(spark, sf_dir):
    """Eighth wave: the bounded-rank PERCENTILE_DISC report equals a
    pure-Python replay (sort per source, value at ceil(k*n/100))."""
    from aggregator_spark.analytics_queries11 import (
        LENGTH_PCTS,
        q_length_percentiles_exact,
    )

    rows = (
        load_testdata(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(int(r["n_chars"]))
    expected = {}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        expected[src] = (n,) + tuple(
            vals[(k * n + 99) // 100 - 1] for k in LENGTH_PCTS
        )
    got = {
        r["source"]: (r["n_docs"],)
        + tuple(r[f"p{k}"] for k in LENGTH_PCTS)
        for r in q_length_percentiles_exact(spark, sf_dir).collect()
    }
    assert got == expected
    # the report is non-degenerate: percentiles differ somewhere
    assert any(v[1] != v[3] for v in got.values())


def test_membership_via_join_agrees_with_literal(spark):
    """The large-m join-probe strategy must pick exactly the literal
    path's verdicts on the same bitset (SCALE.md: the literal's py4j
    transfer is the sf100 killer; the join path is the scale form)."""
    from aggregator_spark.operators.runtime_filter import (
        bloom_words_relation,
        build_bloom_words,
        membership_col,
        membership_via_join,
    )

    keys = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    dim = spark.range(0, 600, 3).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    rel = bloom_words_relation(dim, "k", 8192, 3)
    words = build_bloom_words(dim, "k", 8192, 3)
    via_join = {
        r["k"]: r["maybe"]
        for r in membership_via_join(keys, "k", rel, 8192, 3).collect()
    }
    via_lit = {
        r["k"]: bool(r["m"])
        for r in keys.withColumn(
            "m", membership_col(F.col("k"), words, 8192, 3)
        ).collect()
    }
    assert via_join == via_lit
    # row multiplicity preserved and members all present
    assert len(via_join) == 2000
    assert all(via_join[f"k{i}"] for i in range(0, 600, 3))
