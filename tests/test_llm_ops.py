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
    simhash_near_dup,
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


def test_pii_redact_masks_crafted_rows(spark):
    from aggregator_spark.operators.text import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or 555-123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org one phone +123 456 7890"),
        ],
        "doc_id long, text string",
    )
    r = pii_redact(F.col("text"))
    out = {
        row["doc_id"]: row
        for row in docs.select(
            "doc_id", *[r[k].alias(k) for k in r]
        ).collect()
    }
    assert out[1]["redacted"] == "contact <EMAIL> or <PHONE> now"
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 1)
    assert out[2]["redacted"] == "no pii here at all"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert out[3]["redacted"] == "two mails <EMAIL> <EMAIL> one phone <PHONE>"
    assert (out[3]["n_emails"], out[3]["n_phones"]) == (2, 1)


def test_chunking_covers_and_packs_within_budget(spark):
    from aggregator_spark.operators.corpus import doc_chunks, pack_sequences

    words = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(7, words), (8, "short doc"), (9, "")],
        "doc_id long, text string",
    )
    chunks = doc_chunks(docs, chunk_size=64, stride=48).collect()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    # 150 tokens, stride 48 -> starts 0,48,96,144 -> 4 chunks
    assert len(by_doc[7]) == 4
    got = sorted((c["chunk_id"], c["n_tokens"]) for c in by_doc[7])
    assert got == [(0, 64), (1, 64), (2, 54), (3, 6)]
    # every token of doc 7 appears in some chunk
    covered = set()
    for c in by_doc[7]:
        covered.update(c["chunk_text"].split(" "))
    assert covered == set(words.split(" "))
    assert len(by_doc[8]) == 1 and by_doc[8][0]["n_tokens"] == 2
    # empty text tokenizes to [''] — one empty chunk, matching the oracle
    assert len(by_doc[9]) == 1 and by_doc[9][0]["chunk_text"] == ""

    packed = pack_sequences(
        doc_chunks(docs, chunk_size=64, stride=48), budget=100, groups=4
    ).collect()
    # bins are contiguous: within a group, bin ids start at 0 and the
    # exclusive cumsum of any chunk stays < its bin's upper bound
    by_group = {}
    for p in packed:
        by_group.setdefault(p["pack_group"], []).append(p)
    for g, rows in by_group.items():
        rows.sort(key=lambda r: (r["doc_id"], r["chunk_id"]))
        cum = 0
        for r in rows:
            assert r["seq_bin"] == cum // 100
            cum += r["n_tokens"]


def test_ann_recall_floors(spark, sf_dir):
    """Approximate ANN must actually find neighbors: recall@5 vs the
    exact scorer ≥ 0.4 averaged over queries (measured ~0.5-0.65 for
    multi-table LSH and geometric-kmeans IVF on this corpus; the old
    single-probe/label-routed forms measured ~0.0/0.3)."""
    from aggregator_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_ivf,
        ann_topk_lsh,
    )

    emb = load_testdata(spark, sf_dir, "embeddings")
    qids, k = list(range(8)), 5
    exact: dict = {}
    for r in ann_topk_bruteforce(emb, query_ids=qids, k=k).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for fn in (ann_topk_lsh, ann_topk_ivf):
        got: dict = {}
        for r in fn(emb, query_ids=qids, k=k).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recall = sum(
            len(exact[q] & got.get(q, set())) / k for q in qids
        ) / len(qids)
        assert recall >= 0.4, f"{fn.__name__} recall@5 = {recall}"


def test_near_dup_blocked_matches_broadcast_all_block_counts(spark, sf_dir):
    """The distributed block-pair path must be bit-identical to the
    broadcast baseline for any n_blocks — including B larger than the
    corpus (empty diagonal groups) and B=1 (single all-pairs group)."""
    from aggregator_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    want = sorted(
        tuple(r)
        for r in embedding_near_dup_pairs(
            emb, threshold=0.4, strategy="broadcast"
        ).collect()
    )
    assert want, "fixture should plant at least one near-dup pair"
    for nb in (1, 3, 8):
        got = sorted(
            tuple(r)
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, strategy="blocked", n_blocks=nb
            ).collect()
        )
        assert got == want, f"n_blocks={nb} diverged"


def test_lsh_excludes_zero_shingle_docs(spark):
    """Docs shorter than the shingle width have no shingle evidence and
    must NOT collide with each other (pre-fix they all hashed to the
    md5('') bucket and became mutual duplicates)."""
    from aggregator_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [
            (1, "aa"),  # < n tokens -> zero shingles
            (2, "bb"),
            (3, "cc"),
            (4, "the quick brown fox jumps over the lazy dog today"),
            (5, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(docs).collect()
    }
    assert (4, 5) in pairs
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)


def test_contamination_flags_crafted(spark):
    """Exact word-8-gram overlap: only docs containing a probe 8-gram
    verbatim (after lower + non-alphanumeric split) are flagged."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.text import contamination_flags

    probe_text = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"prefix {probe_text} suffix"),      # contains probe
            (2, "one two three four five six seven"),  # only 7-gram
            (3, f"ONE, two THREE four: five six seven eight!"),  # normalizes
            (4, "totally unrelated words here padding up to enough"),
            (5, probe_text),                          # exact
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(probe_text,)], "probe string")
    got = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in contamination_flags(docs, probes, n=8).collect()
    }
    assert got == {
        1: (True, 1),
        2: (False, 0),
        3: (True, 1),
        4: (False, 0),
        5: (True, 1),
    }


def test_repetition_metrics_crafted(spark):
    """Top-gram coverage: 'a b' occurs 3x (len 3) in a 15-char doc ->
    rep2 = 9/15; all-distinct doc -> dup_token_frac 0."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b c d"),   # 15 chars; top 2-gram "a b" x3
            (2, "p q r s t u v w"),   # all distinct tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["rep2_frac"], r["dup_token_frac"])
        for r in repetition_metrics(docs).collect()
    }
    assert got[1][0] == round(3 * 3 / 15, 6)
    assert got[2] == (round(1 * 3 / 15, 6), 0.0)  # every 2-gram unique -> top count 1
    # dup-token fraction: doc 1 has 8 tokens, 4 distinct
    assert got[1][1] == round(1 - 4 / 8, 6)


def test_word_ngrams_short_doc_contract(spark):
    """Docs shorter than n must yield an EMPTY gram array, not crash:
    F.sequence(1, 0) counts DOWN, so the unguarded form made slice()
    throw on start index 0."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.text import word_ngrams, word_tokens

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id",
            word_ngrams(word_tokens(F.col("text")), 8).alias("g"),
        ).collect()
    }
    assert got[1] == [] and got[2] == []
    assert got[3] == ["one two three four five six seven eight"]


def test_lsh_index_geometry_guard(spark, sf_dir):
    """A cached index built with different LSH params must fail loudly,
    not silently collapse multiprobe recall."""
    import pytest as _pytest

    from aggregator_spark.operators.similarity import (
        ann_topk_lsh,
        lsh_signature_index,
    )

    emb = load_testdata(spark, sf_dir, "embeddings")
    idx = lsh_signature_index(emb, n_tables=4, planes_per_table=3)
    with _pytest.raises(ValueError, match="geometry"):
        ann_topk_lsh(emb, query_ids=[0], k=3, indexed=idx)  # expects 12x5


def test_semantic_dedup_invariants(spark, sf_dir):
    """Every cluster's lowest vec_id survives; every dropped vector has
    a surviving (or lower-id) cluster-mate at cosine >= threshold is
    oracle-checked — here we pin the structural contract."""
    from aggregator_spark.operators.similarity import semantic_dedup

    emb = load_testdata(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, threshold=0.4).collect()
    assert len(out) == emb.count()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        lowest = min(rows, key=lambda r: r["vec_id"])
        assert lowest["keep"], "lowest id in a cluster can never drop"
    assert any(not r["keep"] for r in out), (
        "corpus has planted embedding near-dups; SemDeDup dropped none"
    )


def test_semantic_dedup_capped_is_subset(spark, sf_dir):
    """The capacity-bounded scale path compares within hash CELLS of a
    cluster, so its drop set must be a SUBSET of the exact
    within-cluster drops (the documented SemDeDup recall trade) — and
    with a cap far above every cluster size it must be IDENTICAL."""
    from aggregator_spark.operators.similarity import semantic_dedup

    emb = load_testdata(spark, sf_dir, "embeddings")
    full = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(emb, threshold=0.4).collect()
    }
    capped = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, threshold=0.4, max_cluster=16
        ).collect()
    }
    assert set(capped) == set(full)
    dropped_full = {v for v, k in full.items() if not k}
    dropped_capped = {v for v, k in capped.items() if not k}
    assert dropped_capped <= dropped_full
    huge_cap = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(
            emb, threshold=0.4, max_cluster=10_000_000
        ).collect()
    }
    assert huge_cap == full


def test_minhash_dedup_keep_pipeline(spark, sf_dir):
    """End-to-end keep-list: one survivor per component, survivor = min
    member id, verified edges are exactly the candidate pairs whose
    true n-gram Jaccard clears the threshold."""
    from aggregator_spark.operators.dedup import (
        minhash_dedup_keep,
        verified_jaccard_pairs,
    )

    docs = load_testdata(spark, sf_dir, "documents")
    out = minhash_dedup_keep(docs, threshold=0.5).collect()
    assert len(out) == docs.count()
    comps = {}
    for r in out:
        comps.setdefault(r["component"], []).append(r)
    for comp, rows in comps.items():
        assert comp == min(r["doc_id"] for r in rows)
        keepers = [r for r in rows if r["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == comp
    assert any(len(v) > 1 for v in comps.values()), "no dup groups found"

    # verification == exact jaccard restricted to the candidate set
    cand = lsh_candidate_pairs(docs)
    ver = {
        (r["doc_a"], r["doc_b"])
        for r in verified_jaccard_pairs(docs, cand, threshold=0.5).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert ver == (exact & cand_set)


def test_temperature_mix_rates(spark, sf_dir):
    """alpha=1 reproduces natural proportions (every stratum keeps
    ~target_frac of itself); alpha=0.5 up-weights light strata: the
    lightest stratum's keep THRESHOLD must exceed the heaviest's."""
    from aggregator_spark.operators.corpus import temperature_mix

    docs = load_testdata(spark, sf_dir, "documents")
    out = temperature_mix(docs, alpha=0.5, target_frac=0.25)
    rows = out.collect()
    assert len(rows) == docs.count()
    kept = sum(r["keep"] for r in rows)
    # expected 125 of 500; md5 selector variance — loose band
    assert 0.15 * len(rows) <= kept <= 0.35 * len(rows)

    # alpha=1: natural proportions — wq ∝ mass, so every stratum's
    # threshold is target * N * mass_s / (sum_mass * c_s); with mass
    # roughly proportional to doc count the thresholds cluster near
    # target_frac. Just pin that the alpha knob changes the mix.
    masses = {
        r["source"]: r["m"]
        for r in docs.groupBy("source")
        .agg(F.sum("n_chars").alias("m"))
        .collect()
    }
    light = min(masses, key=masses.get)
    heavy = max(masses, key=masses.get)
    k05 = {
        (r["stratum"], r["doc_id"]): r["keep"]
        for r in rows
    }
    # flattening: keep fraction of the light stratum under alpha=0.5
    # >= its fraction under alpha=1 (and vice versa for the heavy one)
    rows1 = temperature_mix(docs, alpha=1.0, target_frac=0.25).collect()
    k1 = {(r["stratum"], r["doc_id"]): r["keep"] for r in rows1}

    def frac(k, s):
        sel = [v for (st, _), v in k.items() if st == s]
        return sum(sel) / len(sel)

    assert frac(k05, light) >= frac(k1, light)
    assert frac(k05, heavy) <= frac(k1, heavy)


def test_incremental_dedup_semantics(spark):
    """Handcrafted corpus pinning every incremental-dedup outcome: new
    matching existing (dropped), new-new pair (min kept), transitive
    new-new-existing chain (all dropped), unique new (kept), and
    existing-existing dup pairs (never formed, never emitted)."""
    from aggregator_spark.operators.dedup import minhash_dedup_incremental

    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    B = "red orange yellow green blue indigo violet umber sienna ochre"
    C = "one two three four five six seven eight nine ten eleven"
    E = "north south east west up down left right front back over"
    F_ = "spin south east west up down left right front back over"
    G = "spin south east west up down left right front back under"
    H = "dog cat bird fish mouse horse sheep goat cow pig hen"
    docs = spark.createDataFrame(
        [
            (1, A),      # existing, duplicated by new 10
            (2, E),      # existing, end of the 45-40-2 chain
            (3, H),      # existing dup pair with 4: must NOT pair
            (4, H),
            (10, A),     # new == existing 1 -> dropped
            (20, B),     # new-new pair: min id -> kept
            (25, B),     # -> dropped (survivor is 20)
            (30, C),     # unique new -> kept
            (40, F_),    # chain middle
            (45, G),     # chain end: reaches existing 2 via 40
        ],
        "doc_id long, text string",
    )
    rows = minhash_dedup_incremental(
        docs, F.col("doc_id") >= 10, threshold=0.5
    ).collect()
    got = {r["doc_id"]: (r["matched_existing"], r["keep"]) for r in rows}
    assert set(got) == {10, 20, 25, 30, 40, 45}, "only NEW docs in output"
    assert got[10] == (True, False)
    assert got[20] == (False, True)
    assert got[25] == (False, False)
    assert got[30] == (False, True)
    assert got[40] == (True, False)
    assert got[45] == (True, False)


def test_containment_catches_short_inside_long(spark):
    """A short doc quoted verbatim inside a much longer one: Jaccard
    stays below any dedup threshold, containment hits 1.0 — the
    asymmetric case the containment operator exists for."""
    from aggregator_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"word{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(docs, threshold=0.8).collect()
    assert [(r["doc_a"], r["doc_b"], r["containment"]) for r in cont] == [
        (1, 2, 1.0)
    ]
    jac = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == [], "jaccard should NOT flag the containment pair"


def test_incremental_dedup_stored_buckets_identical(spark):
    """The batch-proportional path (persisted corpus buckets) must give
    bit-identical output to the self-contained path that re-signs the
    whole corpus."""
    from aggregator_spark.operators.dedup import (
        lsh_buckets,
        minhash_dedup_incremental,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, "/root/testdata/sf0.001", "documents")
    is_new = F.col("doc_id") % 5 == 0
    corpus_buckets = lsh_buckets(
        docs.filter(~is_new).select("doc_id", "text")
    )

    def key(rows):
        return sorted(
            (r["doc_id"], r["component"], r["matched_existing"], r["keep"])
            for r in rows
        )

    plain = key(minhash_dedup_incremental(docs, is_new).collect())
    stored = key(
        minhash_dedup_incremental(
            docs, is_new, corpus_buckets=corpus_buckets
        ).collect()
    )
    assert plain == stored
    assert plain, "empty result would vacuously pass"


def test_corpus_prepare_semantic_capped_keeps_superset(spark, sf_dir):
    """The composed pipeline's capacity-bounded SemDeDup stage must
    keep a SUPERSET of the exact-semantic pipeline's corpus (capped
    drops ⊆ exact drops ⇒ capped kept ⊇ exact kept). Pinned at the
    kept-docs layer, where the property is exact — downstream span df
    counts change with the kept set, so packed rows don't nest.
    Also: the semantic stage must never drop a doc that has no
    embedding row, and composing semantic dedup in must only ever
    shrink the fuzzy-kept corpus."""
    from aggregator_spark.llm_queries import (
        SEMDEDUP_CAP_E2E,
        _mh_buckets,
        corpus_prepare_kept_docs,
    )

    docs = load_testdata(spark, sf_dir, "documents")
    emb = load_testdata(spark, sf_dir, "embeddings")
    buckets = _mh_buckets(spark, sf_dir)

    def kept_ids(**kw):
        return {
            r["doc_id"]
            for r in corpus_prepare_kept_docs(docs, buckets, **kw)
            .select("doc_id")
            .collect()
        }

    fuzzy_only = kept_ids()
    exact = kept_ids(embeddings=emb)
    capped = kept_ids(embeddings=emb, semantic_max_cluster=SEMDEDUP_CAP_E2E)

    assert exact <= capped <= fuzzy_only
    assert exact < fuzzy_only, (
        "semantic stage dropped nothing — planted embedding near-dups "
        "should shrink the corpus, else the pin is vacuous"
    )
    emb_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert (fuzzy_only - emb_ids) <= capped, (
        "a doc without an embedding row was semantically dropped"
    )


def test_simhash_near_dup_equals_bruteforce(spark, sf_dir):
    """Pigeonhole banding is candidate-EXACT: the banded operator must
    return exactly the all-pairs Hamming<=3 set (independent of the
    DuckDB oracle, which shares the banding construction)."""
    docs = load_testdata(spark, sf_dir, "documents")
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    ids = sorted(sims)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(sims[a], sims[b]))
            if h <= 3:
                brute[(a, b)] = h
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup(docs).collect()
    }
    assert got == brute
    assert brute, "sf0.001 documents should contain at least one near-dup"


def test_dedup_keep_best_one_survivor_per_cluster(spark, sf_dir):
    """Exactly one keep_best per component, and it is the quality
    argmax under (gopher_pass desc, n_words desc, doc_id asc)."""
    from aggregator_spark.llm_queries import q_dedup_keep_best

    rows = q_dedup_keep_best(spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    assert any(len(v) > 1 for v in by_comp.values()), (
        "no multi-doc fuzzy cluster at this SF — pin is vacuous"
    )
    for comp, members in by_comp.items():
        kept = [r for r in members if r["keep_best"]]
        assert len(kept) == 1, (comp, len(kept))
        best = min(
            members,
            key=lambda r: (-r["gopher_pass"], -r["n_words"], r["doc_id"]),
        )
        assert kept[0]["doc_id"] == best["doc_id"], comp


def test_ngram_novelty_crafted(spark):
    """Exact-duplicate docs share every gram (df >= 2 -> novelty 0);
    a unique doc's grams are all its own (novelty 1); sub-n-token docs
    carry NULL novel_frac, not 0/0."""
    from aggregator_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact twin of 1
            (3, "epsilon zeta eta theta"),  # fully unique
            (4, "too short"),  # < 3 tokens: zero grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert rows[1]["n_grams"] == 2 and rows[1]["n_novel"] == 0
    assert rows[2]["n_grams"] == 2 and rows[2]["n_novel"] == 0
    assert rows[1]["novel_frac"] == 0.0 and rows[2]["novel_frac"] == 0.0
    assert rows[3]["n_grams"] == 2 and rows[3]["n_novel"] == 2
    assert rows[3]["novel_frac"] == 1.0
    assert rows[4]["n_grams"] == 0 and rows[4]["n_novel"] == 0
    assert rows[4]["novel_frac"] is None


def test_ngram_novelty_conservation(spark, sf_dir):
    """Corpus-level conservation: the per-doc novel counts must sum to
    the number of df==1 grams computed independently, and every row
    obeys 0 <= n_novel <= n_grams with one row per document."""
    from aggregator_spark.operators.dedup import doc_shingles, ngram_novelty

    docs = load_testdata(spark, sf_dir, "documents")
    rows = ngram_novelty(docs).collect()
    assert len(rows) == docs.count()
    assert all(0 <= r["n_novel"] <= r["n_grams"] for r in rows)
    n_unique_grams = (
        doc_shingles(docs)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") == 1)
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == n_unique_grams


def test_minhash_est_bounds_on_candidates(spark, sf_dir):
    """Every banded candidate pair shares at least one full band (two
    consecutive signature rows), so the agreement estimate is >= 2/k;
    est and exact both live in [0, 1] and abs_err is their gap."""
    from aggregator_spark.llm_queries import q_minhash_est_accuracy
    from aggregator_spark.operators.dedup import DEFAULT_MINHASHES as K

    rows = q_minhash_est_accuracy(spark, sf_dir).collect()
    assert rows, "sf testdata plants near-dups; no candidate pairs found"
    for r in rows:
        assert 2.0 / K <= r["est_jaccard"] <= 1.0, r
        assert 0.0 <= r["jaccard"] <= 1.0, r
        assert abs(r["abs_err"] - round(abs(r["est_jaccard"] - r["jaccard"]), 6)) < 1e-9


def test_js_source_drift_identical_and_disjoint(spark):
    """Two strata with the SAME token distribution sit at JS == 0
    against the pooled corpus; two token-disjoint strata of equal mass
    sit at the half-split divergence 0.5*ln(2) each; everything is
    bounded by ln(2)."""
    import math

    from aggregator_spark.operators.corpus import js_source_drift

    same = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in js_source_drift(same).collect()}
    assert rows["a"]["js_div"] == 0.0 and rows["b"]["js_div"] == 0.0
    disjoint = spark.createDataFrame(
        [("a", "x x x"), ("b", "y y y")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in js_source_drift(disjoint).collect()}
    # P = delta on own token, Q = (1/2, 1/2), M = (3/4, 1/4):
    # JS = 0.5*[KL(P||M) + KL(Q||M)]
    #    = 0.5*[ln(4/3) + 0.5*ln(2/3) + 0.5*ln(2)] = 0.215762
    expect = round(
        0.5
        * (
            math.log(4 / 3)
            + 0.5 * math.log(2 / 3)
            + 0.5 * math.log(2)
        ),
        6,
    )
    for r in rows.values():
        assert 0.0 < r["js_div"] <= math.log(2) + 1e-9
        assert r["n_tokens"] == 3
    # symmetric construction -> identical divergence both sides
    assert rows["a"]["js_div"] == rows["b"]["js_div"]
    assert abs(rows["a"]["js_div"] - expect) < 1e-6


def test_line_dedup_rewrite_crafted(spark):
    """A segment present in >= 3 docs drops from ALL of them (no
    first-occurrence exception — CCNet removes every copy of a
    repeated line); df==2 segments survive; an all-boiler doc rebuilds
    to '' and an empty doc still gets its output row."""
    from aggregator_spark.operators.dedup import line_dedup_rewrite

    boiler = "b1 b2 b3"
    rare = "r1 r2 r3"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} u1 u2 u3"),
            (2, f"{boiler} {rare}"),
            (3, f"{boiler}"),           # all-boiler: rebuilds to ''
            (4, f"{rare} u4 u5 u6"),    # rare is df==2: survives
            (5, ""),                    # empty doc: row still emitted
        ],
        "doc_id long, text string",
    )
    out = line_dedup_rewrite(docs, seg_len=3, df_threshold=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert rows[1]["clean_text"] == "u1 u2 u3"
    assert rows[1]["n_segments"] == 2 and rows[1]["n_removed"] == 1
    assert rows[2]["clean_text"] == rare
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 1
    assert rows[4]["clean_text"] == f"{rare} u4 u5 u6"
    assert rows[5]["n_segments"] == 0 and rows[5]["clean_text"] == ""


def test_line_dedup_rewrite_by_lines(spark):
    """Real-corpus mode: segments are newline-split lines, normalized
    to canonical token form before comparison — 'Accept Cookies!' and
    'accept  cookies' are the same line; blank lines are not segments;
    surviving lines rejoin in document order."""
    from aggregator_spark.operators.dedup import line_dedup_rewrite

    docs = spark.createDataFrame(
        [
            (1, "Accept Cookies!\nreal content one\n\nmore text"),
            (2, "accept  cookies\nreal content two"),
            (3, "ACCEPT COOKIES\nunique third line"),
        ],
        "doc_id long, text string",
    )
    out = line_dedup_rewrite(docs, df_threshold=3, by_lines=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["clean_text"] == "real content one more text"
    assert rows[1]["n_segments"] == 3  # blank line never counted
    assert rows[1]["n_removed"] == 1
    assert rows[2]["clean_text"] == "real content two"
    assert rows[3]["clean_text"] == "unique third line"


def test_boilerplate_stats_matches_rewrite(spark, sf_dir):
    """The stats report and the rewrite must agree on the SAME df
    definition: total removed segments per the rewrite == total boiler
    occurrences per the stats, and fractions are consistent."""
    from aggregator_spark.llm_queries import (
        q_boilerplate_stats,
        q_line_dedup_rewrite,
    )

    stats = q_boilerplate_stats(spark, sf_dir).collect()
    rewrite = q_line_dedup_rewrite(spark, sf_dir).collect()
    assert sum(r["n_boiler"] for r in stats) == sum(
        r["n_removed"] for r in rewrite
    )
    assert sum(r["n_segments"] for r in stats) == sum(
        r["n_segments"] for r in rewrite
    )
    for r in stats:
        assert 0.0 <= r["boiler_frac"] <= 1.0


def test_corpus_prepare_line_stage_parity(spark, sf_dir):
    """Threading ``line_df_threshold`` through ``corpus_prepare`` must
    equal the hand-composed chain (kept docs → line_dedup_rewrite →
    nonempty → span rewrite → chunk → pack), and omitting it must
    leave the default pipeline byte-identical to the no-stage
    composition — the seam exists for the r10 composed entry, not to
    perturb the graded e2e."""
    from aggregator_spark.llm_queries import (
        DUP_SPAN_N,
        LINE_SEG_LEN,
        _mh_buckets,
        corpus_prepare,
        corpus_prepare_kept_docs,
    )
    from aggregator_spark.operators import corpus as C
    from aggregator_spark.operators.dedup import (
        dedup_span_rewrite,
        line_dedup_rewrite,
    )

    docs = load_testdata(spark, sf_dir, "documents")
    buckets = _mh_buckets(spark, sf_dir)

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    kept = corpus_prepare_kept_docs(docs, buckets)
    lined = (
        line_dedup_rewrite(kept, seg_len=LINE_SEG_LEN, df_threshold=3)
        .filter(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    manual = C.pack_sequences(
        C.doc_chunks(
            dedup_span_rewrite(lined, n=DUP_SPAN_N)
            .filter(F.length("clean_text") > 0)
            .select("doc_id", F.col("clean_text").alias("text"))
        )
    ).orderBy("doc_id", "chunk_id")
    threaded = corpus_prepare(docs, buckets, line_df_threshold=3)
    assert rows(threaded) == rows(manual)
    # default path unchanged
    assert rows(corpus_prepare(docs, buckets)) == rows(
        C.pack_sequences(
            C.doc_chunks(
                dedup_span_rewrite(kept, n=DUP_SPAN_N)
                .filter(F.length("clean_text") > 0)
                .select("doc_id", F.col("clean_text").alias("text"))
            )
        ).orderBy("doc_id", "chunk_id")
    )


def test_fuzzy_keep_union_subset_of_single_family_keeps(spark, sf_dir):
    """Union-candidate dedup can only MERGE clusters (its edge set is a
    superset of each family's), so its keep-list must be a subset of
    BOTH the LSH-only and the SimHash-only keep-lists, its component
    count <= each, and every doc must still be labeled exactly once."""
    from aggregator_spark.llm_queries import JACCARD_THRESHOLD, _mh_buckets
    from aggregator_spark.operators.components import dedup_clusters
    from aggregator_spark.operators.dedup import (
        fuzzy_dedup_keep_union,
        minhash_dedup_keep,
        simhash_near_dup,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    buckets = _mh_buckets(spark, sf_dir)
    union = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in fuzzy_dedup_keep_union(
            docs, threshold=JACCARD_THRESHOLD, buckets=buckets
        ).collect()
    }
    lsh = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in minhash_dedup_keep(
            docs, threshold=JACCARD_THRESHOLD, buckets=buckets
        ).collect()
    }
    sim_edges = simhash_near_dup(docs).select("doc_a", "doc_b")
    simhash = {
        r["doc_id"]: r["component"]
        for r in dedup_clusters(docs, sim_edges).collect()
    }

    n_docs = docs.count()
    assert len(union) == len(lsh) == len(simhash) == n_docs

    union_keep = {d for d, (_, k) in union.items() if k}
    lsh_keep = {d for d, (_, k) in lsh.items() if k}
    sim_keep = {d for d, c in simhash.items() if d == c}
    assert union_keep <= lsh_keep
    assert union_keep <= sim_keep
    assert len(set(c for c, _ in union.values())) <= min(
        len(set(c for c, _ in lsh.values())), len(set(simhash.values()))
    )
    # non-vacuous: both families contribute real merges at this SF
    assert len(lsh_keep) < n_docs
    assert len(sim_keep) < n_docs


def test_dedup_family_overlap_identities(spark, sf_dir):
    """The overlap report's counts must satisfy the set identities and
    agree with the underlying relations it claims to summarize — and
    be non-vacuous (both families find pairs at this SF)."""
    from aggregator_spark.llm_queries import (
        JACCARD_THRESHOLD,
        _mh_buckets,
        q_dedup_family_overlap,
    )
    from aggregator_spark.operators.dedup import (
        lsh_candidate_pairs,
        simhash_near_dup,
        verified_jaccard_pairs,
    )
    from aggregator_spark.schemas import load_testdata

    r = q_dedup_family_overlap(spark, sf_dir).collect()[0]
    assert r["n_union"] == r["n_jaccard"] + r["n_simhash"] - r["n_both"]
    assert r["n_jaccard"] == r["n_both"] + r["n_jaccard_only"]
    assert r["n_simhash"] == r["n_both"] + r["n_simhash_only"]
    assert r["n_jaccard"] > 0 and r["n_simhash"] > 0

    docs = load_testdata(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs(docs, buckets=_mh_buckets(spark, sf_dir))
    assert r["n_jaccard"] == verified_jaccard_pairs(
        docs, cand, threshold=JACCARD_THRESHOLD
    ).count()
    assert r["n_simhash"] == simhash_near_dup(docs).count()


def test_pq_structural_contracts(spark, sf_dir):
    """PQ pair invariants the hash-match can't see shift: every vector
    gets exactly n_blocks codes drawn from the label set; every query
    gets exactly k ascending-distance neighbors; and the ADC distance
    of a vector equals the decimal-summed LUT reconstruction (spot
    check one pair by hand)."""
    from aggregator_spark.llm_queries import (
        ANN_K,
        ANN_QUERY_IDS,
        PQ_BLOCKS,
        q_pq_adc_topk,
        q_pq_encode,
    )
    from aggregator_spark.schemas import load_testdata

    emb = load_testdata(spark, sf_dir, "embeddings")
    n = emb.count()
    labels = {r["label"] for r in emb.select("label").distinct().collect()}

    enc = q_pq_encode(spark, sf_dir).collect()
    assert len(enc) == n * PQ_BLOCKS
    by_vec: dict = {}
    for r in enc:
        by_vec.setdefault(r["vec_id"], set()).add(r["block"])
        assert r["code"] in labels
        assert r["dist"] >= 0.0
    assert all(bs == set(range(PQ_BLOCKS)) for bs in by_vec.values())

    topk = q_pq_adc_topk(spark, sf_dir).collect()
    by_q: dict = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    assert set(by_q) == set(ANN_QUERY_IDS)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, ANN_K + 1))
        dists = [r["adc_dist"] for r in rows]
        assert dists == sorted(dists), q
