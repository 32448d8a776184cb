"""Round-10 fifth wave: production curation paths the catalog lacked.

- ``perplexity_gate`` — the CCNet head/middle/tail LM-perplexity split
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  from Web Crawl Data"): per-language thirds of the corpus by bigram-LM
  negative log-likelihood, gated on the bounded-rank NTILE so no
  language ever lands its whole membership on one task.
- ``priority_sample`` — Duffield/Lund/Thorup priority sampling: the
  estimation-optimal weighted sample without replacement, with EXACT
  integer priorities (no transcendentals cross-engine) and the
  (k+1)-th-priority threshold estimator.
- ``dedup_bloom_ingest`` — exact lede-fingerprint ingest dedup where
  the new batch probes a bloom filter of the existing corpus
  fingerprints first: bloom-misses are definitively new (no join at
  all), only the maybe-dup sliver pays the exact verify join. The
  composed verdict is EXACT (bloom false positives removed by the
  join), so the oracle is the plain anti-join.

Reference parity note: the reference (cybergreen-net/aggregator
main.py) has no corpus-curation surface; these are beyond-reference
operators on the driver's ``documents`` table, following SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.testdata_queries import load_testdata

# CCNet splits each language's corpus into thirds by LM perplexity:
# head (best), middle, tail (usually discarded). Thirds = NTILE(3) over
# nll ASC with doc_id tiebreak (a total order, so cross-engine stable).
PPL_TILES = 3
PPL_BUCKET_NAMES = {1: "head", 2: "middle", 3: "tail"}
# two-level-carry quantizer for the bounded rank: nll is a continuous
# score (round-6 doubles, near-unique), exactly the tie-density regime
# where the single-level carry degenerates (rankdist module docstring)
PPL_COARSE = 64

# priority sampling: k kept items + the (k+1)-th priority as threshold
PRIORITY_SAMPLE_K = 200
_U32 = 4294967296  # 2^32 — the hash-to-uniform denominator

# ingest-dedup bloom: m is sized from the corpus-fingerprint
# cardinality at ≥16 bits/key (fill ≈ 17%, FP ≈ 0.5% at k=3), floored
# at 2^16 — at the driver SFs (≤4k corpus fingerprints) the floor
# rules, so both driver runs see the same m. In production the
# survivor index knows its own cardinality as metadata; here the
# sizing count is one cheap aggregate over the fingerprint relation.
# The bitset stays m/8 bytes however large the corpus TEXT is.
INGEST_BLOOM_MIN_M = 1 << 16
INGEST_BLOOM_BITS_PER_KEY = 16
INGEST_BLOOM_K = 3
# kept as the fixed driver-SF value for tests
INGEST_BLOOM_M = INGEST_BLOOM_MIN_M
# above this m the bitset probes via broadcast JOIN against the
# distributed (w, word) relation instead of a Column literal: the
# literal's py4j transfer costs ~150 µs/word (151 s at the 1M words a
# 4M-key corpus needs) and re-serializes into every task — SCALE.md
# §fifth wave. 2^21 bits = 32k words ≈ 5 s of transfer, the knee.
INGEST_BLOOM_LITERAL_MAX_M = 1 << 21


def _ingest_bloom_m(n_keys: int) -> int:
    m = INGEST_BLOOM_MIN_M
    while m < n_keys * INGEST_BLOOM_BITS_PER_KEY:
        m <<= 1
    return m
# lede-fingerprint width: first N normalized tokens
PREFIX_TOKENS = 8


def q_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity gate: score every document
    with the interpolated bigram LM (operators/corpus.py:
    bigram_logprob — already driver-oracled), split each language into
    head/middle/tail thirds by nll ascending (lower = more fluent),
    keep head+middle. Docs with <2 tokens have no bigrams and are
    absent, matching ``bigram_logprob``'s totality contract.

    Scale shape: the LM scoring is the oracled bigram plan (shuffle
    joins on natural keys, one scalar broadcast); the per-language
    thirds run on ``ntile_bucketed`` with the TWO-LEVEL carry
    (score_coarse = floor(-nll × PPL_COARSE)) — a "language" at crawl
    scale is billions of documents, so the plain
    ``ntile() OVER (PARTITION BY lang)`` window would be the
    one-task-per-group shape; here every task is bounded by id-bucket
    and score-cell density. Bit-identical to the plain window (pinned
    in tests/test_fifth_wave.py); the oracle IS the plain window.
    """
    from aggregator_spark.operators.corpus import bigram_logprob
    from aggregator_spark.operators.rankdist import ntile_bucketed

    docs = load_testdata(spark, sf_dir, "documents")
    nll = bigram_logprob(docs)
    # materialize the LM scores once: the bounded-rank plan reads its
    # input from THREE branches (local rank, fine carry, coarse carry)
    # and would otherwise re-run the whole bigram-LM join tree per
    # branch — a real pipeline scores the corpus once and ranks the
    # (doc_id, lang, nll) relation
    scored = (
        nll.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("negnll", -F.col("nll"))
        .localCheckpoint(eager=True)
    )
    binned = ntile_bucketed(
        scored,
        "lang",
        "negnll",
        "doc_id",
        n_tiles=PPL_TILES,
        score_coarse=lambda s: F.floor(s * PPL_COARSE),
    )
    bucket = (
        F.when(F.col("bin") == 1, F.lit("head"))
        .when(F.col("bin") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return binned.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "nll",
        bucket.alias("bucket"),
        (F.col("bin") <= 2).alias("keep"),
    )


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield, Lund, Thorup, JACM 2007): weighted
    sample without replacement that is estimation-optimal for subset
    sums. priority q_i = w_i / u_i with u_i uniform in (0, 1]; keep the
    k largest priorities; the (k+1)-th priority tau gives the unbiased
    per-item weight estimate max(w_i, tau).

    Everything is EXACT integer math so both engines agree bit-for-bit
    with no transcendental in sight: u_i = (h_i + 1) / 2^32 with h_i
    the first-8-hex value of md5(doc_id) (the repo's deterministic-
    uniform idiom), so q_i = floor(w_i * 2^32 / (h_i + 1)) in BIGINT
    DIV. Weight = n_chars. Ties break by doc_id.

    Scale shape: the top-(k+1) is ``orderBy().limit()`` — Spark plans
    TakeOrderedAndProject (per-partition top-k, merge of k×partitions
    rows), never a global sort; the only window runs AFTER the limit
    over ≤ k+1 rows, and tau joins back as a broadcast scalar.
    """
    docs = load_testdata(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    pr = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        h.alias("__h"),
    ).select(
        "doc_id",
        "source",
        "weight",
        F.expr(f"(weight * {_U32}) DIV (__h + 1)").alias("priority"),
    )
    k = PRIORITY_SAMPLE_K
    top = pr.orderBy(F.col("priority").desc(), "doc_id").limit(k + 1)
    # single-task window is safe: the frame is ≤ k+1 rows by the limit
    w = Window.orderBy(F.col("priority").desc(), "doc_id")
    ranked = top.withColumn("rk", F.row_number().over(w))
    tau = ranked.agg(
        F.max(F.when(F.col("rk") == k + 1, F.col("priority"))).alias("__tau")
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "source",
            "weight",
            "priority",
            F.col("rk").cast("int").alias("rk"),
            F.greatest(
                F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0))
            ).alias("est_weight"),
        )
    )


def _prefix_fp(text) -> F.Column:
    """Lede fingerprint: md5 of the first PREFIX_TOKENS normalized
    tokens — the cheap first-pass ingest-dedup key (near-dup rewrites
    overwhelmingly share their lede, so this catches them at exact-
    match cost; the full-content fingerprint key would see zero
    collisions in the driver corpus, which has fuzzy near-dups only)."""
    from aggregator_spark.operators.text import normalized_text

    toks = F.split(normalized_text(text), " ")
    return F.md5(F.array_join(F.slice(toks, 1, PREFIX_TOKENS), " ").cast("binary"))


def q_dedup_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ingest-time dedup with a bloom fast path: the new crawl
    batch (doc_id % NEW_BATCH_MOD == 0, the ``dedup_incremental``
    convention) checks its lede fingerprints (md5 of the first
    PREFIX_TOKENS normalized tokens) against a bloom filter of the
    existing corpus's fingerprints. Bloom-miss ⇒ definitively new
    (false negatives are impossible) — those rows never join;
    bloom-hit ⇒ maybe-dup — only that sliver pays the exact left join
    that removes false positives. Result ≡ the plain anti-join, which
    is the oracle.

    Scale shape: the bitset is m/8 bytes regardless of corpus size
    (built distributed, only the words reach the driver —
    operators/runtime_filter.py); the batch scans itself once with the
    membership test inlined in codegen; the verify join's build side
    is the fingerprint index (in production the persisted survivor
    index of ``sources/prepared_index.py``), probed only by true dups
    + the FP-rate sliver of the batch — at 100 TB/day that is the
    difference between shuffling a day and shuffling nothing.
    """
    from aggregator_spark.llm_queries import NEW_BATCH_MOD
    from aggregator_spark.operators.runtime_filter import (
        bloom_words_relation,
        build_bloom_words,
        membership_col,
        membership_via_join,
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
    corpus = corpus.localCheckpoint(eager=True)  # fp relation scans 3×
    m_bits = _ingest_bloom_m(corpus.count())
    if m_bits <= INGEST_BLOOM_LITERAL_MAX_M:
        words = build_bloom_words(
            corpus, "fp", m_bits=m_bits, k_hashes=INGEST_BLOOM_K
        )
        marked = batch.withColumn(
            "maybe",
            membership_col(
                F.col("fp"), words, m_bits=m_bits, k_hashes=INGEST_BLOOM_K
            ),
        )
    else:
        rel = bloom_words_relation(
            corpus, "fp", m_bits=m_bits, k_hashes=INGEST_BLOOM_K
        ).localCheckpoint(eager=True)  # probed by k joins
        marked = membership_via_join(
            batch, "fp", rel, m_bits=m_bits, k_hashes=INGEST_BLOOM_K
        )
    hits = corpus.withColumn("hit", F.lit(True))
    verified = (
        marked.filter(F.col("maybe"))
        .join(hits, "fp", "left")
        .select("doc_id", F.col("hit").isNull().alias("is_new"))
    )
    misses = marked.filter(~F.col("maybe")).select(
        "doc_id", F.lit(True).alias("is_new")
    )
    return verified.unionByName(misses)


# per-source priority sample: k kept per stratum (+ the per-stratum
# (k+1)-th priority as that stratum's threshold estimator)
PRIORITY_PER_SOURCE_K = 32


def q_priority_sample_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Priority sampling PER STRATUM: the ``priority_sample`` scheme
    (exact integer Duffield/Lund/Thorup priorities) applied within
    each source, keeping the top PRIORITY_PER_SOURCE_K per source with
    the per-source (k+1)-th-priority threshold estimator — the
    stratified form a mixing pipeline actually wants (sample each
    source proportionally to weight WITHIN the source's own budget).

    Scale shape: the per-group top-(k+1) runs on the two-phase exact
    ``topk_per_group`` (operators/rankdist.py) — local top-k within
    (source, salt), then a rank over only buckets×(k+1) survivors per
    source — so a crawl-scale source never lands its membership on one
    task; the per-source tau is a |sources|-row aggregate joined back
    broadcast.
    """
    from aggregator_spark.operators.rankdist import topk_per_group

    docs = load_testdata(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    pr = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        h.alias("__h"),
    ).select(
        "doc_id",
        "source",
        "weight",
        F.expr(f"(weight * {_U32}) DIV (__h + 1)").alias("priority"),
    )
    k = PRIORITY_PER_SOURCE_K
    top = topk_per_group(
        pr,
        "source",
        [F.col("priority").desc(), F.col("doc_id")],
        k + 1,
        salt_col=F.col("doc_id"),
    )
    tau = top.groupBy("source").agg(
        F.max(F.when(F.col("rk") == k + 1, F.col("priority"))).alias("__tau")
    )
    return (
        top.filter(F.col("rk") <= k)
        .join(F.broadcast(tau), "source")
        .select(
            "doc_id",
            "source",
            "weight",
            "priority",
            F.col("rk").cast("int").alias("rk"),
            F.greatest(
                F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0))
            ).alias("est_weight"),
        )
    )


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID calibration report: the marker-based ``lang_id``
    prediction cross-tabulated against the corpus's gold ``lang``
    column — (lang, lang_pred, n_docs, share-of-gold-lang, is_match).
    The table that decides whether a detector is good enough to GATE
    on before routing per-language pipelines (the CCNet split above
    trusts the gold column; a real crawl only has a detector).

    Scale shape: one scan with the detector inlined in codegen, a
    |langs × predictions|-row aggregate, and a broadcast join of the
    |langs|-row gold totals — nothing grows with the corpus but the
    scan."""
    from aggregator_spark.operators.text import lang_id

    docs = load_testdata(spark, sf_dir, "documents")
    pred = docs.select("lang", lang_id(F.col("text")).alias("lang_pred"))
    cells = pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    totals = pred.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("__tot")
    )
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "lang_pred",
        "n_docs",
        F.round(F.col("n_docs") / F.col("__tot"), 6).alias("share"),
        (F.col("lang") == F.col("lang_pred")).alias("is_match"),
    )


# exact per-source percentiles: PERCENTILE_DISC positions, k/100 kept
# in INTEGER math (ceil(k*n/100) = (k*n + 99) DIV 100) so no float
# q*n boundary can disagree cross-engine
LENGTH_PCTS = (50, 90, 99)


def q_length_percentiles_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT per-source length percentiles (p50/p90/p99 of n_chars,
    PERCENTILE_DISC semantics) — the deterministic, driver-oracled
    counterpart to the rows-only ``approx_quantiles_daily`` entry,
    the way the PQ pair is to the rows-only ANN routing.

    PERCENTILE_DISC(q) = the value at ascending position ceil(q·n)
    (1-based). The value at ascending position P equals the value at
    DESCENDING position n+1−P for ANY tie order (ties share the
    value), so the report reads directly off the bounded-rank core's
    0-based descending rank: keep rows where rank0 == n − P. Positions
    use integer math: ceil(k·n/100) = (k·n + 99) DIV 100.

    Scale shape: ``_rank0_bucketed`` bounds every task by id-bucket
    and tie-group (document lengths are heavily tied — the discrete-
    score regime, single-level carry); the report is then a
    |sources|-row aggregate. A plain
    ``percentile(...) OVER (PARTITION BY source)`` — or a per-source
    sort — would land each source's full membership on one task.
    """
    from aggregator_spark.operators.rankdist import _rank0_bucketed

    docs = load_testdata(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("score")
    )
    ranked = _rank0_bucketed(
        docs, "source", "score", "doc_id", id_bucket=100_000
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for k in LENGTH_PCTS:
        pos = F.expr(f"({k} * __n + 99) DIV 100")  # ceil(k*n/100)
        aggs.append(
            F.max(
                F.when(F.col("__rank0") == F.col("__n") - pos, F.col("score"))
            ).alias(f"p{k}")
        )
    return ranked.groupBy("source").agg(*aggs)


# force multi-split reads of the single test container (500–5000
# records) so the driver row exercises the offset-index split path
WARCLITE_RECORDS_PER_SPLIT = 200


def q_warclite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mime rollup of the documents corpus re-packed as a
    warclite binary container and read back through
    ``spark.read.format("warclite")`` (sources/warclite.py): the
    offset-indexed-split custom batch source, with payload CONTENT
    pinned by the oracle (distinct md5 of the bytes must equal the
    distinct md5 of the parquet text — a corrupted length field or a
    mis-seeked split cannot hash-match). records_per_split is set so
    even the 500-doc container reads as multiple input splits."""
    from aggregator_spark.sources.warclite import (
        cached_documents_container,
        register_warclite_source,
    )

    register_warclite_source(spark)
    path = cached_documents_container(spark, sf_dir)
    recs = (
        spark.read.format("warclite")
        .option("path", path)
        .option("records_per_split", str(WARCLITE_RECORDS_PER_SPLIT))
        .load()
    )
    return recs.groupBy("mime").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).cast("long").alias(
            "distinct_payloads"
        ),
    )


def q_media_archive_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline fed FROM THE ARCHIVE: the media-fixture
    payloads (real PNG/WAV bytes) live in a warclite container on
    disk, read back through the offset-indexed-split source, then run
    the IDENTICAL decode→feature plan as ``media_features``
    (analytics_queries4.features_from_media — real codecs, Arrow
    batches). Same oracle as media_features: the encode→container→
    split-read→decode round-trip is value-checked end to end, so a
    mis-seeked split or a corrupted payload byte cannot hash-match.
    This is the production shape — payloads come off storage as
    splittable containers, never from an inline encoder."""
    from aggregator_spark.analytics_queries4 import features_from_media
    from aggregator_spark.sources.warclite import (
        cached_media_container,
        register_warclite_source,
    )

    register_warclite_source(spark)
    path = cached_media_container(spark, sf_dir)
    recs = (
        spark.read.format("warclite")
        .option("path", path)
        .option("records_per_split", str(WARCLITE_RECORDS_PER_SPLIT))
        .load()
    )
    media = recs.select(
        F.col("doc_id").alias("media_id"),
        F.col("mime").alias("kind"),
        "payload",
    )
    return features_from_media(media)


ANALYTICS11_QUERIES = {
    "perplexity_gate": q_perplexity_gate,
    "priority_sample": q_priority_sample,
    "dedup_bloom_ingest": q_dedup_bloom_ingest,
    "priority_sample_per_source": q_priority_sample_per_source,
    "lang_id_confusion": q_lang_id_confusion,
    "length_percentiles_exact": q_length_percentiles_exact,
    "warclite_scan": q_warclite_scan,
    "media_archive_features": q_media_archive_features,
}
