"""Corpus-preparation operators for LLM training-data pipelines:
document chunking, sequence packing, stratified corpus mixing, and
corpus-statistics scoring (unigram log-prob).

Beyond-reference surface (SURVEY.md §7 step 8); the reference has no
document processing at all — these are the operations a 100 TB
training-data pipeline needs between raw documents and a tokenized
training set.

Scale design:

- **chunking** is embarrassingly parallel (one Arrow-batched Python
  pass, no shuffle) — same mapInPandas pattern as shingling
  (operators/dedup.py), which measured ~10× faster than nested
  higher-order-function expressions for per-row text work.
- **packing** shuffles once on a deterministic group key and runs one
  window per group — no global window (a single-partition sort would
  be the classic 100 TB bottleneck); group count scales with the
  cluster, assignment stays reproducible run-to-run.
- **stratified sampling** is a pure filter (md5-prefix per-stratum
  thresholds) — pushdown-friendly, no shuffle, reproducible across
  engines and retries, and consistent across tables sharing the key.
- **unigram log-prob** joins token occurrences against the corpus
  unigram table on the token key — a plain shuffle join that scales
  with vocabulary (deliberately NOT a broadcast: real vocabularies
  don't fit), then one aggregation per document.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

# ASCII whitespace only — Java \s semantics, matching the JVM-side
# expressions and DuckDB's \s (Python's \s would also match unicode)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")

DEFAULT_CHUNK_TOKENS = 64
DEFAULT_CHUNK_STRIDE = 48  # 16-token overlap
DEFAULT_PACK_BUDGET = 256
DEFAULT_PACK_GROUPS = 32


def _chunk_batches(chunk_size: int, stride: int):
    """mapInPandas worker: (doc_id, text) batches → one row per chunk
    (doc_id, chunk_id, chunk_text, n_tokens). Tokens are the
    whitespace split of the trimmed text; chunk i covers tokens
    [i*stride, i*stride + chunk_size); the tail chunk may be short.
    Chunk starts run while start < n_tokens, so every token lands in
    at least one chunk (and in chunk_size/stride chunks on average
    with overlap)."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids, cids, texts, ntoks = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                toks = _WS.split((text or "").strip())
                for ci, s in enumerate(range(0, len(toks), stride)):
                    piece = toks[s : s + chunk_size]
                    ids.append(did)
                    cids.append(ci)
                    texts.append(" ".join(piece))
                    ntoks.append(len(piece))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_id": cids,
                    "chunk_text": texts,
                    "n_tokens": ntoks,
                }
            )

    return fn


def doc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = DEFAULT_CHUNK_TOKENS,
    stride: int = DEFAULT_CHUNK_STRIDE,
) -> DataFrame:
    """Sliding-window token chunking: (doc_id, chunk_id, chunk_text,
    n_tokens), chunk_id 0-based in document order."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from aggregator_spark.operators.util import scatter

    return (
        scatter(docs)
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .mapInPandas(
            _chunk_batches(chunk_size, stride),
            "doc_id long, chunk_id int, chunk_text string, n_tokens int",
        )
    )


def pack_sequences(
    chunks: DataFrame,
    budget: int = DEFAULT_PACK_BUDGET,
    groups: int = DEFAULT_PACK_GROUPS,
) -> DataFrame:
    """Greedy contiguous sequence packing: chunks are laid end-to-end
    in (doc_id, chunk_id) order within a deterministic pack group
    (doc_id % groups) and each chunk is assigned to the training
    sequence (bin) its first token falls in: bin = floor(exclusive
    running token count / budget). The concat-then-split packing used
    for LM training — a bin may run over budget by at most one chunk's
    tail, never under-fill except the last bin per group.

    One shuffle (window partition) per group key; no global ordering.
    Returns (doc_id, chunk_id, pack_group, seq_bin, n_tokens).
    """
    g = (F.col("doc_id") % groups).cast("int")
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        chunks.withColumn("pack_group", g)
        .withColumn(
            "seq_bin",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
            ).cast("int"),
        )
        .select("doc_id", "chunk_id", "pack_group", "seq_bin", "n_tokens")
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling for corpus mixing: keep a
    document iff the first two hex chars of md5(doc_id) fall below the
    stratum's threshold (rate quantized to 1/256ths). Reproducible
    across engines/retries, consistent cohort across tables keyed by
    doc_id, and a pure filter — no shuffle, no RNG state."""

    def thr(rate: float) -> str:
        return format(max(0, min(256, round(rate * 256))), "02x")

    h2 = F.substring(
        F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2
    )
    cond = F.lit(thr(default_rate))
    for stratum, rate in sorted(rates.items()):
        cond = F.when(F.col(stratum_col) == stratum, F.lit(thr(rate))).otherwise(
            cond
        )
    return docs.filter(h2 < cond)


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-statistics quality score: mean unigram negative
    log-likelihood per document, -avg(ln(count(token)/total_tokens))
    over the document's token occurrences, against the corpus's own
    unigram distribution (normalized lowercase tokens). Low = stereo-
    typical text, high = rare-token-heavy; the classic cheap prior for
    quality filtering and importance sampling.

    Returns (doc_id, n_tokens, nll) with nll rounded to 6 decimals.
    """
    from aggregator_spark.operators.text import normalized_text

    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("token"),
    )
    freq = occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    return (
        occ.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt") / F.col("total"))), 6
            ).alias("nll"),
        )
    )


BIGRAM_LAMBDA = 0.75  # interpolation weight on the bigram term


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAMBDA,
) -> DataFrame:
    """Interpolated bigram language-model score per document — the
    next step up from ``unigram_logprob`` in cheap LM-based quality
    filtering (the KenLM-perplexity-filter shape, cf. CCNet):

        P(w2 | w1) = lam * c(w1 w2)/c(w1 ·) + (1-lam) * c(w2)/N

    where c(w1 w2) is the corpus bigram count, c(w1 ·) the count of
    bigrams starting with w1 (so the conditional sums to exactly 1),
    c(w2)/N the corpus unigram distribution, and lam defaults to 0.75
    (exactly representable in binary — the interpolation itself adds
    no cross-engine rounding). Returns (doc_id, n_bigrams, nll) with
    nll = round(avg(-ln P), 6) over the document's bigram occurrences;
    docs with fewer than 2 tokens have no bigrams and are absent
    (same totality contract as unigram_logprob).

    Scale shape: identical to the unigram operator's — bigram
    construction is a JVM higher-order transform (no Python), the
    model tables (bigram counts, first-word totals, unigram counts)
    join back on their natural keys as plain shuffle joins
    (deliberately NOT broadcast: real LM vocabularies don't fit), and
    only the single-row corpus total broadcasts.
    """
    from aggregator_spark.operators.text import normalized_text

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(F.col(text_col)), " ").alias("ts"),
    )
    # unigram table from ALL tokens (the same distribution
    # unigram_logprob scores against)
    uni_occ = toks.select(F.explode("ts").alias("w2"))
    uni = uni_occ.groupBy("w2").agg(F.count(F.lit(1)).alias("c_w2"))
    total = uni.agg(F.sum("c_w2").alias("n_total"))

    occ = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - 1),
                lambda i: F.struct(
                    F.element_at("ts", i).alias("w1"),
                    F.element_at("ts", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")

    big = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    first = big.groupBy("w1").agg(F.sum("c_big").alias("c_w1"))

    p = (
        F.lit(float(lam)) * (F.col("c_big") / F.col("c_w1"))
        + F.lit(1.0 - float(lam)) * (F.col("c_w2") / F.col("n_total"))
    )
    return (
        occ.join(big, ["w1", "w2"])
        .join(first, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("nll"),
        )
    )


DSIR_BUCKETS = 256


def dsir_weights(
    docs: DataFrame,
    target_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) weights under a hashed-unigram feature model: score every
    document by how target-like its token distribution is,

        logw(d) = sum_{token in d} ln p_target(h(token))
                                 - ln p_raw(h(token))

    where h buckets tokens by md5 mod n_buckets (an explicit,
    engine-reproducible hash — collisions ARE the feature model, the
    paper's "hashed n-gram" trick that caps the model at n_buckets
    regardless of vocabulary), and both distributions are
    Laplace-smoothed bucket frequencies: (c_b + 1)/(total + B). The
    raw distribution comes from the whole corpus, the target from the
    rows matching ``target_filter``. Resampling keeps documents with
    the highest weights — rows are returned for ALL docs so the caller
    picks the threshold/temperature.

    Returns (doc_id, n_tokens, logw) with logw rounded to 6 decimals
    (docs with zero tokens get logw = 0.0).

    Scale shape: two fixed-size bucket aggregates (n_buckets rows
    each, map-side partial) joined into ONE broadcast ratio table; the
    corpus token stream joins it on the bucket key map-side and
    collapses per doc — the corpus never shuffles raw text, and model
    size is n_buckets forever.
    """
    from aggregator_spark.operators.text import normalized_text

    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        target_filter.alias("is_target"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("token"),
    ).filter(F.col("token") != "").select(
        "doc_id",
        "is_target",
        (
            F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % n_buckets
        ).cast("int").alias("bucket"),
    )
    model = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.count(F.when(F.col("is_target"), 1)).alias("c_tgt"),
    )
    totals = model.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    ratios = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(
                (F.col("c_tgt") + F.lit(1)).cast("double")
                / (F.col("t_tgt") + F.lit(n_buckets)).cast("double")
            )
            - F.log(
                (F.col("c_raw") + F.lit(1)).cast("double")
                / (F.col("t_raw") + F.lit(n_buckets)).cast("double")
            )
        ).alias("lr"),
    )
    weights = (
        occ.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("logw"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(weights, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    target_frac: float = 0.25,
    stratum_col: str = "source",
    mass_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted corpus mixing (the multilingual-training
    resampling scheme, cf. mC4/XLM-R): per-stratum sampling weight
    w_s = mass_s^alpha, so alpha < 1 flattens the mix toward small
    strata while alpha = 1 keeps natural proportions. Every document
    gets a keep flag such that the expected kept count is
    target_frac * N, distributed across strata proportionally to w_s.

    Determinism across engines: the stratum mass and doc counts are
    exact integers; the weight is quantized to integer micro-units with
    floor (never round — cross-engine round ties differ) so the
    normalizer Z is an exact integer sum, order-independent; the
    per-stratum keep threshold is then one fixed-shape double
    expression over exact integers, bit-identical on any IEEE engine;
    the selector is the first 8 hex digits of md5(doc_id) as a uniform
    fraction — a pure filter, reproducible across retries, no RNG.
    alpha = 0.5 (the default) computes the weight via sqrt, which IEEE
    requires correctly rounded — bit-identical on every engine; other
    alphas go through pow, which is only faithfully rounded, so the
    micro-unit quantization could differ by 1 ulp between engines at
    pathological masses (fine operationally, not oracle-pinned).

    Scale shape: one tiny per-stratum aggregate (|strata| rows)
    broadcast back over the corpus; the corpus itself never shuffles.
    Returns (doc_id, stratum, keep).
    """
    weights = (
        docs.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.sum(mass_col).cast("long").alias("mass"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .withColumn(
            "wq",
            F.floor(
                (
                    F.sqrt(F.col("mass").cast("double"))
                    if alpha == 0.5
                    else F.pow(F.col("mass").cast("double"), F.lit(float(alpha)))
                )
                * 1e6
            ).cast("long"),
        )
    )
    totals = weights.agg(
        F.sum("wq").alias("z"), F.sum("c").alias("n_total")
    )
    rates = weights.crossJoin(F.broadcast(totals)).select(
        "stratum",
        F.least(
            F.lit(1.0),
            (
                F.lit(float(target_frac))
                * F.col("n_total").cast("double")
                * F.col("wq").cast("double")
            )
            / (F.col("z").cast("double") * F.col("c").cast("double")),
        ).alias("thr"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.select(F.col(id_col), F.col(stratum_col).alias("stratum"))
        .join(F.broadcast(rates), "stratum")
        .select(id_col, "stratum", (frac < F.col("thr")).alias("keep"))
    )


def js_source_drift(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum Jensen–Shannon divergence (natural log) between the
    stratum's unigram distribution and the whole-corpus distribution:
    (stratum_col, n_tokens, js_div). Closed form over the stratum's own
    support — tokens absent from the stratum contribute their mass via
    the 0.5·(1−Σq)·ln 2 residual, so no full-vocabulary outer join
    exists. See ``llm_queries.q_corpus_drift_js`` for the checkpoint /
    broadcast scale rationale."""
    toks = docs.select(
        stratum_col,
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    )
    st = toks.groupBy(stratum_col, "token").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    return js_from_counts(st, stratum_col)


def js_from_counts(st: DataFrame, stratum_col: str = "source") -> DataFrame:
    """The divergence stage of ``js_source_drift`` over an
    already-aggregated (stratum, token, cnt) relation — the seam the
    streaming drift monitor serves from (its running count table IS
    this relation, maintained incrementally), guaranteeing batch/stream
    parity structurally rather than by re-implementation. ``st`` must
    have one row per (stratum, token); callers maintaining it
    incrementally aggregate their deltas first."""
    gt = st.groupBy("token").agg(F.sum("cnt").alias("gcnt"))
    stot = st.groupBy(stratum_col).agg(F.sum("cnt").alias("s_total"))
    gtot = st.select(F.sum("cnt").alias("g_total"))
    p = F.col("cnt") / F.col("s_total").cast("double")
    q = F.col("gcnt") / F.col("g_total").cast("double")
    term = 0.5 * (
        p * F.log(2.0 * p / (p + q)) + q * F.log(2.0 * q / (p + q))
    )
    return (
        st.join(gt, "token")
        .join(F.broadcast(stot), stratum_col)
        .crossJoin(F.broadcast(gtot))
        .groupBy(stratum_col)
        .agg(
            F.max("s_total").alias("n_tokens"),
            F.round(
                F.sum(term)
                + 0.5 * (1.0 - F.sum(q)) * F.log(F.lit(2.0)),
                6,
            ).alias("js_div"),
        )
    )


def token_budget_waterfill(
    docs: DataFrame,
    budget_frac: float = 0.5,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget allocation across corpus strata by WATER-FILLING:
    given a total training-token budget T = floor(budget_frac x total
    tokens), find the per-stratum cap c such that sum_s min(mass_s, c)
    = T — small strata keep everything, large strata are clipped to
    the common water level (the budget-constrained form of
    flatten-the-mix weighting; cf. the sampling-rate search in
    multilingual/temperature mixing, solved here exactly instead of
    iteratively).

    ENTIRELY int64 arithmetic, so the result hash-matches across
    engines: with strata sorted by (mass, stratum), the level sits
    after the largest prefix i whose masses fit uncapped, c = (T -
    prefix_mass_i) div (n - i); the division remainder r = T -
    (prefix_mass_i + c*(n-i)) hands one extra token to the first r
    capped strata in (mass, stratum) order, so allocations sum to T
    EXACTLY. Returns one row per stratum: (stratum, mass_tokens,
    allocated_tokens, rate_micro = floor(1e6 x allocated / mass)).

    Scale shape: one partial-aggregated groupBy to the strata-sized
    summary (a handful of rows at any corpus size); the window passes
    run on that summary only. The per-document application of the
    resulting rates is ``stratified_sample`` with rate_micro — this
    operator computes the rates, it never shuffles the corpus.
    """
    from aggregator_spark.operators.text import token_count

    masses = (
        docs.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.sum(token_count(F.col(text_col))).cast("long").alias("mass"))
    )
    return waterfill_allocate(masses, budget_frac=budget_frac)


def waterfill_allocate(
    masses: DataFrame, budget_frac: float = 0.5
) -> DataFrame:
    """The allocation core of ``token_budget_waterfill`` over a
    pre-aggregated (stratum, mass) table — the seam the composed
    train-split pipeline uses to allocate over the PACKED stream's
    masses instead of raw text. Same exact-int64 algorithm and output
    schema; the input is strata-sized, so the single-partition windows
    below are on a handful of rows at any corpus size."""
    total_w = Window.partitionBy()
    order_w = Window.partitionBy().orderBy("mass", "stratum")
    prefix_w = order_w.rowsBetween(Window.unboundedPreceding, -1)
    m = (
        masses.withColumn("total", F.sum("mass").over(total_w))
        .withColumn("n", F.count(F.lit(1)).over(total_w))
        .withColumn("i", F.row_number().over(order_w) - 1)
        .withColumn(
            "prefix", F.coalesce(F.sum("mass").over(prefix_w), F.lit(0))
        )
        .withColumn(
            "budget", F.floor(F.col("total") * F.lit(float(budget_frac)))
        )
    )
    # candidate water level if exactly the i strata before this row
    # stay uncapped; valid when it clips THIS row but not the previous
    cand = F.floor(
        (F.col("budget") - F.col("prefix")) / (F.col("n") - F.col("i"))
    )
    lagged_mass = F.lag("mass").over(order_w)
    level_here = F.when(
        (cand < F.col("mass"))
        & (F.coalesce(lagged_mass <= cand, F.lit(True))),
        cand,
    )
    # broadcast the single resolved level (NULL when budget >= total:
    # nothing is clipped)
    lvl = (
        m.withColumn("lvl", level_here)
        .withColumn("level", F.max("lvl").over(total_w))
    )
    capped = F.col("level").isNotNull() & (F.col("mass") > F.col("level"))
    base_alloc = F.when(capped, F.col("level")).otherwise(F.col("mass"))
    # remainder: budget - sum(base_alloc), handed out one token each to
    # the first r capped strata in (mass, stratum) order
    r = (F.col("budget") - F.sum(base_alloc).over(total_w)).cast("long")
    capped_rank = F.sum(capped.cast("int")).over(
        order_w.rowsBetween(Window.unboundedPreceding, 0)
    )
    alloc = (
        base_alloc
        + F.when(capped & (capped_rank <= r), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return (
        lvl.withColumn("allocated_tokens", alloc)
        .select(
            "stratum",
            F.col("mass").alias("mass_tokens"),
            "allocated_tokens",
            F.floor(
                F.lit(1_000_000)
                * F.col("allocated_tokens")
                / F.col("mass")
            ).cast("long").alias("rate_micro"),
        )
        .orderBy("stratum")
    )
