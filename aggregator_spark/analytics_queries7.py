"""Analytics query pack 7 — feature-engineering / corpus shapes not yet
covered: Shannon entropy per group, array set-ops across a lag window
(day-over-day Jaccard), edit-distance vocabulary pairs (fuzzy-dedup
candidates), bitwise presence bitmaps, and corpus bigram top-k.

Shared determinism rules (round-before-compare, total tiebreak orders,
identical aliases on both engines) follow ``analytics_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def _day(col="ts"):
    return F.date_trunc("day", col).cast("date")


def _tokens(text_col="text"):
    # single shared tokenizer (operators/text.py) — the oracles depend
    # on every text-family query splitting identically
    from aggregator_spark.operators.text import word_tokens

    return word_tokens(F.col(text_col) if isinstance(text_col, str) else text_col)


def q_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution:
    H = -sum(p * ln p) over the (user, type) count shares — the
    behavioral-diversity feature of a user-modeling pipeline.

    Scale shape: one (user, type) hash aggregate (map-side partials),
    then a window-sum partitioned by user over at most |event_types|
    rows per user, then a final per-user aggregate — the raw fact is
    scanned once and never windowed. Entropy sums ≤5 doubles, so
    round(.,6) absorbs partial-merge order.
    """
    e = load_testdata(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id")
    p = F.col("cnt") / F.sum("cnt").over(w).cast("double")
    return (
        per.withColumn("p", p)
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias(
                "entropy"
            ),
            F.sum("cnt").alias("n_events"),
        )
    )


def q_daily_type_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-ops across a lag window: per (user, day) the sorted
    set of event types, Jaccard-compared against the user's previous
    active day (array_intersect / array_union over lag()) — drift
    detection for behavioral features.

    Scale shape: collect_set runs on the (user, day) aggregate key
    (bounded set size = |event_types|); the lag window partitions by
    user over day-grained rows only. Output is scalar columns — the
    arrays stay intermediate.
    """
    e = load_testdata(spark, sf_dir, "events")
    ds = e.groupBy("user_id", _day().alias("day")).agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag("types").over(w)
    return ds.select(
        "user_id",
        "day",
        F.size("types").alias("n_types"),
        F.when(
            prev.isNull(), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.size(F.array_intersect("types", prev))
                / F.size(F.array_union("types", prev)).cast("double"),
                6,
            )
        )
        .alias("jaccard_prev"),
    )


def q_vocab_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup candidate pairs over the corpus vocabulary:
    distinct tokens self-paired at Levenshtein distance 1 (spelling
    variants), a < b to emit each pair once.

    Scale shape — SymSpell-style deletion-neighborhood blocking: each
    term emits itself plus its |t| single-character deletions as join
    keys; every distance-1 pair (substitution, insertion, deletion)
    provably shares a key, so candidates come from a plain HASH
    equi-join on the key — linear key volume, no O(V²) cross/BNLJ —
    and the exact levenshtein==1 filter keeps precision. Key
    generation is a JVM higher-order transform (no Python).
    """
    docs = load_testdata(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(_tokens()).alias("term")).distinct()
    keyed = vocab.select(
        "term",
        F.explode(
            F.expr(
                "array_union(array(term), transform("
                "sequence(1, length(term)), "
                "i -> concat(substr(term, 1, i - 1), "
                "substr(term, i + 1))))"
            )
        ).alias("k"),
    )
    a = keyed.select(F.col("term").alias("term_a"), "k")
    b = keyed.select(F.col("term").alias("term_b"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b")
        .distinct()
        .withColumn("edit_dist", F.levenshtein("term_a", "term_b"))
        .filter(F.col("edit_dist") == 1)
        .select("term_a", "term_b", "edit_dist")
    )


def q_weekday_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise presence aggregate: per user a 7-bit weekday-activity
    bitmap via bit_or(1 << weekday) and its popcount — the
    roaring-bitmap-style presence encoding compressed into one long.

    Scale shape: a single hash aggregate on user_id; bit_or partials
    merge associatively map-side, so shuffle rows = distinct users,
    payload = one long each. (Spark dayofweek is 1=Sun..7=Sat; the
    -1 shift matches DuckDB's 0=Sun..6=Sat.)
    """
    e = load_testdata(spark, sf_dir, "events")
    # F.shiftleft needs a literal shift amount; column shifts via expr
    bit = F.expr("shiftleft(1L, dayofweek(ts) - 1)")
    return e.groupBy("user_id").agg(
        F.bit_or(bit).alias("weekday_bits"),
        F.bit_count(F.bit_or(bit)).alias("n_weekdays"),
    )


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram top-k: adjacent-token pairs per document, global
    count, top 20 by (count desc, bigram asc) — the n-gram statistics
    pass of corpus analysis (unigram twin: ``top_tokens``).

    Scale shape: bigram construction is a JVM higher-order transform
    over the token array (no Python); counts collapse map-side; the
    final top-20 compiles to TakeOrderedAndProject — a distributed
    per-partition top-k merge, NOT a global sort.
    """
    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


ANALYTICS7_QUERIES = {
    "type_entropy": q_type_entropy,
    "daily_type_jaccard": q_daily_type_jaccard,
    "vocab_edit_pairs": q_vocab_edit_pairs,
    "weekday_bitmap": q_weekday_bitmap,
    "top_bigrams": q_top_bigrams,
}
