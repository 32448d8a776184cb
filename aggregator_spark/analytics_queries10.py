"""Catalog batch 10 — late round-6 additions: the bounded time-range
(interval) join, expanding-window anomaly detection, interpolated
bigram LM scoring, and exact duplicated-span removal.

Beyond-reference surface: the reference (cybergreen-net/aggregator
main.py) has no join beyond the equi update-join — the time-join
family (as-of / band / interval) and every document operator here are
the operations SURVEY.md §2.9 lists as absent upstream and a
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.schemas import load_testdata

# clicks counted in the 24h window strictly before each purchase
CLICK_WINDOW_SECONDS = 86_400


def q_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/asof.py:interval_join): for every
    purchase, the number of clicks by the same user in the preceding
    24 hours (half-open: click_ts in [purchase_ts - 24h, purchase_ts)).
    The bucketed equi-join plan — shuffle on (user, time bucket), probe
    replicated to exactly 2 buckets — where a naive SQL inequality join
    would be a per-user cross product."""
    from aggregator_spark.operators.asof import interval_join

    events = load_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = interval_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_cols=["click_ts"],
        lower_seconds=-CLICK_WINDOW_SECONDS,
        upper_seconds=0,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return purchases.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_clicks_24h"),
    )


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user expanding-window outlier flags over event values
    (operators/anomaly.py:expanding_zscore) — exact decimal running
    moments, one shuffle, no self-join. The streaming twin
    (streaming/anomaly_stream.py) is bit-identical on a log replay."""
    from aggregator_spark.operators.anomaly import expanding_zscore

    events = load_testdata(spark, sf_dir, "events")
    return expanding_zscore(events)


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM negative log-likelihood per document
    (operators/corpus.py:bigram_logprob) — the CCNet-style LM quality
    prior one order up from unigram_logprob."""
    from aggregator_spark.operators.corpus import bigram_logprob

    docs = load_testdata(spark, sf_dir, "documents")
    return bigram_logprob(docs)


def q_dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal with document reconstruction
    (operators/dedup.py:dedup_span_rewrite) — keeps the globally first
    occurrence of every duplicated word 16-gram, excises the rest."""
    from aggregator_spark.operators.dedup import dedup_span_rewrite

    docs = load_testdata(spark, sf_dir, "documents")
    return dedup_span_rewrite(docs)


ANALYTICS10_QUERIES = {
    "clicks_before_purchase": q_clicks_before_purchase,
    "zscore_outliers": q_zscore_outliers,
    "bigram_logprob": q_bigram_logprob,
    "dedup_span_rewrite": q_dedup_span_rewrite,
}
