"""Analytics query pack 6 — product/corpus analytics shapes:
ordered funnel conversion, cohort retention, day-over-day lag deltas,
TF-IDF term ranking, snapshot diff (CDC classification), and
mode-per-group (most-frequent value with deterministic tiebreak).

Shared determinism rules (round-before-compare, total tiebreak orders,
identical aliases on both engines) follow ``analytics_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.operators.text import word_tokens as _word_tokens
from aggregator_spark.schemas import load_testdata


def _day(col="ts"):
    return F.date_trunc("day", col).cast("date")


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): a user
    advances a stage only with an event at-or-after their previous
    stage's first timestamp; one output row of stage counts + rounded
    conversion ratios.

    Scale shape: each stage is filter (event_type pushed to the scan)
    -> shuffle on user_id -> min-aggregate; the per-user stage frames
    shrink monotonically, every join is keyed on user_id so AQE can
    plan the later (tiny) stages as broadcasts. No window over the raw
    fact — the 100 TB table only ever feeds filtered min-aggregates.
    """
    e = load_testdata(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    return funnel.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.round(
            F.count("t2")
            / F.nullif(F.count("t1"), F.lit(0)).cast("double"),
            6,
        ).alias("view_to_click"),
        F.round(
            F.count("t3")
            / F.nullif(F.count("t2"), F.lit(0)).cast("double"),
            6,
        ).alias("click_to_purchase"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity ISO week;
    for each (cohort_week, week_offset) the distinct users still
    active that many weeks later.

    Scale shape: first-touch is one min-aggregate on user_id; activity
    is a (user, week) distinct — both shuffle on user_id, so the join
    between them is co-partitioned and AQE elides extra exchanges. The
    final rollup keys on (cohort_week, offset): tiny cardinality, so
    map-side partials collapse the shuffle.
    """
    e = load_testdata(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = (
        e.select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("act_week"),
        )
        .distinct()
    )
    return (
        active.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_dod_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day deltas via lag(): per event_type daily counts with
    absolute delta and rounded pct change vs the previous *observed*
    day (gap days are not densified here — see gap_fill_daily for the
    LOCF variant).

    Scale shape: the window runs over the day-grained aggregate (366
    rows/type/year), partitioned by event_type — never over the raw
    fact. First row per series yields NULL delta (no predecessor).
    """
    e = load_testdata(spark, sf_dir, "events")
    daily = e.groupBy("event_type", _day().alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("cnt").over(w)
    return daily.select(
        "event_type",
        "day",
        "cnt",
        (F.col("cnt") - prev).alias("delta"),
        F.round((F.col("cnt") - prev) / prev.cast("double"), 6).alias(
            "pct_change"
        ),
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term ranking: tokenize (lower + non-alphanumeric split),
    tf per (doc, term), df per term, idf = ln(N/df), top-3 terms per
    doc by (tfidf desc, term asc) — a corpus-analysis staple.

    Scale shape: explode -> (doc_id, term) hash aggregate (map-side
    partials absorb within-doc repeats); the df relation is one row
    per vocabulary term — orders smaller than the corpus, so AQE
    broadcasts it into the tf join; the ranking window partitions by
    doc_id (bounded rows per partition key). N is a 1-row scalar
    broadcast.
    """
    docs = load_testdata(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(_word_tokens(F.col("text"))).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC classification: per-user event counts in two
    disjoint half-month windows, full-outer joined and labeled
    added / removed / changed / same — the changelog an incremental
    pipeline emits between table versions.

    Scale shape: both snapshots aggregate before joining (the full
    outer runs on one row per user per side, not raw events), and both
    aggregates come from ONE scan via conditional count — no second
    pass over the fact.
    """
    e = load_testdata(spark, sf_dir, "events").withColumn("day", _day())
    cut = F.lit("2024-01-15").cast("date")
    per_user = e.groupBy("user_id").agg(
        F.count(F.when(F.col("day") <= cut, 1)).alias("old_cnt_raw"),
        F.count(F.when(F.col("day") > cut, 1)).alias("new_cnt_raw"),
    )
    old_cnt = F.nullif(F.col("old_cnt_raw"), F.lit(0))
    new_cnt = F.nullif(F.col("new_cnt_raw"), F.lit(0))
    return per_user.select(
        "user_id",
        old_cnt.alias("old_cnt"),
        new_cnt.alias("new_cnt"),
        F.when(old_cnt.isNull(), F.lit("added"))
        .when(new_cnt.isNull(), F.lit("removed"))
        .when(old_cnt == new_cnt, F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode per group: each user's most frequent event_type with a
    deterministic tiebreak (count desc, type asc) — the categorical
    argmax every feature pipeline needs.

    Scale shape: (user, type) hash aggregate first (map-side partials),
    then a row_number window over at most |event_types| rows per user —
    the window input is the aggregate, never the raw fact.
    """
    e = load_testdata(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            "cnt",
        )
    )


ANALYTICS6_QUERIES = {
    "funnel_stages": q_funnel_stages,
    "cohort_retention": q_cohort_retention,
    "dod_change": q_dod_change,
    "tfidf_top_terms": q_tfidf_top_terms,
    "snapshot_diff": q_snapshot_diff,
    "mode_event_type": q_mode_event_type,
}
