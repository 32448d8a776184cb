"""Analytics query pack 5 — remaining relational/function surface:
full outer join reconciliation, time-series gap-fill with forward fill
(LOCF), statistical aggregates (corr / covariance / regression), fixed-
width histogram binning, and map-typed column functions.

Scale notes per query live in the docstrings; shared determinism rules
(decimal sums, round-before-compare, total tiebreak orders) follow
``analytics_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def _dsum(col, alias):
    return F.sum(col.cast("decimal(30,6)")).cast("double").alias(alias)


def _day(col="ts"):
    return F.date_trunc("day", col).cast("date")


def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN reconciliation: daily click totals vs daily
    purchase totals, keeping days present on either side only
    (coalesced key + zero-filled measures + signed diff).

    Scale shape: both inputs are already day-grained aggregates (tiny
    vs the raw fact), so the full-outer shuffle is on the small
    post-agg relation — aggregate-then-join, never join-then-aggregate.
    """
    events = load_testdata(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(_day().alias("day"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(_day().alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    # USING-style join: Spark coalesces the key for full outer
    return (
        clicks.join(purchases, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            (
                F.coalesce("n_clicks", F.lit(0))
                - F.coalesce("n_purchases", F.lit(0))
            ).alias("diff"),
        )
    )


def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (LOCF): dense (event_type ×
    calendar day) grid from the global date bounds, daily counts
    left-joined on, missing days carried forward with
    ``last(cnt, ignorenulls=True)`` (0 before a type's first day).

    Scale shape: the calendar is sequence()-generated from a 1-row
    bounds aggregate (days × types is tiny — broadcast side); the
    forward-fill window partitions by event_type so state is one value
    per series, and a 100 TB fact only ever feeds the day-grained
    aggregate, never the window directly.
    """
    events = load_testdata(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("event_type"), _day().alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = events.agg(
        F.min(_day()).alias("d0"), F.max(_day()).alias("d1")
    )
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    grid = events.select("event_type").distinct().crossJoin(cal)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["event_type", "day"], "left")
        .withColumn(
            "cnt_filled",
            F.coalesce(
                F.last("cnt", ignorenulls=True).over(w), F.lit(0)
            ).cast("long"),
        )
        .select("event_type", "day", "cnt_filled")
    )


def q_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: Pearson correlation, population
    covariance, sample stddev, and least-squares regression
    (slope/intercept) of value vs hour-of-day — all single-pass
    JVM-side co-moment aggregates (partial+final merge), rounded to 6
    decimals so partial-agg merge order can't flip the comparison."""
    events = load_testdata(spark, sf_dir, "events").withColumn(
        "hod", F.hour("ts").cast("double")
    )
    return events.groupBy("event_type").agg(
        F.round(F.corr("value", "hod"), 6).alias("corr_vh"),
        F.round(F.covar_pop("value", "hod"), 6).alias("covar_vh"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.regr_slope("value", "hod"), 6).alias("slope"),
        F.round(F.regr_intercept("value", "hod"), 6).alias("intercept"),
        F.count(F.lit(1)).alias("n"),
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: width-50 bins over value, top bin capped
    at 9 (open-ended tail). One hash aggregate over a 10-value key —
    the map-side partials collapse to ≤10 rows per task, so shuffle
    volume is constant regardless of input scale."""
    events = load_testdata(spark, sf_dir, "events")
    bin_ = F.least(
        F.floor(F.col("value") / F.lit(50.0)).cast("int"), F.lit(9)
    )
    return (
        events.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value"), "total_value"),
        )
        .orderBy("bin")
    )


def q_map_user_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: per-user event_type→count map via
    map_from_entries(collect_list(struct)), probed with try_element_at
    (NULL on missing key — ANSI-safe) and size(). The map stays an
    intermediate; output is plain columns so the result is engine-
    comparable."""
    events = load_testdata(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.try_element_at("m", F.lit("click")).alias("n_click"),
        F.try_element_at("m", F.lit("purchase")).alias("n_purchase"),
        F.size("m").alias("n_types"),
    )


ANALYTICS5_QUERIES = {
    "full_outer_reconcile": q_full_outer_reconcile,
    "gap_fill_daily": q_gap_fill_daily,
    "stats_by_type": q_stats_by_type,
    "value_histogram": q_value_histogram,
    "map_user_type_counts": q_map_user_type_counts,
}
