"""Analytics query pack over the TPC-H-ish TESTDATA tables.

These widen the engine surface beyond the reference's own operator set
(SURVEY.md §2.9: window functions, rollup/grouping sets, set ops, top-k,
multi-way joins) — each expressed Spark-first and paired with a DuckDB
oracle in ``oracles_analytics.py``.

Determinism rules shared with the oracles:
- double SUMs go through decimal(30,6) then one cast back to double
  (partial-agg order independent);
- AVG = exact decimal SUM / COUNT, one double division;
- every top-k has a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def _dsum(col, alias):
    return F.sum(col.cast("decimal(30,6)")).cast("double").alias(alias)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter → 2-key groupBy with 8 aggregates."""
    li = load_testdata(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(F.col("l_discount").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, group, top-10 by revenue (total order)."""
    customer, orders, li = load_testdata(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1996-03-15")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        # DATE, not raw TIMESTAMP: collect-time TZ trap (schema lint)
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join → revenue per nation (one region,
    one year). Dims broadcast; the fact never repartitions until the
    final group."""
    customer, orders, li, nation, region = load_testdata(
        spark, sf_dir, "customer", "orders", "lineitem", "nation", "region"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum (predicate pushdown showcase)."""
    li = load_testdata(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q_top_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 most active users per event type (total
    tiebreak). Unlike the other event_type windows in this catalog
    (which run over day-grained aggregates), the per-user count
    relation scales with the USER POPULATION, so a plain
    ``row_number() OVER (PARTITION BY event_type)`` would drag a
    type's every user onto one task at crawl scale — this runs the
    two-phase exact top-k instead (operators/rankdist.py:
    topk_per_group: global top-k ⊆ union of per-salt local top-ks,
    phase 2 ranks only buckets×k survivors), bit-identical to the
    window form by construction and pinned by the unchanged oracle."""
    from aggregator_spark.operators.rankdist import topk_per_group

    events = load_testdata(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return topk_per_group(
        counts,
        "event_type",
        [F.col("cnt").desc(), F.col("user_id")],
        3,
        salt_col=F.xxhash64("user_id"),
    ).select(
        "event_type", "user_id", "cnt", F.col("rk").alias("rank")
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE F.session_window grouping (the
    operator Structured Streaming shares): per (user, session) bounds
    and counts. Semantics pinned against the manual lag+cumsum
    formulation (the oracle): a new session starts when the gap is
    >= 30 min — session_window merges an event only while it falls
    STRICTLY inside previous-event + gap; window end = last event +
    gap. One shuffle on user_id, session merge is map-side."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # epoch-micros longs, not raw timestamps: collect() converts
            # TimestampType via datetime.fromtimestamp in the OS timezone,
            # so raw-ts outputs hash differently under a non-UTC TZ env.
            F.unix_micros(F.col("sw.start")).alias("session_start"),
            F.unix_micros(F.col("sw.end")).alias("session_end"),
            "n_events",
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + cumulative-sum over gaps > 30 min → session
    count and mean session length per user (all-window, no shuffle beyond
    the user partition)."""
    events = load_testdata(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-microsecond gap arithmetic (not ts.cast("long"), which
    # truncates to whole seconds): a 1800.5 s gap must classify as a new
    # session on both engine and oracle sides (oracle uses epoch_us too)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_gap = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    with_session = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    per_session = with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, priority): hierarchical subtotals (SURVEY.md §2.9 —
    the reference only has full CUBE; rollup comes free)."""
    orders = load_testdata(spark, sf_dir, "orders")
    return (
        orders.withColumn("year", F.year("o_orderdate"))
        .rollup("year", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce(F.col("year"), F.lit(-1)).alias("year"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            "n_orders",
            "total_price",
        )
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: users who both clicked and purchased, minus
    users who ever errored."""
    events = load_testdata(spark, sf_dir, "events")

    def users(t):
        return events.filter(F.col("event_type") == t).select("user_id")

    return (
        users("click")
        .intersect(users("purchase"))
        .exceptAll(users("error").distinct())
        .orderBy("user_id")
    )


def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events per day × type → one column per type."""
    events = load_testdata(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("day")
    )


def q_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of pivot_daily: the day × type
    count matrix back to long (day, event_type, cnt) via stack().
    Generated in one Expand pass (no join, no shuffle beyond the
    pivot's own); zero-filled cells are dropped to restore the
    original sparse form."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = q_pivot_daily(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', `{t}`" for t in types)
    return (
        wide.select(
            "day",
            F.expr(
                f"stack({len(types)}, {stack_args}) AS (event_type, cnt)"
            ),
        )
        .filter(F.col("cnt") > 0)
    )


def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (the Q2+Q4 fusion, SURVEY.md §2.4)."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("day")
    )


ANALYTICS_QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "top_events_per_type": q_top_events_per_type,
    "sessionize": q_sessionize,
    "session_window_native": q_session_window_native,
    "unpivot_daily": q_unpivot_daily,
    "rollup_orders": q_rollup_orders,
    "set_ops_users": q_set_ops,
    "pivot_daily": q_pivot_daily,
    "distinct_users_daily": q_distinct_users_daily,
}
