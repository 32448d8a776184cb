"""Analytics query pack 8 — scalar/window function breadth:
window value functions (first_value / nth_value / last_value with
explicit frames) and calendar arithmetic (last_day / add_months /
next_day / dayofyear).

Shared determinism rules follow ``analytics_queries.py``; frames are
spelled out explicitly on BOTH engines (default-frame semantics are a
classic cross-engine trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions over each event_type's daily-count
    series: the series' first value, its overall last value (full
    frame — NOT the default current-row frame), and the second value
    (nth_value, NULL on the first row).

    Scale shape: windows run over the day-grained aggregate (≤366
    rows/series/year), partitioned by event_type — never the raw fact.
    """
    e = load_testdata(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    grow = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return daily.select(
        "event_type",
        "day",
        "cnt",
        F.first("cnt").over(grow).alias("first_cnt"),
        F.last("cnt").over(full).alias("final_cnt"),
        F.nth_value("cnt", 2).over(grow).alias("second_cnt"),
    )


def q_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic over the distinct order dates: month end
    (last_day), same-day-next-month with end-of-month clamping
    (add_months: Jan 31 + 1 → Feb 29), first strictly-later Monday
    (next_day), and day-of-year — the dim_date derivation's richer
    cousin (reference main.py:390-401).

    Scale shape: runs on the distinct-date relation (≤ a few thousand
    rows regardless of fact size); all functions are codegen'd
    JVM date arithmetic.
    """
    orders = load_testdata(spark, sf_dir, "orders")
    d = (
        orders.select(F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
    )
    return d.select(
        "d",
        F.last_day("d").alias("month_end"),
        F.add_months("d", 1).alias("next_month"),
        F.next_day("d", "Mon").alias("next_monday"),
        F.dayofyear("d").alias("doy"),
    )


ANALYTICS8_QUERIES = {
    "window_value_funcs": q_window_value_funcs,
    "calendar_funcs": q_calendar_funcs,
}


def q_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING()/grouping_id: the fix the reference could
    not express (SURVEY §2.4 Q14 — its NULL→sentinel UPDATE cannot
    tell cube-generated NULLs from genuine NULL data, reference
    main.py:408-421). Here 'error' events are nullified to simulate
    unattributed data, and ONLY cube-generated NULLs become the 'ALL'
    sentinel — genuine NULLs surface as 'unattributed'.

    Scale shape: native cube() compiles to Expand + one hash aggregate
    (4 grouping sets × input, partials map-side) — same plan family as
    the reference-parity cubes (operators/cube.py).
    """
    e = load_testdata(spark, sf_dir, "events").select(
        F.nullif("event_type", F.lit("error")).alias("etype"),
        (F.col("user_id") % 3).cast("int").alias("seg"),
        "value",
    )
    agg = e.cube("etype", "seg").agg(
        F.grouping("etype").cast("int").alias("g_etype"),
        F.grouping("seg").cast("int").alias("g_seg"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return agg.select(
        F.when(F.col("g_etype") == 1, F.lit("ALL"))
        .otherwise(F.coalesce("etype", F.lit("unattributed")))
        .alias("etype_out"),
        F.when(F.col("g_seg") == 1, F.lit("ALL"))
        .otherwise(F.col("seg").cast("string"))
        .alias("seg_out"),
        (F.col("g_etype") * 2 + F.col("g_seg")).alias("gid"),
        "n",
        "total_value",
    )


ANALYTICS8_QUERIES["cube_grouping_id"] = q_cube_grouping_id


def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): props parsed once with
    parse_json into a VARIANT, fields extracted with try_variant_get
    (NULL on missing/mistyped — no exceptions at 100 TB), aggregated
    per event_type. VARIANT's binary encoding makes repeated
    field-extraction O(field) instead of re-parsing the JSON text per
    access — the schema-on-read shape for ragged telemetry.
    """
    e = load_testdata(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.try_variant_get(
            F.parse_json("props"), "$.k", "int"
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


ANALYTICS8_QUERIES["variant_json_stats"] = q_variant_json_stats


def q_variant_json_stats_materialized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same stats as ``variant_json_stats`` but over the ingest-time
    materialized VARIANT table (sources/variant_ingest.py): parse_json
    ran ONCE at ingest; this query pays only try_variant_get on the
    binary encoding. This is the production shape — at 10M rows the
    text-parsing form spent ~95% of its wall on parse_json
    (SCALE.md stress table)."""
    from aggregator_spark.sources.variant_ingest import (
        cached_events_variant,
    )

    e = cached_events_variant(spark, sf_dir)
    parsed = e.select(
        "event_type",
        F.try_variant_get("props_v", "$.k", "int").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


ANALYTICS8_QUERIES["variant_json_stats_materialized"] = (
    q_variant_json_stats_materialized
)


def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided interval OVERLAP join (distinct from the one-sided
    band join `value_bands`): per-user session intervals
    (gap>30min sessionization) joined against fixed maintenance
    windows on s.start <= w.end AND s.end >= w.start; output = per
    window, how many sessions it intersects and the distinct users
    affected.

    Scale shape: the windows side is a literal dim — broadcast
    nested-loop on the two range predicates (the standard plan for
    non-equi conditions). Cost is dominated by the upstream
    sessionization windows over the raw fact (measured 31.8 s at 10M
    events — the known sessionize cost, not the join); at extreme
    scale the windows would be bucketed by coarse time grid to
    convert the join into an equi-join on grid cell + residual range
    filter.
    """
    events = load_testdata(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        events.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    windows = spark.createDataFrame(
        [
            ("w1", "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
            ("w2", "2024-01-15 12:00:00", "2024-01-16 12:00:00"),
            ("w3", "2024-01-25 00:00:00", "2024-01-31 00:00:00"),
        ],
        "win_id string, w_start string, w_end string",
    ).select(
        "win_id",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )
    return (
        sess.join(
            F.broadcast(windows),
            (F.col("s_start") <= F.col("w_end"))
            & (F.col("s_end") >= F.col("w_start")),
        )
        .groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


ANALYTICS8_QUERIES["interval_overlap_join"] = q_interval_overlap_join


def q_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (Spark 4 DataFrame.lateralJoin): each
    customer's top-2 orders by price — the per-row-subquery shape.
    Catalyst decorrelates this to a domain join + per-key ranking, so
    it scales like the window form while keeping per-row LIMIT
    semantics explicit in the plan.
    """
    customer = load_testdata(spark, sf_dir, "customer")
    orders = load_testdata(spark, sf_dir, "orders")
    top2 = (
        orders.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(2)
    )
    return customer.select("c_custkey").lateralJoin(top2).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


ANALYTICS8_QUERIES["lateral_topk_orders"] = q_lateral_topk_orders
