"""Analytics query pack 2: the join/aggregation families still missing
after pack 1 — semi joins, scalar subqueries, conditional aggregation,
disjunctive join predicates, as-of + band joins, JSON/string scalar
functions, exact percentiles, GROUPING SETS, and the approx-distinct
scale path (SURVEY.md §2.9 beyond-reference surface).

Same determinism discipline as pack 1 (see analytics_queries.py):
decimal-exact SUMs, total tiebreak orders on every top-k, rounded
floating-point scalar outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.operators.asof import asof_join, band_join
from aggregator_spark.schemas import load_testdata

BIG_ORDER_QTY = 150  # sum(l_quantity) threshold for tpch_q18 shape

VALUE_BANDS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 100.0),
    ("high", 100.0, 1000.0),
    ("extreme", 1000.0, 1e18),
]


def _dsum(col, alias):
    return F.sum(col.cast("decimal(30,6)")).cast("double").alias(alias)


def q_tpch_q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left_semi join, then count per priority.
    The semi join keeps the orders side's columns only and stops probing
    after the first match — strictly cheaper than inner-join+distinct."""
    orders, li = load_testdata(spark, sf_dir, "orders", "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q7_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow between two nations, grouped by
    (supplier nation, customer nation, ship year). Dims broadcast; the
    only shuffles are lineitem⋈orders and the final group."""
    li, orders, customer, supplier, nation = load_testdata(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    li, orders, customer, nation = load_testdata(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-07-01"))
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation — high- vs
    low-priority line counts per return flag."""
    li, orders = load_testdata(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — broadcast dim join feeding
    a conditional aggregate ratio (one output row)."""
    li, part = load_testdata(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type") == "PROMO"
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-02-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(0.0).cast("decimal(30,6)"))
                .cast("double")
                / F.sum(rev.cast("decimal(30,6)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part group, with an
    anti-join exclusion list (suppliers with negative balance stand in
    for the 'customer complaints' exclusion)."""
    li, part, supplier = load_testdata(
        spark, sf_dir, "lineitem", "part", "supplier"
    )
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand") != "Brand#1")
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


def q_tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery → self-aggregated key list joined
    back (large-quantity orders with their customers)."""
    li, orders, customer = load_testdata(
        spark, sf_dir, "lineitem", "orders", "customer"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > BIG_ORDER_QTY)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            # DATE, not raw TIMESTAMP: collect-time TZ trap (schema lint)
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive band predicates over a
    broadcast join — Catalyst extracts the common equi-key (partkey) so
    this stays a broadcast HASH join, with the OR applied as a post-join
    filter."""
    li, part = load_testdata(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 15))
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(5, 20))
        & (F.col("l_quantity").between(10, 30))
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(10, 40))
        & (F.col("l_quantity").between(20, 50))
    )
    return j.filter(c1 | c2 | c3).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


def q_tpch_q22_idle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (avg positive balance) broadcast
    via cross join + anti join (customers with no orders), grouped by
    market segment."""
    orders, customer = load_testdata(spark, sf_dir, "orders", "customer")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event gets the most recent click by the
    same user at-or-before its timestamp (operators/asof.py)."""
    events = load_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # dedup clicks to one row per (user, ts) so the as-of winner at an
    # exact-tie timestamp is well-defined on both engines
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["click_id", "ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        # epoch-micros longs: raw TimestampType outputs are OS-TZ-sensitive
        # at collect() time (datetime.fromtimestamp), so hash-stable
        # results require integer micros on both engine and oracle sides
        F.unix_micros(F.col("ts")).alias("ts"),
        F.col("asof_click_id").alias("click_id"),
        F.unix_micros(F.col("asof_ts")).alias("click_ts"),
    ).orderBy("event_id")


ASOF_BUCKET_SECONDS = 86400  # daily buckets spread a hot user's window


def q_asof_click_purchase_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened as-of join (operators/asof.py:asof_join_bucketed):
    identical semantics to asof_click_purchase — same oracle — but the
    carry-forward window partitions by (user, day bucket), so one
    hyper-hot user cannot concentrate the sort on a single task."""
    events = load_testdata(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    from aggregator_spark.operators.asof import asof_join_bucketed

    out = asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["click_id", "ts"],
        bucket_seconds=ASOF_BUCKET_SECONDS,
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts"),
        F.col("asof_click_id").alias("click_id"),
        F.unix_micros(F.col("asof_ts")).alias("click_ts"),
    ).orderBy("event_id")


def q_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: events bucketed into static value bands via a
    broadcast non-equi join, then per-band rollup."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        band_join(events, "value", VALUE_BANDS)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value"), "total_value"),
        )
        .orderBy("band")
    )


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions: extract props.k (JVM-side get_json_object,
    no UDF), bucket mod 10, count per bucket."""
    events = load_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k_bucket")
    )


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions over documents: regexp extraction, split
    cardinality, case mapping, LIKE predicate — all JVM-side."""
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.upper("source").alias("source_upper"),
        F.col("text").like("%spark%").alias("mentions_spark"),
    )


def q_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolated median + p90) per event type —
    Spark `percentile` (exact, sort-based) vs DuckDB `quantile_cont`."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((day), (event_type)) — the grouping-set
    shape between pack-1's full CUBE and ROLLUP (SQL API; Spark compiles
    it to the same Expand+HashAggregate physical plan as cube)."""
    events = load_testdata(spark, sf_dir, "events")
    events.withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    ).createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT COALESCE(CAST(day AS STRING), 'ALL') AS day,
               COALESCE(event_type, 'ALL') AS event_type,
               COUNT(*) AS cnt
        FROM __gs_events
        GROUP BY GROUPING SETS ((day), (event_type))
        """
    )


def q_approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per day — the opt-in scale path for
    the reference's exact COUNT(DISTINCT) semantics (SURVEY.md §2.9).
    No SQL oracle: HLL estimates are engine-specific (rows-only check);
    `distinct_users_daily` is the oracle-checked exact twin. The plan
    carries a runtime accuracy gate (operators/accuracy.py): every
    day's estimate must land within 5% of the exact count (rsd=0.01 →
    ~1% expected error; 5× headroom guards the contract, not the
    noise) — a broken estimator fails the action loudly."""
    from aggregator_spark.operators.accuracy import (
        attach_gate,
        rel_error_check,
    )

    events = load_testdata(spark, sf_dir, "events")
    daily = events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
    approx = (
        daily.groupBy("day")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("n_users_approx"))
        .orderBy("day")
    )
    exact = daily.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return attach_gate(
        approx,
        rel_error_check(
            approx,
            exact,
            ["day"],
            "n_users_approx",
            "n_users_exact",
            0.05,
            "approx_distinct_daily",
        ),
    )


QUANTILES = [0.5, 0.95, 0.99]
QUANTILE_ACCURACY = 100  # percentile_approx rank error ≤ 1/accuracy


def q_approx_quantiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-day value quantiles (p50/p95/p99) via
    percentile_approx (Greenwald-Khanna sketch — mergeable, one scan,
    bounded memory; the scale path where `median_value`'s exact
    percentile is the oracle-checked small-data twin). No SQL oracle:
    sketch outputs are engine-specific (rows-only check). The plan
    carries a runtime RANK-error gate (operators/accuracy.py): for
    every (day, q) the achieved rank fraction of the estimate must sit
    within 1/accuracy (+ties slack) of q — the guarantee the sketch
    actually makes, asserted against the same data in the same job."""
    from aggregator_spark.operators.accuracy import (
        attach_gate,
        rank_error_check,
    )

    events = load_testdata(spark, sf_dir, "events")
    daily = events.withColumn("day", F.date_trunc("day", "ts").cast("date"))
    approx = daily.groupBy("day").agg(
        F.percentile_approx(
            "value", QUANTILES, QUANTILE_ACCURACY
        ).alias("qs")
    )
    out = approx.select(
        "day",
        *[
            F.round(F.element_at("qs", i + 1), 6).alias(f"p{int(q * 100)}")
            for i, q in enumerate(QUANTILES)
        ],
    ).orderBy("day")
    estimates = approx.select(
        "day",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in QUANTILES]).alias("q"),
                F.col("qs").alias("v"),
            )
        ).alias("e"),
    ).select("day", F.col("e.q").alias("q"), F.col("e.v").alias("v"))
    # +0.01 slack over the 1/accuracy contract: achieved-rank uses <=,
    # so duplicate values at the estimate can only push the fraction
    # up by the tie mass; event values are near-continuous doubles
    check = rank_error_check(
        estimates,
        daily.select("day", "value"),
        ["day"],
        "q",
        "v",
        "value",
        1.0 / QUANTILE_ACCURACY + 0.01,
        "approx_quantiles_daily",
    )
    return attach_gate(out, check)


def q_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-stage aggregation (operators/skew.py): results
    identical to a direct groupBy — the oracle IS the direct form —
    while hot keys spread over 16 reducers."""
    from aggregator_spark.operators.skew import salted_group_count

    events = load_testdata(spark, sf_dir, "events")
    return salted_group_count(
        events, ["event_type"], salt_col="user_id"
    ).orderBy("event_type")


ANALYTICS2_QUERIES = {
    "salted_type_counts": q_salted_type_counts,
    "tpch_q4_semi": q_tpch_q4_semi,
    "tpch_q7_nation_pairs": q_tpch_q7_nation_pairs,
    "tpch_q10_returns": q_tpch_q10_returns,
    "tpch_q12_priority": q_tpch_q12_shipmode,
    "tpch_q14_promo": q_tpch_q14_promo,
    "tpch_q16_supplier_cnt": q_tpch_q16_supplier_cnt,
    "tpch_q18_big_orders": q_tpch_q18_big_orders,
    "tpch_q19_disjunctive": q_tpch_q19_disjunctive,
    "tpch_q22_idle": q_tpch_q22_idle,
    "asof_click_purchase": q_asof_click_purchase,
    "asof_click_purchase_bucketed": q_asof_click_purchase_bucketed,
    "value_bands": q_value_bands,
    "json_props": q_json_props,
    "string_funcs": q_string_funcs,
    "median_value": q_median_value,
    "grouping_sets_daily": q_grouping_sets,
    "approx_distinct_daily": q_approx_distinct_daily,
    "approx_quantiles_daily": q_approx_quantiles_daily,
}
