"""Analytics query pack 3 — the remaining TPC-H idioms: correlated
scalar subqueries (min/avg per group), outer-join histograms, market
share, max-revenue scalar, nested IN, and the Q21 multi-EXISTS shape
decorrelated into per-order aggregates (the oracle cross-checks the
rewrite against literal EXISTS/NOT EXISTS SQL).

The testdata has no partsupp table; ``DISTINCT (l_partkey, l_suppkey)``
from lineitem stands in where TPC-H uses partsupp. Same determinism
discipline as packs 1–2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def _dsum(col, alias):
    return F.sum(col.cast("decimal(30,6)")).cast("double").alias(alias)


def q_tpch_q2_min_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN — for each small part, the
    supplier with the lowest account balance (window rank over the
    partsupp stand-in; ties break on s_suppkey)."""
    li, part, supplier = load_testdata(
        spark, sf_dir, "lineitem", "part", "supplier"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        ps.join(
            F.broadcast(part.filter(F.col("p_size") <= 10)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("p_partkey")
        .limit(50)
    )


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2 suppliers' revenue share per year among
    ASIA-region customers — two independent nation joins (supplier side
    and customer side) plus a conditional-aggregate ratio."""
    li, orders, customer, supplier, nation, region = load_testdata(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "region",
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("cr_key") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", rev)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(30,6)")
                ).cast("double")
                / F.sum(rev.cast("decimal(30,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, year) with a
    synthetic cost term (p_retailprice stands in for ps_supplycost)."""
    li, part, supplier, nation = load_testdata(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.5)
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(_dsum(amount, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join → per-customer order count
    (zeros included) → count-of-counts histogram."""
    orders, customer = load_testdata(spark, sf_dir, "orders", "customer")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue per supplier in a quarter; emit the
    supplier(s) achieving the global max (scalar-subquery-on-aggregate
    via a rank-over-empty-partition window)."""
    li, supplier = load_testdata(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                   "total_revenue"))
    )
    mx = Window.partitionBy()
    return (
        rev.withColumn("mx", F.max("total_revenue").over(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part AVG — revenue of lines whose
    quantity is below half their part's average quantity (one row)."""
    li, part = load_testdata(spark, sf_dir, "lineitem", "part")
    brand = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#5")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = brand.groupBy("p_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    ).withColumnRenamed("p_partkey", "a_partkey")
    return (
        brand.join(
            F.broadcast(avg_qty), F.col("p_partkey") == F.col("a_partkey")
        )
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
                .cast("double")
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


def q_tpch_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN — suppliers who shipped more than 50
    units of widget parts in 1996 (aggregated subquery → semi join)."""
    li, part, supplier = load_testdata(
        spark, sf_dir, "lineitem", "part", "supplier"
    )
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity"), "qty"))
        .filter(F.col("qty") > 50)
    )
    return (
        supplier.join(
            heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS decorrelated into per-order
    aggregates — suppliers with a returned ('R') line in a finished
    ('F') multi-supplier order where NO OTHER supplier had a return.
    The oracle runs the literal EXISTS/NOT EXISTS form, cross-checking
    the rewrite."""
    li, orders, supplier = load_testdata(
        spark, sf_dir, "lineitem", "orders", "supplier"
    )
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    ).withColumnRenamed("l_orderkey", "st_orderkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        returned.join(stats, F.col("l_orderkey") == F.col("st_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a scalar fraction of the
    global total (HAVING against a broadcast scalar aggregate)."""
    li = load_testdata(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        _dsum(F.col("l_extendedprice") * F.col("l_quantity"), "part_value")
    )
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(30,6)"))
        .cast("double")
        .alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.002) * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


ANALYTICS3_QUERIES = {
    "tpch_q11_important_stock": q_tpch_q11_important_stock,
    "tpch_q2_min_supp": q_tpch_q2_min_supp,
    "tpch_q8_market_share": q_tpch_q8_market_share,
    "tpch_q9_profit": q_tpch_q9_profit,
    "tpch_q13_custdist": q_tpch_q13_custdist,
    "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
    "tpch_q17_small_qty": q_tpch_q17_small_qty,
    "tpch_q20_nested_in": q_tpch_q20_nested_in,
    "tpch_q21_waiting": q_tpch_q21_waiting,
}
