"""Skew/layout operators: salted aggregation equals direct aggregation;
bucketed tables join without exchanges."""

from __future__ import annotations

import pytest

from aggregator_spark.operators.skew import salted_group_count, write_bucketed
from aggregator_spark.schemas import load_testdata

SF = "/root/testdata/sf0.001"


def _explain(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_salted_count_matches_direct(spark):
    events = load_testdata(spark, SF, "events")
    from pyspark.sql import functions as F

    direct = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    salted = {
        r["event_type"]: r["cnt"]
        for r in salted_group_count(
            events, ["event_type"], salt_col="user_id"
        ).collect()
    }
    assert salted == direct


def test_salted_plan_two_stage(spark):
    events = load_testdata(spark, SF, "events")
    p = _explain(
        spark, salted_group_count(events, ["event_type"], salt_col="user_id")
    )
    # the salt key must reach the first exchange (hashpartitioning on
    # event_type + salt), the final agg keys on event_type alone
    assert "__salt" in p
    assert p.count("+- Exchange") >= 2


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders, customer = load_testdata(spark, SF, "orders", "customer")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "t_orders_b", "custkey", 8, path=str(tmp_path / "ob"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b", "custkey", 8, path=str(tmp_path / "cb"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(
            spark.table("t_customer_b"), "custkey"
        )
        p = _explain(spark, joined)
        assert "SortMergeJoin" in p
        # co-located: neither side shuffles
        assert "Exchange" not in p, p
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
