"""Misra-Gries two-pass heavy hitters: exactness against brute force,
the candidate superset guarantee under minimal slack, and plan shape
(map-side candidates, broadcast recount)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregator_spark.operators.heavy_hitters import heavy_hitters


def _zipfish(spark, n_rows: int, parts: int):
    """Deterministic skewed items spread across ``parts`` partitions:
    item_j covers the 2^j residues in [2^j-1, 2^(j+1)-1) of id%1024,
    so item_9 is ~half the rows, item_8 ~a quarter, ... item_0 ~1/1024
    — geometric head-heavy skew with an 11-item support."""
    df = spark.range(n_rows, numPartitions=parts)
    item = F.concat(
        F.lit("item_"),
        F.floor(F.log2(F.col("id") % 1024 + 1)).cast("int"),
    )
    return df.select(item.alias("token"))


def _brute(items, k_out):
    total = items.count()
    return {
        (r["token"], r["cnt"])
        for r in items.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k_out > F.lit(total))
        .collect()
    }


@pytest.mark.parametrize("k_out", [2, 5, 50])
def test_exact_vs_brute_force(spark, k_out):
    items = _zipfish(spark, 20_000, parts=8)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(items, "token", k_out=k_out).collect()
    }
    assert got == _brute(items, k_out)


def test_minimal_slack_still_exact(spark):
    # k_mg == k_out is the tightest slack the guarantee allows; the
    # compress step fires constantly (11 distinct items vs 4 counters)
    items = _zipfish(spark, 20_000, parts=8)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(items, "token", k_out=4, k_mg=4).collect()
    }
    assert got == _brute(items, 4)


def test_k_mg_below_k_out_raises(spark):
    items = _zipfish(spark, 100, parts=2)
    with pytest.raises(ValueError):
        heavy_hitters(items, "token", k_out=8, k_mg=4)


def test_uniform_data_empty_result(spark):
    # 1024 distinct items, each appearing ~20 times: nobody exceeds
    # n/4 of the stream
    df = spark.range(20_000, numPartitions=8).select(
        F.concat(F.lit("u"), (F.col("id") % 1024)).alias("token")
    )
    assert heavy_hitters(df, "token", k_out=4).count() == 0


def test_single_item_stream(spark):
    df = spark.range(5_000, numPartitions=8).select(
        F.lit("only").alias("token")
    )
    rows = heavy_hitters(df, "token", k_out=100).collect()
    assert [(r["token"], r["cnt"]) for r in rows] == [("only", 5_000)]


def test_plan_broadcasts_candidates(spark):
    items = _zipfish(spark, 2_000, parts=4)
    plan = (
        heavy_hitters(items, "token", k_out=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
