"""Runtime accuracy gates on the rows-only approximates
(operators/accuracy.py): the plans self-assert their accuracy contract
at action time — recall@k floors for LSH/IVF ANN, relative-error bound
for the HLL daily distinct — so silent degradation is impossible.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


@pytest.mark.parametrize(
    "name", ["ann_topk_lsh", "ann_topk_ivf", "approx_distinct_daily"]
)
def test_gated_queries_pass_contract(spark, sf_dir, name):
    # collecting evaluates the embedded assert_true gate
    rows = QUERIES[name](spark, sf_dir).collect()
    assert rows


def test_gate_fires_on_violation(spark):
    from aggregator_spark.operators.accuracy import attach_gate

    df = spark.range(3)
    bad = spark.range(1).select(
        F.lit(False).alias("ok"), F.lit("contract violated").alias("msg")
    )
    gated = attach_gate(df, bad)
    with pytest.raises(Exception, match="contract violated"):
        gated.collect()


def test_recall_check_counts_missing_queries_as_zero(spark):
    from aggregator_spark.operators.accuracy import recall_check

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "neighbor_id"]
    )
    # query 2 entirely absent from approx → its recall is 0, mean 0.5
    approx = spark.createDataFrame(
        [(1, 10), (1, 11)], ["query_id", "neighbor_id"]
    )
    row = recall_check(approx, exact, k=2, floor=0.6, label="t").collect()[0]
    assert row["ok"] is False and "0.5000" in row["msg"]


def test_rel_error_check_missing_key_violates(spark):
    from aggregator_spark.operators.accuracy import rel_error_check

    exact = spark.createDataFrame([("a", 100), ("b", 100)], ["k", "exact"])
    approx = spark.createDataFrame([("a", 101)], ["k", "approx"])
    row = rel_error_check(
        approx, exact, ["k"], "approx", "exact", 0.05, "t"
    ).collect()[0]
    assert row["ok"] is False


def test_approx_quantiles_passes_contract(spark, sf_dir):
    rows = QUERIES["approx_quantiles_daily"](spark, sf_dir).collect()
    assert rows and set(rows[0].asDict()) == {"day", "p50", "p95", "p99"}
    for r in rows:
        assert r["p50"] <= r["p95"] <= r["p99"]


def test_rank_error_check_flags_bad_estimate(spark):
    from aggregator_spark.operators.accuracy import rank_error_check

    data = spark.range(1000).select(
        F.lit("g").alias("k"), F.col("id").cast("double").alias("value")
    )
    # claim the 0.5-quantile is 900 → achieved rank ~0.9, error ~0.4
    est = spark.createDataFrame([("g", 0.5, 900.0)], ["k", "q", "v"])
    row = rank_error_check(
        est, data, ["k"], "q", "v", "value", 0.02, "t"
    ).collect()[0]
    assert row["ok"] is False and "exceeds bound" in row["msg"]


def test_rel_error_check_exact_zero(spark):
    from aggregator_spark.operators.accuracy import rel_error_check

    exact = spark.createDataFrame([("a", 0), ("b", 100)], ["k", "exact"])
    # exact==0 with approx==0 is fine; approx!=0 must violate, not
    # silently NULL out of max()
    ok_row = rel_error_check(
        spark.createDataFrame([("a", 0), ("b", 100)], ["k", "approx"]),
        exact, ["k"], "approx", "exact", 0.05, "t",
    ).collect()[0]
    assert ok_row["ok"] is True
    bad_row = rel_error_check(
        spark.createDataFrame([("a", 50), ("b", 100)], ["k", "approx"]),
        exact, ["k"], "approx", "exact", 0.05, "t",
    ).collect()[0]
    assert bad_row["ok"] is False


def test_rank_error_check_orphan_estimate_group_violates(spark):
    from aggregator_spark.operators.accuracy import rank_error_check

    data = spark.range(100).select(
        F.lit("g").alias("k"), F.col("id").cast("double").alias("value")
    )
    # estimate for a group with NO data rows must fail, not pass
    # vacuously through an inner join
    est = spark.createDataFrame(
        [("g", 0.5, 49.0), ("ghost", 0.5, 1.0)], ["k", "q", "v"]
    )
    row = rank_error_check(
        est, data, ["k"], "q", "v", "value", 0.05, "t"
    ).collect()[0]
    assert row["ok"] is False
