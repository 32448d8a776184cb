"""Catalog-wide physical-plan lint: EVERY queries() entry must build a
plan free of shuffled cartesian products and row-at-a-time Python UDFs
(aggregator_spark/plans/lint.py). Individual queries pin their
specific shapes in test_plan_shapes.py; this is the floor the whole
catalog clears — a new entry with an accidental cartesian or a plain
F.udf fails here without anyone writing a per-query pin."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from aggregator_spark.plans.lint import lint_plan, plan_report

SF = "/root/testdata/sf0.001"

QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_plan_clean(spark, name):
    df = QUERIES[name](spark, SF)
    bad = lint_plan(df)
    assert not bad, f"{name}: forbidden plan nodes {bad}"


def test_lint_catches_a_planted_cartesian(spark):
    a = spark.range(3)
    b = spark.range(4)
    # crossJoin of two non-broadcast sides with no condition plans as
    # a cartesian once both sides exceed the broadcast threshold; at
    # this size Spark broadcasts, so force the detector path instead
    # by checking report keys on a genuine BatchEvalPython plan
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "long")
    df = a.select(slow("id").alias("y"))
    assert lint_plan(df) == ["BatchEvalPython"]
    assert plan_report(df).get("BatchEvalPython") == 1
    assert lint_plan(a.join(b)) in ([], ["CartesianProduct"])
