"""UDF surface exemplars: scalar Pandas UDF, grouped-agg Pandas UDAF,
Python UDTF — DataFrame and SQL registration paths."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aggregator_spark.operators.udfs import (
    TokenizeUDTF,
    geometric_mean,
    log1p_scaled,
    register_udfs,
)


def test_scalar_pandas_udf(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (10.0,)], "v double")
    got = [r["s"] for r in df.select(log1p_scaled("v").alias("s")).collect()]
    want = [math.log1p(x) for x in (0.0, 1.0, 10.0)]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, want))


def test_grouped_agg_pandas_udaf(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 0.0)], "k string, v double"
    )
    got = {
        r["k"]: r["g"]
        for r in df.groupBy("k").agg(geometric_mean("v").alias("g")).collect()
    }
    want_a = math.expm1((math.log1p(1.0) + math.log1p(3.0)) / 2)
    assert abs(got["a"] - want_a) < 1e-12
    assert got["b"] == 0.0


def test_udtf_lateral(spark):
    from pyspark.sql.functions import lit

    df = TokenizeUDTF(lit("the quick fox"))
    got = [(r["pos"], r["token"]) for r in df.collect()]
    assert got == [(0, "the"), (1, "quick"), (2, "fox")]


def test_sql_registration(spark):
    register_udfs(spark)
    r = spark.sql(
        "SELECT log1p_scaled(CAST(1.0 AS DOUBLE)) AS s"
    ).collect()[0]["s"]
    assert abs(r - math.log1p(1.0)) < 1e-12
    toks = spark.sql(
        "SELECT * FROM tokenize('a b c')"
    ).collect()
    assert [(t["pos"], t["token"]) for t in toks] == [
        (0, "a"), (1, "b"), (2, "c"),
    ]


def test_polymorphic_udtf_schema_from_argument(spark):
    """analyze() computes the output schema from the constant names
    argument — two call sites, two different schemas, one UDTF."""
    from aggregator_spark.operators.udfs import register_polymorphic_udtf

    register_polymorphic_udtf(spark)
    spark.createDataFrame(
        [("1,US,click",), ("2,DE,view",)], "line string"
    ).createOrReplaceTempView("lines")

    three = spark.sql(
        "SELECT t.* FROM lines, "
        "LATERAL split_fields(line, 'id,country,etype') t"
    )
    assert three.columns == ["id", "country", "etype"]
    assert sorted(map(tuple, three.collect())) == [
        ("1", "US", "click"),
        ("2", "DE", "view"),
    ]

    two = spark.sql(
        "SELECT t.* FROM lines, LATERAL split_fields(line, 'a,b') t"
    )
    assert two.columns == ["a", "b"]
    assert sorted(map(tuple, two.collect()))[0] == ("1", "US")
