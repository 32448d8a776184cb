"""Schema evolution on the parquet read path: a feed that grows a
column mid-stream must stay readable — old files project NULL for the
new column (mergeSchema), and an explicit-schema read stays pinned to
the declared subset (the engine's fixed-schema policy)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_merge_schema_reads_both_generations(spark, tmp_path):
    base = str(tmp_path / "feed")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    )
    v1.write.parquet(f"{base}/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id long, payload string, score double"
    )
    v2.write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "payload", "score", "batch"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: 0.5}


def test_explicit_schema_pins_projection(spark, tmp_path):
    base = str(tmp_path / "feed2")
    spark.createDataFrame(
        [(1, "a", 0.5)], "id long, payload string, score double"
    ).write.parquet(base)

    declared = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("payload", T.StringType())]
    )
    df = spark.read.schema(declared).parquet(base)
    assert df.columns == ["id", "payload"]
    assert df.filter(F.col("id") == 1).count() == 1
