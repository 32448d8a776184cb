"""Explicit StructType schemas for every table in the engine's data model.

Reference DDL: logentry/dim_risk/count (reference main.py:128-158),
fact_count/dim_date/dim_asn/cubes (main.py:342-384), dim_country from the
datapackage descriptor (reference tests/fixtures/country-datapackage.json).
Nothing is inferred — fixed schemas keep scans prunable and avoid the
inferSchema double-read at scale.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference star schema -------------------------------------------------

# raw scan observations; reference main.py:134-139
LOGENTRY = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("ip", T.StringType()),
        T.StructField("risk", T.IntegerType()),
        T.StructField("asn", T.LongType()),
        T.StructField("country", T.StringType()),
    ]
)

# stage-1 fact; reference main.py:148-153
COUNT = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("risk", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("asn", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("count_amplified", T.DoubleType()),
    ]
)

# stage-2 fact (TIMESTAMP→DATE, INT→BIGINT widening); reference main.py:355-361
FACT_COUNT = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("risk", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("asn", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("count_amplified", T.DoubleType()),
    ]
)

# reference main.py:140-147
DIM_RISK = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("slug", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("is_archived", T.BooleanType()),
        T.StructField("taxonomy", T.StringType()),
        T.StructField("measurement_units", T.StringType()),
        T.StructField("amplification_factor", T.DoubleType()),
        T.StructField("description", T.StringType()),
    ]
)

# reference tests/fixtures/country-datapackage.json:12-38
DIM_COUNTRY = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("slug", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("continent", T.StringType()),
    ]
)

# reference main.py:317
DIM_ASN = T.StructType(
    [
        T.StructField("number", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

# reference main.py:348-354
DIM_DATE = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("quarter", T.IntegerType()),
        T.StructField("week", T.IntegerType()),
        T.StructField("week_start", T.DateType()),
        T.StructField("week_end", T.DateType()),
    ]
)

# reference main.py:362-368 (one table per granularity week/month/quarter/year)
AGG_RISK_COUNTRY = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("risk", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("count_amplified", T.DoubleType()),
    ]
)

# --- beyond-reference tables (TESTDATA.md synthetic corpus) ----------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# multimodal: opaque binary payload + typed metadata (SURVEY.md §7 step 8)
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_one(spark, sf_dir: str, name: str):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        # Older testdata: events.ts is parquet TIMESTAMP(NANOS); with
        # nanosAsLong it surfaces as epoch-nanos LongType — convert back
        # to a session-TZ timestamp.
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer `div`, NOT `/`: float division of epoch-nanos
            # exceeds double's 53-bit integer precision and rounds the
            # microsecond up, while DuckDB (and parquet ns→µs generally)
            # truncates — a 1µs disagreement that breaks value hashes on
            # any query exposing raw ts
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # Newer testdata: naive timestamp[us], which Spark 4 infers as
        # TIMESTAMP_NTZ. unix_micros / window() / session_window expect
        # TIMESTAMP, so normalize. The session TZ is pinned to UTC by
        # load_testdata before this cast, so the wall clock is read as a
        # UTC instant — exactly how DuckDB treats naive timestamps.
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast("timestamp")
            )
    return df


def load_testdata(spark, sf_dir: str, *names: str):
    """Load driver-generated parquet tables as DataFrames (TESTDATA.md).

    Set at runtime (not only in the session factory) so this also works
    under a driver-provided SparkSession. The UTC pin matters for oracle
    parity: DuckDB timestamps are UTC-naive, so timestamp→date truncation
    must happen in UTC or day boundaries shift.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = [_read_one(spark, sf_dir, n) for n in names]
    return out[0] if len(out) == 1 else out
