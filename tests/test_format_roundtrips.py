"""Source/sink format breadth: ORC and JSON-lines round-trips must
preserve every testdata schema exactly — timestamps to the microsecond,
float32 embedding arrays bit-for-bit — because a user switching from
the reference must be able to land the same tables in any of Spark's
built-in formats, not just parquet."""

from __future__ import annotations

import pytest

from aggregator_spark.schemas import load_testdata

SF = "/root/testdata/sf0.001"


def _assert_same_rows(a, b):
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.mark.parametrize("table", ["events", "documents", "embeddings"])
def test_orc_roundtrip(spark, tmp_path, table):
    src = load_testdata(spark, SF, table)
    path = str(tmp_path / f"{table}_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_same_rows(src, back)


# Spark's default JSON timestampFormat carries MILLISECONDS only —
# a silent 999-row-in-1000 precision loss on microsecond data. Any
# JSON landing of the events table must set an explicit microsecond
# format on BOTH sides; this is the pinned contract.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


@pytest.mark.parametrize("table", ["events", "documents", "embeddings"])
def test_json_roundtrip_with_schema(spark, tmp_path, table):
    # JSON has no native timestamp/float32: reading back with the
    # WRITER's schema must restore both exactly (ISO-microsecond
    # strings; shortest-round-trip float repr)
    src = load_testdata(spark, SF, table)
    path = str(tmp_path / f"{table}_json")
    src.write.mode("overwrite").option("timestampFormat", TS_FMT).json(path)
    back = (
        spark.read.schema(src.schema)
        .option("timestampFormat", TS_FMT)
        .json(path)
    )
    _assert_same_rows(src, back)


def test_json_default_format_truncates_to_millis(spark, tmp_path):
    src = load_testdata(spark, SF, "events")
    path = str(tmp_path / "events_json_default")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    from pyspark.sql import functions as F

    micros = back.filter(F.expr("unix_micros(ts) % 1000 != 0")).count()
    assert micros == 0, "default JSON format unexpectedly kept micros"


def test_json_without_schema_infers_wider_types(spark, tmp_path):
    # document the inference contract: timestamps come back as strings
    # unless a schema is supplied — the reason load paths always carry
    # explicit schemas
    src = load_testdata(spark, SF, "events")
    path = str(tmp_path / "events_json_noschema")
    src.write.mode("overwrite").json(path)
    inferred = spark.read.json(path)
    assert dict(inferred.dtypes)["user_id"] == "bigint"
    assert inferred.count() == src.count()


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    src = load_testdata(spark, SF, "events")
    path = str(tmp_path / "events_orc_pd")
    src.write.mode("overwrite").orc(path)
    df = spark.read.orc(path).filter("event_type = 'click'").select(
        "event_id"
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "event_type" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0]


def test_json_corrupt_record_contract(spark, tmp_path):
    """PERMISSIVE JSON loads must surface garbage lines in
    _corrupt_record (other fields NULL) instead of aborting — and
    FAILFAST must abort, so a pipeline can choose its failure mode."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"event_id": 1, "user_id": 7}\n'
        "this is not json\n"
        '{"event_id": 2, "user_id": 8}\n'
    )
    schema = "event_id long, user_id long, _corrupt_record string"
    rows = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(str(p))
        .collect()
    )
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["event_id"] is None
    assert {r["event_id"] for r in rows if r["_corrupt_record"] is None} == {
        1,
        2,
    }

    import pytest as _pytest

    with _pytest.raises(Exception):
        (
            spark.read.schema("event_id long, user_id long")
            .option("mode", "FAILFAST")
            .json(str(p))
            .collect()
        )
