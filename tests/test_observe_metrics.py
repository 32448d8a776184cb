"""DataFrame.observe() instrumentation: pipeline health metrics (rows
in / rows out / threshold rejects) collected DURING the job — no second
scan, the production observability idiom for a 100 TB run where a
separate count() pass would double the cost."""

from __future__ import annotations

from pyspark.sql import Observation, functions as F

from aggregator_spark.schemas import load_testdata

SF = "/root/testdata/sf0.001"


def test_observe_counts_in_one_pass(spark):
    events = load_testdata(spark, SF, "events")
    obs_in = Observation("ingest")
    obs_agg = Observation("post_agg")
    daily = (
        events.observe(
            obs_in,
            F.count(F.lit(1)).alias("rows_in"),
            # DISTINCT aggregates are disallowed in observed metrics —
            # the HLL sketch is the observable form (exact at tiny n)
            F.approx_count_distinct("user_id").alias("users_in"),
        )
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .observe(obs_agg, F.count(F.lit(1)).alias("groups_out"))
    )
    out_rows = daily.count()

    assert obs_in.get["rows_in"] == events.count()
    assert obs_in.get["users_in"] == 15
    assert obs_agg.get["groups_out"] == out_rows
