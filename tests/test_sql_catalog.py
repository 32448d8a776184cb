"""SQL-first entry surface: registered views answer plain spark.sql."""

from __future__ import annotations

from aggregator_spark.sql_catalog import register_engine_views

SF = "/root/testdata/sf0.001"


def test_sql_views_answer_queries(spark):
    views = register_engine_views(spark, SF)
    assert "events" in views and "events_daily_distinct" in views

    n = spark.sql("SELECT COUNT(*) AS n FROM events").collect()[0]["n"]
    assert n > 0

    agg = spark.sql(
        """
        SELECT day, event_type, COUNT(*) AS cnt
        FROM events_daily_distinct
        GROUP BY day, event_type
        HAVING COUNT(*) > 3
        ORDER BY day DESC, event_type
        """
    )
    from aggregator_spark.testdata_queries import q_daily_counts

    df_api = q_daily_counts(spark, SF)
    assert [tuple(r) for r in agg.collect()] == [
        tuple(r) for r in df_api.collect()
    ]

    dd = spark.sql("SELECT * FROM dim_date_v ORDER BY date").collect()
    assert len(dd) > 0 and dd[0]["week_start"] <= dd[0]["date"]
