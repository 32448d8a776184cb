"""SQL-first entry surface: register the corpus as temp views so users
can drive the engine with ``spark.sql(...)`` — the idiom closest to the
reference's SQL-string workflow, with Catalyst doing what Redshift/
Postgres did there.

``register_testdata_views`` exposes the ten TESTDATA tables;
``register_engine_views`` additionally materializes engine derivations
(deduped observations, dim_date, …) as views over them, so a SQL user
can query the engine's outputs without touching the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from aggregator_spark.schemas import TESTDATA_TABLES, load_testdata


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """One temp view per TESTDATA table; returns the view names."""
    for name in TESTDATA_TABLES:
        load_testdata(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TESTDATA_TABLES)


def register_engine_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Engine derivations as SQL views (built on the base views)."""
    register_testdata_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW events_daily_distinct AS
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type
        FROM events
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW dim_date_v AS
        SELECT date,
               month(date) AS month, year(date) AS year,
               quarter(date) AS quarter, weekofyear(date) AS week,
               CAST(date_trunc('week', date) AS DATE) AS week_start,
               date_add(CAST(date_trunc('week', date) AS DATE), 6) AS week_end
        FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS date
              FROM events)
        """
    )
    return [*TESTDATA_TABLES, "events_daily_distinct", "dim_date_v"]
