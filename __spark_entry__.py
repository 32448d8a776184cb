"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (B1 dedup→group-count→having→sort,
reference main.py:206-215 re-expressed Spark-first) on sf0.001.

``queries()`` / ``oracle_sql()`` — the operator catalog from SURVEY.md §2
plus beyond-reference ops, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aggregator_spark.testdata_queries import q_daily_counts

    return q_daily_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aggregator_spark.testdata_queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from aggregator_spark.oracles import oracle_sql as _oracle_sql

    return _oracle_sql()
