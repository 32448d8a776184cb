"""dim_date derivation (Q10-Q12).

Reference (reference main.py:390-401):

    INSERT INTO dim_date (
      SELECT date, EXTRACT(MONTH FROM date), EXTRACT(YEAR FROM date),
             EXTRACT(QUARTER FROM date), EXTRACT(WEEK FROM date),
             date_trunc('week', date), date_trunc('week', date) + '6 days'
      FROM fact_count GROUP BY date)

Postgres EXTRACT(WEEK) and Spark ``weekofyear`` are both ISO-8601 weeks;
``date_trunc('week')`` is Monday-based in both (SURVEY.md §7 hard-item 4).
GROUP BY date with no aggregates ≡ ``distinct()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def derive_dim_date(fact: DataFrame, date_col: str = "date") -> DataFrame:
    week_start = F.date_trunc("week", F.col("date")).cast("date")
    return (
        fact.select(F.col(date_col).cast("date").alias("date"))
        .distinct()
        .select(
            "date",
            F.month("date").alias("month"),
            F.year("date").alias("year"),
            F.quarter("date").alias("quarter"),
            F.weekofyear("date").alias("week"),
            week_start.alias("week_start"),
            F.date_add(week_start, 6).alias("week_end"),
        )
    )
