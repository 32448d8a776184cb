"""DuckDB oracle SQL for every entry in ``testdata_queries.queries()``.

Column aliases match the Spark side exactly (the driver sorts columns by
name before hashing). Floating-point aggregates use the same exact
decimal-sum → double cast as the Spark plans.
"""

from __future__ import annotations

from aggregator_spark.testdata_queries import AMPLIFICATION, HAVING_THRESHOLD

_DIM_VALUES = ", ".join(f"('{t}', CAST({f} AS DOUBLE))" for t, f in AMPLIFICATION)

_DAILY_DISTINCT = """
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type
    FROM events
"""

_DAILY_COUNTS = f"""
    SELECT day, event_type, COUNT(*) AS cnt
    FROM ({_DAILY_DISTINCT})
    GROUP BY day, event_type
    HAVING COUNT(*) > {HAVING_THRESHOLD}
"""


def _cube_sql(granularity: str) -> str:
    return f"""
    SELECT COALESCE(period, DATE '1970-01-01') AS period,
           COALESCE(event_type, 'T') AS event_type,
           cnt, total_value
    FROM (
      SELECT CAST(date_trunc('{granularity}', ts) AS DATE) AS period,
             event_type,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY CUBE (period, event_type)
    )
    """


def oracle_sql() -> dict[str, str]:
    oracles = {
        "daily_counts": _DAILY_COUNTS,
        # incremental maintenance must equal the full recompute — the
        # oracle IS the from-scratch aggregate
        "incremental_daily_counts": _DAILY_COUNTS,
        # bloom prefilter + exact join ≡ plain join (false positives
        # removed by the join; false negatives impossible)
        "bloom_prefiltered_join": """
            SELECT user_id, c_name, COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                     AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            WHERE c_acctbal > 9000.0
            GROUP BY user_id, c_name
        """,
        "amplified_counts": f"""
            WITH dim(event_type, factor) AS (VALUES {_DIM_VALUES}),
                 agg AS ({_DAILY_COUNTS})
            SELECT agg.day, agg.event_type, agg.cnt,
                   COALESCE(agg.cnt * dim.factor, CAST(0.0 AS DOUBLE))
                     AS cnt_amplified
            FROM agg LEFT JOIN dim USING (event_type)
        """,
        "dim_date": """
            SELECT date,
                   CAST(EXTRACT(month FROM date) AS INT) AS month,
                   CAST(EXTRACT(year FROM date) AS INT) AS year,
                   CAST(EXTRACT(quarter FROM date) AS INT) AS quarter,
                   CAST(week(date) AS INT) AS week,
                   CAST(date_trunc('week', date) AS DATE) AS week_start,
                   CAST(date_trunc('week', date) + INTERVAL 6 DAY AS DATE)
                     AS week_end
            FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS date
                  FROM events)
        """,
        "missing_users": """
            SELECT DISTINCT user_id FROM events e
            WHERE user_id IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id)
        """,
        "repaired_user_dim": """
            SELECT c_custkey AS id, c_name AS name FROM customer
            UNION ALL
            SELECT user_id AS id, 'unknown' AS name
            FROM (SELECT DISTINCT user_id FROM events e
                  WHERE user_id IS NOT NULL
                    AND NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = e.user_id))
        """,
    }
    for g in ("week", "month", "quarter", "year"):
        oracles[f"cube_{g}"] = _cube_sql(g)

    from aggregator_spark.oracles_analytics import ANALYTICS_ORACLES
    from aggregator_spark.oracles_analytics2 import ANALYTICS2_ORACLES
    from aggregator_spark.oracles_analytics3 import ANALYTICS3_ORACLES
    from aggregator_spark.oracles_analytics4 import ANALYTICS4_ORACLES
    from aggregator_spark.oracles_analytics5 import ANALYTICS5_ORACLES
    from aggregator_spark.oracles_analytics6 import ANALYTICS6_ORACLES
    from aggregator_spark.oracles_analytics7 import ANALYTICS7_ORACLES
    from aggregator_spark.oracles_analytics8 import ANALYTICS8_ORACLES
    from aggregator_spark.oracles_analytics9 import ANALYTICS9_ORACLES
    from aggregator_spark.oracles_analytics10 import ANALYTICS10_ORACLES
    from aggregator_spark.oracles_analytics11 import ANALYTICS11_ORACLES
    from aggregator_spark.oracles_analytics12 import ANALYTICS12_ORACLES
    from aggregator_spark.oracles_analytics13 import ANALYTICS13_ORACLES
    from aggregator_spark.oracles_graph import GRAPH_ORACLES
    from aggregator_spark.oracles_llm import LLM_ORACLES
    from aggregator_spark.oracles_index import INDEX_ORACLES
    from aggregator_spark.oracles_pipeline import PIPELINE_ORACLES

    oracles.update(ANALYTICS_ORACLES)
    oracles.update(ANALYTICS2_ORACLES)
    oracles.update(ANALYTICS3_ORACLES)
    oracles.update(ANALYTICS4_ORACLES)
    oracles.update(ANALYTICS5_ORACLES)
    oracles.update(ANALYTICS6_ORACLES)
    oracles.update(ANALYTICS7_ORACLES)
    oracles.update(ANALYTICS8_ORACLES)
    oracles.update(ANALYTICS9_ORACLES)
    oracles.update(ANALYTICS10_ORACLES)
    oracles.update(ANALYTICS11_ORACLES)
    oracles.update(ANALYTICS12_ORACLES)
    oracles.update(ANALYTICS13_ORACLES)
    oracles.update(GRAPH_ORACLES)
    oracles.update(LLM_ORACLES)
    oracles.update(PIPELINE_ORACLES)
    oracles.update(INDEX_ORACLES)
    return oracles
