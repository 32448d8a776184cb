"""DuckDB oracles for analytics query pack 9.

The regression oracle mirrors the Spark side exactly: identical exact
moments (bigint / decimal sums), identical double expression tree —
see analytics_queries9.py's determinism note.
"""

from __future__ import annotations

from aggregator_spark.analytics_queries9 import HH_K, REGR_ANCHOR

ANALYTICS9_ORACLES = {
    "regr_value_by_type": f"""
        WITH m AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx,
                 CAST(SUM(x * x) AS DOUBLE) AS sxx,
                 CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(y * x) AS DOUBLE) AS sxy,
                 CAST(SUM(y * y) AS DOUBLE) AS syy
          FROM (SELECT event_type,
                       CAST(datediff('day', DATE '{REGR_ANCHOR}',
                                     CAST(ts AS DATE)) AS BIGINT) AS x,
                       CAST(value AS DECIMAL(18,6)) AS y
                FROM events)
          GROUP BY event_type)
        SELECT event_type,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                 AS slope,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                      * sx) / n, 6) AS intercept,
               round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 AS r2,
               round((n * sxy - sx * sy)
                     / sqrt(greatest((n * sxx - sx * sx)
                                     * (n * syy - sy * sy), 0.0)),
                     6) AS corr_xy
        FROM m
        ORDER BY event_type
    """,
    "heavy_bigrams": rf"""
        WITH words AS (
          SELECT string_split_regex(trim(lower(text)), '\s+') AS w
          FROM documents),
        bg AS (
          SELECT unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1]))
                   AS token
          FROM words WHERE len(w) >= 2),
        tot AS (SELECT COUNT(*) AS n FROM bg)
        SELECT token, COUNT(*) AS cnt
        FROM bg
        GROUP BY token
        HAVING COUNT(*) * {HH_K} > (SELECT n FROM tot)
        ORDER BY token
    """,
}

ANALYTICS9_ORACLES["dq_report"] = """
    SELECT * FROM (
      SELECT 'events_event_id_unique' AS "check",
             CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0)
                  AS BIGINT) AS failed
      FROM (SELECT event_id, COUNT(*) AS n FROM events GROUP BY event_id)
      UNION ALL
      SELECT 'events_user_id_not_null',
             CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'events_value_in_0_100',
             CAST(COUNT(CASE WHEN value < 0 OR value > 100 THEN 1 END)
                  AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'customer_custkey_unique',
             CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0)
                  AS BIGINT)
      FROM (SELECT c_custkey, COUNT(*) AS n FROM customer
            GROUP BY c_custkey)
      UNION ALL
      SELECT 'orders_custkey_fk', CAST(COUNT(*) AS BIGINT)
      FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'lineitem_orderkey_fk', CAST(COUNT(*) AS BIGINT)
      FROM lineitem l
      WHERE l.l_orderkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    ORDER BY "check"
"""
