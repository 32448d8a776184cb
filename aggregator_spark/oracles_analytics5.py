"""DuckDB oracles for analytics pack 5 (same aliases as the Spark
queries — the driver compares by column name)."""

from __future__ import annotations

ANALYTICS5_ORACLES: dict[str, str] = {
    "full_outer_reconcile": """
        WITH c AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS n_clicks
          FROM events WHERE event_type = 'click' GROUP BY 1
        ),
        p AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT COALESCE(c.day, p.day) AS day,
               COALESCE(n_clicks, 0) AS n_clicks,
               COALESCE(n_purchases, 0) AS n_purchases,
               COALESCE(n_clicks, 0) - COALESCE(n_purchases, 0) AS diff
        FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    "gap_fill_daily": """
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        ),
        bounds AS (
          SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0,
                 MAX(CAST(date_trunc('day', ts) AS DATE)) AS d1
          FROM events
        ),
        cal AS (
          SELECT CAST(unnest(generate_series(
                   CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                   INTERVAL 1 DAY)) AS DATE) AS day
          FROM bounds
        ),
        grid AS (
          SELECT t.event_type, cal.day
          FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN cal
        )
        SELECT g.event_type, g.day,
               COALESCE(last_value(d.cnt IGNORE NULLS) OVER (
                 PARTITION BY g.event_type ORDER BY g.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS cnt_filled
        FROM grid g
        LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
    """,
    "stats_by_type": """
        SELECT event_type,
               ROUND(corr(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6)
                 AS corr_vh,
               ROUND(covar_pop(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6)
                 AS covar_vh,
               ROUND(stddev_samp(value), 6) AS sd_value,
               ROUND(regr_slope(value, CAST(extract(hour FROM ts) AS DOUBLE)), 6)
                 AS slope,
               ROUND(regr_intercept(value,
                     CAST(extract(hour FROM ts) AS DOUBLE)), 6) AS intercept,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "value_histogram": """
        SELECT LEAST(CAST(FLOOR(value / 50.0) AS INT), 9) AS bin,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                 AS total_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "map_user_type_counts": """
        SELECT user_id,
               NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0)
                 AS n_click,
               NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0)
                 AS n_purchase,
               CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
        FROM events GROUP BY user_id
    """,
}
