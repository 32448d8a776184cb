"""DuckDB oracles for analytics pack 8 (same aliases, explicit window
frames mirroring the Spark side)."""

from __future__ import annotations

ANALYTICS8_ORACLES: dict[str, str] = {
    "window_value_funcs": """
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, cnt,
               first_value(cnt) OVER grow AS first_cnt,
               last_value(cnt) OVER full_frame AS final_cnt,
               nth_value(cnt, 2) OVER grow AS second_cnt
        FROM daily
        WINDOW
          grow AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          full_frame AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING)
    """,
    "calendar_funcs": """
        WITH d AS (
          SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
        )
        SELECT d,
               last_day(d) AS month_end,
               CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
               CAST(d + CAST(
                 (CASE WHEN (8 - isodow(d)) % 7 = 0 THEN 7
                       ELSE (8 - isodow(d)) % 7 END) || ' days'
                 AS INTERVAL) AS DATE) AS next_monday,
               CAST(dayofyear(d) AS INTEGER) AS doy
        FROM d
    """,
}

ANALYTICS8_ORACLES["cube_grouping_id"] = """
    WITH e AS (
      SELECT NULLIF(event_type, 'error') AS etype,
             CAST(user_id % 3 AS INTEGER) AS seg, value
      FROM events
    )
    SELECT CASE WHEN GROUPING(etype) = 1 THEN 'ALL'
                ELSE COALESCE(etype, 'unattributed') END AS etype_out,
           CASE WHEN GROUPING(seg) = 1 THEN 'ALL'
                ELSE CAST(seg AS VARCHAR) END AS seg_out,
           CAST(GROUPING(etype) * 2 + GROUPING(seg) AS INTEGER) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
             AS total_value
    FROM e GROUP BY CUBE(etype, seg)
"""

ANALYTICS8_ORACLES["variant_json_stats"] = """
    WITH parsed AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type,
           COUNT(k) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM parsed GROUP BY event_type
"""

# the materialized-VARIANT form computes the same answer — one oracle,
# two engine paths (parse-per-query vs parse-once-at-ingest)
ANALYTICS8_ORACLES["variant_json_stats_materialized"] = ANALYTICS8_ORACLES[
    "variant_json_stats"
]

ANALYTICS8_ORACLES["interval_overlap_join"] = """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS session_id, ts
      FROM g
    ),
    sess AS (
      SELECT user_id, session_id,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM s GROUP BY user_id, session_id
    ),
    win(win_id, w_start, w_end) AS (VALUES
      ('w1', TIMESTAMP '2024-01-05 00:00:00',
             TIMESTAMP '2024-01-07 00:00:00'),
      ('w2', TIMESTAMP '2024-01-15 12:00:00',
             TIMESTAMP '2024-01-16 12:00:00'),
      ('w3', TIMESTAMP '2024-01-25 00:00:00',
             TIMESTAMP '2024-01-31 00:00:00'))
    SELECT win_id, COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users
    FROM sess JOIN win
      ON sess.s_start <= win.w_end AND sess.s_end >= win.w_start
    GROUP BY win_id
"""

ANALYTICS8_ORACLES["lateral_topk_orders"] = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
"""
