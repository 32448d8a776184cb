"""DuckDB oracles for the analytics query pack (same aliases, same
decimal-exact aggregation discipline as the Spark plans)."""

from __future__ import annotations


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


ANALYTICS_ORACLES: dict[str, str] = {
    "tpch_q1": f"""
        SELECT l_returnflag, l_linestatus,
               {_dsum('l_quantity', 'sum_qty')},
               {_dsum('l_extendedprice', 'sum_base_price')},
               {_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
               {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_q3": f"""
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               o_orderpriority,
               {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "tpch_q5": f"""
        SELECT n_name AS nation,
               {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "tpch_q6": f"""
        SELECT {_dsum('l_extendedprice * l_discount', 'revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.04
          AND l_quantity < 24
    """,
    "top_events_per_type": """
        SELECT event_type, user_id, cnt, CAST(rank AS INT) AS rank FROM (
          SELECT event_type, user_id, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY COUNT(*) DESC, user_id) AS rank
          FROM events GROUP BY event_type, user_id)
        WHERE rank <= 3
    """,
    "sessionize": """
        WITH gaps AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        > 1800000000
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS session_id
          FROM gaps
        ), per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n_events
          FROM sessions GROUP BY user_id, session_id)
        SELECT user_id, COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events
        FROM per_session GROUP BY user_id
    """,
    "unpivot_daily": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    """,
    "session_window_native": """
        WITH gaps AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                        >= 1800000000
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END
                   AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS sid
          FROM gaps)
        SELECT user_id,
               epoch_us(MIN(ts)) AS session_start,
               epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, sid
    """,
    "rollup_orders": f"""
        SELECT COALESCE(year, -1) AS year,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               n_orders, total_price
        FROM (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
                 o_orderpriority, COUNT(*) AS n_orders,
                 {_dsum('o_totalprice', 'total_price')}
          FROM orders GROUP BY ROLLUP (year, o_orderpriority))
    """,
    "set_ops_users": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "pivot_daily": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY day
    """,
    "distinct_users_daily": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY day
    """,
}
