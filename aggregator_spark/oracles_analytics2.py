"""DuckDB oracles for analytics pack 2 (same aliases, same decimal-exact
aggregation discipline; as-of join checked against DuckDB's native ASOF
JOIN)."""

from __future__ import annotations

from aggregator_spark.analytics_queries2 import BIG_ORDER_QTY, VALUE_BANDS


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


_BANDS_VALUES = ", ".join(
    f"('{b}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
    for b, lo, hi in VALUE_BANDS
)

ANALYTICS2_ORACLES: dict[str, str] = {
    "tpch_q4_semi": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "tpch_q7_nation_pairs": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q10_returns": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
               {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q12_priority": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """,
    "tpch_q14_promo": """
        SELECT round(
                 100.0
                 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(30,6))) AS DOUBLE),
                 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
    "tpch_q16_supplier_cnt": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand != 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 50
    """,
    "tpch_q18_big_orders": f"""
        WITH big AS (
          SELECT l_orderkey, {_dsum('l_quantity', 'sum_qty')}
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 > {BIG_ORDER_QTY})
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
               sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "tpch_q19_disjunctive": f"""
        SELECT {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
               AND l_quantity BETWEEN 20 AND 50)
    """,
    "tpch_q22_idle": f"""
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0)
        SELECT c_mktsegment, COUNT(*) AS numcust,
               {_dsum('c_acctbal', 'totacctbal')}
        FROM customer, avg_bal
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    # the bucketed twin is semantics-identical, so it shares the oracle
    "asof_click_purchase_bucketed": """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        clicks AS (
          SELECT user_id, ts, MAX(event_id) AS click_id FROM events
          WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts,
               c.click_id, epoch_us(c.ts) AS click_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "asof_click_purchase": """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        clicks AS (
          SELECT user_id, ts, MAX(event_id) AS click_id FROM events
          WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts,
               c.click_id, epoch_us(c.ts) AS click_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "value_bands": f"""
        WITH bands(band, lo, hi) AS (VALUES {_BANDS_VALUES})
        SELECT band, COUNT(*) AS n_events,
               {_dsum('value', 'total_value')}
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
    "json_props": """
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10
                 AS k_bucket,
               COUNT(*) AS cnt
        FROM events GROUP BY k_bucket
    """,
    "string_funcs": r"""
        SELECT doc_id,
               regexp_extract(text, '^(\w+)', 1) AS first_word,
               len(string_split(text, ' ')) AS n_words,
               upper(source) AS source_upper,
               text LIKE '%spark%' AS mentions_spark
        FROM documents
    """,
    "median_value": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 6) AS median_value,
               round(quantile_cont(value, 0.9), 6) AS p90_value,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    "grouping_sets_daily": """
        SELECT COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
               COALESCE(event_type, 'ALL') AS event_type,
               COUNT(*) AS cnt
        FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type
              FROM events)
        GROUP BY GROUPING SETS ((day), (event_type))
    """,
    "salted_type_counts": """
        SELECT event_type, COUNT(*) AS cnt
        FROM events GROUP BY event_type
    """,
    # approx_distinct_daily: no oracle — HLL estimates are engine-specific
}
