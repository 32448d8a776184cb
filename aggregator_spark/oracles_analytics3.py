"""DuckDB oracles for analytics pack 3. tpch_q21_waiting deliberately
uses the literal correlated EXISTS/NOT EXISTS form to cross-check the
Spark side's decorrelated per-order-aggregate rewrite."""

from __future__ import annotations


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


ANALYTICS3_ORACLES: dict[str, str] = {
    "tpch_q11_important_stock": """
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice * l_quantity
                       AS DECIMAL(30,6))) AS DOUBLE) AS part_value
          FROM lineitem GROUP BY l_partkey),
        total AS (
          SELECT CAST(SUM(CAST(part_value AS DECIMAL(30,6))) AS DOUBLE)
                 AS total_value
          FROM per_part)
        SELECT l_partkey, part_value
        FROM per_part, total
        WHERE part_value > 0.002 * total_value
        ORDER BY part_value DESC, l_partkey
    """,
    "tpch_q2_min_supp": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal FROM (
          SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY p_partkey
                                    ORDER BY s_acctbal, s_suppkey) AS rk
          FROM ps
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE p_size <= 10)
        WHERE rk = 1
        ORDER BY p_partkey
        LIMIT 50
    """,
    "tpch_q8_market_share": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               round(
                 CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_2'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,6))) AS DOUBLE),
                 6) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_year
    """,
    "tpch_q9_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
               {_dsum(
                   'l_extendedprice * (1 - l_discount)'
                   ' - p_retailprice * l_quantity * 0.5',
                   'sum_profit')}
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, o_year
    """,
    "tpch_q13_custdist": """
        SELECT c_count, COUNT(*) AS custdist FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority != '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "tpch_q15_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "tpch_q17_small_qty": """
        WITH brand AS (
          SELECT l_quantity, l_extendedprice, p_partkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#5'),
        avg_qty AS (
          SELECT p_partkey AS a_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
          FROM brand GROUP BY p_partkey)
        SELECT round(
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
        FROM brand JOIN avg_qty ON p_partkey = a_partkey
        WHERE l_quantity < 0.5 * avg_qty
    """,
    "tpch_q20_nested_in": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%widget%'
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) > 50)
        ORDER BY s_suppkey
    """,
    "tpch_q21_waiting": """
        WITH ret AS (
          SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
          FROM lineitem l1
          JOIN orders ON l1.l_orderkey = o_orderkey
          WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
            AND EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_returnflag = 'R'))
        SELECT s_name, COUNT(*) AS numwait
        FROM ret JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
}
