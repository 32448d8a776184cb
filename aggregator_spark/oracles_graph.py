"""DuckDB oracles for the graph pack — the PageRank unroll mirrors
``graph_queries.PR_ROUNDS`` = 3 and DAMPING = 0.85 as a CTE chain."""

from __future__ import annotations

_EDGES_CTE = """
        toks AS (
          SELECT list_filter(string_split_regex(lower(text),
                 '[^a-z0-9]+'), x -> x <> '') AS t
          FROM documents
        ),
        raw_pairs AS (
          SELECT t[u.i] AS src, t[u.i + 1] AS dst
          FROM toks, unnest(range(1, len(t))) AS u(i)
          WHERE len(t) >= 2
        ),
        edges AS (
          SELECT DISTINCT src, dst FROM raw_pairs WHERE src <> dst
        )
"""

GRAPH_ORACLES: dict[str, str] = {
    "textrank_keywords": f"""
        WITH {_EDGES_CTE},
        nodes AS (
          SELECT src AS term FROM edges
          UNION SELECT dst FROM edges
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_nodes FROM nodes),
        outdeg AS (
          SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
        ),
        r0 AS (
          SELECT term, 1.0 / n.n_nodes AS pr FROM nodes CROSS JOIN n
        ),
        c1 AS (
          SELECT e.dst, SUM(r.pr / o.outdeg) AS c
          FROM edges e JOIN r0 r ON e.src = r.term
          JOIN outdeg o ON e.src = o.src GROUP BY e.dst
        ),
        r1 AS (
          SELECT nodes.term,
                 0.15 / n.n_nodes + 0.85 * COALESCE(c1.c, 0.0) AS pr
          FROM nodes LEFT JOIN c1 ON nodes.term = c1.dst CROSS JOIN n
        ),
        c2 AS (
          SELECT e.dst, SUM(r.pr / o.outdeg) AS c
          FROM edges e JOIN r1 r ON e.src = r.term
          JOIN outdeg o ON e.src = o.src GROUP BY e.dst
        ),
        r2 AS (
          SELECT nodes.term,
                 0.15 / n.n_nodes + 0.85 * COALESCE(c2.c, 0.0) AS pr
          FROM nodes LEFT JOIN c2 ON nodes.term = c2.dst CROSS JOIN n
        ),
        c3 AS (
          SELECT e.dst, SUM(r.pr / o.outdeg) AS c
          FROM edges e JOIN r2 r ON e.src = r.term
          JOIN outdeg o ON e.src = o.src GROUP BY e.dst
        ),
        r3 AS (
          SELECT nodes.term,
                 0.15 / n.n_nodes + 0.85 * COALESCE(c3.c, 0.0) AS pr
          FROM nodes LEFT JOIN c3 ON nodes.term = c3.dst CROSS JOIN n
        )
        SELECT term, ROUND(pr, 6) AS pr FROM r3
    """,
    "cooccur_triangles": f"""
        WITH {_EDGES_CTE},
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM edges
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM und e1
        JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b
    """,
}
