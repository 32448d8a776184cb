"""DuckDB oracles for analytics pack 6 (same aliases as the Spark
queries — the driver compares by column name)."""

from __future__ import annotations

ANALYTICS6_ORACLES: dict[str, str] = {
    "funnel_stages": """
        WITH t1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        t2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts >= t1.t1
          GROUP BY e.user_id
        ),
        t3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
          GROUP BY e.user_id
        )
        SELECT COUNT(t1.t1) AS n_view,
               COUNT(t2.t2) AS n_click,
               COUNT(t3.t3) AS n_purchase,
               ROUND(COUNT(t2.t2) / CAST(NULLIF(COUNT(t1.t1), 0)
                     AS DOUBLE), 6) AS view_to_click,
               ROUND(COUNT(t3.t3) / CAST(NULLIF(COUNT(t2.t2), 0)
                     AS DOUBLE), 6) AS click_to_purchase
        FROM t1
        LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
    "cohort_retention": """
        WITH first_touch AS (
          SELECT user_id,
                 CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
          FROM events GROUP BY user_id
        ),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS act_week
          FROM events
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.act_week) / 7
                    AS INTEGER) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM active a JOIN first_touch f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "dod_change": """
        WITH daily AS (
          SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, cnt,
               cnt - LAG(cnt) OVER w AS delta,
               ROUND((cnt - LAG(cnt) OVER w)
                     / CAST(LAG(cnt) OVER w AS DOUBLE), 6) AS pct_change
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    "tfidf_top_terms": """
        WITH terms AS (
          SELECT doc_id, unnest(string_split_regex(lower(text),
                 '[^a-z0-9]+')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM terms WHERE term <> '' GROUP BY doc_id, term
        ),
        docfreq AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * ln(n.n_docs / docfreq.df), 6) AS tfidf
          FROM tf JOIN docfreq ON tf.term = docfreq.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, rk FROM (
          SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term) AS rk
          FROM scored
        ) WHERE rk <= 3
    """,
    "snapshot_diff": """
        WITH per_user AS (
          SELECT user_id,
                 NULLIF(COUNT(*) FILTER (WHERE CAST(date_trunc('day', ts)
                   AS DATE) <= DATE '2024-01-15'), 0) AS old_cnt,
                 NULLIF(COUNT(*) FILTER (WHERE CAST(date_trunc('day', ts)
                   AS DATE) > DATE '2024-01-15'), 0) AS new_cnt
          FROM events GROUP BY user_id
        )
        SELECT user_id, old_cnt, new_cnt,
               CASE WHEN old_cnt IS NULL THEN 'added'
                    WHEN new_cnt IS NULL THEN 'removed'
                    WHEN old_cnt = new_cnt THEN 'same'
                    ELSE 'changed' END AS status
        FROM per_user
    """,
    "mode_event_type": """
        SELECT user_id, mode_type, cnt FROM (
          SELECT user_id, event_type AS mode_type, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY COUNT(*) DESC, event_type) AS rk
          FROM events GROUP BY user_id, event_type
        ) WHERE rk = 1
    """,
}
