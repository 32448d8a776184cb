"""DuckDB oracles for analytics pack 7 (same aliases as the Spark
queries — the driver compares by column name)."""

from __future__ import annotations

ANALYTICS7_ORACLES: dict[str, str] = {
    "type_entropy": """
        WITH per AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY user_id, event_type
        ),
        shares AS (
          SELECT user_id, cnt,
                 cnt / CAST(SUM(cnt) OVER (PARTITION BY user_id)
                      AS DOUBLE) AS p
          FROM per
        )
        SELECT user_id,
               ROUND(-SUM(p * ln(p)), 6) AS entropy,
               CAST(SUM(cnt) AS BIGINT) AS n_events
        FROM shares GROUP BY user_id
    """,
    "daily_type_jaccard": """
        WITH ds AS (
          SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                 list_sort(list(DISTINCT event_type)) AS types
          FROM events GROUP BY 1, 2
        ),
        lagged AS (
          SELECT user_id, day, types,
                 LAG(types) OVER (PARTITION BY user_id ORDER BY day)
                   AS prev
          FROM ds
        )
        SELECT user_id, day,
               CAST(len(types) AS INTEGER) AS n_types,
               CASE WHEN prev IS NULL THEN NULL
                    ELSE ROUND(len(list_intersect(types, prev))
                      / CAST(len(list_distinct(types || prev))
                             AS DOUBLE), 6)
               END AS jaccard_prev
        FROM lagged
    """,
    "vocab_edit_pairs": """
        WITH vocab AS (
          SELECT DISTINCT unnest(string_split_regex(lower(text),
                 '[^a-z0-9]+')) AS term
          FROM documents
        ),
        v AS (SELECT term FROM vocab WHERE term <> '')
        SELECT a.term AS term_a, b.term AS term_b,
               CAST(levenshtein(a.term, b.term) AS INTEGER) AS edit_dist
        FROM v a JOIN v b
          ON a.term < b.term
         AND abs(length(a.term) - length(b.term)) <= 1
        WHERE levenshtein(a.term, b.term) = 1
    """,
    "weekday_bitmap": """
        SELECT user_id,
               CAST(bit_or(1 << dayofweek(ts)) AS BIGINT)
                 AS weekday_bits,
               CAST(bit_count(CAST(bit_or(1 << dayofweek(ts)) AS BIGINT))
                 AS INTEGER) AS n_weekdays
        FROM events GROUP BY user_id
    """,
    "top_bigrams": """
        WITH toks AS (
          SELECT list_filter(string_split_regex(lower(text),
                 '[^a-z0-9]+'), x -> x <> '') AS t
          FROM documents
        ),
        bg AS (
          SELECT unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i + 1])) AS bigram
          FROM toks WHERE len(t) >= 2
        )
        SELECT bigram, COUNT(*) AS cnt
        FROM bg GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
    """,
}
