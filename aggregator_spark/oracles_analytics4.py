"""DuckDB oracles for analytics pack 4."""

from __future__ import annotations


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


ANALYTICS4_ORACLES: dict[str, str] = {
    "profile_events": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS null_user_id,
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS null_props,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT event_type) AS n_types,
               epoch_us(MIN(ts)) AS min_ts,
               epoch_us(MAX(ts)) AS max_ts,
               round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_value
        FROM events
    """,
    "json_struct": f"""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 5 AS k_mod,
               COUNT(*) AS cnt,
               {_dsum('value', 'total_value')}
        FROM events GROUP BY k_mod
    """,
    "top_tokens": r"""
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                AS token FROM documents)
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 20
    """,
    "geomean_value": """
        SELECT event_type,
               round(exp(avg(ln(value + 1))) - 1, 6) AS geo_value
        FROM events GROUP BY event_type
    """,
    # media_features: the real PNG/WAV decode isn't SQL-expressible, but
    # the payloads are a pure function of doc_id % 256 — so the oracle
    # joins a 256-row expected-value lookup computed in plain Python by
    # the SAME codec functions the Spark workers run (media_fixture.py).
    "media_features": "__MEDIA_FEATURES__",  # filled below (needs codecs)
    "tumbling_hourly": f"""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws,
               COUNT(*) AS cnt,
               {_dsum('value', 'total_value')}
        FROM events GROUP BY ws
    """,
    "sliding_halfhour": """
        SELECT ws, COUNT(*) AS cnt FROM (
          SELECT (epoch_us(ts) // 1800000000) * 1800000000 AS ws
          FROM events
          UNION ALL
          SELECT (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000
          FROM events)
        GROUP BY ws
    """,
    "latest_event_per_user": """
        WITH ranked AS (
          SELECT user_id, event_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn_last,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn_first
          FROM events)
        SELECT user_id,
               MAX(CASE WHEN rn_last = 1 THEN event_id END) AS last_event_id,
               MAX(CASE WHEN rn_first = 1 THEN event_type END) AS first_type,
               epoch_us(MAX(ts)) AS last_ts
        FROM ranked GROUP BY user_id
    """,
    "user_type_arrays": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',')
                 AS types,
               CAST(len(list(DISTINCT event_type)) AS BIGINT) AS n_types
        FROM events GROUP BY user_id
    """,
    "deterministic_sample": """
        SELECT doc_id, lang, source
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
    """,
    "rank_analytics": """
        SELECT event_type, user_id, cnt,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               round(CUME_DIST() OVER w, 6) AS cume
        FROM (SELECT event_type, user_id, COUNT(*) AS cnt
              FROM events GROUP BY event_type, user_id)
        WINDOW w AS (PARTITION BY event_type ORDER BY cnt, user_id)
    """,
    "rolling_7d_avg": """
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2)
        SELECT day, event_type, cnt,
               round(CAST(SUM(CAST(cnt AS DECIMAL(30,6))) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 6) AS avg_7d
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                           AND CURRENT ROW)
    """,
    "scd2_merge": """
        SELECT c_custkey, c_acctbal,
               DATE '1970-01-01' AS valid_from,
               DATE '2024-02-01' AS valid_to,
               FALSE AS is_current
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal, DATE '1970-01-01', NULL, TRUE
        FROM customer WHERE c_custkey % 10 != 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0, DATE '2024-02-01', NULL, TRUE
        FROM customer WHERE c_custkey % 10 = 0
    """,
}


def _media_features_oracle() -> str:
    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        lookup_values_sql,
    )

    return f"""
        WITH lookup(k, width, height, duration_ms, rms_micro, feat_str)
        AS (VALUES
        {lookup_values_sql()}
        )
        SELECT d.doc_id AS media_id,
               CASE WHEN d.doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                 AS kind,
               l.width, l.height, l.duration_ms, l.rms_micro, l.feat_str
        FROM documents d
        JOIN lookup l ON d.doc_id % {N_KEYS} = l.k
    """


ANALYTICS4_ORACLES["media_features"] = _media_features_oracle()


def _video_frames_oracle() -> str:
    from aggregator_spark.operators.media_fixture import (
        N_VIDEO_KEYS,
        video_lookup_values_sql,
    )

    return f"""
        WITH lookup(k, frame_index, frame_ts_ms, frame_md5)
        AS (VALUES
        {video_lookup_values_sql()}
        )
        SELECT d.doc_id AS media_id,
               CAST(l.frame_index AS BIGINT) AS frame_index,
               CAST(l.frame_ts_ms AS BIGINT) AS frame_ts_ms,
               l.frame_md5
        FROM documents d
        JOIN lookup l ON d.doc_id % {N_VIDEO_KEYS} = l.k
    """


ANALYTICS4_ORACLES["video_frames"] = _video_frames_oracle()
