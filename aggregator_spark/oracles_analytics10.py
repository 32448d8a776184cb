"""DuckDB oracles for analytics_queries10 (interval join, expanding
z-score, bigram LM, span-removal rewrite).

The interval-join oracle is the plain inequality join — equivalence
with the bucketed equi-join plan IS the correctness claim. The z-score
oracle mirrors the exact-decimal-moment expression shape token for
token (decimal window sums cast to double once, then one IEEE
expression; floor-quantized output — floor has no cross-engine tie
semantics). Tokenizers match the Spark side: NORM split for the LM
(same as unigram_logprob), word tokens for the span rewrite (same as
dup_span_stats)."""

from __future__ import annotations

from aggregator_spark.analytics_queries10 import CLICK_WINDOW_SECONDS
from aggregator_spark.operators.anomaly import MIN_PRIOR, SIGMAS
from aggregator_spark.operators.corpus import BIGRAM_LAMBDA
from aggregator_spark.oracles_llm import NORM

_WORD_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')"
)

# shared variance expression (exact decimal sums -> double, same shape
# as the Spark plan: s2/n - mean*mean clamped at 0)
_VAR = "greatest(s2/n - (s1/n)*(s1/n), 0.0)"

ANALYTICS10_ORACLES = {
    "clicks_before_purchase": f"""
        WITH p AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, ts AS cts FROM events
          WHERE event_type = 'click'),
        j AS (
          SELECT p.event_id, COUNT(*) AS n
          FROM p JOIN c ON p.user_id = c.user_id
           AND c.cts >= p.ts - INTERVAL {CLICK_WINDOW_SECONDS} SECOND
           AND c.cts < p.ts
          GROUP BY p.event_id)
        SELECT p.event_id, p.user_id,
               CAST(COALESCE(j.n, 0) AS BIGINT) AS n_clicks_24h
        FROM p LEFT JOIN j USING (event_id)
    """,
    "zscore_outliers": f"""
        WITH base AS (
          SELECT event_id, user_id, ts,
                 CAST(value AS DECIMAL(30,6)) AS vq,
                 CAST(value * value AS DECIMAL(30,6)) AS sq
          FROM events),
        w AS (
          SELECT event_id, user_id,
                 CAST(vq AS DOUBLE) AS x,
                 COUNT(vq) OVER win AS n,
                 CAST(SUM(vq) OVER win AS DOUBLE) AS s1,
                 CAST(SUM(sq) OVER win AS DOUBLE) AS s2
          FROM base
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, CAST(n AS BIGINT) AS n_prior,
               CASE WHEN n >= {MIN_PRIOR} AND {_VAR} > 0.0
                    THEN CAST(floor((x - s1/n) / sqrt({_VAR}) * 1e6)
                              AS BIGINT) END AS z_micro,
               COALESCE(
                 CASE WHEN n >= {MIN_PRIOR} THEN
                   CASE WHEN {_VAR} > 0.0
                        THEN abs(x - s1/n) > {SIGMAS} * sqrt({_VAR})
                        ELSE abs(x - s1/n) > 0.0 END
                 END, FALSE) AS is_anomaly
        FROM w
    """,
    "bigram_logprob": f"""
        WITH toks AS (
          SELECT doc_id, string_split({NORM}, ' ') AS ts FROM documents),
        uni AS (
          SELECT w2, COUNT(*) AS c_w2
          FROM (SELECT unnest(ts) AS w2 FROM toks) GROUP BY w2),
        tot AS (SELECT SUM(c_w2) AS n_total FROM uni),
        occ AS (
          SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
          FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2),
        big AS (
          SELECT w1, w2, COUNT(*) AS c_big FROM occ GROUP BY w1, w2),
        fst AS (SELECT w1, SUM(c_big) AS c_w1 FROM big GROUP BY w1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(AVG(-ln({BIGRAM_LAMBDA} * (c_big / c_w1)
                           + {1.0 - BIGRAM_LAMBDA} * (c_w2 / n_total))),
                     6) AS nll
        FROM occ JOIN big USING (w1, w2) JOIN fst USING (w1)
             JOIN uni USING (w2) CROSS JOIN tot
        GROUP BY doc_id
    """,
    "dedup_span_rewrite": f"""
        WITH toks AS (
          SELECT doc_id, {_WORD_TOKS} AS ts FROM documents),
        grams AS (
          SELECT doc_id, i AS pos,
                 array_to_string(ts[i:i+15], ' ') AS gram
          FROM toks, UNNEST(generate_series(1, len(ts) - 15)) AS u(i)
          WHERE len(ts) >= 16),
        marked AS (
          SELECT doc_id, pos,
                 COUNT(*) OVER (PARTITION BY gram) AS df,
                 ROW_NUMBER() OVER (PARTITION BY gram
                                    ORDER BY doc_id, pos) AS rn
          FROM grams),
        covered AS (
          SELECT DISTINCT doc_id, pos + j AS pos
          FROM marked, UNNEST(generate_series(0, 15)) AS g(j)
          WHERE df >= 2 AND rn > 1),
        tokpos AS (
          SELECT doc_id, i AS pos, ts[i] AS token
          FROM toks, UNNEST(generate_series(1, len(ts))) AS u(i)),
        kept AS (
          SELECT t.doc_id, t.pos, t.token
          FROM tokpos t
          ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos),
        rebuilt AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(token, ' ' ORDER BY pos) AS clean_text
          FROM kept GROUP BY doc_id)
        SELECT x.doc_id, CAST(len(x.ts) AS BIGINT) AS n_tokens,
               CAST(len(x.ts) - COALESCE(r.n_kept, 0) AS BIGINT)
                 AS n_removed,
               COALESCE(r.clean_text, '') AS clean_text
        FROM toks x LEFT JOIN rebuilt r ON x.doc_id = r.doc_id
    """,
}
