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

from aggregator_spark.analytics_queries10 import (
    BM25_QUERIES,
    CLICK_WINDOW_SECONDS,
)
from aggregator_spark.operators.anomaly import MIN_PRIOR, SIGMAS
from aggregator_spark.operators.corpus import BIGRAM_LAMBDA, DSIR_BUCKETS
from aggregator_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    TOP_K,
    query_terms,
)
from aggregator_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH
from aggregator_spark.oracles_llm import NORM, WORD_TOKS, _hex8_to_bigint

_WORD_TOKS = WORD_TOKS

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

_CMS_ROWS = ", ".join(f"({r})" for r in range(CMS_DEPTH))
_CMS_BUCKET = (
    _hex8_to_bigint(
        "md5(CAST(row_ AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))"
    )
    + f" % {CMS_WIDTH}"
)

# the bucketed z-score is semantics-identical to the plain form —
# one oracle, two implementations under test (asof precedent)
ANALYTICS10_ORACLES["zscore_outliers_bucketed"] = ANALYTICS10_ORACLES[
    "zscore_outliers"
]

ANALYTICS10_ORACLES["cms_user_counts"] = f"""
    WITH rows_ AS (SELECT * FROM (VALUES {_CMS_ROWS}) AS r(row_)),
    occ AS (
      SELECT row_, {_CMS_BUCKET} AS bucket
      FROM events CROSS JOIN rows_ WHERE user_id IS NOT NULL),
    counters AS (
      SELECT row_, bucket, COUNT(*) AS cnt FROM occ GROUP BY row_, bucket),
    probe AS (
      SELECT user_id, row_, {_CMS_BUCKET} AS bucket
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
           CROSS JOIN rows_),
    est AS (
      SELECT p.user_id, MIN(c.cnt) AS est_cnt
      FROM probe p JOIN counters c
        ON p.row_ = c.row_ AND p.bucket = c.bucket
      GROUP BY p.user_id),
    tru AS (
      SELECT user_id, COUNT(*) AS true_cnt FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id)
    SELECT user_id, CAST(est_cnt AS BIGINT) AS est_cnt,
           CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(est_cnt - true_cnt AS BIGINT) AS overcount
    FROM est JOIN tru USING (user_id)
"""

_BM25_QTERMS = ", ".join(
    f"({qid}, '{term}')"
    for qid, qtext in BM25_QUERIES
    for term in query_terms(qtext)
)
_WORD_TOKS_D = _WORD_TOKS  # documents word tokenizer (shared above)

def _bm25_ranked_sql(top_k: int) -> str:
    """BM25 ranking SQL, parameterized on the rank cut — shared by the
    top-5 search entry and the RRF re-ranker's top-20 candidate pool
    (one ranking definition, two consumers)."""
    return f"""
    WITH toks AS (
      SELECT doc_id, {_WORD_TOKS_D} AS ts FROM documents),
    tf AS (
      SELECT doc_id, len(ts) AS dl, t AS term, COUNT(*) AS tf
      FROM toks, UNNEST(ts) AS u(t)
      GROUP BY doc_id, len(ts), t),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    -- corpus scalars from the postings (docs with >= 1 token), the
    -- same derivation the Spark side uses so an indexed-corpus serve
    -- needs nothing beyond the postings table
    sc AS (SELECT COUNT(*) AS n_docs, SUM(dl) / COUNT(*) AS avgdl
           FROM (SELECT DISTINCT doc_id, dl FROM tf)),
    q(query_id, term) AS (VALUES {_BM25_QTERMS}),
    contrib AS (
      SELECT q.query_id, tf.doc_id,
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * {BM25_K1 + 1.0})
               / (tf + {BM25_K1} * ({1.0 - BM25_B}
                                    + {BM25_B} * dl / avgdl)) AS part
      FROM tf JOIN q USING (term) JOIN dfq USING (term) CROSS JOIN sc),
    scored AS (
      SELECT query_id, doc_id, round(SUM(part), 6) AS score
      FROM contrib GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, CAST(rn AS INT) AS rank, score FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    WHERE rn <= {top_k}
"""


ANALYTICS10_ORACLES["bm25_search"] = _bm25_ranked_sql(TOP_K)

# RRF re-ranking: the BM25 top-RRF_POOL pool fused with the quality
# prior (oracles_llm._QUALITY — the text_quality entry's expression
# verbatim) by INTEGER micro-reciprocals, so rank fusion is exact
# int64 arithmetic on both engines
from aggregator_spark.analytics_queries10 import (  # noqa: E402
    RRF_K,
    RRF_POOL,
)
from aggregator_spark.oracles_llm import _QUALITY  # noqa: E402

ANALYTICS10_ORACLES["bm25_rrf_rerank"] = f"""
    WITH pool AS ({_bm25_ranked_sql(RRF_POOL)}),
    qual AS (SELECT doc_id, quality FROM ({_QUALITY})),
    ranked AS (
      SELECT p.query_id, p.doc_id, p.rank AS bm25_rank,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY q.quality DESC, p.doc_id) AS INT) AS quality_rank
      FROM pool p JOIN qual q USING (doc_id)),
    fused AS (
      SELECT query_id, doc_id, bm25_rank, quality_rank,
             CAST(1000000000 // (CAST({RRF_K} AS BIGINT) + bm25_rank)
                + 1000000000 // (CAST({RRF_K} AS BIGINT) + quality_rank)
               AS BIGINT) AS rrf_score
      FROM ranked)
    SELECT query_id, doc_id, bm25_rank, quality_rank, rrf_score,
           CAST(rn AS INT) AS final_rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY rrf_score DESC, bm25_rank, doc_id) AS rn
      FROM fused)
    WHERE rn <= {TOP_K}
"""

def _bpe_levels_sql(n_merges: int) -> str:
    """CTE chain for the unrolled BPE trainer (same discipline as the
    k-means oracle): w0 = word-frequency table with sentinel-string
    states; per round, p{i} counts adjacent symbol pairs, m{i} is the
    deterministic argmax, w{i} applies the merge as a literal
    replace-all (left-to-right non-overlapping == greedy BPE)."""
    parts = [
        f"""w0 AS (
      SELECT word,
             '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS state,
             freq
      FROM (SELECT word, COUNT(*) AS freq
            FROM (SELECT unnest({_WORD_TOKS}) AS word FROM documents)
            GROUP BY word))"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""p{i} AS (
      SELECT syms[j] AS l_sym, syms[j+1] AS r_sym,
             SUM(freq) AS pair_count
      FROM (SELECT list_filter(string_split(state, '|'), x -> x <> '')
                     AS syms,
                   freq
            FROM w{i - 1}),
           UNNEST(generate_series(1, len(syms) - 1)) AS u(j)
      WHERE len(syms) >= 2
      GROUP BY syms[j], syms[j+1])""")
        parts.append(f"""m{i} AS (
      SELECT l_sym, r_sym, l_sym || r_sym AS merged, pair_count
      FROM p{i} ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1)""")
        # LEFT JOIN ON TRUE, not a cross join: a round with no pair
        # left (degenerate corpus) yields an empty m{i}, and a cross
        # join would empty every later w{i} — the Spark trainer just
        # stops merging, so the oracle must pass states through
        parts.append(f"""w{i} AS (
      SELECT word,
             CASE WHEN m.l_sym IS NULL THEN state
                  ELSE replace(state,
                               '|' || m.l_sym || '||' || m.r_sym || '|',
                               '|' || m.l_sym || m.r_sym || '|') END
               AS state,
             freq
      FROM w{i - 1} LEFT JOIN m{i} m ON TRUE)""")
    return ",\n    ".join(parts)


def _bpe_merges_sql(n_merges: int) -> str:
    unions = "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l_sym, r_sym, merged,"
        f" CAST(pair_count AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_levels_sql(n_merges)}\n    {unions}"


def _bpe_encode_sql(n_merges: int) -> str:
    return f"""
    WITH {_bpe_levels_sql(n_merges)},
    enc AS (
      SELECT t.doc_id, t.i,
             list_filter(string_split(w.state, '|'), x -> x <> '')
               AS syms
      FROM (SELECT doc_id, j AS i, ts[j] AS word
            FROM (SELECT doc_id, {_WORD_TOKS} AS ts FROM documents),
                 UNNEST(generate_series(1, len(ts))) AS u(j)) t
      JOIN w{n_merges} w ON t.word = w.word)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(len(syms)) AS BIGINT) AS n_symbols,
           string_agg(array_to_string(syms, ' '), ' ' ORDER BY i)
             AS encoded
    FROM enc GROUP BY doc_id
"""


from aggregator_spark.operators.bpe import BPE_MERGES  # noqa: E402

ANALYTICS10_ORACLES["bpe_merges"] = _bpe_merges_sql(BPE_MERGES)
ANALYTICS10_ORACLES["bpe_encode_docs"] = _bpe_encode_sql(BPE_MERGES)

# per-source tokenizer-fit report: the encode fragment reused verbatim,
# joined back to documents for source + raw char length; MATERIALIZED
# because the merge-chain CTEs are heavy and DuckDB would inline them
ANALYTICS10_ORACLES["bpe_fertility"] = f"""
    WITH enc AS MATERIALIZED ({_bpe_encode_sql(BPE_MERGES)})
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(e.n_tokens) AS BIGINT) AS n_words,
           CAST(SUM(e.n_symbols) AS BIGINT) AS n_bpe_tokens,
           round(SUM(e.n_symbols) / CAST(SUM(e.n_tokens) AS DOUBLE), 6)
             AS fertility,
           round(SUM(length(d.text)) / CAST(SUM(e.n_symbols) AS DOUBLE), 6)
             AS chars_per_token
    FROM enc e JOIN documents d USING (doc_id)
    GROUP BY d.source
"""

from aggregator_spark.analytics_queries10 import (  # noqa: E402
    PMI_MIN_COUNT,
    PMI_TOP_K,
    PMI_WINDOW,
    SEMDECON_MOD,
    SEMDECON_THRESHOLD,
)

ANALYTICS10_ORACLES["semantic_decontaminate"] = f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    p AS (SELECT vec FROM base WHERE vec_id % {SEMDECON_MOD} = 0),
    c AS (SELECT vec_id, vec FROM base
          WHERE vec_id % {SEMDECON_MOD} <> 0),
    s AS (
      SELECT c.vec_id,
             MAX(round(list_dot_product(c.vec, p.vec)
                       / (sqrt(list_dot_product(c.vec, c.vec))
                          * sqrt(list_dot_product(p.vec, p.vec))),
                 6)) AS max_probe_cosine
      FROM c CROSS JOIN p GROUP BY c.vec_id)
    SELECT c.vec_id, s.max_probe_cosine,
           COALESCE(s.max_probe_cosine >= {SEMDECON_THRESHOLD}, FALSE)
             AS contaminated
    FROM c LEFT JOIN s ON c.vec_id = s.vec_id
"""

ANALYTICS10_ORACLES["pmi_collocations"] = f"""
    WITH toks AS (
      SELECT {_WORD_TOKS} AS ts FROM documents),
    pairs AS (
      SELECT least(ts[i], ts[i+d]) AS l_tok,
             greatest(ts[i], ts[i+d]) AS r_tok
      FROM toks,
           (VALUES {", ".join(f"({d})" for d in range(1, PMI_WINDOW + 1))})
             AS o(d),
           UNNEST(generate_series(1, len(ts) - d)) AS u(i)
      WHERE len(ts) > d AND ts[i] <> ts[i+d]),
    pc AS (
      SELECT l_tok, r_tok, COUNT(*) AS pair_count
      FROM pairs GROUP BY l_tok, r_tok
      HAVING COUNT(*) >= {PMI_MIN_COUNT}),
    uni AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY tok),
    tot AS (
      SELECT (SELECT SUM(pair_count) FROM pc) AS p_total,
             (SELECT SUM(c) FROM uni) AS n_total)
    SELECT l_tok, r_tok, CAST(pair_count AS BIGINT) AS pair_count,
           round(ln((pair_count / p_total)
                    / ((lu.c / n_total) * (ru.c / n_total))), 6) AS pmi
    FROM pc
    JOIN uni lu ON pc.l_tok = lu.tok
    JOIN uni ru ON pc.r_tok = ru.tok
    CROSS JOIN tot
    ORDER BY pmi DESC, l_tok, r_tok LIMIT {PMI_TOP_K}
"""

_DSIR_BUCKET = _hex8_to_bigint("md5(token)") + f" % {DSIR_BUCKETS}"

ANALYTICS10_ORACLES["dsir_weights"] = f"""
    WITH occ AS (
      SELECT doc_id, (lang = 'en') AS is_target,
             {_DSIR_BUCKET} AS bucket
      FROM (SELECT doc_id, lang,
                   unnest(string_split({NORM}, ' ')) AS token
            FROM documents)
      WHERE token <> ''),
    model AS (
      SELECT bucket, COUNT(*) AS c_raw,
             COUNT(CASE WHEN is_target THEN 1 END) AS c_tgt
      FROM occ GROUP BY bucket),
    tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM model),
    ratios AS (
      SELECT bucket,
             ln(CAST(c_tgt + 1 AS DOUBLE)
                / CAST(t_tgt + {DSIR_BUCKETS} AS DOUBLE))
           - ln(CAST(c_raw + 1 AS DOUBLE)
                / CAST(t_raw + {DSIR_BUCKETS} AS DOUBLE)) AS lr
      FROM model CROSS JOIN tot),
    w AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             round(SUM(lr), 6) AS logw
      FROM occ JOIN ratios USING (bucket) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(w.n_tokens, 0) AS BIGINT) AS n_tokens,
           COALESCE(w.logw, 0.0) AS logw
    FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
"""
