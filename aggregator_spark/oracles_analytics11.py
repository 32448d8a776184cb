"""DuckDB oracles for the round-10 fifth wave (analytics_queries11).

Fragment discipline: the perplexity gate's LM CTEs are the SAME
fragment as the hash-matched ``bigram_logprob`` oracle
(oracles_analytics10), re-composed; the ingest-dedup oracle is the
plain anti-join the bloom path must equal; the priority-sample oracle
repeats the exact integer priority formula (BIGINT // — no floats).
"""

from __future__ import annotations

from aggregator_spark.analytics_queries11 import (
    LENGTH_PCTS,
    PREFIX_TOKENS,
    PRIORITY_PER_SOURCE_K,
    PRIORITY_SAMPLE_K,
    _U32,
)
from aggregator_spark.llm_queries import NEW_BATCH_MOD
from aggregator_spark.operators.corpus import BIGRAM_LAMBDA
from aggregator_spark.oracles_llm import LLM_ORACLES, NORM, _hex8_to_bigint

# the bigram-LM per-doc nll, verbatim from the bigram_logprob oracle
_BIGRAM_NLL_CTES = f"""
        toks AS (
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
        fst AS (SELECT w1, SUM(c_big) AS c_w1 FROM big GROUP BY w1),
        nll AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 round(AVG(-ln({BIGRAM_LAMBDA} * (c_big / c_w1)
                             + {1.0 - BIGRAM_LAMBDA} * (c_w2 / n_total))),
                       6) AS nll
          FROM occ JOIN big USING (w1, w2) JOIN fst USING (w1)
               JOIN uni USING (w2) CROSS JOIN tot
          GROUP BY doc_id)
"""

_PRIORITY = (
    f"(CAST(n_chars AS BIGINT) * {_U32}) // "
    f"({_hex8_to_bigint('md5(CAST(doc_id AS VARCHAR))')} + 1)"
)

ANALYTICS11_ORACLES = {
    # plain per-language NTILE(3) window over nll ASC, doc_id — the
    # bit-parity target of the bounded-rank plan
    "perplexity_gate": f"""
        WITH {_BIGRAM_NLL_CTES},
        tiled AS (
          SELECT n.doc_id, d.lang, n.n_bigrams, n.nll,
                 ntile(3) OVER (PARTITION BY d.lang
                                ORDER BY n.nll ASC, n.doc_id) AS t
          FROM nll n JOIN documents d ON n.doc_id = d.doc_id)
        SELECT doc_id, lang, n_bigrams, nll,
               CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                      ELSE 'tail' END AS bucket,
               (t <= 2) AS keep
        FROM tiled
    """,
    "priority_sample": f"""
        WITH pr AS (
          SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
                 CAST({_PRIORITY} AS BIGINT) AS priority
          FROM documents),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id)
                    AS rn
          FROM pr),
        tau AS (
          SELECT max(CASE WHEN rn = {PRIORITY_SAMPLE_K + 1}
                          THEN priority END) AS tau
          FROM rk)
        SELECT r.doc_id, r.source, r.weight, r.priority,
               CAST(r.rn AS INT) AS rk,
               CAST(greatest(r.weight, COALESCE(t.tau, 0)) AS BIGINT)
                 AS est_weight
        FROM rk r CROSS JOIN tau t
        WHERE r.rn <= {PRIORITY_SAMPLE_K}
    """,
    # the bloom path must EQUAL the plain anti-join verdict; the key
    # is the lede fingerprint (first PREFIX_TOKENS normalized tokens)
    "dedup_bloom_ingest": f"""
        WITH fps AS (
          SELECT doc_id,
                 md5(array_to_string(
                       (string_split({NORM}, ' '))[1:{PREFIX_TOKENS}],
                       ' ')) AS fp
          FROM documents),
        corpus AS (
          SELECT DISTINCT fp FROM fps
          WHERE doc_id % {NEW_BATCH_MOD} <> 0),
        batch AS (
          SELECT doc_id, fp FROM fps
          WHERE doc_id % {NEW_BATCH_MOD} = 0)
        SELECT b.doc_id, (c.fp IS NULL) AS is_new
        FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
    """,
    # per-source plain window — the bit-parity target of the two-phase
    # topk_per_group plan; same integer priority formula
    "priority_sample_per_source": f"""
        WITH pr AS (
          SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
                 CAST({_PRIORITY} AS BIGINT) AS priority
          FROM documents),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY priority DESC, doc_id)
                    AS rn
          FROM pr),
        tau AS (
          SELECT source,
                 max(CASE WHEN rn = {PRIORITY_PER_SOURCE_K + 1}
                          THEN priority END) AS tau
          FROM rk GROUP BY source)
        SELECT r.doc_id, r.source, r.weight, r.priority,
               CAST(r.rn AS INT) AS rk,
               CAST(greatest(r.weight, COALESCE(t.tau, 0)) AS BIGINT)
                 AS est_weight
        FROM rk r JOIN tau t USING (source)
        WHERE r.rn <= {PRIORITY_PER_SOURCE_K}
    """,
    "lang_id_confusion": f"""
        WITH p AS (
          SELECT d.lang, l.lang_pred
          FROM documents d
          JOIN ({{LANG_ID}}) l USING (doc_id)),
        cells AS (
          SELECT lang, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
        tot AS (SELECT lang, COUNT(*) AS t FROM p GROUP BY 1)
        SELECT c.lang, c.lang_pred, CAST(c.n AS BIGINT) AS n_docs,
               round(c.n / t.t, 6) AS share,
               (c.lang = c.lang_pred) AS is_match
        FROM cells c JOIN tot t USING (lang)
    """,
}

_PCT_CASES = ",\n               ".join(
    f"max(CASE WHEN p = ({k} * n + 99) // 100 THEN n_chars END) AS p{k}"
    for k in LENGTH_PCTS
)

# PERCENTILE_DISC via the explicit closed form (ascending position
# ceil(k*n/100), integer //) — deliberately NOT quantile_disc, whose
# rounding convention would have to be trusted to match; this is the
# same position arithmetic the Spark plan runs
ANALYTICS11_ORACLES["length_percentiles_exact"] = """
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS p,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {cases}
    FROM r GROUP BY source
""".format(cases=_PCT_CASES)

# the container round-trip: payload bytes are the utf-8 text, so
# strlen (DuckDB: VARCHAR byte length) and md5 (hashes utf-8 bytes)
# pin the binary payloads exactly
ANALYTICS11_ORACLES["warclite_scan"] = """
    SELECT 'text/' || lang AS mime,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_payloads
    FROM documents GROUP BY 1
"""

# the container-fed multimodal twin runs the IDENTICAL decode plan
# over the archived payloads, so its oracle IS media_features' (the
# quality_percentile_bucketed same-oracle-object precedent)
from aggregator_spark.oracles_analytics4 import ANALYTICS4_ORACLES  # noqa: E402

ANALYTICS11_ORACLES["media_archive_features"] = ANALYTICS4_ORACLES[
    "media_features"
]

# splice the shared lang_id fragment in (a plain replace keeps the
# big f-string above readable)
ANALYTICS11_ORACLES["lang_id_confusion"] = ANALYTICS11_ORACLES[
    "lang_id_confusion"
].replace("{LANG_ID}", LLM_ORACLES["lang_id"])
