"""DuckDB oracles for the LLM-pipeline catalog. Generated from the SAME
constants as the Spark operators (stopwords, language markers, shingle
width, hash seeds) so both engines evaluate literally the same function.

Escaping note: DuckDB regexp_replace needs the 'g' flag to replace all
occurrences (Spark's replaces all by default).
"""

from __future__ import annotations

from aggregator_spark.llm_queries import (
    ANN_K,
    ANN_QUERY_IDS,
    DECONTAM_MOD,
    DECONTAM_N,
    EMB_DUP_THRESHOLD,
    JACCARD_THRESHOLD,
    KMEANS_ITERATIONS,
    MAX_DF,
    MIX_DEFAULT,
    MIX_RATES,
)
from aggregator_spark.operators.corpus import (
    DEFAULT_CHUNK_STRIDE,
    DEFAULT_CHUNK_TOKENS,
    DEFAULT_PACK_BUDGET,
    DEFAULT_PACK_GROUPS,
)
from aggregator_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_MINHASHES,
    DEFAULT_SHINGLE,
)
from aggregator_spark.operators.text import (
    EMAIL_RE,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    LANG_MARKERS,
    PHONE_RE,
    STOPWORDS,
)

NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"

# the word tokenizer (operators/text.py:word_tokens) as DuckDB SQL —
# canonical definition; new oracles should use this, not a fresh copy
WORD_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')"
)
TOKS = r"string_split_regex(trim(text), '\s+')"
NOSPACE_LEN = r"length(regexp_replace(trim(text), '\s+', '', 'g'))"


def _in_list(values) -> str:
    return ", ".join(f"'{v}'" for v in values)


N = DEFAULT_SHINGLE
# shingle CTEs shared by jaccard/minhash/lsh (word n-grams over
# normalized text, distinct per doc, empty when fewer than N tokens)
_SHINGLES = f"""
    words AS (
      SELECT doc_id, string_split_regex({NORM}, '\\s+') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) < {N} THEN CAST([] AS VARCHAR[])
                  ELSE list_distinct(list_transform(
                         range(1, len(w) - {N - 2}),
                         i -> array_to_string(w[i:i+{N - 1}], ' ')))
             END AS shingles
      FROM words
    )
"""

_MH_COLS = ",\n             ".join(
    f"list_min(list_transform(shingles, s -> md5(s || '#{i}'))) AS mh_{i}"
    for i in range(DEFAULT_MINHASHES)
)

_ROWS_PER_BAND = DEFAULT_MINHASHES // DEFAULT_BANDS
# zero-shingle docs (all-NULL signatures) are excluded from banding on
# both sides — they have no shingle evidence (see lsh_candidate_pairs)
_BAND_SELECTS = "\n      UNION ALL\n".join(
    "      SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS bucket FROM sigs WHERE mh_0 IS NOT NULL".format(
        b=b,
        cols=", ".join(
            f"mh_{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(DEFAULT_BANDS)
)


def _simhash_votes() -> str:
    votes = []
    for p in range(16):
        nib = f"(strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1)"
        for b in range(4):
            i = p * 4 + b
            votes.append(
                f"SUM((((({nib} >> {b}) & 1) * 2) - 1) * cnt) AS v_{i}"
            )
    return ",\n             ".join(votes)


_SIMHASH_BITS = " || ".join(
    f"(CASE WHEN v_{i} >= 0 THEN '1' ELSE '0' END)" for i in range(64)
)

_LANG_SCORES = ",\n             ".join(
    f"len(list_filter({TOKS}, x -> x IN ({_in_list(m)}))) AS c_{lang}"
    for lang, m in LANG_MARKERS.items()
)
_LANG_BEST = "greatest(" + ", ".join(f"c_{l}" for l in LANG_MARKERS) + ")"
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN c_{l} > 0 AND c_{l} = {_LANG_BEST} THEN '{l}'"
        for l in LANG_MARKERS
    )
    + " ELSE 'und' END"
)

_COSINE = (
    "round(list_dot_product(qvec, vec)"
    " / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))), 6)"
)

_D1 = "CAST(1.0 AS DOUBLE)"
_D0 = "CAST(0.0 AS DOUBLE)"
# every literal cast to DOUBLE: DuckDB would otherwise run the arithmetic
# in DECIMAL (exact 0.70) while Spark runs doubles (0.7000000000000001)
_QUALITY = f"""
    SELECT doc_id,
           round(sw / n_tok, 6) AS stopword_ratio,
           CAST(0.4 AS DOUBLE) * (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN {_D1} ELSE {_D0} END)
         + CAST(0.3 AS DOUBLE) * (CASE WHEN sw / n_tok >= 0.05 AND sw / n_tok <= 0.6 THEN {_D1} ELSE {_D0} END)
         + CAST(0.3 AS DOUBLE) * (CASE WHEN atl >= 2.0 AND atl <= 12.0 THEN {_D1} ELSE {_D0} END)
           AS quality
    FROM (
      SELECT doc_id,
             len({TOKS}) AS n_tok,
             len(list_filter({TOKS}, x -> x IN ({_in_list(STOPWORDS)}))) AS sw,
             {NOSPACE_LEN} / len({TOKS}) AS atl
      FROM documents)
"""

LLM_ORACLES: dict[str, str] = {
    "token_stats": f"""
        SELECT doc_id,
               len({TOKS}) AS n_tokens,
               length(text) AS len_chars,
               round({NOSPACE_LEN} / len({TOKS}), 6) AS avg_token_len
        FROM documents
    """,
    "text_quality": _QUALITY,
    "lang_id": f"""
        SELECT doc_id, {_LANG_CASE} AS lang_pred
        FROM (SELECT doc_id, {_LANG_SCORES} FROM documents)
    """,
    "doc_fingerprint": f"""
        SELECT doc_id, md5({NORM}) AS fingerprint FROM documents
    """,
    "clean_text": r"""
        SELECT doc_id, clean, length(clean) AS clean_len FROM (
          SELECT doc_id,
                 lower(trim(regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '[^ -~]', ' ', 'g'),
                     '([!?.,;:])\1+', '\1', 'g'),
                   '\s+', ' ', 'g'))) AS clean
          FROM documents)
    """,
    "dedup_exact": f"""
        SELECT fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        FROM (SELECT doc_id, md5({NORM}) AS fingerprint FROM documents)
        GROUP BY fingerprint
    """,
    "ngram_jaccard_pairs": f"""
        WITH {_SHINGLES},
        ps AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ps GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM ps a JOIN ps b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT doc_a, doc_b,
                 round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b)
        WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "ngram_jaccard_capped": f"""
        WITH {_SHINGLES},
        ps0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        freq AS (SELECT shingle, COUNT(*) AS df FROM ps0 GROUP BY shingle),
        ps AS (SELECT doc_id, ps0.shingle FROM ps0
               JOIN freq ON ps0.shingle = freq.shingle
               WHERE df <= {MAX_DF}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM ps GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
          FROM ps a JOIN ps b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT doc_a, doc_b,
                 round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b)
        WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    "minhash_signatures": f"""
        WITH {_SHINGLES}
        SELECT doc_id,
             {_MH_COLS}
        FROM sh
    """,
    "minhash_lsh_pairs": f"""
        WITH {_SHINGLES},
        sigs AS (
          SELECT doc_id,
             {_MH_COLS}
          FROM sh),
        buckets AS (
{_BAND_SELECTS}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a
        JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
    """,
    "dedup_components": f"""
        WITH RECURSIVE {_SHINGLES},
        sigs AS (
          SELECT doc_id,
             {_MH_COLS}
          FROM sh),
        buckets AS (
{_BAND_SELECTS}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a
          JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION
          SELECT doc_b, doc_a FROM cand),
        reach(node, lab) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
        comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """,
    "simhash64": f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex({NORM}, '\\s+')) AS token
          FROM documents),
        cnt AS (
          SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        hashed AS (
          SELECT doc_id, cnt, md5(token) AS h FROM cnt),
        votes AS (
          SELECT doc_id,
             {_simhash_votes()}
          FROM hashed GROUP BY doc_id)
        SELECT doc_id, {_SIMHASH_BITS} AS simhash FROM votes
    """,
    "ann_topk": f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        q AS (
          SELECT vec_id AS query_id, vec AS qvec FROM base
          WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})),
        scored AS (
          SELECT query_id, b.vec_id AS neighbor_id, {_COSINE} AS cosine
          FROM base b CROSS JOIN q
          WHERE b.vec_id != q.query_id)
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored)
        WHERE rank <= {ANN_K}
    """,
    "embedding_near_dup": f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
        SELECT id_a, id_b, cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.vec, b.vec)
                   / (sqrt(list_dot_product(a.vec, a.vec))
                      * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
          FROM base a JOIN base b ON a.vec_id < b.vec_id)
        WHERE cosine >= {EMB_DUP_THRESHOLD}
    """,
}

# The star-algorithm variant computes the exact same labels as the
# propagation variant — one oracle, two implementations under test.
LLM_ORACLES["dedup_components_star"] = LLM_ORACLES["dedup_components"]


# ---- corpus-preparation pack (operators/corpus.py + gopher/pii) ----

_CK, _ST = DEFAULT_CHUNK_TOKENS, DEFAULT_CHUNK_STRIDE
# chunk CTE: 1-based starts 1, 1+stride, ... ≤ len(w); inclusive slice
# w[s : s+chunk-1]; mirrors the mapInPandas worker exactly
_CHUNKS = f"""
    words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) // {_ST} AS INT) AS chunk_id,
             array_to_string(w[s : s + {_CK - 1}], ' ') AS chunk_text,
             CAST(len(w[s : s + {_CK - 1}]) AS INT) AS n_tokens
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w), {_ST})) AS s
            FROM words))
"""

LLM_ORACLES["doc_chunks"] = f"""
    WITH {_CHUNKS}
    SELECT doc_id, chunk_id, chunk_text, n_tokens FROM chunks
"""

LLM_ORACLES["pack_sequences"] = f"""
    WITH {_CHUNKS}
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM (SELECT doc_id, chunk_id, n_tokens,
                 CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group
          FROM chunks)
"""

LLM_ORACLES["gopher_quality"] = f"""
    SELECT doc_id, n_words,
           round(nosp / n_words, 6) AS mean_word_len,
           round(alpha / n_words, 6) AS alpha_frac,
           round(nsym / n_words, 6) AS symbol_ratio,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND nosp / n_words >= {GOPHER_MIN_MEAN_WORD_LEN}
            AND nosp / n_words <= {GOPHER_MAX_MEAN_WORD_LEN}
            AND alpha / n_words >= {GOPHER_MIN_ALPHA_FRAC}
            AND nsym / n_words <= {GOPHER_MAX_SYMBOL_RATIO}) AS gopher_pass
    FROM (
      SELECT doc_id,
             CAST(len({TOKS}) AS BIGINT) AS n_words,
             {NOSPACE_LEN} AS nosp,
             CAST(len(list_filter({TOKS},
                  x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           + CAST((length(text) - length(replace(text, '...', ''))) / 3
                  AS BIGINT) AS nsym
      FROM documents)
"""

LLM_ORACLES["pii_redact"] = f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones
    FROM documents
"""

_MIX_CASE = (
    "CASE "
    + " ".join(
        "WHEN lang = '{l}' THEN '{t:02x}'".format(
            l=l, t=max(0, min(256, round(r * 256)))
        )
        for l, r in sorted(MIX_RATES.items())
    )
    + " ELSE '{t:02x}' END".format(t=max(0, min(256, round(MIX_DEFAULT * 256))))
)

LLM_ORACLES["stratified_sample"] = f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_MIX_CASE}
"""

LLM_ORACLES["embedding_normalize"] = """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    unit AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(vec, vec)) = 0 THEN vec
                  ELSE list_transform(vec,
                         x -> round(x / sqrt(list_dot_product(vec, vec)), 6))
             END AS uvec
      FROM base)
    SELECT vec_id,
           array_to_string(list_transform(uvec,
             x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)),
             ',') AS unit_vec
    FROM unit
"""

LLM_ORACLES["embedding_quantize"] = """
    SELECT vec_id,
           array_to_string(list_transform(vec,
             x -> CAST(CAST(floor(x * scale + 0.5) AS INT) AS VARCHAR)),
             ',') AS q_vec,
           round(scale, 6) AS scale
    FROM (
      SELECT vec_id, vec,
             CASE WHEN amax = 0 THEN CAST(0 AS DOUBLE)
                  ELSE 127.0 / amax END AS scale
      FROM (
        SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) AS amax
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
              FROM embeddings)))
"""

LLM_ORACLES["label_centroids"] = """
    SELECT label, CAST(dim AS INT) AS dim, round(AVG(x), 6) AS centroid
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             generate_subscripts(embedding, 1) - 1 AS dim
      FROM embeddings)
    GROUP BY label, dim
"""

LLM_ORACLES["kmeans_assign"] = """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    cent AS (
      SELECT c_label, list(m ORDER BY dim) AS cvec FROM (
        SELECT label AS c_label, dim, AVG(x) AS m
        FROM (SELECT label,
                     unnest(CAST(embedding AS DOUBLE[])) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY label, dim)
      GROUP BY c_label),
    scored AS (
      SELECT vec_id, c_label,
             round(list_distance(vec, cvec), 6) AS dist
      FROM base CROSS JOIN cent)
    SELECT vec_id, c_label AS assigned, dist
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY dist, c_label) AS rn
          FROM scored)
    WHERE rn = 1
"""

# product quantization (r10): label-initialized per-block codebooks
# (the kmeans_assign centroid CTE restricted to a dim block), nearest
# codeword per (vector, block) under round-6 L2 — fully deterministic,
# so the PQ pair is oracled (unlike the rows-only LSH/IVF routing).
# Spark's 0-based posexplode dim maps to (dim-1)/sub on DuckDB's
# 1-based generate_subscripts; sub-distance accumulation is the
# sequential list fold both engines share at round-6.
_PQ_SUB = 16  # 64 dims / PQ_BLOCKS=4
_PQ_CTES = f"""
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    cb AS (
      SELECT block, code, list(m ORDER BY dim) AS cvec FROM (
        SELECT CAST((dim - 1) // {_PQ_SUB} AS INT) AS block,
               label AS code, dim, AVG(x) AS m
        FROM (SELECT label,
                     unnest(CAST(embedding AS DOUBLE[])) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY 1, 2, 3)
      GROUP BY block, code),
    blk AS (
      SELECT vec_id, b.block,
             vec[1 + b.block * {_PQ_SUB} : (b.block + 1) * {_PQ_SUB}]
               AS subvec
      FROM base, (SELECT unnest(generate_series(0, 3)) AS block) b),
    enc AS (
      SELECT vec_id, block, code, dist FROM (
        SELECT blk.vec_id, blk.block, cb.code,
               round(list_distance(blk.subvec, cb.cvec), 6) AS dist,
               ROW_NUMBER() OVER (
                 PARTITION BY blk.vec_id, blk.block
                 ORDER BY round(list_distance(blk.subvec, cb.cvec), 6),
                          cb.code) AS rn
        FROM blk JOIN cb ON cb.block = blk.block)
      WHERE rn = 1)
"""

LLM_ORACLES["pq_encode"] = f"""
    WITH {_PQ_CTES}
    SELECT vec_id, CAST(block AS INT) AS block, code, dist FROM enc
"""

LLM_ORACLES["pq_adc_topk"] = f"""
    WITH {_PQ_CTES},
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})),
    qb AS (
      SELECT query_id, b.block,
             qvec[1 + b.block * {_PQ_SUB} : (b.block + 1) * {_PQ_SUB}]
               AS qsub
      FROM q, (SELECT unnest(generate_series(0, 3)) AS block) b),
    lut AS (
      SELECT query_id, cb.block, cb.code,
             CAST(round(list_sum(list_transform(
                    list_zip(qb.qsub, cb.cvec),
                    s -> (s[1] - s[2]) * (s[1] - s[2]))),
                  6) AS DECIMAL(30, 6)) AS d2
      FROM qb JOIN cb ON cb.block = qb.block),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id,
             round(sqrt(CAST(SUM(l.d2) AS DOUBLE)), 6) AS adc_dist
      FROM enc e JOIN lut l
        ON l.block = e.block AND l.code = e.code
      WHERE e.vec_id <> l.query_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= {ANN_K}
"""


# IVF-PQ (r11): the two deterministic fragments composed — cells are
# the kmeans_assign oracle VERBATIM (subquery), routing re-derives the
# same label centroids (raw AVG means, round-6 distance argmin, ties
# -> lowest cell), scoring is the pq_adc LUT restricted to the probed
# cells. NPROBE/ANN_K come from the same constants as the Spark side.
from aggregator_spark.llm_queries import IVFPQ_NPROBE  # noqa: E402

LLM_ORACLES["ann_topk_ivfpq"] = f"""
    WITH {_PQ_CTES},
    cent AS (
      SELECT c_label AS cell, list(m ORDER BY dim) AS cvec FROM (
        SELECT label AS c_label, dim, AVG(x) AS m
        FROM (SELECT label,
                     unnest(CAST(embedding AS DOUBLE[])) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY label, dim)
      GROUP BY c_label),
    cells AS (
      SELECT vec_id AS neighbor_id, assigned AS cell
      FROM ({LLM_ORACLES["kmeans_assign"]})),
    q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
      FROM embeddings
      WHERE vec_id IN ({", ".join(str(i) for i in ANN_QUERY_IDS)})),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY round(list_distance(q.qvec, cent.cvec), 6),
                          cent.cell) AS rn
        FROM q CROSS JOIN cent)
      WHERE rn <= {IVFPQ_NPROBE}),
    qb AS (
      SELECT query_id, b.block,
             qvec[1 + b.block * {_PQ_SUB} : (b.block + 1) * {_PQ_SUB}]
               AS qsub
      FROM q, (SELECT unnest(generate_series(0, 3)) AS block) b),
    lut AS (
      SELECT query_id, cb.block, cb.code,
             CAST(round(list_sum(list_transform(
                    list_zip(qb.qsub, cb.cvec),
                    s -> (s[1] - s[2]) * (s[1] - s[2]))),
                  6) AS DECIMAL(30, 6)) AS d2
      FROM qb JOIN cb ON cb.block = qb.block),
    scored AS (
      SELECT l.query_id, e.vec_id AS neighbor_id,
             round(sqrt(CAST(SUM(l.d2) AS DOUBLE)), 6) AS adc_dist
      FROM enc e
      JOIN cells c ON c.neighbor_id = e.vec_id
      JOIN probes p ON p.cell = c.cell
      JOIN lut l ON l.query_id = p.query_id
               AND l.block = e.block AND l.code = e.code
      WHERE e.vec_id <> l.query_id
      GROUP BY 1, 2)
    SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= {ANN_K}
"""


def _kmeans_unrolled_sql(iters: int) -> str:
    """Unroll `iters` Lloyd rounds as a CTE chain — the declarative
    twin of the iterative kmeans_fit loop."""
    parts = [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec"
        " FROM embeddings)",
        "a0 AS (SELECT vec_id, label AS assigned FROM embeddings)",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
      SELECT c_label, list(m ORDER BY dim) AS cvec FROM (
        SELECT a.assigned AS c_label, e.dim, AVG(e.x) AS m
        FROM (SELECT vec_id, unnest(vec) AS x,
                     generate_subscripts(vec, 1) AS dim FROM base) e
        JOIN a{i - 1} a USING (vec_id)
        GROUP BY c_label, e.dim)
      GROUP BY c_label)""")
        parts.append(f"""s{i} AS (
      SELECT vec_id, c_label, round(list_distance(vec, cvec), 6) AS dist
      FROM base CROSS JOIN c{i})""")
        parts.append(f"""a{i} AS (
      SELECT vec_id, c_label AS assigned, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY dist, c_label) AS rn FROM s{i})
      WHERE rn = 1)""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, assigned, dist FROM a{iters}"
    )


LLM_ORACLES["kmeans_fit"] = _kmeans_unrolled_sql(KMEANS_ITERATIONS)

LLM_ORACLES["unigram_logprob"] = f"""
    WITH occ AS (
      SELECT doc_id, unnest(string_split({NORM}, ' ')) AS token
      FROM documents),
    freq AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token),
    tot AS (SELECT SUM(cnt) AS total FROM freq)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(AVG(-ln(cnt / total)), 6) AS nll
    FROM occ JOIN freq USING (token) CROSS JOIN tot
    GROUP BY doc_id
"""

# benchmark decontamination: probes = first DECONTAM_N-gram of every
# DECONTAM_MOD-th doc; flag any doc containing any probe n-gram (same
# word tokenizer as the graph oracles: lower + split non-alphanumeric
# runs, empties dropped). Constants interpolated from llm_queries so
# the Spark query and its oracle can never desynchronize.
LLM_ORACLES["decontaminate_docs"] = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents),
    probes AS (
      SELECT DISTINCT array_to_string(ts[1:{DECONTAM_N}], ' ') AS probe
      FROM toks
      WHERE doc_id % {DECONTAM_MOD} = 0 AND len(ts) >= {DECONTAM_N}),
    grams AS (
      SELECT doc_id,
             array_to_string(ts[i:i+{DECONTAM_N - 1}], ' ') AS gram
      FROM toks,
           UNNEST(generate_series(1, len(ts) - {DECONTAM_N - 1}))
             AS u(i)
      WHERE len(ts) >= {DECONTAM_N}),
    hits AS (
      SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits
      FROM grams g JOIN probes p ON g.gram = p.probe
      GROUP BY g.doc_id)
    SELECT d.doc_id,
           (h.doc_id IS NOT NULL) AS contaminated,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""

# Gopher repetitious-text metrics: per-doc top n-gram char coverage
# (count x gram chars / doc chars; ties -> lexicographically smallest
# gram, matching the Spark sorted-run strict-> update) + dup-token frac
LLM_ORACLES["repetition_metrics"] = r"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents),
    g2 AS (
      SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
      WHERE len(ts) >= 2),
    b2 AS (
      SELECT doc_id, gram, c FROM (
        SELECT doc_id, gram, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, gram) AS rn
        FROM g2 GROUP BY doc_id, gram) WHERE rn = 1),
    g3 AS (
      SELECT doc_id, array_to_string(ts[i:i+2], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
      WHERE len(ts) >= 3),
    b3 AS (
      SELECT doc_id, gram, c FROM (
        SELECT doc_id, gram, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, gram) AS rn
        FROM g3 GROUP BY doc_id, gram) WHERE rn = 1)
    SELECT t.doc_id,
           round(CASE WHEN len(t.text) > 0 THEN
                 CAST(COALESCE(b2.c * len(b2.gram), 0) AS DOUBLE)
                 / len(t.text) ELSE 0.0 END, 6) AS rep2_frac,
           round(CASE WHEN len(t.text) > 0 THEN
                 CAST(COALESCE(b3.c * len(b3.gram), 0) AS DOUBLE)
                 / len(t.text) ELSE 0.0 END, 6) AS rep3_frac,
           round(CASE WHEN len(t.ts) > 0 THEN
                 1.0 - CAST(len(list_distinct(t.ts)) AS DOUBLE)
                 / len(t.ts) ELSE 0.0 END, 6) AS dup_token_frac
    FROM toks t
    LEFT JOIN b2 ON t.doc_id = b2.doc_id
    LEFT JOIN b3 ON t.doc_id = b3.doc_id
"""


# ---- round-7 additions: SemDeDup, end-to-end fuzzy dedup, mixing ----

from aggregator_spark.llm_queries import (  # noqa: E402
    SEMDEDUP_THRESHOLD,
    TEMP_TARGET,
)

# nearest-centroid assignment CTEs shared with the kmeans_assign oracle
_ASSIGN_CTES = """
    base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    cent AS (
      SELECT c_label, list(m ORDER BY dim) AS cvec FROM (
        SELECT label AS c_label, dim, AVG(x) AS m
        FROM (SELECT label,
                     unnest(CAST(embedding AS DOUBLE[])) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings)
        GROUP BY label, dim)
      GROUP BY c_label),
    scored AS (
      SELECT vec_id, c_label,
             round(list_distance(vec, cvec), 6) AS dist
      FROM base CROSS JOIN cent),
    asg AS (
      SELECT vec_id, c_label AS cluster
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY dist, c_label) AS rn
            FROM scored)
      WHERE rn = 1)
"""

LLM_ORACLES["semantic_dedup"] = f"""
    WITH {_ASSIGN_CTES},
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM asg a JOIN asg b
        ON a.cluster = b.cluster AND b.vec_id < a.vec_id
      JOIN base va ON va.vec_id = a.vec_id
      JOIN base vb ON vb.vec_id = b.vec_id
      WHERE round(list_dot_product(va.vec, vb.vec)
            / (sqrt(list_dot_product(va.vec, va.vec))
               * sqrt(list_dot_product(vb.vec, vb.vec))), 6)
            >= {SEMDEDUP_THRESHOLD})
    SELECT g.vec_id, g.cluster, (d.vec_id IS NULL) AS keep
    FROM asg g LEFT JOIN dropped d ON g.vec_id = d.vec_id
"""

# end-to-end fuzzy dedup: LSH candidates (same CTEs as dedup_components)
# -> exact-Jaccard verification over the distinct shingle sets -> same
# recursive-CTE transitive closure -> keep = (doc_id = component)
LLM_ORACLES["dedup_fuzzy_keep"] = f"""
    WITH RECURSIVE {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    ver AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.shingles, b.shingles)) AS ic,
               len(a.shingles) AS na, len(b.shingles) AS nb
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b)
      WHERE ic > 0
        AND round(CAST(ic AS DOUBLE) / (na + nb - ic), 6)
            >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
           (d.doc_id = COALESCE(c.component, d.doc_id)) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""

# SimHash near-dup pairs: the simhash64 oracle reused as a subquery,
# then the SAME 16-bit-band pigeonhole candidates + exact Hamming
# verify (DuckDB's hamming() over the 64-char bit strings ==
# bit_count(xor) over the halves on the Spark side)
LLM_ORACLES["simhash_near_dup"] = f"""
    WITH sh0 AS MATERIALIZED ({LLM_ORACLES["simhash64"]}),
    bands AS (
      SELECT doc_id, b.band,
             substr(simhash, 1 + 16 * b.band, 16) AS bucket
      FROM sh0, (SELECT unnest(generate_series(0, 3)) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(hamming(x.simhash, y.simhash) AS BIGINT) AS hamming
    FROM cand c
    JOIN sh0 x ON x.doc_id = c.doc_a
    JOIN sh0 y ON y.doc_id = c.doc_b
    WHERE hamming(x.simhash, y.simhash) <= 3
"""

# quality-aware survivor selection: fuzzy components × gopher signals,
# one window — both fragments reused verbatim (materialized: the
# fuzzy oracle holds the recursive closure)
LLM_ORACLES["dedup_keep_best"] = f"""
    WITH comp AS MATERIALIZED ({LLM_ORACLES["dedup_fuzzy_keep"]}),
    g AS MATERIALIZED ({LLM_ORACLES["gopher_quality"]})
    SELECT c.doc_id, c.component, g.gopher_pass, g.n_words,
           (row_number() OVER (PARTITION BY c.component
              ORDER BY g.gopher_pass DESC, g.n_words DESC, c.doc_id)
            = 1) AS keep_best
    FROM comp c JOIN g ON g.doc_id = c.doc_id
"""

# union-candidate fuzzy dedup: the SAME verified-Jaccard edges as
# dedup_fuzzy_keep UNION the simhash_near_dup pairs (both fragments'
# CTE bodies reused), then the SAME recursive transitive closure. The
# simhash oracle embeds as a materialized subquery (its own WITH is
# nested scope; materialized because the closure references edges
# multiply — the DuckDB CTE-inlining trap).
LLM_ORACLES["dedup_fuzzy_keep_union"] = f"""
    WITH RECURSIVE {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    ver AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.shingles, b.shingles)) AS ic,
               len(a.shingles) AS na, len(b.shingles) AS nb
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b)
      WHERE ic > 0
        AND round(CAST(ic AS DOUBLE) / (na + nb - ic), 6)
            >= {JACCARD_THRESHOLD}),
    sim AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({LLM_ORACLES["simhash_near_dup"]})),
    uni AS (
      SELECT doc_a, doc_b FROM ver
      UNION
      SELECT doc_a, doc_b FROM sim),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM uni
      UNION
      SELECT doc_b, doc_a FROM uni),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
           (d.doc_id = COALESCE(c.component, d.doc_id)) AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""

# candidate-family overlap: the verified-Jaccard edge CTEs + the
# simhash pair subquery, full-outer joined, one global rollup
LLM_ORACLES["dedup_family_overlap"] = f"""
    WITH {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    ver AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.shingles, b.shingles)) AS ic,
               len(a.shingles) AS na, len(b.shingles) AS nb
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b)
      WHERE ic > 0
        AND round(CAST(ic AS DOUBLE) / (na + nb - ic), 6)
            >= {JACCARD_THRESHOLD}),
    sim AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({LLM_ORACLES["simhash_near_dup"]})),
    j AS (SELECT doc_a, doc_b, 1 AS in_jac FROM ver),
    s AS (SELECT doc_a, doc_b, 1 AS in_sim FROM sim),
    fo AS (
      SELECT COALESCE(j.in_jac, NULL) AS in_jac, s.in_sim
      FROM j FULL OUTER JOIN s USING (doc_a, doc_b))
    SELECT CAST(COUNT(in_jac) AS BIGINT) AS n_jaccard,
           CAST(COUNT(in_sim) AS BIGINT) AS n_simhash,
           CAST(SUM(CASE WHEN in_jac IS NOT NULL AND in_sim IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(SUM(CASE WHEN in_jac IS NOT NULL AND in_sim IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_jaccard_only,
           CAST(SUM(CASE WHEN in_jac IS NULL AND in_sim IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash_only,
           CAST(COUNT(*) AS BIGINT) AS n_union
    FROM fo
"""

# per-source contamination report: the decontaminate_docs oracle reused
# verbatim as a subquery, rolled up by source
LLM_ORACLES["contamination_by_source"] = f"""
    WITH flags AS MATERIALIZED ({LLM_ORACLES["decontaminate_docs"]})
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f.contaminated THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           round(CAST(SUM(CASE WHEN f.contaminated THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS contamination_rate,
           CAST(SUM(f.n_hits) AS BIGINT) AS n_hits
    FROM documents d JOIN flags f ON d.doc_id = f.doc_id
    GROUP BY d.source
"""

# cluster-size histogram over the SAME fuzzy-dedup components — the
# fuzzy-keep oracle reused verbatim as a subquery, then two GROUP BYs
LLM_ORACLES["dedup_cluster_sizes"] = f"""
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM (
      SELECT component, COUNT(*) AS cluster_size
      FROM ({LLM_ORACLES["dedup_fuzzy_keep"]})
      GROUP BY component)
    GROUP BY cluster_size
"""

# water-filling token-budget allocation: the SAME int64 algorithm as
# operators/corpus.py:token_budget_waterfill, CTE for CTE (sorted
# prefix sums -> unique integer water level -> remainder distribution).
# Parameterized on the (stratum, mass) SELECT and the budget fraction
# (interpolated from llm_queries.WATERFILL_BUDGET_FRAC like RRF_K /
# SPLIT_VAL_N, so one constant drives both engines) — the composed
# train-split oracle re-targets the same fragment at the packed
# stream's masses.
from aggregator_spark.llm_queries import (  # noqa: E402
    WATERFILL_BUDGET_FRAC,
)


def waterfill_sql(masses_select: str, budget_frac: float) -> str:
    return f"""
    WITH masses AS ({masses_select}),
    base AS (
      SELECT stratum, mass,
             SUM(mass) OVER () AS total,
             COUNT(*) OVER () AS n,
             ROW_NUMBER() OVER (ORDER BY mass, stratum) - 1 AS i,
             COALESCE(SUM(mass) OVER (ORDER BY mass, stratum
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix,
             LAG(mass) OVER (ORDER BY mass, stratum) AS prev_mass
      FROM masses),
    b2 AS (
      SELECT *, CAST(floor(total * {budget_frac}) AS BIGINT) AS budget,
             (CAST(floor(total * {budget_frac}) AS BIGINT) - prefix)
               // (n - i) AS cand
      FROM base),
    lvl AS (
      SELECT MAX(CASE WHEN cand < mass
                       AND COALESCE(prev_mass <= cand, TRUE)
                 THEN cand END) AS level
      FROM b2),
    alloc AS (
      SELECT b.stratum, b.mass, b.budget,
             (l.level IS NOT NULL AND b.mass > l.level) AS capped,
             CASE WHEN l.level IS NOT NULL AND b.mass > l.level
                  THEN l.level ELSE b.mass END AS base_alloc
      FROM b2 b CROSS JOIN lvl l),
    a2 AS (
      SELECT *, budget - SUM(base_alloc) OVER () AS rem,
             SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER (
               ORDER BY mass, stratum ROWS UNBOUNDED PRECEDING)
               AS capped_rank
      FROM alloc)
    SELECT stratum, mass AS mass_tokens,
           CAST(base_alloc + CASE WHEN capped AND capped_rank <= rem
                                  THEN 1 ELSE 0 END AS BIGINT)
             AS allocated_tokens,
           CAST(floor(1000000 * (base_alloc
                  + CASE WHEN capped AND capped_rank <= rem
                         THEN 1 ELSE 0 END) / mass) AS BIGINT)
             AS rate_micro
    FROM a2
"""


LLM_ORACLES["mix_waterfill"] = waterfill_sql(
    f"""SELECT source AS stratum, CAST(SUM(len({TOKS})) AS BIGINT) AS mass
      FROM documents GROUP BY source""",
    WATERFILL_BUDGET_FRAC,
)

# bin-utilization report over the pack_sequences oracle, reused
# verbatim as a subquery
LLM_ORACLES["pack_efficiency"] = f"""
    SELECT pack_group,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(floor(1000000 * SUM(bin_tokens)
                / (COUNT(*) * {DEFAULT_PACK_BUDGET})) AS BIGINT)
             AS util_micro
    FROM (
      SELECT pack_group, seq_bin, SUM(n_tokens) AS bin_tokens
      FROM ({LLM_ORACLES["pack_sequences"]})
      GROUP BY pack_group, seq_bin)
    GROUP BY pack_group
"""

# exact-quota eval split: same md5 ordering, same rank cuts
from aggregator_spark.llm_queries import (  # noqa: E402
    SPLIT_TEST_N,
    SPLIT_VAL_N,
)

LLM_ORACLES["eval_split_quota"] = f"""
    SELECT doc_id, stratum,
           CASE WHEN rn <= {SPLIT_VAL_N} THEN 'val'
                WHEN rn <= {SPLIT_VAL_N + SPLIT_TEST_N} THEN 'test'
                ELSE 'train' END AS split
    FROM (
      SELECT doc_id, source AS stratum,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
"""


def _hex8_to_bigint(hexpr: str) -> str:
    """First-8-hex-digit value as an exact BIGINT (DuckDB has no conv)."""
    parts = [
        f"CAST(strpos('0123456789abcdef', substr({hexpr}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + "\n             + ".join(parts) + ")"


LLM_ORACLES["temperature_mix"] = f"""
    WITH w AS (
      SELECT source AS stratum, CAST(SUM(n_chars) AS BIGINT) AS mass,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source),
    wq AS (
      SELECT stratum, c,
             CAST(floor(sqrt(CAST(mass AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS wq
      FROM w),
    tot AS (
      SELECT CAST(SUM(wq) AS BIGINT) AS z,
             CAST(SUM(c) AS BIGINT) AS n_total
      FROM wq),
    r AS (
      SELECT stratum,
             least(CAST(1.0 AS DOUBLE),
                   CAST({TEMP_TARGET} AS DOUBLE)
                   * CAST(n_total AS DOUBLE) * CAST(wq AS DOUBLE)
                   / (CAST(z AS DOUBLE) * CAST(c AS DOUBLE))) AS thr
      FROM wq CROSS JOIN tot),
    dh AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h8
      FROM documents)
    SELECT dh.doc_id, dh.source AS stratum,
           (CAST({_hex8_to_bigint("dh.h8")} AS DOUBLE)
            / CAST(4294967296.0 AS DOUBLE) < r.thr) AS keep
    FROM dh JOIN r ON dh.source = r.stratum
"""


from aggregator_spark.llm_queries import DUP_SPAN_N  # noqa: E402

# cross-document duplicated spans: same word tokenizer as the
# decontamination oracle; a gram position is "dup" when its gram occurs
# in >= 2 distinct documents
LLM_ORACLES["dup_span_stats"] = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS ts
      FROM documents),
    g AS (
      SELECT doc_id,
             array_to_string(ts[i:i+{DUP_SPAN_N - 1}], ' ') AS gram
      FROM toks,
           UNNEST(generate_series(1, len(ts) - {DUP_SPAN_N - 1})) AS u(i)
      WHERE len(ts) >= {DUP_SPAN_N}),
    dup AS (
      SELECT gram FROM (
        SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram)
      WHERE df >= 2),
    nd AS (
      SELECT g.doc_id, COUNT(*) AS n_dup_spans
      FROM g JOIN dup ON g.gram = dup.gram
      GROUP BY g.doc_id),
    tot AS (
      SELECT doc_id, COUNT(*) AS n_spans FROM g GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(t.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(nd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CASE WHEN COALESCE(t.n_spans, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE round(COALESCE(nd.n_dup_spans, 0) / t.n_spans, 6)
           END AS dup_frac
    FROM documents d
    LEFT JOIN tot t ON d.doc_id = t.doc_id
    LEFT JOIN nd ON d.doc_id = nd.doc_id
"""


from aggregator_spark.llm_queries import DUP_FRAC_MAX  # noqa: E402

# quality-gate decision layer: conjunction of four already-oracled
# signals, each reused verbatim as a subquery so the composed oracle
# can never drift from its parts
LLM_ORACLES["corpus_keep_list"] = f"""
    SELECT g.doc_id, g.gopher_pass, l.lang_pred, c.contaminated,
           s.dup_frac,
           (g.gopher_pass AND l.lang_pred <> 'und'
            AND NOT c.contaminated
            AND s.dup_frac <= {DUP_FRAC_MAX}) AS keep
    FROM (SELECT doc_id, gopher_pass FROM ({LLM_ORACLES["gopher_quality"]})) g
    JOIN (SELECT doc_id, lang_pred FROM ({LLM_ORACLES["lang_id"]})) l
      USING (doc_id)
    JOIN (SELECT doc_id, contaminated
          FROM ({LLM_ORACLES["decontaminate_docs"]})) c USING (doc_id)
    JOIN (SELECT doc_id, dup_frac
          FROM ({LLM_ORACLES["dup_span_stats"]})) s USING (doc_id)
"""


from aggregator_spark.llm_queries import NEW_BATCH_MOD  # noqa: E402

# incremental fuzzy dedup: same signature/banding CTEs, but candidate
# pairs are restricted to those touching the "new batch"
# (doc_id % NEW_BATCH_MOD = 0) — existing x existing pairs are never
# formed — then the same exact-Jaccard verify and transitive closure
# over the touched subgraph; output rows are the NEW docs only
LLM_ORACLES["dedup_incremental"] = f"""
    WITH RECURSIVE {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
                      greatest(a.doc_id, b.doc_id) AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id <> b.doc_id
        AND (a.doc_id % {NEW_BATCH_MOD} = 0
             OR b.doc_id % {NEW_BATCH_MOD} = 0)),
    ver AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.shingles, b.shingles)) AS ic,
               len(a.shingles) AS na, len(b.shingles) AS nb
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b)
      WHERE ic > 0
        AND round(CAST(ic AS DOUBLE) / (na + nb - ic), 6)
            >= {JACCARD_THRESHOLD}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    lab AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             (d.doc_id % {NEW_BATCH_MOD} = 0) AS is_new
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
      WHERE d.doc_id % {NEW_BATCH_MOD} = 0 OR c.node IS NOT NULL),
    flags AS (
      SELECT component,
             MAX(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS has_existing,
             MIN(CASE WHEN is_new THEN doc_id END) AS min_new
      FROM lab GROUP BY component)
    SELECT l.doc_id, l.component,
           (f.has_existing = 1) AS matched_existing,
           (f.has_existing = 0 AND l.doc_id = f.min_new) AS keep
    FROM lab l JOIN flags f USING (component)
    WHERE l.is_new
    ORDER BY l.doc_id
"""


from aggregator_spark.llm_queries import CONTAINMENT_THRESHOLD  # noqa: E402

# asymmetric containment: same shingle CTEs as the jaccard baseline,
# denominator = the smaller shingle set
LLM_ORACLES["ngram_containment_pairs"] = f"""
    WITH {_SHINGLES},
    ps AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ps GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM ps a JOIN ps b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, containment FROM (
      SELECT doc_a, doc_b,
             round(n_common / least(sa.n, sb.n), 6) AS containment
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b)
    WHERE containment >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_a, doc_b
"""

# capacity-bounded semantic-dedup scale path (r8): same nearest-
# centroid assignment, clusters hash-split into ceil(size/cap) md5
# cells, comparisons within cells only — the per-task quadratic work
# is capacity-bounded however the corpus grows. Parametrized on cap
# so the composed pipeline (oracles_pipeline.py, cap=SEMDEDUP_CAP_E2E
# over the fuzzy survivors' embeddings) reuses the fragment verbatim.
from aggregator_spark.llm_queries import SEMDEDUP_CAP  # noqa: E402


def semdedup_capped_sql(cap: int) -> str:
    return f"""
    WITH {_ASSIGN_CTES},
    sizes AS (SELECT cluster, COUNT(*) AS c_n FROM asg GROUP BY cluster),
    cells AS (
      SELECT a.vec_id, a.cluster,
             CAST({_hex8_to_bigint("md5(CAST(a.vec_id AS VARCHAR))")}
                  % CAST(ceil(s.c_n / {cap}) AS BIGINT)
               AS INT) AS cell
      FROM asg a JOIN sizes s USING (cluster)),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM cells a JOIN cells b
        ON a.cluster = b.cluster AND a.cell = b.cell
       AND b.vec_id < a.vec_id
      JOIN base va ON va.vec_id = a.vec_id
      JOIN base vb ON vb.vec_id = b.vec_id
      WHERE round(list_dot_product(va.vec, vb.vec)
            / (sqrt(list_dot_product(va.vec, va.vec))
               * sqrt(list_dot_product(vb.vec, vb.vec))), 6)
            >= {SEMDEDUP_THRESHOLD})
    SELECT g.vec_id, g.cluster, (d.vec_id IS NULL) AS keep
    FROM cells g LEFT JOIN dropped d ON g.vec_id = d.vec_id
"""


LLM_ORACLES["semantic_dedup_capped"] = semdedup_capped_sql(SEMDEDUP_CAP)

# curriculum binning: the text_quality expression reused verbatim,
# per-stratum NTILE with explicit NULLS LAST (engine defaults differ)
from aggregator_spark.llm_queries import CURRICULUM_BINS  # noqa: E402

LLM_ORACLES["curriculum_bins"] = f"""
    SELECT q.doc_id, d.source AS stratum, q.quality,
           CAST(NTILE({CURRICULUM_BINS}) OVER (
                  PARTITION BY d.source
                  ORDER BY q.quality DESC NULLS LAST, q.doc_id)
             AS INT) AS bin
    FROM ({_QUALITY}) q JOIN documents d USING (doc_id)
"""

# per-source quality percentile gate: the same text_quality expression,
# percent_rank over a total order (quality DESC, doc_id) — both engines
# compute (rank-1)/(n-1) in doubles over identical orderings, so the
# unrounded keep_top comparison is deterministic
from aggregator_spark.llm_queries import QUALITY_TOP_FRAC  # noqa: E402

LLM_ORACLES["quality_percentile"] = f"""
    SELECT q.doc_id, d.source, q.quality,
           round(percent_rank() OVER w, 6) AS pct_rank,
           (percent_rank() OVER w <= {QUALITY_TOP_FRAC}) AS keep_top
    FROM ({_QUALITY}) q JOIN documents d USING (doc_id)
    WINDOW w AS (PARTITION BY d.source
                 ORDER BY q.quality DESC NULLS LAST, q.doc_id)
"""

# the bucketed twin computes the SAME doubles (integer rank equality),
# so it shares the oracle SQL OBJECT — the variant_json_stats twin
# precedent
LLM_ORACLES["quality_percentile_bucketed"] = LLM_ORACLES[
    "quality_percentile"
]

# the continuous-score percentile gate (r10): the two-level-carry
# bucketed form computes the SAME doubles as the plain window, so the
# oracle IS the plain window over the continuous score
LLM_ORACLES["quality_percentile_continuous"] = f"""
    SELECT q.doc_id, d.source, round(q.cs, 6) AS cscore,
           round(percent_rank() OVER w, 6) AS pct_rank,
           (percent_rank() OVER w <= {QUALITY_TOP_FRAC}) AS keep_top
    FROM (SELECT doc_id, {NOSPACE_LEN} / len({TOKS}) AS cs
          FROM documents) q
    JOIN documents d USING (doc_id)
    WINDOW w AS (PARTITION BY d.source
                 ORDER BY q.cs DESC NULLS LAST, q.doc_id)
"""

# per-doc 3-gram novelty: corpus gram df computed once; df==1 grams
# attributed via MIN(doc_id) (the only owner), never joined back to the
# corpus-wide gram relation — same closed form as the Spark plan
LLM_ORACLES["ngram_novelty"] = f"""
    WITH {_SHINGLES},
    ps AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM ps GROUP BY doc_id),
    novel AS (
      SELECT doc_id, COUNT(*) AS n_novel FROM (
        SELECT MIN(doc_id) AS doc_id
        FROM ps GROUP BY shingle HAVING COUNT(*) = 1)
      GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(u.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(u.n_novel, 0)
                 / CAST(NULLIF(COALESCE(p.n_grams, 0), 0) AS DOUBLE),
                 6) AS novel_frac
    FROM documents d
    LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    LEFT JOIN novel u ON d.doc_id = u.doc_id
"""

# MinHash estimator calibration: signature-agreement estimate vs exact
# Jaccard on the SAME banded candidate pairs; est uses matches/k over
# the k md5 min-hashes (identical md5 math both engines)
_MH_MATCHES = " + ".join(
    f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END"
    for i in range(DEFAULT_MINHASHES)
)
LLM_ORACLES["minhash_est_accuracy"] = f"""
    WITH {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a
      JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    ps AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ps GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM ps a JOIN ps b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2),
    est AS (
      SELECT doc_a, doc_b,
             round(({_MH_MATCHES}) / {DEFAULT_MINHASHES}.0, 6)
               AS est_jaccard
      FROM cand
      JOIN sigs sa ON sa.doc_id = doc_a
      JOIN sigs sb ON sb.doc_id = doc_b),
    exact AS (
      SELECT doc_a, doc_b,
             round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b)
    SELECT e.doc_a, e.doc_b, e.est_jaccard, x.jaccard,
           round(abs(e.est_jaccard - x.jaccard), 6) AS abs_err
    FROM est e JOIN exact x
      ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
"""

# per-source Jensen-Shannon drift vs the whole-corpus unigram
# distribution (natural log); the residual-mass term folds every
# token absent from the source into 0.5*(1 - sum(q))*ln(2)
LLM_ORACLES["corpus_drift_js"] = r"""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents),
    st AS (SELECT source, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    gt AS (SELECT token, SUM(cnt) AS gcnt FROM st GROUP BY token),
    stot AS (SELECT source, SUM(cnt) AS s_total FROM st GROUP BY source),
    gtot AS (SELECT SUM(cnt) AS g_total FROM st),
    terms AS (
      SELECT st.source,
             st.cnt / CAST(s_total AS DOUBLE) AS p,
             gcnt / CAST(g_total AS DOUBLE) AS q,
             s_total
      FROM st
      JOIN gt USING (token)
      JOIN stot USING (source)
      CROSS JOIN gtot)
    SELECT source,
           CAST(MAX(s_total) AS BIGINT) AS n_tokens,
           ROUND(SUM(0.5 * (p * ln(2 * p / (p + q))
                            + q * ln(2 * q / (p + q))))
                 + 0.5 * (1 - SUM(q)) * ln(2), 6) AS js_div
    FROM terms
    GROUP BY source
"""


# per-source Heaps-law vocabulary growth: full vs doc-parity-half
# token/vocab counts and the implied exponent; same tokenizer as
# corpus_drift_js, ln on identical doubles both engines (the drift
# precedent), rounded to 6
LLM_ORACLES["vocab_growth"] = r"""
    WITH tok0 AS (
      SELECT source, doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents),
    tok AS (SELECT * FROM tok0 WHERE token <> ''),
    st AS (
      SELECT source, token, COUNT(*) AS cnt,
             SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS cnt_half
      FROM tok GROUP BY 1, 2),
    agg AS (
      SELECT source,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(cnt_half) AS BIGINT) AS n_tokens_half,
             CAST(SUM(CASE WHEN cnt_half > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_half
      FROM st GROUP BY source)
    SELECT source, n_tokens, vocab, n_tokens_half, vocab_half,
           CASE WHEN vocab_half > 0 AND n_tokens_half > 0
                     AND n_tokens <> n_tokens_half
                THEN round(ln(CAST(vocab AS DOUBLE) / vocab_half)
                           / ln(CAST(n_tokens AS DOUBLE) / n_tokens_half),
                           6)
           END AS heaps_beta
    FROM agg
"""


# line-level boilerplate dedup (CCNet §4.1): a SEGMENT (12 consecutive
# word tokens — the synthetic corpus's stand-in for a line) occurring
# in >= 3 distinct documents is boilerplate; ALL occurrences drop (no
# first-occurrence exception — repeated lines are chrome, not content)
# and each doc is rebuilt from its surviving segments in order. The
# Spark side counts df on xxhash64(seg); the oracle groups by the
# segment string — identical absent a 64-bit collision (the span-family
# trade, unobservable at oracle SFs).
_LINE_SEGS = f"""
    toks AS (SELECT doc_id, source, {WORD_TOKS} AS ts FROM documents),
    segs AS (
      SELECT doc_id, source,
             CAST((i - 1) / 12 AS BIGINT) AS seg_idx,
             array_to_string(ts[i:i+11], ' ') AS seg
      FROM toks, UNNEST(generate_series(1, len(ts), 12)) AS u(i)),
    boiler AS (
      SELECT seg FROM (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
      WHERE df >= 3)
"""

LLM_ORACLES["line_dedup_rewrite"] = f"""
    WITH {_LINE_SEGS},
    reb AS (
      SELECT s.doc_id,
             COUNT(*) AS n_segments,
             SUM(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END)
               AS n_removed,
             string_agg(CASE WHEN b.seg IS NULL THEN s.seg END, ' '
                        ORDER BY s.seg_idx) AS clean_text
      FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
      GROUP BY s.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(r.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           COALESCE(r.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN reb r ON d.doc_id = r.doc_id
"""

LLM_ORACLES["boilerplate_stats"] = f"""
    WITH {_LINE_SEGS}
    SELECT s.source,
           CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           ROUND(SUM(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
    FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
    GROUP BY s.source
"""
