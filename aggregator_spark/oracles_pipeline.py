"""DuckDB oracle for the composed corpus-preparation pipeline
(``corpus_prepare_e2e`` — llm_queries.q_corpus_prepare_e2e).

The oracle is assembled from the SAME SQL fragments that already
hash-match each stage on its own (keep-list verdict, MinHash-LSH fuzzy
dedup, span-removal rewrite, chunk + pack), re-targeted at the
upstream stage's output instead of the raw ``documents`` table — so
the composition can never drift from its graded parts. Fragments are
re-targeted by a controlled ``FROM documents`` substitution; the
asserts below fail the import if a fragment's shape changes."""

from __future__ import annotations

from aggregator_spark.llm_queries import (
    DECONTAM_MOD,
    DECONTAM_N,
    DUP_FRAC_MAX,
    DUP_SPAN_N,
    JACCARD_THRESHOLD,
    NEW_BATCH_MOD,
    SPLIT_TEST_N,
    SPLIT_VAL_N,
    WATERFILL_BUDGET_FRAC,
)
from aggregator_spark.operators.corpus import (
    DEFAULT_PACK_BUDGET,
    DEFAULT_PACK_GROUPS,
)
from aggregator_spark.oracles_analytics10 import ANALYTICS10_ORACLES
from aggregator_spark.oracles_llm import (
    LLM_ORACLES,
    WORD_TOKS,
    _BAND_SELECTS,
    _CHUNKS,
    _MH_COLS,
    _SHINGLES,
)


def _retarget(
    fragment: str, new_src: str, expect: int = 1, src: str = "documents"
) -> str:
    """Point a fragment's ``FROM <src>`` at an upstream CTE."""
    n = fragment.count(f"FROM {src}")
    assert n == expect, f"fragment shape changed: {n} != {expect}"
    return fragment.replace(f"FROM {src}", f"FROM {new_src}")


# fuzzy-dedup signature CTEs over the quality survivors
_SH_Q = _retarget(_SHINGLES, "qsurv")
# span-removal rewrite over the fuzzy-kept corpus (df within kept set)
_SPAN_KEPT = _retarget(ANALYTICS10_ORACLES["dedup_span_rewrite"], "fkept")
# chunking over the non-empty rewritten text
_CHUNKS_RW = _retarget(_CHUNKS, "src2")

PIPELINE_ORACLES = {
    "corpus_prepare_e2e": f"""
    WITH keepq AS ({LLM_ORACLES["corpus_keep_list"]}),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS (
      WITH RECURSIVE {_SH_Q},
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    fkept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN fz USING (doc_id)),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_KEPT})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
""",
}

# the allocation tail composed onto the prepared corpus
# (llm_queries.q_corpus_train_split_e2e): the corpus_prepare_e2e
# oracle reused verbatim as the upstream CTE, the waterfill fragment
# re-targeted at the packed stream's strata masses, the eval-split
# ranking applied to the selected docs — every piece is a fragment
# that already hash-matches on its own
from aggregator_spark.oracles_llm import (  # noqa: E402
    _hex8_to_bigint,
    waterfill_sql,
)

_WF_PACKED = waterfill_sql(
    """SELECT stratum, CAST(SUM(doc_tokens) AS BIGINT) AS mass
      FROM docmass GROUP BY stratum""",
    WATERFILL_BUDGET_FRAC,
)

PIPELINE_ORACLES["corpus_train_split_e2e"] = f"""
    WITH prep AS MATERIALIZED ({PIPELINE_ORACLES["corpus_prepare_e2e"]}),
    docmass AS MATERIALIZED (
      SELECT p.doc_id, d.source AS stratum,
             CAST(SUM(p.n_tokens) AS BIGINT) AS doc_tokens
      FROM prep p JOIN documents d USING (doc_id)
      GROUP BY p.doc_id, d.source),
    alloc AS (
      SELECT stratum, rate_micro FROM ({_WF_PACKED})),
    sel AS MATERIALIZED (
      SELECT m.doc_id, m.stratum, m.doc_tokens,
             ({_hex8_to_bigint("md5(CAST(m.doc_id AS VARCHAR))")}
               * 1000000 < a.rate_micro * 4294967296) AS selected
      FROM docmass m JOIN alloc a USING (stratum)),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY stratum
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM sel WHERE selected)
    SELECT s.doc_id, s.stratum, s.doc_tokens, s.selected,
           CASE WHEN r.rn IS NULL THEN NULL
                WHEN r.rn <= {SPLIT_VAL_N} THEN 'val'
                WHEN r.rn <= {SPLIT_VAL_N + SPLIT_TEST_N} THEN 'test'
                ELSE 'train' END AS split
    FROM sel s LEFT JOIN ranked r USING (doc_id)
"""

# ---------------------------------------------------------------------
# corpus_prepare_incremental (llm_queries.q_corpus_prepare_incremental):
# the steady-state batch-arrival job. The oracle FULLY RECOMPUTES what
# the Spark side reads from the persisted prepared-corpus index
# (sources/prepared_index.py): the survivor set of the previous run
# over the EXISTING corpus (quality keep-list + fuzzy dedup — the same
# fragments as corpus_prepare_e2e retargeted at the existing slice),
# the benchmark probe set, then the batch gate / incremental dedup /
# span-chunk-pack tail. Every heavy CTE is MATERIALIZED — DuckDB
# otherwise inlines multiply-referenced CTEs and the recursive
# component closure re-evaluates per reference (measured minutes → ~30 s
# on the train-split oracle).

# existing-corpus keep list: all six source refs (gopher, lang, contam
# toks+final, span toks+final) point at the existing slice — exactly
# what the previous full run saw when the corpus WAS the existing docs
_KEEP_EXISTING = _retarget(LLM_ORACLES["corpus_keep_list"], "existing", 6)
_GOPHER_B = _retarget(LLM_ORACLES["gopher_quality"], "batch")
_LANG_B = _retarget(LLM_ORACLES["lang_id"], "batch")
_SPAN_B = _retarget(LLM_ORACLES["dup_span_stats"], "batch", 2)
_SH_E = _retarget(_SHINGLES, "esurv")
_SH_U = _retarget(_SHINGLES, "uni")
_CHUNKS_B = _retarget(_CHUNKS, "srcb")


def _span_rewrite_incr_sql(
    batch_src: str, corpus_src: str, n: int = DUP_SPAN_N
) -> str:
    """Cross-corpus span rewrite over ``batch_src`` against the gram
    set of ``corpus_src`` (the SQL twin of
    dedup_span_rewrite(corpus_grams=...)): within-batch repeats keep
    their first (doc_id, pos) occurrence; grams present in the corpus
    are removed from the batch ENTIRELY. Yields (doc_id, n_tokens,
    n_removed, clean_text) for every batch doc."""
    wt = WORD_TOKS
    return f"""
    WITH btoks AS (
      SELECT doc_id, {wt} AS ts FROM {batch_src}),
    g AS (
      SELECT doc_id, i AS pos,
             array_to_string(ts[i:i+{n - 1}], ' ') AS gram
      FROM btoks, UNNEST(generate_series(1, len(ts) - {n - 1})) AS u(i)
      WHERE len(ts) >= {n}),
    eg AS (
      SELECT DISTINCT array_to_string(ts[i:i+{n - 1}], ' ') AS gram
      FROM (SELECT {wt} AS ts FROM {corpus_src}),
           UNNEST(generate_series(1, len(ts) - {n - 1})) AS u(i)
      WHERE len(ts) >= {n}),
    marked AS (
      SELECT doc_id, pos, gram,
             COUNT(*) OVER (PARTITION BY gram) AS df,
             ROW_NUMBER() OVER (PARTITION BY gram
                                ORDER BY doc_id, pos) AS rn
      FROM g),
    cov0 AS (
      SELECT doc_id, pos FROM marked WHERE df >= 2 AND rn > 1
      UNION
      SELECT g.doc_id, g.pos FROM g JOIN eg USING (gram)),
    covered AS (
      SELECT DISTINCT doc_id, pos + j AS pos
      FROM cov0, UNNEST(generate_series(0, {n - 1})) AS v(j)),
    tokpos AS (
      SELECT doc_id, i AS pos, ts[i] AS token
      FROM btoks, UNNEST(generate_series(1, len(ts))) AS u(i)),
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
    FROM btoks x LEFT JOIN rebuilt r ON x.doc_id = r.doc_id
"""

PIPELINE_ORACLES["corpus_prepare_incremental"] = f"""
    WITH existing AS MATERIALIZED (
      SELECT * FROM documents WHERE doc_id % {NEW_BATCH_MOD} <> 0),
    batch AS MATERIALIZED (
      SELECT * FROM documents WHERE doc_id % {NEW_BATCH_MOD} = 0),
    ekeep AS MATERIALIZED (
      SELECT doc_id FROM ({_KEEP_EXISTING}) WHERE keep),
    esurv AS MATERIALIZED (
      SELECT e.* FROM existing e JOIN ekeep USING (doc_id)),
    survivors AS MATERIALIZED (
      WITH RECURSIVE {_SH_E},
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
      SELECT q.doc_id FROM esurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    eprobes AS MATERIALIZED (
      SELECT DISTINCT array_to_string(ts[1:{DECONTAM_N}], ' ') AS probe
      FROM (SELECT doc_id, {WORD_TOKS} AS ts FROM existing) t
      WHERE doc_id % {DECONTAM_MOD} = 0 AND len(ts) >= {DECONTAM_N}),
    bcontam AS MATERIALIZED (
      WITH btoks AS (SELECT doc_id, {WORD_TOKS} AS ts FROM batch),
      grams AS (
        SELECT doc_id,
               array_to_string(ts[i:i+{DECONTAM_N - 1}], ' ') AS gram
        FROM btoks,
             UNNEST(generate_series(1, len(ts) - {DECONTAM_N - 1})) AS u(i)
        WHERE len(ts) >= {DECONTAM_N}),
      hits AS (
        SELECT DISTINCT g.doc_id
        FROM grams g JOIN eprobes p ON g.gram = p.probe)
      SELECT b.doc_id, (h.doc_id IS NOT NULL) AS contaminated
      FROM batch b LEFT JOIN hits h USING (doc_id)),
    bkeep AS MATERIALIZED (
      SELECT g.doc_id
      FROM (SELECT doc_id, gopher_pass FROM ({_GOPHER_B})) g
      JOIN (SELECT doc_id, lang_pred FROM ({_LANG_B})) l USING (doc_id)
      JOIN bcontam c USING (doc_id)
      JOIN (SELECT doc_id, dup_frac FROM ({_SPAN_B})) s USING (doc_id)
      WHERE g.gopher_pass AND l.lang_pred <> 'und'
        AND NOT c.contaminated AND s.dup_frac <= {DUP_FRAC_MAX}),
    uni AS MATERIALIZED (
      SELECT b.doc_id, b.text FROM batch b JOIN bkeep USING (doc_id)
      UNION ALL
      SELECT d.doc_id, d.text FROM documents d JOIN survivors USING (doc_id)),
    incr AS MATERIALIZED (
      WITH RECURSIVE {_SH_U},
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
        SELECT u.doc_id,
               COALESCE(c.component, u.doc_id) AS component,
               (u.doc_id % {NEW_BATCH_MOD} = 0) AS is_new
        FROM uni u LEFT JOIN comp c ON u.doc_id = c.node
        WHERE u.doc_id % {NEW_BATCH_MOD} = 0 OR c.node IS NOT NULL),
      flags AS (
        SELECT component,
               MAX(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS has_existing,
               MIN(CASE WHEN is_new THEN doc_id END) AS min_new
        FROM lab GROUP BY component)
      SELECT l.doc_id FROM lab l JOIN flags f USING (component)
      WHERE l.is_new AND f.has_existing = 0 AND l.doc_id = f.min_new),
    bkept AS MATERIALIZED (
      SELECT b.doc_id, b.text FROM batch b JOIN incr USING (doc_id)),
    sdocs AS MATERIALIZED (
      SELECT d.doc_id, d.text
      FROM documents d JOIN survivors USING (doc_id)),
    rewritten AS MATERIALIZED (
      SELECT doc_id, clean_text
      FROM ({_span_rewrite_incr_sql("bkept", "sdocs")})),
    srcb AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_B}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# standalone cross-corpus span rewrite (the stage in isolation, batch
# vs the raw existing slice — no survivor recursion, so the oracle is
# cheap enough to run per-SF in the sweep)
PIPELINE_ORACLES["span_rewrite_incremental"] = f"""
    WITH batch AS (
      SELECT * FROM documents WHERE doc_id % {NEW_BATCH_MOD} = 0),
    existing AS (
      SELECT * FROM documents WHERE doc_id % {NEW_BATCH_MOD} <> 0)
    SELECT * FROM ({_span_rewrite_incr_sql("batch", "existing")})
"""

# ---------------------------------------------------------------------
# corpus_prepare_line_e2e (llm_queries.q_corpus_prepare_line_e2e): the
# e2e pipeline with CCNet line-level boilerplate removal composed in
# between the keep decision and span removal. The line fragment is the
# SAME SQL object that hash-matches `line_dedup_rewrite` on its own,
# re-targeted at the fuzzy-kept corpus (fkeptd re-attaches the source
# column the fragment's segment CTE selects — it never reaches the
# rewrite output); segment df is counted WITHIN the kept set, exactly
# like the Spark side (line_dedup_rewrite receives the post-fuzzy
# corpus). Fully-boilerplate docs drop before the span stage, so their
# grams never count toward span df — same as the Spark filter.
_LINE_FKEPT = _retarget(LLM_ORACLES["line_dedup_rewrite"], "fkeptd", 2)
_SPAN_LINED = _retarget(ANALYTICS10_ORACLES["dedup_span_rewrite"], "lsrc")

PIPELINE_ORACLES["corpus_prepare_line_e2e"] = f"""
    WITH keepq AS ({LLM_ORACLES["corpus_keep_list"]}),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS MATERIALIZED (
      WITH RECURSIVE {_SH_Q},
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    fkeptd AS MATERIALIZED (
      SELECT d.doc_id, d.text, d.source
      FROM documents d JOIN fz USING (doc_id)),
    lined AS MATERIALIZED (
      {_LINE_FKEPT}),
    lsrc AS (
      SELECT doc_id, clean_text AS text FROM lined
      WHERE clean_text <> ''),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_LINED})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# ---------------------------------------------------------------------
# corpus_prepare_topp_e2e (llm_queries.q_corpus_prepare_topp_e2e): the
# e2e pipeline with the quality gate swapped for the per-source
# percentile gate — keepq becomes the quality_percentile fragment
# (keep_top), every downstream CTE is the base oracle verbatim. The
# Spark side runs the BUCKETED percentile form; it is bit-identical to
# the plain window (pytest-pinned), so the plain SQL is the oracle.
PIPELINE_ORACLES["corpus_prepare_topp_e2e"] = f"""
    WITH keepq AS (
      SELECT doc_id, keep_top AS keep
      FROM ({LLM_ORACLES["quality_percentile"]})),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS (
      WITH RECURSIVE {_SH_Q},
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    fkept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN fz USING (doc_id)),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_KEPT})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# ---------------------------------------------------------------------
# corpus_prepare_ppl_e2e (llm_queries.q_corpus_prepare_ppl_e2e): the
# e2e pipeline with the CCNet perplexity gate — keepq becomes the
# perplexity_gate fragment (keep = head+middle thirds per language;
# docs without an LM score are absent from the fragment and therefore
# dropped by the join, the CCNet behavior). Every downstream CTE is
# the base oracle verbatim.
from aggregator_spark.oracles_analytics11 import (  # noqa: E402
    ANALYTICS11_ORACLES,
)

PIPELINE_ORACLES["corpus_prepare_ppl_e2e"] = f"""
    WITH keepq AS (
      SELECT doc_id, keep
      FROM ({ANALYTICS11_ORACLES["perplexity_gate"]})),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS (
      WITH RECURSIVE {_SH_Q},
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    fkept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN fz USING (doc_id)),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_KEPT})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# ---------------------------------------------------------------------
# corpus_prepare_semantic_e2e (llm_queries.q_corpus_prepare_semantic_e2e):
# the e2e pipeline with the CAPACITY-BOUNDED SemDeDup stage composed in
# after fuzzy dedup. The semantic fragment is the SAME parametrized SQL
# that hash-matches `semantic_dedup_capped` on its own
# (oracles_llm.semdedup_capped_sql), re-targeted at the fuzzy
# survivors' embedding slice — centroids, cluster sizes and md5 cell
# split are all computed over the FILTERED set, exactly like the Spark
# side (semantic_dedup receives the post-fuzzy join). Docs without an
# embedding row pass untouched (drop-list anti-join, not an inner
# join). fz is now referenced twice (femb + fkept) → MATERIALIZED, per
# the DuckDB multiply-referenced-recursive-CTE trap.
from aggregator_spark.llm_queries import SEMDEDUP_CAP_E2E  # noqa: E402
from aggregator_spark.oracles_llm import semdedup_capped_sql  # noqa: E402

_SEM_FEMB = _retarget(
    semdedup_capped_sql(SEMDEDUP_CAP_E2E), "femb", 2, src="embeddings"
)

PIPELINE_ORACLES["corpus_prepare_semantic_e2e"] = f"""
    WITH keepq AS ({LLM_ORACLES["corpus_keep_list"]}),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS MATERIALIZED (
      WITH RECURSIVE {_SH_Q},
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    femb AS MATERIALIZED (
      SELECT e.* FROM embeddings e JOIN fz ON e.vec_id = fz.doc_id),
    semdrop AS MATERIALIZED (
      SELECT vec_id FROM ({_SEM_FEMB}) WHERE NOT keep),
    fkept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN fz USING (doc_id)
      ANTI JOIN semdrop s ON d.doc_id = s.vec_id),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_KEPT})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# ---------------------------------------------------------------------
# curriculum_ablation (llm_queries.q_curriculum_ablation): the staged-
# training readiness table — per (stratum, curriculum bin): doc count,
# quality-gate survivors, kept token mass, and the sequence count /
# fill ratio if the stage's kept docs were packed alone. Three
# already-hash-matched fragments composed: the curriculum NTILE, the
# keep-list conjunction, and the chunk CTEs with the pack window
# re-partitioned by (stratum, bin, pack_group).
PIPELINE_ORACLES["curriculum_ablation"] = f"""
    WITH q AS ({LLM_ORACLES["curriculum_bins"]}),
    keepq AS ({LLM_ORACLES["corpus_keep_list"]}),
    {_CHUNKS},
    kc AS (
      SELECT c.doc_id, c.chunk_id, c.n_tokens, q.stratum, q.bin,
             CAST(c.doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group
      FROM chunks c
      JOIN q USING (doc_id)
      JOIN keepq k USING (doc_id)
      WHERE k.keep),
    packed AS (
      SELECT stratum, bin, pack_group, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (
                    PARTITION BY stratum, bin, pack_group
                    ORDER BY doc_id, chunk_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin
      FROM kc),
    agg AS (
      SELECT stratum, bin,
             CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
             CAST(COUNT(DISTINCT CAST(pack_group AS BIGINT) * 1000000
                                 + seq_bin) AS BIGINT) AS n_seqs
      FROM packed GROUP BY stratum, bin),
    counts AS (
      SELECT q.stratum, q.bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
      FROM q JOIN keepq k USING (doc_id)
      GROUP BY q.stratum, q.bin)
    SELECT c.stratum, c.bin, c.n_docs, c.n_kept,
           COALESCE(a.kept_tokens, 0) AS kept_tokens,
           COALESCE(a.n_seqs, 0) AS n_seqs,
           CASE WHEN COALESCE(a.n_seqs, 0) = 0 THEN NULL
                ELSE CAST(floor(1000000 * a.kept_tokens
                           / (a.n_seqs * {DEFAULT_PACK_BUDGET}))
                       AS BIGINT) END AS util_micro
    FROM counts c LEFT JOIN agg a USING (stratum, bin)
"""


# ---------------------------------------------------------------------
# corpus_prepare_union_e2e (llm_queries.q_corpus_prepare_union_e2e):
# the e2e pipeline with the DEDUP stage widened to the union-candidate
# configuration — the fz closure takes verified-Jaccard edges UNION the
# simhash_near_dup pairs, BOTH families computed over the quality
# survivors (the simhash fragment re-targeted at qsurv, the same
# controlled substitution as the shingle CTEs); keepq and every
# downstream CTE are the base oracle verbatim. The simhash subquery is
# MATERIALIZED because the closure references edges multiply (the
# DuckDB CTE-inlining trap, dedup_fuzzy_keep_union precedent).
_SIMHASH_Q = _retarget(LLM_ORACLES["simhash_near_dup"], "qsurv")

PIPELINE_ORACLES["corpus_prepare_union_e2e"] = f"""
    WITH keepq AS ({LLM_ORACLES["corpus_keep_list"]}),
    qsurv AS (
      SELECT d.* FROM documents d JOIN keepq k USING (doc_id)
      WHERE k.keep),
    fz AS (
      WITH RECURSIVE {_SH_Q},
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
        SELECT doc_a, doc_b FROM ({_SIMHASH_Q})),
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
      SELECT q.doc_id FROM qsurv q LEFT JOIN comp c ON q.doc_id = c.node
      WHERE q.doc_id = COALESCE(c.component, q.doc_id)),
    fkept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN fz USING (doc_id)),
    rewritten AS (
      SELECT doc_id, clean_text FROM ({_SPAN_KEPT})),
    src2 AS (
      SELECT doc_id, clean_text AS text FROM rewritten
      WHERE clean_text <> ''),
    packed AS (
      WITH {_CHUNKS_RW}
      SELECT doc_id, chunk_id,
             CAST(doc_id % {DEFAULT_PACK_GROUPS} AS INT) AS pack_group,
             n_tokens
      FROM chunks)
    SELECT doc_id, chunk_id, pack_group,
           CAST(floor((SUM(n_tokens) OVER (
                  PARTITION BY pack_group ORDER BY doc_id, chunk_id
                  ROWS UNBOUNDED PRECEDING) - n_tokens)
                / {DEFAULT_PACK_BUDGET}) AS INT) AS seq_bin,
           n_tokens
    FROM packed
"""

# the base e2e oracle body from qsurv onward, reused verbatim by the
# dsir e2e (extracted once so a 5th copy of the 60-line CTE chain is
# not hand-maintained; asserts pin the extraction point)
_E2E_TAIL = PIPELINE_ORACLES["corpus_prepare_e2e"]
_E2E_TAIL = _E2E_TAIL[_E2E_TAIL.index("qsurv AS (") :]


# ---------------------------------------------------------------------
# dsir_gate (llm_queries.q_dsir_gate): DSIR selection — per-source
# top-p% by the hashed-unigram importance weight; the dsir_weights
# fragment reused verbatim, plain percent_rank window as the oracle of
# the two-level-carry bounded form (bit-identical by integer rank
# equality, the quality_percentile_continuous precedent).
from aggregator_spark.llm_queries import DSIR_TOP_FRAC  # noqa: E402

PIPELINE_ORACLES["dsir_gate"] = f"""
    WITH w AS ({ANALYTICS10_ORACLES["dsir_weights"]})
    SELECT w.doc_id, d.source, w.logw,
           round(percent_rank() OVER win, 6) AS pct_rank,
           (percent_rank() OVER win <= {DSIR_TOP_FRAC}) AS keep
    FROM w JOIN documents d USING (doc_id)
    WINDOW win AS (PARTITION BY d.source
                   ORDER BY w.logw DESC NULLS LAST, w.doc_id)
"""

# corpus_prepare_dsir_e2e: the e2e pipeline with the DSIR gate as
# keepq — every downstream CTE is the base oracle verbatim (the
# topp/ppl pattern).
PIPELINE_ORACLES["corpus_prepare_dsir_e2e"] = f"""
    WITH keepq AS (
      SELECT doc_id, keep
      FROM ({PIPELINE_ORACLES["dsir_gate"]})),
    {_E2E_TAIL}
"""
