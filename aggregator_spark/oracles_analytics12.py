"""DuckDB oracles for the round-11 shard-emission wave. Built from the
SAME constants as the Spark side; the ranked CTE is one ROW_NUMBER —
the closed form the distributed bounded-rank plan must reproduce
bit-for-bit (md5-of-decimal-string order is engine-neutral: both
engines render a BIGINT as plain digits and compare lowercase hex
byte-wise)."""

from __future__ import annotations

from aggregator_spark.analytics_queries12 import N_SHARDS, SEQ_KEY_BASE
from aggregator_spark.oracles_llm import LLM_ORACLES
from aggregator_spark.oracles_pipeline import PIPELINE_ORACLES


def _seqs_ranked(src: str) -> str:
    """seqs+ranked CTE pair over any packed-stream relation ``src``
    (columns pack_group, seq_bin, n_tokens) — the sequence rollup and
    the hash-order ROW_NUMBER the shard closed form reads."""
    return f"""
    seqs AS (
      SELECT pack_group, seq_bin,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
             CAST(pack_group AS BIGINT) * {SEQ_KEY_BASE}
               + CAST(seq_bin AS BIGINT) AS seq_key
      FROM {src} GROUP BY 1, 2),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(seq_key AS VARCHAR)) DESC, seq_key
             ) - 1 AS r
      FROM seqs)
"""


_SHARD_SELECT = f"""
    SELECT pack_group, seq_bin, n_chunks, seq_tokens,
           CAST(r % {N_SHARDS} AS INT) AS shard_id,
           CAST(r // {N_SHARDS} AS BIGINT) AS shard_rank
    FROM ranked
"""

ANALYTICS12_ORACLES = {
    "corpus_shard_emit": f"""
        WITH packed AS ({LLM_ORACLES["pack_sequences"]}),
        {_seqs_ranked("packed")}
        {_SHARD_SELECT}
    """,
    "shard_manifest": f"""
        WITH packed AS ({LLM_ORACLES["pack_sequences"]}),
        {_seqs_ranked("packed")}
        SELECT CAST(r % {N_SHARDS} AS INT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_seqs,
               CAST(SUM(seq_tokens) AS BIGINT) AS shard_tokens,
               MIN(CASE WHEN r // {N_SHARDS} = 0 THEN seq_key END)
                 AS head_seq_key
        FROM ranked GROUP BY 1
    """,
    # the complete last mile: the base corpus_prepare_e2e oracle (all
    # its gate/dedup/span/pack CTEs verbatim, MATERIALIZED — the
    # recursive closure must not re-inline per reference) feeding the
    # SAME rollup + ROW_NUMBER closed form as corpus_shard_emit
    "corpus_prepare_shard_e2e": f"""
        WITH prep AS MATERIALIZED (
            {PIPELINE_ORACLES["corpus_prepare_e2e"]}),
        {_seqs_ranked("prep")}
        {_SHARD_SELECT}
    """,
}


# vocabulary scaling curve: first-occurrence closed form; checkpoint =
# integer-DIV bucket against the corpus max doc_id (both engines
# integer: Spark DIV, DuckDB //)
from aggregator_spark.analytics_queries12 import HEAPS_CKPTS, ZORDER_TILES
from aggregator_spark.oracles_llm import NORM

_K = HEAPS_CKPTS

ANALYTICS12_ORACLES["heaps_law_points"] = f"""
    WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
    tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id, unnest(string_split({NORM}, ' ')) AS token
        FROM documents)
      WHERE token <> ''),
    tp AS (
      SELECT LEAST(CAST(doc_id * {_K} // (mx + 1) AS INT), {_K - 1})
               AS ckpt, COUNT(*) AS c
      FROM tok CROSS JOIN mx GROUP BY 1),
    first AS (SELECT token, MIN(doc_id) AS doc_id FROM tok GROUP BY 1),
    vf AS (
      SELECT LEAST(CAST(doc_id * {_K} // (mx + 1) AS INT), {_K - 1})
               AS ckpt, COUNT(*) AS v
      FROM first CROSS JOIN mx GROUP BY 1),
    spine AS (SELECT unnest(generate_series(0, {_K - 1})) AS ckpt)
    SELECT CAST(s.ckpt AS INT) AS ckpt,
           CAST(SUM(COALESCE(tp.c, 0)) OVER (ORDER BY s.ckpt)
                AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(vf.v, 0)) OVER (ORDER BY s.ckpt)
                AS BIGINT) AS vocab_size
    FROM spine s
    LEFT JOIN tp ON tp.ckpt = s.ckpt
    LEFT JOIN vf ON vf.ckpt = s.ckpt
"""

# exact-quantile Morton keys: plain NTILE windows (the bounded form is
# bit-identical) + the same bit interleave in integer arithmetic
_ZSUM = " + ".join(
    f"((b_value >> {b}) & 1) * {1 << (2 * b)}"
    f" + ((b_user >> {b}) & 1) * {1 << (2 * b + 1)}"
    for b in range(4)
)

ANALYTICS12_ORACLES["zorder_layout_keys"] = f"""
    WITH v AS (
      SELECT event_id,
             NTILE({ZORDER_TILES}) OVER (
               ORDER BY value DESC NULLS LAST, event_id) - 1 AS b_value
      FROM events),
    u AS (
      SELECT event_id,
             NTILE({ZORDER_TILES}) OVER (
               ORDER BY user_id DESC NULLS LAST, event_id) - 1 AS b_user
      FROM events)
    SELECT v.event_id, CAST(b_value AS INT) AS b_value,
           CAST(b_user AS INT) AS b_user,
           CAST({_ZSUM} AS BIGINT) AS zkey
    FROM v JOIN u ON u.event_id = v.event_id
"""


# shard mixing evidence: the ranked CTE re-used, adjacency = seq_key+1
# (consecutive bins of one pack group; bins never straddle the 2^40
# group stride), co-location counted per shard
ANALYTICS12_ORACLES["shard_mixing_report"] = f"""
    WITH packed AS ({LLM_ORACLES["pack_sequences"]}),
    {_seqs_ranked("packed")},
    sh AS (
      SELECT seq_key, CAST(r % {N_SHARDS} AS INT) AS shard_id
      FROM ranked),
    co AS (
      SELECT a.shard_id, COUNT(*) AS adj_colocated
      FROM sh a JOIN sh b ON b.seq_key = a.seq_key + 1
      WHERE a.shard_id = b.shard_id
      GROUP BY 1)
    SELECT s.shard_id, CAST(COUNT(*) AS BIGINT) AS n_seqs,
           CAST(COALESCE(MIN(co.adj_colocated), 0) AS BIGINT)
             AS adj_colocated
    FROM sh s LEFT JOIN co ON co.shard_id = s.shard_id
    GROUP BY 1
"""


# ---- round-12: perceptual image near-dup dedup -----------------------
# The expected dHash per even fixture key is a CLOSED FORM of
# doc_id % 256 computed by the same codec functions the Spark workers
# run (operators/media_fixture.expected_dhash — the media_features
# oracle precedent), embedded as a VALUES lookup. Banding in SQL uses
# the single-block tables (_ORACLE_BANDS equal-width bands over the 64
# bits — pigeonhole-exact for hamming <= _ORACLE_BANDS - 1, same
# recall as the Spark side's 6-choose-3 Manku tables — both are
# candidate schemes verified by the same exact Hamming, so the PAIR
# sets are identical); components are the standard recursive closure.
# The radius is INTERPOLATED from the engine's constant and the
# exactness bound asserted here, so changing either side alone fails
# loudly at import instead of silently desynchronizing (ADVICE r12).

from aggregator_spark.operators.media_fixture import (  # noqa: E402
    dhash_lookup_values_sql,
)
from aggregator_spark.operators.multimodal import (  # noqa: E402
    MEDIA_MAX_HAMMING,
)

_ORACLE_BANDS = 4
assert 64 % _ORACLE_BANDS == 0, "bands must tile the 64-bit signature"
assert _ORACLE_BANDS > MEDIA_MAX_HAMMING, (
    f"the {_ORACLE_BANDS}-band single-block scheme is only "
    f"pigeonhole-exact for hamming <= {_ORACLE_BANDS - 1}; "
    f"MEDIA_MAX_HAMMING={MEDIA_MAX_HAMMING} needs more bands"
)
_BAND_W = 64 // _ORACLE_BANDS

_DHASH_SIG = f"""
    lk(k, dhash) AS (VALUES
{dhash_lookup_values_sql()}),
    sig AS (
      SELECT d.doc_id, l.dhash
      FROM documents d JOIN lk l ON d.doc_id % 256 = l.k
      WHERE d.doc_id % 2 = 0)
"""

_DHASH_EDGES = f"""
    rep AS (SELECT dhash, MIN(doc_id) AS rid FROM sig GROUP BY dhash),
    bands AS (
      SELECT rid, b.band,
             substr(dhash, 1 + {_BAND_W} * b.band, {_BAND_W}) AS bucket
      FROM rep,
           (SELECT unnest(generate_series(0, {_ORACLE_BANDS - 1}))
              AS band) b),
    cand AS (
      SELECT DISTINCT a.rid AS doc_a, b.rid AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.rid < b.rid),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             CAST(hamming(x.dhash, y.dhash) AS BIGINT) AS hamming
      FROM cand c
      JOIN rep x ON x.rid = c.doc_a
      JOIN rep y ON y.rid = c.doc_b
      WHERE hamming(x.dhash, y.dhash) <= {MEDIA_MAX_HAMMING})
"""

ANALYTICS12_ORACLES["image_dhash"] = f"""
    WITH {_DHASH_SIG}
    SELECT doc_id, dhash FROM sig
"""

ANALYTICS12_ORACLES["image_near_dup_pairs"] = f"""
    WITH {_DHASH_SIG},
    {_DHASH_EDGES}
    SELECT doc_a, doc_b, hamming FROM ver
"""

ANALYTICS12_ORACLES["image_near_dup_keep"] = f"""
    WITH RECURSIVE {_DHASH_SIG},
    {_DHASH_EDGES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    repc AS (
      SELECT r.dhash, COALESCE(c.component, r.rid) AS component
      FROM rep r LEFT JOIN comp c ON c.node = r.rid)
    SELECT s.doc_id, rc.component, (s.doc_id = rc.component) AS keep
    FROM sig s JOIN repc rc ON s.dhash = rc.dhash
"""


# ---- round-12 second wave: perceptual AUDIO near-dup dedup ----------
# Mirror of the image wave: expected spectral fingerprint per odd
# fixture key as a closed-form VALUES lookup (computed by the same
# codec functions), same SQL banding/closure.

from aggregator_spark.operators.media_fixture import (  # noqa: E402
    audio_fp_lookup_values_sql,
)

_AFP_SIG = f"""
    lk(k, afp) AS (VALUES
{audio_fp_lookup_values_sql()}),
    sig AS (
      SELECT d.doc_id, l.afp AS dhash
      FROM documents d JOIN lk l ON d.doc_id % 256 = l.k
      WHERE d.doc_id % 2 = 1)
"""

ANALYTICS12_ORACLES["audio_fingerprint"] = f"""
    WITH {_AFP_SIG}
    SELECT doc_id, dhash AS afp FROM sig
"""

# the keep oracle is the image one with the signature CTE swapped —
# sig aliases afp to "dhash" above precisely so the banding/closure
# fragment (_DHASH_EDGES + the same tail) reuses verbatim
ANALYTICS12_ORACLES["audio_near_dup_keep"] = f"""
    WITH RECURSIVE {_AFP_SIG},
    {_DHASH_EDGES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    repc AS (
      SELECT r.dhash, COALESCE(c.component, r.rid) AS component
      FROM rep r LEFT JOIN comp c ON c.node = r.rid)
    SELECT s.doc_id, rc.component, (s.doc_id = rc.component) AS keep
    FROM sig s JOIN repc rc ON s.dhash = rc.dhash
"""


# ---- round-12 third wave: perceptual VIDEO near-dup dedup -----------
# Signature set per video key = the sorted distinct dHashes of its
# SAMPLED frames (closed form — same demux/sample/hash functions,
# media_fixture.expected_video_fhashes); shared-frame evidence as the
# SAME hub-star edges the Spark side builds (one hub per frame hash,
# B-1 edges for a frame shared by B videos; closure over the stars ==
# closure over the clique).

from aggregator_spark.operators.media_fixture import (  # noqa: E402
    video_fhash_lookup_values_sql,
)

ANALYTICS12_ORACLES["video_near_dup_keep"] = f"""
    WITH RECURSIVE lk(k, fhash) AS (VALUES
{video_fhash_lookup_values_sql()}),
    docs AS (SELECT doc_id, doc_id % 64 AS k FROM documents),
    df AS (
      SELECT d.doc_id, l.fhash
      FROM docs d JOIN lk l ON d.k = l.k),
    hubs AS (SELECT fhash, MIN(doc_id) AS hub FROM df GROUP BY fhash),
    ver AS (
      SELECT DISTINCT h.hub AS doc_a, d.doc_id AS doc_b
      FROM df d JOIN hubs h ON d.fhash = h.fhash
      WHERE d.doc_id <> h.hub),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT v.doc_id, COALESCE(c.component, v.doc_id) AS component,
           (v.doc_id = COALESCE(c.component, v.doc_id)) AS keep
    FROM (SELECT DISTINCT doc_id FROM df) v
    LEFT JOIN comp c ON c.node = v.doc_id
"""
