"""DuckDB oracles for the round-13 entries.

``served_media_near_dup``: the streaming store's served views are, by
construction (pinned in tests/test_streaming_warclite_ingest.py),
identical to the batch keeps over the landed corpus — and the landed
corpus is every document of the scale factor under the residue
modality map (sources/media_store.py:store_kind). So the oracle is
the SAME closed-form signature lookup + banding + recursive closure
as the batch ``*_near_dup_keep`` oracles (oracles_analytics12), one
block per modality with the residue filters, unioned with a modality
label. The banding constants are imported from the engine's single
source of truth and the exactness bound asserted there (ADVICE r12).
"""

from __future__ import annotations

from aggregator_spark.operators.media_fixture import (
    audio_fp_lookup_values_sql,
    dhash_lookup_values_sql,
    video_fhash_lookup_values_sql,
)
from aggregator_spark.oracles_analytics12 import (
    _BAND_W,
    _ORACLE_BANDS,
)
from aggregator_spark.operators.multimodal import MEDIA_MAX_HAMMING


def _sig_keep_ctes(p: str) -> str:
    """Banding + exact-Hamming verify + recursive closure + keep over
    the 64-bit-signature CTE ``<p>sig(doc_id, sig)`` — the image/audio
    block, CTE-name-prefixed so two instances coexist in one query."""
    return f"""
    {p}rep AS (SELECT sig, MIN(doc_id) AS rid FROM {p}sig GROUP BY sig),
    {p}bands AS (
      SELECT rid, b.band,
             substr(sig, 1 + {_BAND_W} * b.band, {_BAND_W}) AS bucket
      FROM {p}rep,
           (SELECT unnest(generate_series(0, {_ORACLE_BANDS - 1}))
              AS band) b),
    {p}cand AS (
      SELECT DISTINCT a.rid AS doc_a, b.rid AS doc_b
      FROM {p}bands a
      JOIN {p}bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.rid < b.rid),
    {p}ver AS (
      SELECT c.doc_a, c.doc_b
      FROM {p}cand c
      JOIN {p}rep x ON x.rid = c.doc_a
      JOIN {p}rep y ON y.rid = c.doc_b
      WHERE hamming(x.sig, y.sig) <= {MEDIA_MAX_HAMMING}),
    {p}edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM {p}ver
      UNION
      SELECT doc_b, doc_a FROM {p}ver),
    {p}reach(node, lab) AS (
      SELECT src, src FROM {p}edges
      UNION
      SELECT e.src, r.lab
      FROM {p}edges e JOIN {p}reach r ON e.dst = r.node),
    {p}comp AS (
      SELECT node, MIN(lab) AS component FROM {p}reach GROUP BY node),
    {p}repc AS (
      SELECT r.sig, COALESCE(c.component, r.rid) AS component
      FROM {p}rep r LEFT JOIN {p}comp c ON c.node = r.rid),
    {p}keep AS (
      SELECT s.doc_id, rc.component, (s.doc_id = rc.component) AS keep
      FROM {p}sig s JOIN {p}repc rc ON s.sig = rc.sig)
"""


ANALYTICS13_ORACLES: dict[str, str] = {}

ANALYTICS13_ORACLES["served_media_near_dup"] = f"""
    WITH RECURSIVE
    ilk(k, sig) AS (VALUES
{dhash_lookup_values_sql()}),
    isig AS (
      SELECT d.doc_id, l.sig
      FROM documents d JOIN ilk l ON d.doc_id % 256 = l.k
      WHERE d.doc_id % 2 = 0),
    {_sig_keep_ctes("i")},
    alk(k, sig) AS (VALUES
{audio_fp_lookup_values_sql()}),
    asig AS (
      SELECT d.doc_id, l.sig
      FROM documents d JOIN alk l ON d.doc_id % 256 = l.k
      WHERE d.doc_id % 4 = 1),
    {_sig_keep_ctes("a")},
    vlk(k, fhash) AS (VALUES
{video_fhash_lookup_values_sql()}),
    vdf AS (
      SELECT d.doc_id, l.fhash
      FROM documents d JOIN vlk l ON d.doc_id % 64 = l.k
      WHERE d.doc_id % 4 = 3),
    vhubs AS (SELECT fhash, MIN(doc_id) AS hub FROM vdf GROUP BY fhash),
    vver AS (
      SELECT DISTINCT h.hub AS doc_a, d.doc_id AS doc_b
      FROM vdf d JOIN vhubs h ON d.fhash = h.fhash
      WHERE d.doc_id <> h.hub),
    vedges AS (
      SELECT doc_a AS src, doc_b AS dst FROM vver
      UNION
      SELECT doc_b, doc_a FROM vver),
    vreach(node, lab) AS (
      SELECT src, src FROM vedges
      UNION
      SELECT e.src, r.lab
      FROM vedges e JOIN vreach r ON e.dst = r.node),
    vcomp AS (
      SELECT node, MIN(lab) AS component FROM vreach GROUP BY node),
    vkeep AS (
      SELECT v.doc_id,
             COALESCE(c.component, v.doc_id) AS component,
             (v.doc_id = COALESCE(c.component, v.doc_id)) AS keep
      FROM (SELECT DISTINCT doc_id FROM vdf) v
      LEFT JOIN vcomp c ON c.node = v.doc_id)
    SELECT 'image' AS modality, doc_id, component, keep FROM ikeep
    UNION ALL
    SELECT 'audio' AS modality, doc_id, component, keep FROM akeep
    UNION ALL
    SELECT 'video' AS modality, doc_id, component, keep FROM vkeep
"""
