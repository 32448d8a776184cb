"""DuckDB oracles for the index-artifact entries (index_queries.py):
each rebuilds the artifact from the raw corpus with the SAME shared SQL
fragments that already hash-match the consumers (BM25 ranking, LSH
pair generation, k-means fit, BPE training) — so a cached parquet
generation must be bit-identical to a fresh rebuild to pass."""

from __future__ import annotations

from aggregator_spark.llm_queries import DECONTAM_MOD, DECONTAM_N, NEW_BATCH_MOD
from aggregator_spark.operators.bpe import BPE_MERGES
from aggregator_spark.oracles_analytics10 import _bpe_levels_sql
from aggregator_spark.oracles_llm import (
    WORD_TOKS,
    _BAND_SELECTS,
    _MH_COLS,
    _SHINGLES,
    _kmeans_unrolled_sql,
)

INDEX_ORACLES: dict[str, str] = {}

# postings = the tf CTE of the BM25 ranking oracle, surfaced as the
# result instead of consumed by it
INDEX_ORACLES["bm25_index_postings"] = f"""
    WITH toks AS (
      SELECT doc_id, {WORD_TOKS} AS ts FROM documents)
    SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, t AS term,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks, UNNEST(ts) AS u(t)
    GROUP BY doc_id, len(ts), t
"""

# bucket table = the buckets CTE shared by every MinHash oracle
INDEX_ORACLES["dedup_bucket_index"] = f"""
    WITH {_SHINGLES},
    sigs AS (
      SELECT doc_id,
         {_MH_COLS}
      FROM sh),
    buckets AS (
{_BAND_SELECTS}
    )
    SELECT doc_id, CAST(band AS INT) AS band, bucket FROM buckets
"""

# IVF assignment = one unrolled Lloyd round (the kmeans_fit oracle at
# iterations=1), keeping only the routing columns
INDEX_ORACLES["ann_ivf_index"] = f"""
    SELECT vec_id, CAST(assigned AS INT) AS cluster
    FROM ({_kmeans_unrolled_sql(1)})
"""

# dict states = the final w{{n}} level of the unrolled BPE trainer (the
# same CTE chain behind bpe_merges / bpe_encode_docs)
INDEX_ORACLES["bpe_dict_states"] = f"""
    WITH {_bpe_levels_sql(BPE_MERGES)}
    SELECT word, state, CAST(freq AS BIGINT) AS freq
    FROM w{BPE_MERGES}
"""

# prepared-corpus probe set = the benchmark-probe derivation over the
# EXISTING slice (the same fragment the incremental pipeline's gate
# uses — oracles_pipeline eprobes)
INDEX_ORACLES["prepared_probes"] = f"""
    WITH existing AS (
      SELECT * FROM documents WHERE doc_id % {NEW_BATCH_MOD} <> 0)
    SELECT DISTINCT array_to_string(ts[1:{DECONTAM_N}], ' ') AS probe
    FROM (SELECT doc_id, {WORD_TOKS} AS ts FROM existing) t
    WHERE doc_id % {DECONTAM_MOD} = 0 AND len(ts) >= {DECONTAM_N}
"""
