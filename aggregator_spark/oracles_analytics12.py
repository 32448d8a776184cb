"""DuckDB oracles for the round-11 shard-emission wave. Built from the
SAME constants as the Spark side; the ranked CTE is one ROW_NUMBER —
the closed form the distributed bounded-rank plan must reproduce
bit-for-bit (md5-of-decimal-string order is engine-neutral: both
engines render a BIGINT as plain digits and compare lowercase hex
byte-wise)."""

from __future__ import annotations

from aggregator_spark.analytics_queries12 import N_SHARDS, SEQ_KEY_BASE
from aggregator_spark.oracles_llm import LLM_ORACLES

_SEQS = f"""
    packed AS ({LLM_ORACLES["pack_sequences"]}),
    seqs AS (
      SELECT pack_group, seq_bin,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
             CAST(pack_group AS BIGINT) * {SEQ_KEY_BASE}
               + CAST(seq_bin AS BIGINT) AS seq_key
      FROM packed GROUP BY 1, 2),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(seq_key AS VARCHAR)) DESC, seq_key
             ) - 1 AS r
      FROM seqs)
"""

ANALYTICS12_ORACLES = {
    "corpus_shard_emit": f"""
        WITH {_SEQS}
        SELECT pack_group, seq_bin, n_chunks, seq_tokens,
               CAST(r % {N_SHARDS} AS INT) AS shard_id,
               CAST(r // {N_SHARDS} AS BIGINT) AS shard_rank
        FROM ranked
    """,
    "shard_manifest": f"""
        WITH {_SEQS}
        SELECT CAST(r % {N_SHARDS} AS INT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_seqs,
               CAST(SUM(seq_tokens) AS BIGINT) AS shard_tokens,
               MIN(CASE WHEN r // {N_SHARDS} = 0 THEN seq_key END)
                 AS head_seq_key
        FROM ranked GROUP BY 1
    """,
}
