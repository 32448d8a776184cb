"""Streaming boilerplate monitor: the line-level dedup's segment
document frequencies (``operators/dedup.segment_df``) maintained
incrementally over document micro-batches, so the CCNet-style rewrite
(``line_dedup_rewrite``) can run against everything that has arrived
without re-counting the corpus.

Reference analogue: the weekly refresh loop
(reference load_asn_ref_data.py:4-12) — a standing job folding each
arriving drop into served state. Here the served state is the running
(sh, df) segment-document-frequency relation; the rewrite is computed
FROM that relation on demand via ``line_dedup_rewrite(seg_df=...)``,
so batch/stream parity is structural: both paths run literally the
same boilerplate-decision + rebuild plan, only the df relation's
provenance differs (one-shot corpus aggregate vs summed batch deltas).

The additive merge is exact, not approximate: each document arrives in
exactly ONE wave, so its contribution to a segment's distinct-doc
count lands in exactly one delta (per-batch ``count_distinct`` within
the wave), and the read-time SUM over deltas equals the corpus-wide
distinct count. Retroactivity falls out for free — a segment that
crosses the df threshold only after a later batch arrives is
boilerplate in EVERY document when the rewrite next runs, exactly as
the batch operator would decide (pinned by the parity test).

Store mechanics (batch_id-keyed overwrite deltas, read-time sum,
log-structured compaction) are the shared ``delta_store.py``
discipline, exactly-once without a transactional store. At 100 TB/day
the per-batch delta is |distinct segments in the batch| rows of two
longs — orders smaller than the batch text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.streaming import delta_store
from aggregator_spark.streaming.corpus_prepare_stream import (
    register_docwave_source,
)

SEG_LEN = 12  # keep in lockstep with llm_queries.LINE_SEG_LEN
DF_THRESHOLD = 3


def _p(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


def boilerplate_micro_batch(
    batch_df: DataFrame, batch_id: int, root: str, seg_len: int = SEG_LEN
) -> None:
    """Fold one document wave into the df store: segment the batch,
    count each segment's distinct docs WITHIN the wave (exact, because
    a doc is never split across waves), overwrite this batch's delta."""
    from aggregator_spark.operators.dedup import doc_segments, segment_df

    segs = doc_segments(batch_df, seg_len=seg_len).select(
        "doc_id", F.xxhash64("seg").alias("sh")
    )
    delta = segment_df(segs).withColumnRenamed("df", "cnt")
    delta_store.write_delta(delta, root, batch_id)


def run_boilerplate_stream(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    n_waves: int,
    max_waves: int | None = None,
) -> None:
    """Drain all available waves into ``root``'s delta store
    (``processAllAvailable`` — availableNow snapshots only the first
    prefetched batch of a Simple reader, the known trap). Calling
    again with a larger ``max_waves`` resumes from the checkpoint —
    the restart seam the parity test exercises."""
    register_docwave_source(spark)
    stream = (
        spark.readStream.format("docwave")
        .option("sf_dir", sf_dir)
        .option("mod", "1")
        .option("n_waves", str(n_waves))
        .option("max_waves", str(max_waves or n_waves))
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: boilerplate_micro_batch(df, bid, root)
        )
        .option("checkpointLocation", _p(root, "checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def served_seg_df(spark: SparkSession, root: str) -> DataFrame:
    """The running (sh, df) relation over everything that has
    arrived: read-time sum of the batch deltas plus any compacted
    base generation."""
    return delta_store.served_counts(
        spark, root, ("sh",), cnt_col="cnt"
    ).withColumnRenamed("cnt", "df")


def compact_deltas(spark: SparkSession, root: str) -> None:
    """Fold the accumulated deltas into a new base generation; the
    served relation (and therefore the rewrite) reads identically
    before and after (pinned in tests)."""
    delta_store.compact(spark, root, ("sh",), cnt_col="cnt")


def served_rewrite(
    spark: SparkSession, root: str, docs: DataFrame
) -> DataFrame:
    """The boilerplate rewrite of ``docs`` under the incrementally
    maintained corpus-wide df counts — the SAME decision + rebuild
    plan the batch operator runs, fed by the served relation."""
    from aggregator_spark.operators.dedup import line_dedup_rewrite

    return line_dedup_rewrite(
        docs,
        seg_len=SEG_LEN,
        df_threshold=DF_THRESHOLD,
        seg_df=served_seg_df(spark, root),
    )
