"""Streaming source-drift monitor: the batch JS-divergence report
(``operators/corpus.js_source_drift``) maintained incrementally over
document micro-batches.

Reference analogue: the weekly refresh loop
(reference load_asn_ref_data.py:4-12) — a standing job folding each
arriving drop into a served table. Here the served state is the
running (source, token, cnt) unigram count relation; the JS report is
computed FROM that relation on demand via the shared
``js_from_counts`` stage, so batch/stream parity is structural: both
paths run literally the same divergence plan over the same relation
shape.

Shape::

    docwave source (replayable, offset-tracked waves of documents)
      → foreachBatch:
          batch (doc_id, text) ⋈ (doc_id, source) spine
          → explode tokens → (source, token, cnt) DELTA
          → overwrite  root/deltas/batch_id=N
      serving query (any time):
          read root/deltas → SUM by (source, token) → js_from_counts

Exactly-once without a transactional store: each batch's only write
is an overwrite keyed by its batch_id — a retry replaces its own
delta, and the additive merge happens at READ time (sum over delta
dirs), so a half-written previous attempt can never double-count.
This is the same batch-id-keyed-delta discipline as the streaming
corpus-preparation pipeline (corpus_prepare_stream.py).

At 100 TB/day: the per-batch delta is vocab×sources-sized (already
aggregated map-side before the write — orders smaller than the batch
text), the delta store grows by that small relation per batch, and
the read-time SUM is a single hash aggregate over it. Periodic
compaction (rewrite the summed relation as a new generation, drop the
deltas) bounds the store exactly like any log-structured table; the
serving plan is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.streaming.corpus_prepare_stream import (
    register_docwave_source,
)


def _p(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


def drift_micro_batch(
    batch_df: DataFrame, batch_id: int, root: str, sf_dir: str
) -> None:
    """Fold one document wave into the delta store: recover the
    source spine (the docwave source ships (doc_id, text); a real
    feed would carry source inline), aggregate the batch's token
    counts, overwrite this batch's delta dir."""
    from aggregator_spark.schemas import load_testdata

    spark = batch_df.sparkSession
    # bound the spine scan by the batch's id range: waves arrive as
    # contiguous id chunks, so the min/max predicate prunes the spine
    # read to the batch's parquet row groups instead of scanning the
    # whole corpus per batch (the 1-row bounds collect is the same
    # bounded driver pull as the as-of skew sample). A real feed
    # carries source inline and skips the spine entirely.
    lo, hi = batch_df.agg(
        F.min("doc_id"), F.max("doc_id")
    ).first()
    if lo is None:  # empty micro-batch: nothing to fold in
        return
    spine = (
        load_testdata(spark, sf_dir, "documents")
        .filter(F.col("doc_id").between(lo, hi))
        .select("doc_id", "source")
    )
    delta = (
        batch_df.join(spine, "doc_id")
        .select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from aggregator_spark.streaming import delta_store

    delta_store.write_delta(delta, root, batch_id)


def run_drift_stream(
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
            lambda df, bid: drift_micro_batch(df, bid, root, sf_dir)
        )
        .option("checkpointLocation", _p(root, "checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def served_counts(spark: SparkSession, root: str) -> DataFrame:
    """The running (source, token, cnt) relation: additive merge of
    every committed batch delta — plus the compacted base generation
    when one exists — performed at read time (idempotent under batch
    retries by construction). Store mechanics live in the shared
    ``streaming/delta_store.py`` (also used by the boilerplate
    monitor)."""
    from aggregator_spark.streaming import delta_store

    try:
        return delta_store.served_counts(spark, root, ("source", "token"))
    except FileNotFoundError:
        raise FileNotFoundError(f"no drift state under {root}") from None


def compact_deltas(spark: SparkSession, root: str) -> None:
    """Log-structured compaction: fold every accumulated delta (and
    any previous base) into a single summed base generation, then drop
    the delta dirs — the store returns to vocab×sources rows however
    many batches have arrived, and ``served_counts``/``served_drift``
    read identically before and after (pinned in tests)."""
    from aggregator_spark.streaming import delta_store

    delta_store.compact(spark, root, ("source", "token"))


def served_drift(spark: SparkSession, root: str) -> DataFrame:
    """The JS drift report over everything that has arrived — the
    SAME ``js_from_counts`` plan the batch operator runs, fed by the
    incrementally-maintained relation."""
    from aggregator_spark.operators.corpus import js_from_counts

    return js_from_counts(served_counts(spark, root))
