"""Streaming source-drift monitor: the served JS report must equal the
batch operator over everything that has arrived, including across a
checkpoint restart between waves (two query starts sharing one
checkpoint), and batch retries must not double-count (delta overwrite
keyed by batch_id)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aggregator_spark.operators.corpus import js_source_drift
from aggregator_spark.schemas import load_testdata
from aggregator_spark.streaming.drift_stream import (
    drift_micro_batch,
    run_drift_stream,
    served_counts,
    served_drift,
)

SF = "/root/testdata/sf0.001"
N_WAVES = 3


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_matches_batch_after_all_waves(spark, tmp_path):
    root = str(tmp_path / "drift")
    run_drift_stream(spark, SF, root, n_waves=N_WAVES)
    batch = js_source_drift(load_testdata(spark, SF, "documents"))
    assert _rows(served_drift(spark, root)) == _rows(batch)
    # the maintained relation equals the from-scratch aggregate too
    docs = load_testdata(spark, SF, "documents")
    full = (
        docs.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _rows(served_counts(spark, root)) == _rows(full)


def test_restart_between_waves_is_identical(spark, tmp_path):
    root = str(tmp_path / "drift_restart")
    # first query start: one wave only, then the query stops (a crash
    # stand-in); second start resumes from the same checkpoint
    run_drift_stream(spark, SF, root, n_waves=N_WAVES, max_waves=1)
    assert len(os.listdir(os.path.join(root, "deltas"))) == 1
    run_drift_stream(spark, SF, root, n_waves=N_WAVES)
    batch = js_source_drift(load_testdata(spark, SF, "documents"))
    assert _rows(served_drift(spark, root)) == _rows(batch)


def test_batch_retry_does_not_double_count(spark, tmp_path):
    root = str(tmp_path / "drift_retry")
    run_drift_stream(spark, SF, root, n_waves=N_WAVES)
    before = _rows(served_counts(spark, root))
    # replay wave 0 against the same root — a foreachBatch retry
    # after a half-applied attempt; the overwrite keyed by batch_id
    # must leave the served relation unchanged
    from aggregator_spark.streaming.corpus_prepare_stream import (
        wave_doc_ids,
    )

    ids = wave_doc_ids(SF, 1, N_WAVES)[0]
    docs = load_testdata(spark, SF, "documents")
    wave0 = docs.filter(F.col("doc_id").isin(ids)).select(
        "doc_id", "text"
    )
    drift_micro_batch(wave0, 0, root, SF)
    assert _rows(served_counts(spark, root)) == before


def test_compaction_preserves_served_state(spark, tmp_path):
    root = str(tmp_path / "drift_compact")
    # two waves -> compact -> remaining wave appends as a delta; the
    # served relation and report must be identical to the uncompacted
    # full stream at every point
    run_drift_stream(spark, SF, root, n_waves=N_WAVES, max_waves=2)
    mid = _rows(served_counts(spark, root))
    from aggregator_spark.streaming.drift_stream import compact_deltas

    compact_deltas(spark, root)
    assert os.listdir(os.path.join(root, "deltas")) == []
    assert _rows(served_counts(spark, root)) == mid
    # compaction is idempotent (base-only state re-folds to itself)
    compact_deltas(spark, root)
    assert _rows(served_counts(spark, root)) == mid
    run_drift_stream(spark, SF, root, n_waves=N_WAVES)
    batch = js_source_drift(load_testdata(spark, SF, "documents"))
    assert _rows(served_drift(spark, root)) == _rows(batch)
