"""Streaming ingest dedup (streaming/ingest_dedup_stream.py): the
served verdicts must equal a driver-side first-wave-wins replay of the
same wave split (non-tautological expected values, computed with
hashlib — no Spark), including across a checkpoint restart; batch
retries must not corrupt state (self-excluding reads + overwrite-keyed
deltas); compaction must not change the served result; and the
log-structured bloom must carry real fast-path traffic."""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow.parquet as pq

from aggregator_spark.streaming.corpus_prepare_stream import wave_doc_ids
from aggregator_spark.streaming.ingest_dedup_stream import (
    STREAM_BLOOM_K,
    STREAM_BLOOM_M,
    _served_bloom_words,
    _served_fps,
    compact,
    ingest_micro_batch,
    run_ingest_dedup_stream,
    served_verdicts,
)

SF = "/root/testdata/sf0.001"
N_WAVES = 4


def _lede_fp(text: str) -> str:
    norm = re.sub(r"\s+", " ", text).strip().lower()
    lede = " ".join(norm.split(" ")[:8])
    return hashlib.md5(lede.encode()).hexdigest()


def _expected_verdicts() -> dict[int, bool]:
    """First-wave-wins replay: a doc is new iff no STRICTLY EARLIER
    wave contains its lede fingerprint (within-wave dups all new)."""
    tbl = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    text_by_id = dict(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    waves = wave_doc_ids(SF, mod=1, n_waves=N_WAVES)
    seen: set[str] = set()
    verdicts: dict[int, bool] = {}
    for ids in waves:
        wave_fps = [(d, _lede_fp(text_by_id[d])) for d in ids]
        for d, fp in wave_fps:
            verdicts[d] = fp not in seen
        seen |= {fp for _, fp in wave_fps}
    return verdicts


def _got(spark, root) -> dict[int, bool]:
    return {
        r["doc_id"]: r["is_new"]
        for r in served_verdicts(spark, root).collect()
    }


def test_stream_matches_replay_and_dups_exist(spark, tmp_path):
    root = str(tmp_path / "ingest")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    expected = _expected_verdicts()
    got = _got(spark, root)
    assert got == expected
    # the fixture is alive: cross-wave lede dups exist
    assert not all(got.values())
    assert any(got.values())


def test_restart_between_waves_is_identical(spark, tmp_path):
    root = str(tmp_path / "ingest_restart")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES, max_waves=2)
    assert len(os.listdir(os.path.join(root, "verdicts"))) == 2
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    assert _got(spark, root) == _expected_verdicts()


def test_batch_retry_is_idempotent(spark, tmp_path):
    """Re-folding an already-committed wave (the foreachBatch retry)
    must leave the store byte-identical in effect: reads are
    self-excluding (batch_id < N) so the retry sees the same pre-wave
    state, and writes overwrite their own batch_id dirs."""
    from pyspark.sql import functions as F

    from aggregator_spark.schemas import load_testdata

    root = str(tmp_path / "ingest_retry")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    before = _got(spark, root)
    # replay wave 2's exact frame through the fold again
    ids = wave_doc_ids(SF, mod=1, n_waves=N_WAVES)[2]
    wave_df = (
        load_testdata(spark, SF, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
    )
    ingest_micro_batch(wave_df, 2, root)
    assert _got(spark, root) == before


def test_compaction_preserves_served_state(spark, tmp_path):
    root = str(tmp_path / "ingest_compact")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    big = 1 << 60
    fps_before = sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    )
    words_before = _served_bloom_words(spark, root, big)
    compact(spark, root)
    assert not os.path.isdir(os.path.join(root, "fps"))
    assert not os.path.isdir(os.path.join(root, "bloom"))
    assert sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    ) == fps_before
    assert _served_bloom_words(spark, root, big) == words_before
    # and verdicts (the output log) are untouched
    assert _got(spark, root) == _expected_verdicts()


def test_bloom_fast_path_carries_traffic(spark, tmp_path):
    """On the LAST wave some rows must be definite-miss (skip the
    verify join) and every true dup must be bloom-positive — the
    incremental OR'd bloom has no false negatives by construction."""
    from pyspark.sql import functions as F

    from aggregator_spark.analytics_queries11 import _prefix_fp
    from aggregator_spark.operators.runtime_filter import membership_col
    from aggregator_spark.schemas import load_testdata

    root = str(tmp_path / "ingest_bloom")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    last = N_WAVES - 1
    ids = wave_doc_ids(SF, mod=1, n_waves=N_WAVES)[last]
    wave = (
        load_testdata(spark, SF, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", _prefix_fp(F.col("text")).alias("fp"))
    )
    words = _served_bloom_words(spark, root, last)
    marked = wave.withColumn(
        "maybe",
        membership_col(
            F.col("fp"), words, m_bits=STREAM_BLOOM_M,
            k_hashes=STREAM_BLOOM_K,
        ),
    ).collect()
    maybe = {r["doc_id"] for r in marked if r["maybe"]}
    miss = {r["doc_id"] for r in marked if not r["maybe"]}
    assert miss, "no definite-miss traffic — the fast path is dead"
    expected = _expected_verdicts()
    true_dups = {d for d in ids if not expected[d]}
    assert true_dups and true_dups <= maybe


def test_compact_on_empty_store_raises(spark, tmp_path):
    """compact() on a store with no deltas and no base must fail with
    a clear ValueError, not an AttributeError on a None frame."""
    import pytest

    with pytest.raises(ValueError, match="nothing to compact"):
        compact(spark, str(tmp_path / "empty_store"))


def test_compaction_crash_window_serves_old_state(spark, tmp_path):
    """A crash between parking the old base aside (base/<sub>.old)
    and renaming the new one into place must NOT lose fingerprints
    whose deltas a PRIOR compaction already folded away: _base_dir
    falls back to the .old dir, and a re-run of compact() heals the
    store back to the exact pre-crash serving state."""
    import shutil

    root = str(tmp_path / "ingest_crash")
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES, max_waves=2)
    compact(spark, root)  # generation 1: wave deltas folded + dropped
    run_ingest_dedup_stream(spark, SF, root, n_waves=N_WAVES)
    big = 1 << 60
    fps_expected = sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    )
    words_expected = _served_bloom_words(spark, root, big)
    # simulate the crash: old base parked aside, new base not yet in
    # place (the exact window ADVICE r10 flagged)
    for sub in ("fps", "bloom"):
        final = os.path.join(root, "base", sub)
        os.rename(final, final + ".old")
    assert sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    ) == fps_expected
    assert _served_bloom_words(spark, root, big) == words_expected
    # recovery: a fresh compact() reads .old + deltas and rebuilds
    compact(spark, root)
    for sub in ("fps", "bloom"):
        assert os.path.isdir(os.path.join(root, "base", sub))
        assert not os.path.isdir(os.path.join(root, "base", sub + ".old"))
        assert not os.path.isdir(os.path.join(root, sub))
    assert sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    ) == fps_expected
    assert _served_bloom_words(spark, root, big) == words_expected
    assert _got(spark, root) == _expected_verdicts()
    shutil.rmtree(root, ignore_errors=True)
