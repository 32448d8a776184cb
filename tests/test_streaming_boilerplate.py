"""Streaming boilerplate monitor: the rewrite served from the
incrementally maintained segment-df relation must equal the batch
``line_dedup_rewrite`` over everything that has arrived — including
RETROACTIVELY (a segment that crosses the df threshold only after a
later wave is removed from the earlier waves' documents too), across a
checkpoint restart, under batch retries, and through compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aggregator_spark.operators.dedup import line_dedup_rewrite, segment_df
from aggregator_spark.schemas import load_testdata
from aggregator_spark.streaming.boilerplate_stream import (
    DF_THRESHOLD,
    SEG_LEN,
    boilerplate_micro_batch,
    compact_deltas,
    run_boilerplate_stream,
    served_rewrite,
    served_seg_df,
)

SF = "/root/testdata/sf0.001"
N_WAVES = 3


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_seg_len_lockstep():
    """The monitor's segment length must match the catalog entry's —
    a drift here would silently make the served df relation count
    different segments than the batch rewrite deletes (kept as a pin
    instead of an import to avoid a streaming→llm_queries module
    dependency)."""
    from aggregator_spark.llm_queries import (
        LINE_DF_THRESHOLD,
        LINE_SEG_LEN,
    )

    assert SEG_LEN == LINE_SEG_LEN
    assert DF_THRESHOLD == LINE_DF_THRESHOLD


def _batch_rewrite(spark):
    docs = load_testdata(spark, SF, "documents")
    return line_dedup_rewrite(
        docs, seg_len=SEG_LEN, df_threshold=DF_THRESHOLD
    )


def test_served_rewrite_matches_batch(spark, tmp_path):
    root = str(tmp_path / "boiler")
    run_boilerplate_stream(spark, SF, root, n_waves=N_WAVES)
    docs = load_testdata(spark, SF, "documents")
    assert _rows(served_rewrite(spark, root, docs)) == _rows(
        _batch_rewrite(spark)
    )
    # the maintained df relation equals the from-scratch aggregate
    from aggregator_spark.operators.dedup import doc_segments

    segs = doc_segments(docs, seg_len=SEG_LEN).select(
        "doc_id", F.xxhash64("seg").alias("sh")
    )
    assert _rows(served_seg_df(spark, root)) == _rows(segment_df(segs))


def test_threshold_crossing_is_retroactive(spark, tmp_path):
    """The point of maintaining CORPUS-wide df: docs 1 and 2 arrive in
    wave A sharing a segment (df 2 < 3 — kept if the rewrite ran
    then); doc 3 arrives later with the same segment (df 3) — the
    next served rewrite must remove it from ALL THREE docs."""
    boiler = "b1 b2 b3"
    mk = lambda i, extra: (i, f"{boiler} {extra}")
    wave_a = spark.createDataFrame(
        [mk(1, "u1 u2 u3"), mk(2, "v1 v2 v3")], "doc_id long, text string"
    )
    wave_b = spark.createDataFrame(
        [mk(3, "w1 w2 w3")], "doc_id long, text string"
    )
    root = str(tmp_path / "retro")
    from aggregator_spark.operators.dedup import line_dedup_rewrite as ldr
    from aggregator_spark.streaming.boilerplate_stream import (
        served_seg_df as seg,
    )

    boilerplate_micro_batch(wave_a, 0, root, seg_len=3)
    early = ldr(wave_a, seg_len=3, df_threshold=3, seg_df=seg(spark, root))
    assert all(r["n_removed"] == 0 for r in early.collect())
    boilerplate_micro_batch(wave_b, 1, root, seg_len=3)
    everything = wave_a.unionByName(wave_b)
    late = ldr(
        everything, seg_len=3, df_threshold=3, seg_df=seg(spark, root)
    )
    rows = {r["doc_id"]: r for r in late.collect()}
    assert all(rows[i]["n_removed"] == 1 for i in (1, 2, 3))
    assert rows[1]["clean_text"] == "u1 u2 u3"
    # and it equals the one-shot batch decision over the union
    assert _rows(late) == _rows(ldr(everything, seg_len=3, df_threshold=3))


def test_restart_retry_and_compaction(spark, tmp_path):
    root = str(tmp_path / "boiler_rrc")
    # restart: first query start drains one wave, second resumes
    run_boilerplate_stream(spark, SF, root, n_waves=N_WAVES, max_waves=1)
    assert len(os.listdir(os.path.join(root, "deltas"))) == 1
    run_boilerplate_stream(spark, SF, root, n_waves=N_WAVES)
    before = _rows(served_seg_df(spark, root))
    # retry: replay wave 0 — overwrite keyed by batch_id, no double count
    from aggregator_spark.streaming.corpus_prepare_stream import (
        wave_doc_ids,
    )

    ids = wave_doc_ids(SF, 1, N_WAVES)[0]
    docs = load_testdata(spark, SF, "documents")
    wave0 = docs.filter(F.col("doc_id").isin(ids)).select("doc_id", "text")
    boilerplate_micro_batch(wave0, 0, root)
    assert _rows(served_seg_df(spark, root)) == before
    # compaction: served df relation and rewrite identical after fold
    compact_deltas(spark, root)
    assert os.listdir(os.path.join(root, "deltas")) == []
    assert _rows(served_seg_df(spark, root)) == before
    assert _rows(served_rewrite(spark, root, docs)) == _rows(
        _batch_rewrite(spark)
    )
