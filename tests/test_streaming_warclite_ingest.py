"""Streaming warclite ingest (streaming/warclite_ingest_stream.py):
containers land in waves; served verdicts must equal a driver-side
first-batch-wins replay over payload md5s (hashlib, no Spark);
features must exist for exactly the new docs and match the batch
decode tail; a checkpoint restart between waves and a re-folded batch
must change nothing; compaction (shared with ingest_dedup_stream)
must preserve the served state."""

from __future__ import annotations

import hashlib
import os

from aggregator_spark.operators.media_fixture import (
    N_KEYS,
    build_payload,
    media_kind,
)
from aggregator_spark.sources.warclite import write_warclite
from aggregator_spark.streaming.ingest_dedup_stream import compact
from aggregator_spark.streaming.warclite_ingest_stream import (
    ingest_media_batch,
    run_warclite_ingest_stream,
    served_media_features,
    served_media_verdicts,
)

# wave 1: keys 0..19 plus a WITHIN-wave dup pair (20 and 20+256 share
# a payload); wave 2: ids 256..275 (cross-wave dups of wave 1's keys)
# plus fresh keys 100..109
WAVE1 = list(range(0, 21)) + [20 + N_KEYS]
WAVE2 = list(range(N_KEYS, N_KEYS + 20)) + list(range(100, 110))


def _land(landing: str, name: str, ids: list[int]) -> None:
    os.makedirs(landing, exist_ok=True)
    write_warclite(
        os.path.join(landing, name),
        ((d, media_kind(d), build_payload(d % N_KEYS)) for d in ids),
    )


def _expected(waves: list[list[int]]) -> dict[int, bool]:
    seen: set[str] = set()
    out: dict[int, bool] = {}
    for ids in waves:
        fps = [
            (d, hashlib.md5(build_payload(d % N_KEYS)).hexdigest())
            for d in ids
        ]
        for d, fp in fps:
            out[d] = fp not in seen
        seen |= {fp for _, fp in fps}
    return out


def _got(spark, root) -> dict[int, bool]:
    return {
        r["doc_id"]: r["is_new"]
        for r in served_media_verdicts(spark, root).collect()
    }


def test_stream_matches_replay_and_decodes_only_new(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)

    expected = _expected([WAVE1, WAVE2])
    got = _got(spark, root)
    assert got == expected
    # fixture alive: cross-wave dups exist AND fresh keys exist in w2
    w2 = {d: expected[d] for d in WAVE2}
    assert not all(w2.values()) and any(w2.values())
    # within-wave dup pair: both new (the whole batch probes pre-batch
    # state), one shared feature row each
    assert expected[20] and expected[20 + N_KEYS]

    feats = served_media_features(spark, root)
    new_ids = {d for d, isnew in expected.items() if isnew}
    assert {r["doc_id"] for r in feats.collect()} == new_ids

    # feature values match the batch decode tail over the same docs
    from pyspark.sql import functions as F

    from aggregator_spark.analytics_queries4 import features_from_media

    rows = [
        (d, media_kind(d), build_payload(d % N_KEYS)) for d in new_ids
    ]
    batch = features_from_media(
        spark.createDataFrame(
            rows, "media_id long, kind string, payload binary"
        )
    )
    got_feats = feats.select(
        F.col("doc_id").alias("media_id"), "kind", "width", "height",
        "duration_ms", "rms_micro", "feat_str",
    )
    assert got_feats.exceptAll(batch).count() == 0
    assert batch.exceptAll(got_feats).count() == 0


def test_restart_and_retry_are_idempotent(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)  # restart seam
    before = _got(spark, root)
    assert before == _expected([WAVE1, WAVE2])

    # retry: re-fold wave 2's exact frame through the fold again
    rows = [
        (d, media_kind(d), build_payload(d % N_KEYS)) for d in WAVE2
    ]
    wave_df = spark.createDataFrame(
        rows, "doc_id long, mime string, payload binary"
    )
    ingest_media_batch(wave_df, 1, root)
    assert _got(spark, root) == before

    feats_before = sorted(
        (r["doc_id"], r["feat_str"])
        for r in served_media_features(spark, root).collect()
    )
    ingest_media_batch(wave_df, 1, root)
    assert sorted(
        (r["doc_id"], r["feat_str"])
        for r in served_media_features(spark, root).collect()
    ) == feats_before


def test_compaction_shared_with_ingest_dedup_store(spark, tmp_path):
    from aggregator_spark.streaming.ingest_dedup_stream import (
        _served_bloom_words,
        _served_fps,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)
    big = 1 << 60
    fps_before = sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    )
    words_before = _served_bloom_words(spark, root, big)
    compact(spark, root)
    assert sorted(
        r["fp"] for r in _served_fps(spark, root, big).collect()
    ) == fps_before
    assert _served_bloom_words(spark, root, big) == words_before
    assert _got(spark, root) == _expected([WAVE1, WAVE2])


def test_streaming_image_near_dup_matches_batch(spark, tmp_path):
    """r12: the served perceptual view == the batch operator over the
    same landed corpus — the streaming side of image near-dup dedup.
    Also pins decode-once: exactly one dHash row per distinct image
    payload ever landed."""
    from aggregator_spark.operators.multimodal import image_near_dup_keep
    from aggregator_spark.streaming.warclite_ingest_stream import (
        _served_dhash,
        compact_media,
        served_image_near_dup,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)

    all_ids = WAVE1 + WAVE2
    image_ids = [d for d in all_ids if media_kind(d) == "image"]
    rows = [
        (d, "image", build_payload(d % N_KEYS)) for d in image_ids
    ]
    batch = image_near_dup_keep(
        spark.createDataFrame(
            rows, "media_id long, kind string, payload binary"
        )
    )
    want = sorted(tuple(r) for r in batch.collect())
    got = sorted(
        tuple(r) for r in served_image_near_dup(spark, root).collect()
    )
    assert got == want

    # decode-once: one signature per DISTINCT image payload
    n_distinct_imgs = len({d % N_KEYS for d in image_ids})
    assert _served_dhash(spark, root).count() == n_distinct_imgs

    # the full-store compaction (fps + bloom + dhash) preserves the view
    compact_media(spark, root)
    import os as _os

    assert not _os.path.isdir(_os.path.join(root, "dhash"))
    assert sorted(
        tuple(r) for r in served_image_near_dup(spark, root).collect()
    ) == want


def test_pruned_consumed_containers_are_tolerated(spark, tmp_path):
    """Deleting already-consumed containers from the landing dir must
    not wedge the stream (their content lives in the store); only a
    NEW container landing with a name below the consumed frontier is
    the refuse-loudly case."""
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    os.remove(os.path.join(landing, "c0.wlc"))  # prune consumed
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)
    assert _got(spark, root) == _expected([WAVE1, WAVE2])


def _split_rows(reader, splits):
    """Read splits the way executor tasks would (Arrow batches) and
    flatten to (doc_id, mime, payload) tuples."""
    return [
        (d["doc_id"], d["mime"], d["payload"])
        for s in splits
        for batch in reader.read(s)
        for d in batch.to_pylist()
    ]


def _poll(reader, start):
    """One simulated micro-batch through the partition-based reader:
    plan the batch (latestOffset + partitions — the only driver-side
    steps) and read every split the way executor tasks would; returns
    (rows, end)."""
    end = reader.latestOffset()
    splits = reader.partitions(start, end)
    return _split_rows(reader, splits), end


def test_below_frontier_landing_raises(tmp_path):
    """A container whose name sorts below the consumed frontier can
    never be ingested by a frontier offset — the reader refuses with
    a diagnosis instead of silently skipping it."""
    import pytest

    from aggregator_spark.streaming.warclite_ingest_stream import (
        WarcLandStreamReader,
    )

    landing = str(tmp_path / "landing")
    _land(landing, "c5.wlc", [0, 2])
    reader = WarcLandStreamReader({"path": landing})
    rows, end = _poll(reader, reader.initialOffset())
    assert list(rows) and end["names"] == ["c5.wlc"]
    _land(landing, "c3.wlc", [4])  # sorts BELOW the frontier
    with pytest.raises(ValueError, match="out-of-order landing"):
        _poll(reader, end)


def test_straggler_masked_by_prune_still_raises(tmp_path):
    """ADVICE r12: a below-frontier straggler landing in the same
    polling interval as a prune of a consumed container cancelled out
    under the r12 count-based detector. The name-SET offset catches
    it: the straggler is below the frontier and not in the set, no
    matter how many consumed containers were pruned."""
    import pytest

    from aggregator_spark.streaming.warclite_ingest_stream import (
        WarcLandStreamReader,
    )

    landing = str(tmp_path / "landing")
    _land(landing, "c2.wlc", [0])
    _land(landing, "c5.wlc", [2])
    reader = WarcLandStreamReader({"path": landing})
    rows, end = _poll(reader, reader.initialOffset())
    assert len(list(rows)) == 2 and end["names"] == ["c2.wlc", "c5.wlc"]
    # prune one consumed container AND land a straggler — counts cancel
    os.remove(os.path.join(landing, "c2.wlc"))
    _land(landing, "c3.wlc", [4])
    with pytest.raises(ValueError, match="c3.wlc"):
        _poll(reader, end)


def test_legacy_offset_formats_migrate_or_refuse(tmp_path):
    """Offset-format migrations: an r12 frontier offset normalizes to
    the present consumed names; a pre-r12 count offset refuses when
    consumed containers were pruned before migration (the frontier is
    unknowable — mapping the count onto the present listing would
    silently skip never-consumed containers; ADVICE r12 medium)."""
    import pytest

    from aggregator_spark.streaming.warclite_ingest_stream import (
        WarcLandStreamReader,
    )

    landing = str(tmp_path / "landing")
    _land(landing, "c0.wlc", [0])
    _land(landing, "c1.wlc", [2])
    reader = WarcLandStreamReader({"path": landing})

    # r12 frontier offset: consumed = present files <= upto
    rows, end = _poll(reader, {"upto": "c0.wlc", "n_upto": 1})
    assert [r[0] for r in rows] == [2]
    assert end["names"] == ["c0.wlc", "c1.wlc"]

    # pre-r12 count offset, intact listing: first n names
    rows, end = _poll(reader, {"n": 1})
    assert [r[0] for r in rows] == [2]
    assert end["names"] == ["c0.wlc", "c1.wlc"]

    # pre-r12 count offset after pruning: refuse, don't guess
    os.remove(os.path.join(landing, "c0.wlc"))
    with pytest.raises(ValueError, match="cannot migrate"):
        _poll(reader, {"n": 2})


def test_partitioned_reader_splits_and_replay(tmp_path):
    """r14 (VERDICT r13 item 1): the landing source is a
    partition-based reader — batch planning yields offset-indexed
    splits carrying only (path, offset, n_records), payload bytes are
    read per split (executor-side), and ``partitions`` is pure in
    (start, end) so checkpoint replay re-reads exactly the batch's
    name range."""
    from aggregator_spark.streaming.warclite_ingest_stream import (
        WarcLandStreamReader,
        _LandSplit,
    )

    landing = str(tmp_path / "landing")
    ids = [0, 2, 4, 6, 8]
    _land(landing, "c0.wlc", ids)
    reader = WarcLandStreamReader(
        {"path": landing, "records_per_split": "2"}
    )
    start = reader.initialOffset()
    end = reader.latestOffset()
    splits = reader.partitions(start, end)
    # one split per records_per_split chunk, metadata only
    assert [s.n_records for s in splits] == [2, 2, 1]
    assert all(isinstance(s, _LandSplit) for s in splits)
    assert set(vars(splits[0])) == {"path", "offset", "n_records"}
    rows = _split_rows(reader, splits)
    assert [r[0] for r in rows] == ids
    assert rows == [
        (d, media_kind(d), build_payload(d % N_KEYS)) for d in ids
    ]
    # replay: a FRESH reader (post-restart) plans the same batch from
    # the checkpointed offsets alone and reproduces the same rows
    fresh = WarcLandStreamReader(
        {"path": landing, "records_per_split": "2"}
    )
    replay = _split_rows(fresh, fresh.partitions(start, end))
    assert replay == rows


def test_compaction_heals_bloom_fps_divergence(spark, tmp_path):
    """A crash between the fps and bloom delta writes leaves fps of a
    batch with no bloom bits; compaction must rebuild the bloom base
    from the fps ground truth so the definite-miss fast path can never
    wrongly clear a known fingerprint afterwards."""
    import shutil as _sh

    from aggregator_spark.operators.runtime_filter import (
        build_bloom_words,
    )
    from aggregator_spark.streaming.ingest_dedup_stream import (
        STREAM_BLOOM_K,
        STREAM_BLOOM_M,
        _served_bloom_words,
        _served_fps,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land(landing, "c0.wlc", WAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land(landing, "c1.wlc", WAVE2)
    run_warclite_ingest_stream(spark, landing, root)
    # simulate the torn fold: batch 1's bloom delta never landed
    _sh.rmtree(os.path.join(root, "bloom", "batch_id=1"))
    compact(spark, root)
    big = 1 << 60
    fps = _served_fps(spark, root, big)
    want = build_bloom_words(
        fps, "fp", m_bits=STREAM_BLOOM_M, k_hashes=STREAM_BLOOM_K
    )
    assert _served_bloom_words(spark, root, big) == want


# ---- r13: the audio + video perceptual serve (VERDICT r12 item 2) ----

VIDEO_BASE = 1000  # ids >= VIDEO_BASE land as videos in the mixed waves


def _mixed_row(d: int) -> tuple[int, str, bytes]:
    from aggregator_spark.operators.media_fixture import (
        N_VIDEO_KEYS,
        build_video_payload,
    )

    if d >= VIDEO_BASE:
        return (d, "video", build_video_payload(d % N_VIDEO_KEYS))
    return (d, media_kind(d), build_payload(d % N_KEYS))


def _land_mixed(landing: str, name: str, ids: list[int]) -> None:
    os.makedirs(landing, exist_ok=True)
    write_warclite(
        os.path.join(landing, name), (_mixed_row(d) for d in ids)
    )


# wave 1 mixes all three kinds incl. a video payload-dup pair
# (1003 and 1003+64 share a payload); wave 2 adds cross-wave dups of
# every kind plus fresh keys
MWAVE1 = list(range(0, 12)) + [1000, 1001, 1002, 1003, 1003 + 64]
MWAVE2 = (
    list(range(256, 264))  # audio/image cross-wave payload dups
    + [1064, 1065, 1130]   # 1064/1065 dup 1000/1001's payloads
    + [40, 41, 1010]       # fresh keys of each kind
)


def _batch_keep(spark, op, rows):
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    return sorted(tuple(r) for r in op(df).collect())


def test_streaming_audio_video_near_dup_match_batch(spark, tmp_path):
    """r13: the served audio and video perceptual views == the batch
    operators over the same landed corpus, through waves, compaction,
    and a post-compaction wave; one signature row per DISTINCT payload
    (decode-once)."""
    from aggregator_spark.operators.multimodal import (
        audio_near_dup_keep,
        image_near_dup_keep,
        video_near_dup_keep,
    )
    from aggregator_spark.streaming.warclite_ingest_stream import (
        _served_sig,
        compact_media,
        served_audio_near_dup,
        served_image_near_dup,
        served_video_near_dup,
    )

    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    _land_mixed(landing, "c0.wlc", MWAVE1)
    run_warclite_ingest_stream(spark, landing, root)
    _land_mixed(landing, "c1.wlc", MWAVE2)
    run_warclite_ingest_stream(spark, landing, root)

    def check_views(all_ids):
        rows = [_mixed_row(d) for d in all_ids]
        by_kind = {
            k: [r for r in rows if r[1] == k]
            for k in ("image", "audio", "video")
        }
        assert sorted(
            tuple(r) for r in served_audio_near_dup(spark, root).collect()
        ) == _batch_keep(spark, audio_near_dup_keep, by_kind["audio"])
        assert sorted(
            tuple(r) for r in served_video_near_dup(spark, root).collect()
        ) == _batch_keep(spark, video_near_dup_keep, by_kind["video"])
        assert sorted(
            tuple(r) for r in served_image_near_dup(spark, root).collect()
        ) == _batch_keep(spark, image_near_dup_keep, by_kind["image"])

    all_ids = MWAVE1 + MWAVE2
    check_views(all_ids)

    # the fixture is alive: the video payload-dup pairs really merged
    vkeep = {
        r["doc_id"]: r["keep"]
        for r in served_video_near_dup(spark, root).collect()
    }
    assert vkeep[1003] and not vkeep[1003 + 64]
    assert not vkeep[1064] and not vkeep[1065]

    # decode-once: one signature row set per DISTINCT payload
    n_aud = len({d % N_KEYS for d in all_ids
                 if d < VIDEO_BASE and media_kind(d) == "audio"})
    assert _served_sig(spark, root, "afp").count() == n_aud
    from aggregator_spark.operators.media_fixture import N_VIDEO_KEYS

    n_vid = len({d % N_VIDEO_KEYS for d in all_ids if d >= VIDEO_BASE})
    assert (
        _served_sig(spark, root, "vfh")
        .select("fp").distinct().count() == n_vid
    )

    # full-store compaction folds all three signature relations and
    # preserves every served view
    compact_media(spark, root)
    for rel in ("dhash", "afp", "vfh"):
        assert not os.path.isdir(os.path.join(root, rel))
    check_views(all_ids)

    # a post-compaction wave ingests against the folded bases and the
    # served views still equal the batch operators over the union
    wave3 = [70, 71, 1003 + 128, 1190]  # 1003+128 dups 1003's payload
    _land_mixed(landing, "c2.wlc", wave3)
    run_warclite_ingest_stream(spark, landing, root)
    check_views(all_ids + wave3)
