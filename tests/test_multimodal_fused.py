"""Pin the r13 fused single-decode pass (multimodal.media_decode_all +
analytics_queries4.features_from_decoded) row-equal to the unfused
single-purpose operators it replaced in the ingest store fold — the
optimization changes HOW values are produced (one decode per payload
instead of two), never WHAT is produced."""

from __future__ import annotations

import pytest

from aggregator_spark.sources.media_store import store_kind, store_row


@pytest.fixture(scope="module")
def media(spark):
    # a spread of doc_ids covering all three modalities and payload-key
    # wraparound (the store's residue map: even→image, %4==1→audio,
    # %4==3→video)
    ids = list(range(0, 24)) + [256, 257, 259, 513, 515]
    rows = [store_row(d) for d in ids]
    df = spark.createDataFrame(
        [(m, k, bytearray(p)) for (m, k, p) in rows],
        "media_id long, kind string, payload binary",
    )
    return df.localCheckpoint(eager=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_image_matches_unfused(spark, media):
    from aggregator_spark.operators.multimodal import (
        decode_image_features,
        image_dhash,
        media_decode_all,
    )

    dec = media_decode_all(media)
    img = dec.filter("kind = 'image'")
    assert _rows(img.select("media_id", "dhash")) == _rows(
        image_dhash(media)
    )
    assert _rows(
        img.select("media_id", "width", "height", "features")
    ) == _rows(decode_image_features(media, fake=False))


def test_fused_audio_matches_unfused(spark, media):
    from aggregator_spark.operators.multimodal import (
        audio_fp64,
        extract_audio_features,
        media_decode_all,
    )

    dec = media_decode_all(media)
    aud = dec.filter("kind = 'audio'")
    assert _rows(aud.select("media_id", "afp")) == _rows(audio_fp64(media))
    assert _rows(
        aud.select("media_id", "duration_ms", "rms", "features")
    ) == _rows(
        extract_audio_features(media, fake=False).select(
            "media_id", "duration_ms", "rms", F_mfcc()
        )
    )


def F_mfcc():
    from pyspark.sql import functions as F

    return F.col("mfcc").alias("features")


def test_fused_video_matches_unfused(spark, media):
    from pyspark.sql import functions as F

    from aggregator_spark.operators.multimodal import (
        media_decode_all,
        video_frame_dhash,
    )

    dec = media_decode_all(media)
    fused = dec.filter("kind = 'video'").select(
        "media_id", F.explode("fhashes").alias("fhash")
    )
    assert _rows(fused) == _rows(
        video_frame_dhash(media).select("media_id", "fhash")
    )


def test_fused_features_projection_matches(spark, media):
    from aggregator_spark.analytics_queries4 import (
        features_from_decoded,
        features_from_media,
    )
    from aggregator_spark.operators.multimodal import media_decode_all

    fused = features_from_decoded(media_decode_all(media))
    assert _rows(fused) == _rows(features_from_media(media))
    assert fused.schema == features_from_media(media).schema


def test_store_kind_residues():
    for d in range(0, 40):
        k = store_kind(d)
        if d % 2 == 0:
            assert k == "image"
        elif d % 4 == 1:
            assert k == "audio"
        else:
            assert k == "video"
