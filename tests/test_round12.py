"""Round-12 property pins: perceptual image near-dup dedup (VERDICT
r11 what's-missing #1 / next-round item 3).

- dhash64 invariances: the hash must survive the transformations a
  near-dup actually undergoes (re-encode, uniform brightness shift,
  small crop/shift, downscale) and separate unrelated content.
- The crafted near-dup-pair pin: the SAME image patch-edited (flips
  1–3 dHash bits, inside the banding's exact-recall radius) must be
  FOUND by the banded pipeline and merged by components — liveness of
  the non-identical near-dup path, which the fixture alone can't
  guarantee (its gradients also collide exactly).
- Closed-form oracle parity: expected_dhash(k) is the same function
  of the fixture key on both engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aggregator_spark.operators.codecs import (
    decode_png,
    dhash64,
    encode_png,
)


def _ham(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def _base_image() -> np.ndarray:
    """Deterministic textured (non-smooth) grayscale image — smooth
    gradients make every perturbation hash-invariant, which would pin
    nothing."""
    y = np.arange(32)[:, None]
    x = np.arange(40)[None, :]
    return ((3 * y * y + 5 * x + (x * y) % 7) % 200).astype(np.uint8)


def _patched(px: np.ndarray) -> np.ndarray:
    """A local brightening patch — the small-edit near-dup (flips 2
    dHash bits on the base image, verified below)."""
    v = px.copy()
    v[8:12, 10:15] = np.minimum(
        v[8:12, 10:15].astype(int) + 50, 255
    ).astype(np.uint8)
    return v


def test_dhash_invariances_and_separation():
    base = _base_image()
    h0 = dhash64(base)
    assert len(h0) == 64 and set(h0) <= {"0", "1"}
    # re-encode round-trip: identical bytes-of-pixels, identical hash
    assert dhash64(decode_png(encode_png(base))) == h0
    # uniform brightness shift (no wrap): differences preserved
    assert dhash64((base + 40).astype(np.uint8)) == h0
    # one-pixel crop/shift and 2x downscale are grid-stable where the
    # content is smoother than the 8x9 grid (the invariance dHash is
    # built for); the textured base's sub-cell detail legitimately
    # moves bits, so pin these on a smooth gradient
    y = np.arange(32)[:, None]
    x = np.arange(40)[None, :]
    smooth = ((2 * y + 3 * x) % 200).astype(np.uint8)
    hs = dhash64(smooth)
    assert _ham(hs, dhash64(smooth[:, 1:])) == 0
    assert _ham(hs, dhash64(smooth[::2, ::2])) == 0
    # the crafted small edit sits INSIDE the near-dup radius
    d_edit = _ham(h0, dhash64(_patched(base)))
    assert 1 <= d_edit <= 3, d_edit
    # unrelated content sits far OUTSIDE it
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, size=(32, 40)).astype(np.uint8)
    assert _ham(h0, dhash64(noise)) > 10


def test_dhash_degenerate_sizes():
    """Images narrower than the 9-column grid produce empty cells —
    deterministic '0' bits, never a crash (fixture widths go down to
    8 px)."""
    tiny = (np.arange(64).reshape(8, 8) % 256).astype(np.uint8)
    h = dhash64(tiny)
    assert len(h) == 64
    # RGB input folds channels exactly (sum, not float mean)
    rgb = np.stack([tiny, tiny, tiny], axis=2)
    assert dhash64(rgb) == h


def test_expected_dhash_matches_real_decode():
    """The oracle's closed form IS the worker computation: payload →
    real PNG decode → dhash64, per fixture key."""
    from aggregator_spark.operators.media_fixture import (
        build_payload,
        expected_dhash,
    )

    for k in range(0, 32, 2):
        assert expected_dhash(k) == dhash64(decode_png(build_payload(k)))


def _media_df(spark):
    """Crafted corpus: base (10), brightness twin (20) — EXACT dHash
    collision, the contraction path; patch-edit near-dup (30) —
    hamming 2, the banded-candidate path; unrelated (40)."""
    base = _base_image()
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, size=(32, 40)).astype(np.uint8)
    rows = [
        (10, "image", bytearray(encode_png(base))),
        (20, "image", bytearray(encode_png((base + 40).astype(np.uint8)))),
        (30, "image", bytearray(encode_png(_patched(base)))),
        (40, "image", bytearray(encode_png(noise))),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def test_image_near_dup_pipeline_liveness(spark):
    """The end-to-end crafted pin (VERDICT r11 item 3 done-criteria):
    re-encoded/shifted copies of one image must collapse to one
    survivor through BOTH merge paths — exact signature collision AND
    a banded non-zero-Hamming edge — while unrelated content survives
    untouched."""
    from aggregator_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_keep,
        image_near_dup_pairs,
    )

    media = _media_df(spark)
    sigs = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(media).collect()
    }
    assert sigs[10] == sigs[20]  # brightness twin: exact collision
    assert 1 <= _ham(sigs[10], sigs[30]) <= 3
    assert _ham(sigs[10], sigs[40]) > 3

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_near_dup_pairs(media).collect()
    }
    # node representatives are min-ids per signature: {10,20}→10,
    # {30}→30, {40}→40; the ONLY banded edge is the patch edit
    assert set(pairs) == {(10, 30)}
    assert 1 <= pairs[(10, 30)] <= 3

    keep = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in image_near_dup_keep(media).collect()
    }
    assert keep == {
        10: (10, True),
        20: (10, False),
        30: (10, False),
        40: (40, True),
    }


def test_image_entries_stay_driver_checkable():
    """The r12 media novelties took their driver rows in the r12 window
    (CORRECTNESS_r12.json); from r13 on they rotate with the age ledger
    like every other entry. The durable invariant is that each stays a
    catalog entry WITH a DuckDB oracle — membership in the current
    round's window is the ledger test's job (test_driver_window.py)."""
    from aggregator_spark.oracles import oracle_sql
    from aggregator_spark.testdata_queries import queries

    qs = queries()
    osql = oracle_sql()
    for name in ("image_dhash", "image_near_dup_pairs",
                 "image_near_dup_keep", "audio_fingerprint",
                 "audio_near_dup_keep"):
        assert name in qs
        assert name in osql


# ---- audio twin -------------------------------------------------------


def _tone(rate: int = 16000, n: int = 2000) -> np.ndarray:
    t = np.arange(n) / rate
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1250 * t)
        + 0.05 * np.sin(2 * np.pi * 3100 * t)
    )


def test_audio_fingerprint_invariances_and_separation():
    from aggregator_spark.operators.codecs import (
        audio_fingerprint64,
        decode_wav,
        encode_wav,
    )

    rate = 16000
    base = _tone(rate)
    h0 = audio_fingerprint64(base, rate)
    assert len(h0) == 64 and set(h0) <= {"0", "1"}
    # level invariance: a uniform gain scales every band equally
    assert audio_fingerprint64(base * 0.5, rate) == h0
    assert audio_fingerprint64(base * 1.7, rate) == h0
    # re-encode (int16 quantization) round-trip
    r2, _, s2 = decode_wav(encode_wav(base, rate))
    assert audio_fingerprint64(s2.ravel(), r2) == h0
    # small additive noise sits INSIDE the near-dup radius (0.08 RMS
    # on a 0.5-amplitude tone flips 2 threshold bits; quieter noise
    # flips none — thresholded-energy bits are stabler than the old
    # comparison chain)
    rng = np.random.RandomState(3)
    noisy = base + 0.08 * rng.randn(len(base))
    d = _ham(h0, audio_fingerprint64(noisy, rate))
    assert 0 < d <= 3, d
    # unrelated content sits far OUTSIDE it
    assert _ham(h0, audio_fingerprint64(
        rng.randn(len(base)) * 0.3, rate)) > 10


def test_expected_audio_fp_matches_real_decode():
    from aggregator_spark.operators.codecs import (
        audio_fingerprint64,
        decode_wav,
    )
    from aggregator_spark.operators.media_fixture import (
        build_payload,
        expected_audio_fp,
    )

    for k in range(1, 32, 2):
        rate, _, samples = decode_wav(build_payload(k))
        assert expected_audio_fp(k) == audio_fingerprint64(samples, rate)


def test_audio_near_dup_pipeline_liveness(spark):
    """The audio crafted pin, mirroring the image one: a gain copy
    (exact fingerprint collision), a lightly-noised copy (banded
    non-zero-Hamming edge), and unrelated content that survives."""
    from aggregator_spark.operators.codecs import encode_wav
    from aggregator_spark.operators.multimodal import (
        audio_fp64,
        audio_near_dup_keep,
    )

    rate = 16000
    base = _tone(rate)
    rng = np.random.RandomState(3)
    noisy = base + 0.08 * rng.randn(len(base))
    unrelated = rng.randn(len(base)) * 0.3
    rows = [
        (10, "audio", bytearray(encode_wav(base, rate))),
        (20, "audio", bytearray(encode_wav(base * 0.5, rate))),
        (30, "audio", bytearray(encode_wav(noisy, rate))),
        (40, "audio", bytearray(encode_wav(unrelated, rate))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    sigs = {
        r["media_id"]: r["afp"] for r in audio_fp64(media).collect()
    }
    assert sigs[10] == sigs[20]
    assert 1 <= _ham(sigs[10], sigs[30]) <= 3
    assert _ham(sigs[10], sigs[40]) > 3
    keep = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in audio_near_dup_keep(media).collect()
    }
    assert keep == {
        10: (10, True),
        20: (10, False),
        30: (10, False),
        40: (40, True),
    }


# ---- video twin (operator-level; no window slot left this round) ----


def _frames(seed: int, n: int = 3):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 200, size=(16, 20, 3)).astype(np.uint8)
        for _ in range(n)
    ]


def test_video_near_dup_pipeline_liveness(spark):
    """The third modality on the shared machinery: a re-encoded copy
    (all frame hashes shared), a one-frame-edited copy (two of three
    frames shared), and an unrelated video that survives. Star edges
    per frame-hash bucket — connectivity equals the clique."""
    from aggregator_spark.operators.codecs import encode_avi
    from aggregator_spark.operators.multimodal import (
        video_frame_dhash,
        video_near_dup_keep,
    )

    base = _frames(1)
    edited = [f.copy() for f in base]
    edited[2] = _frames(99)[0]  # replace one frame entirely
    rows = [
        (10, "video", bytearray(encode_avi(base, fps=4))),
        (20, "video", bytearray(encode_avi(base, fps=4))),  # re-encode
        (30, "video", bytearray(encode_avi(edited, fps=4))),
        (40, "video", bytearray(encode_avi(_frames(7), fps=4))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    fh = video_frame_dhash(media, every_ms=250).collect()
    by_vid = {}
    for r in fh:
        by_vid.setdefault(r["media_id"], set()).add(r["fhash"])
    assert by_vid[10] == by_vid[20]
    shared = by_vid[10] & by_vid[30]
    assert shared and by_vid[30] - by_vid[10]
    assert not (by_vid[10] & by_vid[40])

    keep = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in video_near_dup_keep(media, every_ms=250).collect()
    }
    assert keep == {
        10: (10, True),
        20: (10, False),
        30: (10, False),
        40: (40, True),
    }
