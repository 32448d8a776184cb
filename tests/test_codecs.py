"""Real PNG/WAV codecs (operators/codecs.py) and their wiring into the
multimodal operators: decode is exercised on genuinely-encoded payloads,
including PNGs using every scanline filter type, not just our encoder's
filter-0 output."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aggregator_spark.operators.codecs import (
    UnsupportedMediaError,
    audio_features,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_features,
    png_info,
    resize_nearest,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    px = _rng().integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    payload = encode_png(px)
    w, h, depth, _ = png_info(payload)
    assert (w, h, depth) == (9, 13, 8)
    out = decode_png(payload)
    assert out.shape == (13, 9, channels)
    assert np.array_equal(out, px)


def _png_with_filter(px, ftype):
    """Hand-build a PNG whose every scanline uses filter `ftype` —
    our encoder only emits filter 0, but real PNGs use all five."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            filt = (cur - left) % 256
        elif ftype == 2:
            filt = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            filt = (cur - ((left + prev) >> 1)) % 256
        elif ftype == 4:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            filt = (cur - pred) % 256
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types(ftype):
    px = _rng(ftype).integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_with_filter(px, ftype)), px)


def test_png_palette_expansion():
    # 2x2 palette image: indices into a 3-color PLTE
    palette = b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"
    raw = b"\x00\x00\x01" + b"\x00\x02\x00"  # filter 0 + indices per row

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    px = decode_png(payload)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 1]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (0, 0, 255)


def test_png_rejects_out_of_scope():
    px = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    payload[24] = 16  # bit depth byte in IHDR
    with pytest.raises(UnsupportedMediaError):
        decode_png(bytes(payload))
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")


def test_resize_nearest_identity_and_downscale():
    px = _rng().integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(px, 8, 8), px)
    small = resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small[0, 0], px[0, 0])


def test_image_features_flat_image_is_constant():
    px = np.full((32, 32, 3), 128, dtype=np.uint8)
    feats = image_features(px)
    assert len(feats) == 16
    assert all(abs(f - 128 / 255) < 1e-6 for f in feats)


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(sine, rate)
    got_rate, channels, samples = decode_wav(payload)
    assert (got_rate, channels) == (rate, 1)
    assert len(samples) == rate
    dur, rms, bands = audio_features(samples, rate)
    assert dur == 1000
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert abs(rms - 0.35355) < 1e-3
    assert len(bands) == 16
    assert max(bands) > 0


def test_wav_formats():
    rate = 4000
    samples = 0.25 * np.sin(np.arange(rate) / 20.0)
    # float32 WAV (format tag 3)
    pcm = samples.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got_rate, _, got = decode_wav(payload)
    assert got_rate == rate
    assert np.allclose(got[:, 0], samples, atol=1e-6)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_multimodal_real_codecs_end_to_end(spark):
    """The multimodal operators' real (fake=False) path over genuinely
    encoded PNG/WAV payloads riding the MEDIA schema."""
    from aggregator_spark.operators.multimodal import (
        decode_image_features,
        extract_audio_features,
        resize_images,
    )
    from aggregator_spark.schemas import MEDIA

    png = encode_png(
        _rng().integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    )
    rate = 8000
    wav = encode_wav(
        0.5 * np.sin(2 * np.pi * 440 * np.arange(rate) / rate), rate
    )
    rows = [
        (1, "image", bytearray(png), "image/png", 30, 20, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, 1000),
    ]
    df = spark.createDataFrame(rows, MEDIA)

    img = decode_image_features(df).collect()
    assert len(img) == 1
    assert (img[0]["width"], img[0]["height"]) == (30, 20)
    assert len(img[0]["features"]) == 16

    rsz = resize_images(df, width=8, height=8).collect()
    assert len(rsz) == 1
    out_px = decode_png(bytes(rsz[0]["payload"]))
    assert out_px.shape == (8, 8, 3)

    aud = extract_audio_features(df).collect()
    assert len(aud) == 1
    assert aud[0]["duration_ms"] == 1000
    assert abs(aud[0]["rms"] - 0.35355) < 1e-3


def test_micro_matches_spark_round_sweep(spark):
    """_micro claims to mirror Spark's cast(round(col*1e6) as bigint)
    on FloatType values — verify against Spark itself over a
    deterministic sweep including negatives and near-tie magnitudes."""
    import numpy as np
    from pyspark.sql import functions as F

    from aggregator_spark.operators.media_fixture import _micro

    vals = [
        float(np.float32(s * (i + 0.5) / 7919.0 * 10.0 ** -e))
        for i in range(200)
        for s in (1.0, -1.0)
        for e in (3, 5, 6)
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v float")
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", F.round(F.col("v") * 1e6).cast("bigint").alias("m")
        ).collect()
    }
    for i, v in enumerate(vals):
        assert _micro(v) == got[i], (i, v, _micro(v), got[i])


# ---- AVI (r6) ----


def test_avi_roundtrip_multiframe():
    from aggregator_spark.operators.codecs import decode_avi, encode_avi, is_avi

    frames = [
        _rng(i).integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
        for i in range(4)
    ]
    payload = encode_avi(frames, fps=5)
    assert is_avi(payload)
    us, out = decode_avi(payload)
    assert us == 200_000 and len(out) == 4
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_avi_stride_padding_and_grayscale_promotion():
    from aggregator_spark.operators.codecs import decode_avi, encode_avi

    # width 7 → 21-byte rows pad to 24 (DIB 4-byte alignment)
    g = (np.arange(35).reshape(5, 7) % 256).astype(np.uint8)
    us, out = decode_avi(encode_avi([g], fps=2))
    assert out[0].shape == (5, 7, 3)
    assert np.array_equal(out[0][:, :, 0], g)
    assert np.array_equal(out[0][:, :, 1], g)


def test_avi_rejects_out_of_scope():
    from aggregator_spark.operators.codecs import decode_avi, encode_avi

    payload = bytearray(
        encode_avi([np.zeros((4, 4), dtype=np.uint8)], fps=2)
    )
    # flip biCompression (strf offset: find the strf chunk, dword 6)
    i = payload.find(b"strf")
    struct.pack_into("<I", payload, i + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(UnsupportedMediaError, match="compression"):
        decode_avi(bytes(payload))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_video_frame_sampling_real_path(spark):
    """sample_video_frames(fake=False) demuxes a real AVI: source-frame
    selection per sampled instant, PNG payloads decodable by the image
    codec, duration derived from the avih header."""
    from aggregator_spark.operators.codecs import encode_avi
    from aggregator_spark.operators.multimodal import sample_video_frames
    from aggregator_spark.schemas import MEDIA

    # 6 frames at 2 fps → 3000 ms; sample every 1000 ms → ts 0/1000/2000
    # hitting source frames 0/2/4
    frames = [
        np.full((5, 5, 3), 40 * i, dtype=np.uint8) for i in range(6)
    ]
    avi = encode_avi(frames, fps=2)
    df = spark.createDataFrame(
        [(7, "video", bytearray(avi), "video/avi", 5, 5, None)], MEDIA
    )
    out = sorted(
        sample_video_frames(df, every_ms=1000, fake=False).collect(),
        key=lambda r: r["frame_ts_ms"],
    )
    assert [(r["frame_index"], r["frame_ts_ms"]) for r in out] == [
        (0, 0),
        (2, 1000),
        (4, 2000),
    ]
    px = decode_png(bytes(out[1]["frame_payload"]))
    assert px.shape == (5, 5, 3) and int(px[0, 0, 0]) == 80
