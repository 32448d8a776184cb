"""Deterministic media payload fixtures for the hash-matched
``media_features`` catalog query.

The driver's correctness gate needs a DuckDB oracle, and no SQL engine
decodes PNG/WAV — so the fixture makes the *expected output* a pure
function of ``doc_id % 256``: each doc gets a synthetic payload (even
ids → a gradient grayscale PNG, odd ids → a sine-burst 16-bit PCM WAV)
whose shape depends only on that key. The Spark side encodes and then
REALLY decodes the payload through ``operators.codecs`` (full PNG
unfilter, WAV PCM + spectral bands); the oracle side computes the same
expectation once per key in plain Python — same codec functions, same
numpy — and embeds it as a 256-row VALUES lookup the SQL joins on.
Round-trip through the real codecs is therefore hash-checked end to
end, not rows-only.

Float contract: features/rms pass through the Arrow FloatType boundary
(float32), then both sides serialize as HALF_UP micro-unit integers —
float-repr-proof across engines, same convention as
``embedding_normalize``.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

N_KEYS = 256  # expectation is a pure function of doc_id % N_KEYS
AUDIO_RATE = 16000
FEATURE_DIM = 16


def media_kind(doc_id: int) -> str:
    return "image" if doc_id % 2 == 0 else "audio"


def _image_pixels(k: int) -> np.ndarray:
    """Gradient grayscale (height, width) uint8 — non-constant so the
    PNG round-trip exercises real scanline content, not a fill."""
    height = 8 + k % 7
    width = 8 + k % 5
    y = np.arange(height)[:, None]
    x = np.arange(width)[None, :]
    return ((k + 3 * y + 7 * x) % 256).astype(np.uint8)


def _audio_samples(k: int) -> np.ndarray:
    """Sine burst, amplitude and frequency keyed on k."""
    n = 160 + k
    amp = 0.1 + 0.8 * (k / 255.0)
    freq = 100.0 + 10.0 * k
    t = np.arange(n, dtype=np.float64) / AUDIO_RATE
    return amp * np.sin(2.0 * math.pi * freq * t)


@lru_cache(maxsize=N_KEYS)
def build_payload(k: int) -> bytes:
    """Encoded media bytes for key k (PNG for even, WAV for odd)."""
    from aggregator_spark.operators.codecs import encode_png, encode_wav

    if k % 2 == 0:
        return encode_png(_image_pixels(k))
    return encode_wav(_audio_samples(k), rate=AUDIO_RATE)


def _micro(v: float) -> int:
    """Micro-units of a float32-bounded value, mirroring Spark's
    ``cast(round(col * 1e6) as bigint)`` EXACTLY: F.round is Java
    BigDecimal.valueOf(double) HALF_UP, i.e. HALF_UP on the SHORTEST
    decimal representation (Python ``repr``), not on the exact binary
    expansion — the two differ on representable half-values (pinned by
    an 18k adversarial sweep vs Spark)."""
    from decimal import ROUND_HALF_UP, Decimal

    x = float(np.float32(v)) * 1e6
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _micro_str(vals: list[float]) -> str:
    return ",".join(str(_micro(v)) for v in vals)


@lru_cache(maxsize=N_KEYS)
def expected_row(k: int) -> tuple:
    """(width, height, duration_ms, rms_micro, feat_str) expected from
    the REAL decode of build_payload(k); None for the other modality's
    columns. Runs the same codec functions the Spark workers run."""
    from aggregator_spark.operators.codecs import (
        audio_features,
        decode_png,
        decode_wav,
        image_features,
    )

    payload = build_payload(k)
    if k % 2 == 0:
        px = decode_png(payload)
        feats = image_features(px, FEATURE_DIM)
        return (px.shape[1], px.shape[0], None, None, _micro_str(feats))
    rate, _, samples = decode_wav(payload)
    duration_ms, rms, bands = audio_features(samples, rate, FEATURE_DIM)
    return (None, None, duration_ms, _micro(rms), _micro_str(bands))


def lookup_values_sql() -> str:
    """The 256-row (k, width, height, duration_ms, rms_micro, feat_str)
    VALUES list for the DuckDB oracle."""
    rows = []
    for k in range(N_KEYS):
        w, h, dur, rms, feats = expected_row(k)

        def lit(v):
            return "CAST(NULL AS BIGINT)" if v is None else str(v)

        rows.append(f"({k}, {lit(w)}, {lit(h)}, {lit(dur)}, {lit(rms)}, '{feats}')")
    return ",\n".join(rows)


@lru_cache(maxsize=N_KEYS)
def expected_dhash(k: int) -> str:
    """64-char dHash expected from the REAL decode of the even key's
    PNG payload — same codec functions the Spark workers run
    (integer-exact, so closed-form across engines)."""
    from aggregator_spark.operators.codecs import decode_png, dhash64

    return dhash64(decode_png(build_payload(k)))


def dhash_lookup_values_sql() -> str:
    """(k, dhash) VALUES rows for the DuckDB oracle — one per even
    (image) fixture key."""
    return ",\n".join(
        f"({k}, '{expected_dhash(k)}')" for k in range(0, N_KEYS, 2)
    )


@lru_cache(maxsize=N_KEYS)
def expected_audio_fp(k: int) -> str:
    """64-char spectral fingerprint expected from the REAL decode of
    the odd key's WAV payload — same codec functions the Spark workers
    run."""
    from aggregator_spark.operators.codecs import (
        audio_fingerprint64,
        decode_wav,
    )

    rate, _, samples = decode_wav(build_payload(k))
    return audio_fingerprint64(samples, rate)


def audio_fp_lookup_values_sql() -> str:
    """(k, afp) VALUES rows for the DuckDB oracle — one per odd
    (audio) fixture key."""
    return ",\n".join(
        f"({k}, '{expected_audio_fp(k)}')" for k in range(1, N_KEYS, 2)
    )


# ---- video fixture (r6): same contract as image/audio, AVI modality --

N_VIDEO_KEYS = 64  # videos key on doc_id % N_VIDEO_KEYS
VIDEO_FPS = 4
VIDEO_EVERY_MS = 500  # catalog sampling interval


def _video_frames(k: int) -> list:
    """2–5 small gradient RGB frames whose content moves per frame —
    the AVI round-trip exercises real multi-frame demux, not a still."""
    n_frames = 2 + k % 4
    height = 6 + k % 5
    width = 6 + k % 3
    frames = []
    y = np.arange(height)[:, None, None]
    x = np.arange(width)[None, :, None]
    c = np.arange(3)[None, None, :]
    for i in range(n_frames):
        frames.append(
            ((k + 5 * i + 3 * y + 7 * x + 11 * c) % 256).astype(np.uint8)
        )
    return frames


@lru_cache(maxsize=N_VIDEO_KEYS)
def build_video_payload(k: int) -> bytes:
    from aggregator_spark.operators.codecs import encode_avi

    return encode_avi(_video_frames(k), fps=VIDEO_FPS)


@lru_cache(maxsize=N_VIDEO_KEYS)
def expected_video_rows(k: int) -> tuple:
    """((frame_index, frame_ts_ms, md5_hex_of_png), ...) expected from
    the REAL demux+sample of build_video_payload(k) — same codec
    functions the Spark workers run, PNG bytes hashed because the
    payload itself is the value under test."""
    import hashlib

    from aggregator_spark.operators.codecs import decode_avi, encode_png

    us_per_frame, frames = decode_avi(build_video_payload(k))
    duration_ms = len(frames) * us_per_frame // 1000
    n = max(1, int(duration_ms // VIDEO_EVERY_MS))
    rows = []
    for i in range(n):
        ts_ms = i * VIDEO_EVERY_MS
        fidx = min(len(frames) - 1, ts_ms * 1000 // us_per_frame)
        png = encode_png(frames[fidx])
        rows.append((int(fidx), ts_ms, hashlib.md5(png).hexdigest()))
    return tuple(rows)


@lru_cache(maxsize=N_VIDEO_KEYS)
def expected_video_fhashes(k: int) -> tuple[str, ...]:
    """Sorted distinct dHashes of the key's SAMPLED frames — the
    video near-dup signature set, computed by the same demux/sample/
    hash functions the Spark workers run (raw frame arrays: the PNG
    round-trip is lossless, pinned in tests)."""
    from aggregator_spark.operators.codecs import decode_avi, dhash64

    us_per_frame, frames = decode_avi(build_video_payload(k))
    duration_ms = len(frames) * us_per_frame // 1000
    n = max(1, int(duration_ms // VIDEO_EVERY_MS))
    hashes = set()
    for i in range(n):
        ts_ms = i * VIDEO_EVERY_MS
        fidx = min(len(frames) - 1, ts_ms * 1000 // us_per_frame)
        hashes.add(dhash64(frames[fidx]))
    return tuple(sorted(hashes))


def video_fhash_lookup_values_sql() -> str:
    """(k, fhash) VALUES rows for the DuckDB oracle — one row per
    distinct sampled-frame dHash per video key."""
    rows = []
    for k in range(N_VIDEO_KEYS):
        for h in expected_video_fhashes(k):
            rows.append(f"({k}, '{h}')")
    return ",\n".join(rows)


def video_lookup_values_sql() -> str:
    """(k, frame_index, frame_ts_ms, frame_md5) VALUES rows for the
    DuckDB oracle — one row per expected sampled frame per key."""
    rows = []
    for k in range(N_VIDEO_KEYS):
        for fidx, ts_ms, md5hex in expected_video_rows(k):
            rows.append(f"({k}, {fidx}, {ts_ms}, '{md5hex}')")
    return ",\n".join(rows)
