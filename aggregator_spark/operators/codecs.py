"""Real, dependency-free media codecs for the multimodal operators.

The container has no PIL/libvips/ffmpeg, but PNG and WAV are simple
enough to decode with the stdlib (`zlib`, `struct`) + numpy — so the
image/audio paths of ``operators.multimodal`` get a REAL decode stage,
not just the deterministic fake. Scope (documented contract):

- PNG: non-interlaced, 8-bit grayscale / gray+alpha / RGB / RGBA /
  palette. All five filter types per the PNG spec. Interlaced (Adam7)
  and 16-bit raise ``UnsupportedMediaError``.
- WAV: RIFF/WAVE with 8/16/32-bit integer PCM or 32-bit float
  (format tags 1 and 3). Compressed formats raise.

Everything here is per-row pure-Python/numpy and runs inside the
Arrow-batched ``mapInPandas`` workers of ``multimodal.py`` — the
distributed shape (partitioning, batch size, schema) is unchanged
whether the codec is real or fake.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from functools import lru_cache

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# ---- decode-once-per-distinct-payload memo (r13, guide §4.3) -------
# A crawl-shaped corpus re-delivers the SAME asset from thousands of
# pages; every derived value here (signature, feature vector) is a
# pure function of the payload bytes, so each Python worker pays one
# decode per DISTINCT payload instead of one per arrival — the batch
# analogue of the ingest store's first-seen contract. Keyed on
# (derivation, blake2b-128(payload)): the memo key never needs to
# match the store's fp values (md5 there is a documented identity
# contract), so it uses a collision-resistant digest — two crafted
# distinct payloads cannot be made to share a cached decode (r14,
# ADVICE). Values are small (signature strings, float lists), never
# payloads or pixel arrays; the table resets at 64k entries to bound
# worker memory. Workers are single-threaded per task, so a plain
# dict is safe.
_PAYLOAD_MEMO: dict[tuple, object] = {}
_PAYLOAD_MEMO_MAX = 1 << 16


def payload_memo(kind, payload: bytes, compute):
    """Return ``compute()`` memoized under (kind, blake2b(payload));
    ``kind`` is any hashable derivation tag (callers fold non-content
    parameters like the video sample grid into it)."""
    key = (kind, hashlib.blake2b(payload or b"", digest_size=16).digest())
    hit = _PAYLOAD_MEMO.get(key)
    if hit is None:
        if len(_PAYLOAD_MEMO) >= _PAYLOAD_MEMO_MAX:
            _PAYLOAD_MEMO.clear()
        hit = compute()
        _PAYLOAD_MEMO[key] = hit
    return hit


class UnsupportedMediaError(NotImplementedError):
    """Payload is valid media but outside the documented codec scope."""


def is_png(payload: bytes) -> bool:
    return bool(payload) and payload[:8] == _PNG_MAGIC


def png_info(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — O(1), no
    pixel decode. Raises ValueError on a non-PNG payload."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    if payload[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    w, h, depth, ctype = struct.unpack(">IIBB", payload[16:26])
    return w, h, depth, ctype


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Returns (height, stride)
    uint8. Sequential by spec — each line's reconstruction feeds the
    next — but each payload is one row of a batch, so parallelism comes
    from the executor fan-out, not from inside one image."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos
        ).astype(np.int32)
        pos += stride
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                rec[i] = (rec[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Full PNG decode → (height, width, channels) uint8 array.
    Palette images are expanded to RGB."""
    w, h, depth, ctype = png_info(payload)
    if depth != 8:
        raise UnsupportedMediaError(f"PNG bit depth {depth} (only 8)")
    if ctype not in _CHANNELS:
        raise UnsupportedMediaError(f"PNG color type {ctype}")
    idat = bytearray()
    palette = None
    pos = 8
    interlace = payload[28]
    if interlace:
        raise UnsupportedMediaError("interlaced (Adam7) PNG")
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + crc
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    expect = h * (stride + 1)
    if len(raw) != expect:
        raise ValueError(f"PNG data length {len(raw)} != expected {expect}")
    px = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 on every scanline): inverse of
    ``decode_png`` for 8-bit gray/RGB/RGBA arrays."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure indexing."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return px[ys][:, xs]


def image_features(px: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic real features from decoded pixels: a 4x4 grid of
    mean grayscale intensities (unit scale) — the classic thumbnail
    descriptor, comparable across codecs."""
    gray = px[:, :, :3].mean(axis=2) if px.shape[2] >= 3 else px[:, :, 0]
    side = int(dim**0.5)
    tiles = resize_nearest(
        gray[:, :, None], side * 8, side * 8
    )[:, :, 0].astype(np.float64)
    feats = []
    step = side * 8 // side
    for ty in range(side):
        for tx in range(side):
            tile = tiles[ty * step : (ty + 1) * step, tx * step : (tx + 1) * step]
            feats.append(round(float(tile.mean()) / 255.0, 6))
    return feats


def dhash64(px: np.ndarray, hash_size: int = 8) -> str:
    """64-bit difference hash (dHash) of decoded pixels as a 64-char
    '0'/'1' string — the same cross-engine-safe representation as
    ``dedup.simhash64``, so the Manku banded-Hamming machinery and the
    DuckDB ``hamming()`` oracle apply unchanged.

    The classic perceptual fingerprint (size/compression invariant):
    box-downscale to a ``hash_size x (hash_size+1)`` luminance grid,
    then bit[r*8+c] = 1 iff cell(r, c+1) is brighter than cell(r, c).
    Everything is EXACT integer arithmetic — cell boundaries are
    ``floor(i*H/rows)``, and the mean comparison cross-multiplies cell
    sums by cell areas instead of dividing — so the hash is a pure
    function of the pixel bytes on any platform (no float rounding),
    which is what lets the driver oracle carry a closed-form expected
    hash per fixture key."""
    if px.ndim == 2:
        px = px[:, :, None]
    lum = (
        px[:, :, :3].sum(axis=2, dtype=np.int64)
        if px.shape[2] >= 3
        else px[:, :, 0].astype(np.int64)
    )
    h, w = lum.shape
    rows, cols = hash_size, hash_size + 1
    rb = [i * h // rows for i in range(rows + 1)]
    cb = [j * w // cols for j in range(cols + 1)]
    sums = np.empty((rows, cols), dtype=np.int64)
    areas = np.empty((rows, cols), dtype=np.int64)
    for r in range(rows):
        for c in range(cols):
            cell = lum[rb[r] : rb[r + 1], cb[c] : cb[c + 1]]
            sums[r, c] = int(cell.sum())
            areas[r, c] = cell.size
    bits = []
    for r in range(rows):
        for c in range(cols - 1):
            left = sums[r, c] * areas[r, c + 1]
            right = sums[r, c + 1] * areas[r, c]
            bits.append("1" if right > left else "0")
    return "".join(bits)


# ---- WAV ----


def is_wav(payload: bytes) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, float64 samples in [-1, 1] shaped
    (n_frames, channels)). Integer PCM 8/16/32-bit and float32."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            samples = (
                np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
            )
        else:
            raise UnsupportedMediaError(f"{bits}-bit integer PCM")
    elif audio_fmt == 3 and bits == 32:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise UnsupportedMediaError(f"WAV format tag {audio_fmt}/{bits}-bit")
    n = len(samples) // channels * channels
    return rate, channels, samples[:n].reshape(-1, channels)


def encode_wav(
    samples: np.ndarray, rate: int = 16000, channels: int | None = None
) -> bytes:
    """Minimal 16-bit PCM WAV encoder (inverse of decode_wav) for
    float samples in [-1, 1]."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = channels or samples.shape[1]
    pcm = (
        np.clip(samples, -1.0, 1.0) * 32767.0
    ).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(
    samples: np.ndarray, rate: int, dim: int = 16
) -> tuple[int, float, list[float]]:
    """(duration_ms, rms, band_energies[dim]) from decoded audio: real
    RMS plus log-spaced spectral band energies via numpy rFFT — the
    shape MFCCs occupy downstream, computed from actual signal."""
    mono = samples.mean(axis=1)
    duration_ms = int(round(len(mono) / rate * 1000.0))
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    spec = np.abs(np.fft.rfft(mono)) if len(mono) else np.zeros(1)
    edges = np.unique(
        np.geomspace(1, max(2, len(spec)), dim + 1).astype(int)
    )
    bands = np.zeros(dim)
    for i in range(min(dim, len(edges) - 1)):
        seg = spec[edges[i] : edges[i + 1]]
        if len(seg):
            bands[i] = np.log1p(float(np.mean(seg)))
    return duration_ms, round(rms, 6), [round(float(b), 6) for b in bands]


AUDIO_FP_SEGS = 8
AUDIO_FP_BANDS = 8  # 8 band-vs-segment-mean bits per segment -> 64 bits


def audio_fingerprint64(samples: np.ndarray, rate: int) -> str:
    """64-bit spectral audio fingerprint as a 64-char '0'/'1' string —
    the audio twin of ``dhash64`` (same signature contract, same
    banded-Hamming machinery and DuckDB ``hamming()`` oracle apply).

    Chromaprint-shaped: the clip splits into ``AUDIO_FP_SEGS`` equal
    time segments; per segment, ``AUDIO_FP_BANDS`` log-spaced spectral
    band energies (numpy rFFT, the ``audio_features`` band scheme);
    bit = band energy ABOVE the segment's mean band energy — i.e. the
    bit pattern marks WHERE the spectral mass sits, not just its
    monotone shape (an adjacent-band comparison chain collapsed the
    pure-tone fixture to 18 signatures, 36 of them all-zero — a
    signature that can't see which band is hot carries ~4 informative
    bits on tonal content; this form yields 87 distinct fixture
    signatures with none degenerate). Level-invariant by construction
    (a uniform gain scales every band AND the mean, preserving every
    comparison); robust to re-encode/quantization because thresholded
    energy, not raw energy, is the signature. Deterministic for a
    fixed numpy — the oracle computes the same closed form per
    fixture key (the ``audio_features`` float precedent). ``rate`` is
    accepted for interface symmetry; the fingerprint is
    sample-domain."""
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    n = len(mono)
    bits = []
    for s in range(AUDIO_FP_SEGS):
        seg = mono[s * n // AUDIO_FP_SEGS : (s + 1) * n // AUDIO_FP_SEGS]
        spec = np.abs(np.fft.rfft(seg)) if len(seg) else np.zeros(1)
        edges = _fp_band_edges(len(spec))
        bands = np.zeros(AUDIO_FP_BANDS)
        for i in range(min(AUDIO_FP_BANDS, len(edges) - 1)):
            sub = spec[edges[i] : edges[i + 1]]
            if len(sub):
                bands[i] = float(np.mean(sub))
        mean = float(np.mean(bands))
        for i in range(AUDIO_FP_BANDS):
            bits.append("1" if bands[i] > mean else "0")
    return "".join(bits)


@lru_cache(maxsize=4096)
def _fp_band_edges(spec_len: int) -> tuple[int, ...]:
    """Log-spaced band edges for a spectrum length — a pure function
    of the length, cached because the fingerprint loop would otherwise
    recompute geomspace+unique per segment per clip."""
    return tuple(
        np.unique(
            np.geomspace(1, max(2, spec_len), AUDIO_FP_BANDS + 1).astype(int)
        )
    )


# ---- AVI (uncompressed DIB video) ----
#
# Same RIFF container family as WAV, so the parser reuses the chunk
# discipline above. Scope (documented contract, like PNG/WAV): 'vids'
# stream with BI_RGB (biCompression=0) 24-bit bottom-up DIB frames in
# '00db'/'00dc' movi chunks. Compressed codecs (MJPG, cinepak, ...)
# raise UnsupportedMediaError — decoding those genuinely needs
# ffmpeg/pyav, which this container lacks.

_AVIH_FMT = "<IIIIIIIIII"  # first 10 dwords of the main AVI header


def is_avi(payload: bytes) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk_riff(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each chunk in [pos, end);
    LIST chunks yield their list type as fourcc with the inner span."""
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if tag == b"LIST" and length >= 4:
            yield buf[body : body + 4], body + 4, length - 4
        else:
            yield tag, body, length
        pos = body + length + (length & 1)  # chunks are word-aligned


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """(micro_sec_per_frame, frames) — each frame (height, width, 3)
    uint8 RGB, decoded from bottom-up BGR DIB rows. Raises
    UnsupportedMediaError outside the documented scope."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    us_per_frame = None
    width = height = None
    bitcount = compression = None
    frame_chunks: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, width, height, bitcount, compression
        for tag, body, length in _walk_riff(payload, pos, end):
            if tag in (b"hdrl", b"strl", b"movi"):
                walk(body, body + length)
            elif tag == b"avih":
                us_per_frame = struct.unpack(
                    "<I", payload[body : body + 4]
                )[0]
            elif tag == b"strf" and width is None:
                (_, width, height, _, bitcount, compression) = struct.unpack(
                    "<IiiHHI", payload[body : body + 20]
                )
            elif tag[2:4] in (b"db", b"dc"):
                frame_chunks.append(payload[body : body + length])

    walk(12, len(payload))
    if us_per_frame is None or width is None:
        raise ValueError("corrupt AVI: missing avih/strf headers")
    if compression != 0:
        raise UnsupportedMediaError(
            f"AVI compression 0x{compression:x} (only BI_RGB=0)"
        )
    if bitcount != 24:
        raise UnsupportedMediaError(f"AVI bit count {bitcount} (only 24)")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    frames = []
    for chunk in frame_chunks:
        if len(chunk) < stride * height:
            raise ValueError("corrupt AVI: short frame chunk")
        rows = np.frombuffer(
            chunk, dtype=np.uint8, count=stride * height
        ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
        if bottom_up:
            rows = rows[::-1]
        frames.append(rows[:, :, ::-1].copy())  # BGR → RGB
    return us_per_frame, frames


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Minimal uncompressed-AVI encoder (inverse of ``decode_avi``):
    24-bit BI_RGB bottom-up DIB frames, one '00db' chunk each."""
    if not frames:
        raise ValueError("need at least one frame")
    first = frames[0]
    if first.ndim == 2:
        frames = [np.repeat(f[:, :, None], 3, axis=2) for f in frames]
        first = frames[0]
    height, width, _ = first.shape
    stride = (width * 3 + 3) & ~3
    us_per_frame = 1_000_000 // fps

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        _AVIH_FMT,
        us_per_frame,
        stride * height * fps,
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,
        stride * height,
        width,
        height,
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), stride * height, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        stride * height, 0, 0, 0, 0,
    )
    movi_frames = []
    idx = []
    offset = 4  # relative to 'movi' fourcc
    for f in frames:
        bgr = f[::-1, :, ::-1].astype(np.uint8)  # top-down RGB → bottom-up BGR
        rows = np.zeros((f.shape[0], stride), dtype=np.uint8)
        rows[:, : f.shape[1] * 3] = bgr.reshape(f.shape[0], -1)
        body = rows.tobytes()
        movi_frames.append(chunk(b"00db", body))
        idx.append(b"00db" + struct.pack("<III", 0x10, offset, len(body)))
        offset += 8 + len(body) + (len(body) & 1)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(movi_frames))
    idx1 = chunk(b"idx1", b"".join(idx))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)
