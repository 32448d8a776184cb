"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (MEDIA schema in ``aggregator_spark.schemas``).

The Spark-side plumbing is real and tested: Arrow-batched
``mapInPandas`` operators with explicit output schemas, partition-count
preserved, constant memory per batch. Image and audio decode are REAL
for PNG and WAV payloads — pure stdlib/numpy codecs in
``operators.codecs`` (full PNG unfilter + palette expansion, PCM/float
WAV, spectral band energies), no external media library needed. The
``fake=True`` path keeps the deterministic md5-derived stand-in for
synthetic payloads (the testdata media table carries random bytes, not
encoded media). Video frame sampling is REAL too since r6:
uncompressed-AVI demux (RIFF/DIB, ``operators.codecs.decode_avi``) with
sampled frames re-encoded as PNG; compressed codecs remain out of scope
(``UnsupportedMediaError`` — MJPG et al genuinely need ffmpeg).

At scale: binary payloads ride the same parquet scans as everything else
(no separate object fetch per row when media is inlined; for
pointer-style payloads swap the decode UDF for a fetch+decode UDF and
raise ``spark.sql.files.maxPartitionBytes`` awareness — batches stay
bounded by Arrow batch size either way).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_DIM = 16

# Perceptual near-dup radius shared by the image/audio signature paths
# AND their DuckDB oracles (oracles_analytics12 interpolates it into
# the banding SQL and asserts its scheme stays pigeonhole-exact for
# this radius at import — ADVICE r12: a hardcoded copy silently
# desynchronized engine and oracle when either changed).
MEDIA_MAX_HAMMING = 3

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: md5 of the bytes
    → (width, height, FEATURE_DIM unit-scale floats). STUB — replace
    with PIL/libvips in a real deployment."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feats = [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]
    return width, height, feats


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media (kind='image') → (media_id, width, height, features[16]).

    Arrow-batched mapInPandas: one pandas batch in, one out — no per-row
    Python call overhead beyond the batch loop.

    Real path (``fake=False``): PNG payloads are actually decoded
    (operators/codecs.py) — true width/height from IHDR, features a 4x4
    grid of mean grayscale intensities from the decoded pixels.
    """

    def real_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import (
            decode_png,
            image_features,
            payload_memo,
        )

        def img_feats(payload: bytes):
            px = decode_png(payload)
            return (
                int(px.shape[0]),
                int(px.shape[1]),
                image_features(px, FEATURE_DIM),
            )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # decode once per DISTINCT payload per worker (r13,
                # guide §4.3 — see codecs.payload_memo)
                h, w, feats = payload_memo(
                    "imgfeat", payload, lambda: img_feats(payload)
                )
                out["media_id"].append(mid)
                out["height"].append(h)
                out["width"].append(w)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    def fake_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.filter(df.kind == "image").mapInPandas(
        fake_fn if fake else real_fn, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """media (kind='video') → one row per sampled frame.

    Real path (``fake=False``, since r6): uncompressed-AVI payloads are
    actually demuxed (operators/codecs.py:decode_avi — RIFF walk, BI_RGB
    bottom-up DIB frames), one sample per ``every_ms`` of real duration
    (duration = n_frames × µs/frame from the avih header),
    ``frame_index`` = the SOURCE frame at that instant, and
    ``frame_payload`` = the sampled frame re-encoded as PNG by the same
    encoder the image path decodes. Compressed codecs raise
    ``UnsupportedMediaError`` (documented scope — MJPG et al genuinely
    need ffmpeg, absent in this container).

    The fake path fabricates frame payloads as md5(payload ||
    frame_index) from the duration_ms metadata column, for synthetic
    corpora whose payloads are random bytes."""
    if not fake:

        def real_fn(batches: Iterator) -> Iterator:
            import pandas as pd

            from aggregator_spark.operators.codecs import (
                decode_avi,
                encode_png,
            )

            for pdf in batches:
                out = {
                    "media_id": [],
                    "frame_index": [],
                    "frame_ts_ms": [],
                    "frame_payload": [],
                }
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    us_per_frame, frames = decode_avi(payload)
                    duration_ms = len(frames) * us_per_frame // 1000
                    n = max(1, int(duration_ms // every_ms))
                    for i in range(n):
                        ts_ms = i * every_ms
                        fidx = min(
                            len(frames) - 1, ts_ms * 1000 // us_per_frame
                        )
                        out["media_id"].append(mid)
                        out["frame_index"].append(int(fidx))
                        out["frame_ts_ms"].append(ts_ms)
                        out["frame_payload"].append(
                            encode_png(frames[fidx])
                        )
                yield pd.DataFrame(out)

        return df.filter(df.kind == "video").mapInPandas(
            real_fn, FRAME_SAMPLE_SCHEMA
        )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_ts_ms": [],
                   "frame_payload": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, int((dur or 0) // every_ms))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_payload"].append(
                        hashlib.md5((payload or b"") + bytes([i % 256])).digest()
                    )
            yield pd.DataFrame(out)

    return df.filter(df.kind == "video").mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("mfcc", T.ArrayType(T.FloatType())),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media (kind='audio') → (media_id, duration_ms, rms, mfcc[16]).

    Real path (``fake=False``): WAV payloads are actually decoded
    (operators/codecs.py) — duration from the sample count, true RMS,
    and log-spaced spectral band energies (numpy rFFT) in the mfcc
    slot. Fake path keeps md5-derived stand-ins for synthetic bytes."""

    def real_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import (
            audio_features,
            decode_wav,
            payload_memo,
        )

        def au_feats(payload: bytes):
            rate, _, samples = decode_wav(payload)
            return audio_features(samples, rate, FEATURE_DIM)

        for pdf in batches:
            out = {"media_id": [], "duration_ms": [], "rms": [], "mfcc": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # decode once per DISTINCT payload per worker (r13,
                # guide §4.3 — see codecs.payload_memo)
                dur, rms, bands = payload_memo(
                    "aufeat", payload, lambda: au_feats(payload)
                )
                out["media_id"].append(mid)
                out["duration_ms"].append(dur)
                out["rms"].append(rms)
                out["mfcc"].append(bands)
            yield pd.DataFrame(out)

    def fake_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rms, mfcc = [], []
            for payload in pdf["payload"]:
                h = hashlib.md5(payload or b"").digest()
                rms.append(round(h[2] / 255.0, 6))
                mfcc.append([round(b / 255.0, 6) for b in h[:FEATURE_DIM]])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "duration_ms": pdf["duration_ms"].values,
                    "rms": rms,
                    "mfcc": mfcc,
                }
            )

    return df.filter(df.kind == "audio").mapInPandas(
        fake_fn if fake else real_fn, AUDIO_FEATURES_SCHEMA
    )


def image_dhash(df: DataFrame) -> DataFrame:
    """media (kind='image') → (media_id, dhash): real PNG decode →
    64-bit perceptual difference hash (``codecs.dhash64``, integer-
    exact, '0'/'1'-string representation) in one Arrow-batched pass.
    The image analogue of ``dedup.simhash64`` — same signature
    contract, so the Manku banded-Hamming machinery and the DuckDB
    ``hamming()`` oracle apply unchanged."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import (
            decode_png,
            dhash64,
            payload_memo,
        )

        for pdf in batches:
            out = {"media_id": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                # decode once per DISTINCT payload per worker (r13,
                # guide §4.3 — see codecs.payload_memo)
                out["dhash"].append(
                    payload_memo(
                        "dhash", payload,
                        lambda: dhash64(decode_png(payload)),
                    )
                )
            yield pd.DataFrame(out)

    return df.filter(df.kind == "image").mapInPandas(
        fn, "media_id long, dhash string"
    )


def signature_nodes(sigs: DataFrame, sig_col: str) -> DataFrame:
    """(<sig_col>, doc_id = min media_id carrying it) — the EXACT-dup
    contraction that makes perceptual dedup linear: identical
    payloads (and any distinct payloads that hash alike) collapse to
    ONE signature node before the banded candidate join, so candidate
    work is bounded by distinct perceptual signatures, not crawl
    arrivals — the property that holds at 100 TB where the same asset
    arrives from thousands of pages. Checkpointed eagerly: the banding
    plan reads it from both join sides. The ONE node builder — pairs
    and keep both flow through it, so 'what a node is' cannot
    diverge between them."""
    from pyspark.sql import functions as F

    return (
        sigs.groupBy(sig_col)
        .agg(F.min("media_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = MEDIA_MAX_HAMMING, n_blocks: int = 6
) -> DataFrame:
    """Perceptual near-duplicate image pairs (doc_a, doc_b, hamming)
    between signature-node representatives: dHash over the real PNG
    decode, exact contraction to distinct signatures, then the Manku
    block-combination candidates + exact-Hamming verify
    (``dedup.banded_hamming_pairs`` — the SimHash machinery reused
    verbatim; VERDICT r11 what's-missing #1)."""
    from aggregator_spark.operators.dedup import banded_hamming_pairs

    nodes = signature_nodes(image_dhash(media), "dhash")
    return banded_hamming_pairs(
        nodes.select("doc_id", "dhash"), "dhash", max_hamming, n_blocks
    )


def signature_near_dup_keep(
    sigs: DataFrame,
    sig_col: str,
    max_hamming: int = MEDIA_MAX_HAMMING,
    n_blocks: int = 6,
) -> DataFrame:
    """Perceptual dedup keep-list over ANY (media_id, 64-bit-string
    signature) relation — shared by the image (dHash) and audio
    (spectral fingerprint) paths: exact-dup contraction (identical
    signature → one node), banded-Hamming near-dup edges between
    nodes, connected components over the node graph (star
    contraction), then every row inherits its signature node's
    component; the survivor per component is the min doc_id (== the
    component label, because node ids are already per-signature
    minima). Returns (doc_id, component, keep).

    Scale shape: every join is equi-shuffle; components run on the
    NODE graph (distinct signatures), orders smaller than the corpus."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.components import dedup_clusters
    from aggregator_spark.operators.dedup import banded_hamming_pairs

    sigs = sigs.localCheckpoint(eager=True)
    nodes = signature_nodes(sigs, sig_col)
    pairs = banded_hamming_pairs(
        nodes.select("doc_id", sig_col), sig_col, max_hamming, n_blocks
    )
    comp = dedup_clusters(nodes, pairs.select("doc_a", "doc_b"))
    rep_comp = nodes.join(comp, "doc_id").select(sig_col, "component")
    return sigs.join(rep_comp, sig_col).select(
        F.col("media_id").alias("doc_id"),
        "component",
        (F.col("media_id") == F.col("component")).alias("keep"),
    )


def image_near_dup_keep(
    media: DataFrame, max_hamming: int = MEDIA_MAX_HAMMING, n_blocks: int = 6
) -> DataFrame:
    """Perceptual image dedup keep-list: (doc_id, component, keep) for
    every image row — real PNG decode → dHash, then the shared
    ``signature_near_dup_keep`` composition."""
    return signature_near_dup_keep(
        image_dhash(media), "dhash", max_hamming, n_blocks
    )


def audio_fp64(df: DataFrame) -> DataFrame:
    """media (kind='audio') → (media_id, afp): real WAV decode →
    64-bit spectral fingerprint (``codecs.audio_fingerprint64``) in
    one Arrow-batched pass — the audio twin of ``image_dhash``."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import (
            audio_fingerprint64,
            decode_wav,
            payload_memo,
        )

        def fp(payload: bytes) -> str:
            rate, _, samples = decode_wav(payload)
            return audio_fingerprint64(samples, rate)

        for pdf in batches:
            out = {"media_id": [], "afp": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                # decode once per DISTINCT payload per worker (r13,
                # guide §4.3 — see codecs.payload_memo)
                out["afp"].append(
                    payload_memo("afp", payload, lambda: fp(payload))
                )
            yield pd.DataFrame(out)

    return df.filter(df.kind == "audio").mapInPandas(
        fn, "media_id long, afp string"
    )


def audio_near_dup_keep(
    media: DataFrame, max_hamming: int = MEDIA_MAX_HAMMING, n_blocks: int = 6
) -> DataFrame:
    """Perceptual audio dedup keep-list: (doc_id, component, keep) for
    every audio row — real WAV decode → spectral fingerprint, then the
    shared ``signature_near_dup_keep`` composition (contraction +
    banded Hamming + star components)."""
    return signature_near_dup_keep(
        audio_fp64(media), "afp", max_hamming, n_blocks
    )


def video_frame_dhash(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """media (kind='video') → (media_id, frame_index, fhash): real AVI
    demux + the SAME per-instant frame sampling as
    ``sample_video_frames``, each sampled frame perceptually hashed
    with the image dHash — in ONE Arrow pass. The hash runs on the
    raw demuxed pixel array: re-encoding the frame as PNG only to
    decode it again would produce the identical hash (the round-trip
    is lossless — pinned in tests) while paying a zlib deflate +
    inflate + unfilter per frame and shipping PNG bytes through an
    extra exchange; at crawl scale that would be the dominant wasted
    CPU of the video dedup path."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import payload_memo
        from aggregator_spark.operators.multimodal import (
            _vfh_frame_hashes,
        )

        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "fhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # demux once per DISTINCT payload per worker (r13,
                # guide §4.3 — see codecs.payload_memo; the key folds
                # every_ms since the sample grid shapes the rows;
                # the sampling fn is shared with media_decode_all so
                # the entries interchange — r14, ADVICE)
                for fidx, fh in payload_memo(
                    ("vfh", every_ms), payload,
                    lambda: _vfh_frame_hashes(payload, every_ms),
                ):
                    out["media_id"].append(mid)
                    out["frame_index"].append(fidx)
                    out["fhash"].append(fh)
            yield pd.DataFrame(out)

    return df.filter(df.kind == "video").mapInPandas(
        fn, "media_id long, frame_index int, fhash string"
    )


def video_near_dup_keep(
    media: DataFrame, every_ms: int = 500
) -> DataFrame:
    """Perceptual VIDEO dedup keep-list (doc_id, component, keep) —
    the third modality on the shared machinery: real AVI demux →
    sampled-frame dHash signature SET per video, then the shared
    ``frame_signature_near_dup_keep`` tail (hub-star evidence edges +
    components + min-id survivor)."""
    fh = (
        video_frame_dhash(media, every_ms)
        .select("media_id", "fhash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return frame_signature_near_dup_keep(fh)


def frame_signature_near_dup_keep(fh: DataFrame) -> DataFrame:
    """The set-signature dedup tail over ANY (media_id, fhash)
    relation — shared by the batch video path and the streaming served
    view (which reads its frame hashes from the ingest store instead
    of re-demuxing): two items are near-dups when they share any
    signature (re-encoded copies share every frame hash; partial edits
    still share the untouched frames). Evidence edges are STAR edges
    per signature bucket — (min item of the bucket) → (each other
    item) — so a signature shared by B items contributes B-1 edges,
    never B², and a ubiquitous signature (title card, black frame)
    cannot go quadratic; connectivity through the hub is equivalent to
    the all-pairs clique. Components + min-id survivor as in the
    image/audio keeps. ``fh`` should be distinct and materialized by
    the caller (it is read by the hub build and the edge join)."""
    from pyspark.sql import functions as F

    from aggregator_spark.operators.components import dedup_clusters

    hubs = fh.groupBy("fhash").agg(F.min("media_id").alias("hub"))
    edges = (
        fh.join(hubs, "fhash")
        .filter(F.col("media_id") != F.col("hub"))
        .select(
            F.col("hub").alias("doc_a"), F.col("media_id").alias("doc_b")
        )
        .distinct()
    )
    videos = fh.select("media_id").distinct().withColumnRenamed(
        "media_id", "doc_id"
    )
    comp = dedup_clusters(videos, edges)
    return comp.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


MEDIA_DECODE_ALL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.FloatType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("dhash", T.StringType()),
        T.StructField("afp", T.StringType()),
        T.StructField("fhashes", T.ArrayType(T.StringType())),
    ]
)


def _vfh_frame_hashes(payload: bytes, every_ms: int) -> list:
    """(frame_index, dhash) per sampled instant — the ONE sampling
    implementation shared by ``video_frame_dhash`` and
    ``media_decode_all`` (so their ``("vfh", every_ms)`` memo entries
    are interchangeable by construction)."""
    from aggregator_spark.operators.codecs import decode_avi, dhash64

    us_per_frame, frames = decode_avi(payload)
    duration_ms = len(frames) * us_per_frame // 1000
    n = max(1, int(duration_ms // every_ms))
    rows = []
    for i in range(n):
        ts_ms = i * every_ms
        fidx = min(len(frames) - 1, ts_ms * 1000 // us_per_frame)
        rows.append((int(fidx), dhash64(frames[fidx])))
    return rows


def _decode_all_one(kind: str, payload: bytes, every_ms: int) -> tuple:
    """media_decode_all's per-payload decode. Each derived piece is
    memoized under the SAME key its single-purpose pass uses
    ("imgfeat"/"dhash"/"aufeat"/"afp"/("vfh", every_ms)), so a worker
    that already ran one of those passes reuses its decode here and
    vice versa (r14, ADVICE — the r13 form keyed the whole row under
    ('all', ...), which never matched). The raw decode itself is
    shared across cold pieces through the lazy ``cell``. Module-level
    so tests/test_multimodal_fused.py can pin the key interchange
    in-process."""
    from aggregator_spark.operators.codecs import (
        audio_features,
        audio_fingerprint64,
        decode_png,
        decode_wav,
        dhash64,
        image_features,
        payload_memo,
    )

    w = h = dur = rms = feats = dh = afp = fhashes = None
    cell: list = []
    if kind == "image":
        def px():
            if not cell:
                cell.append(decode_png(payload))
            return cell[0]

        def img_feats():
            p = px()
            return (
                int(p.shape[0]),
                int(p.shape[1]),
                image_features(p, FEATURE_DIM),
            )

        h, w, feats = payload_memo("imgfeat", payload, img_feats)
        dh = payload_memo("dhash", payload, lambda: dhash64(px()))
    elif kind == "audio":
        def wav():
            if not cell:
                rate, _, samples = decode_wav(payload)
                cell.append((samples, rate))
            return cell[0]

        dur, rms, feats = payload_memo(
            "aufeat", payload,
            lambda: audio_features(*wav(), FEATURE_DIM),
        )
        afp = payload_memo(
            "afp", payload, lambda: audio_fingerprint64(*wav())
        )
    elif kind == "video":
        fhashes = [
            fh
            for _, fh in payload_memo(
                ("vfh", every_ms), payload,
                lambda: _vfh_frame_hashes(payload, every_ms),
            )
        ]
    return (w, h, dur, rms, feats, dh, afp, fhashes)


def media_decode_all(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """ONE decode per payload, every derived value in the same pass
    (r13, guide §1.2/§4: the ingest store's fold previously ran
    ``decode_image_features`` + ``image_dhash`` (PNG decoded twice),
    ``extract_audio_features`` + ``audio_fp64`` (WAV decoded twice) and
    ``video_frame_dhash`` as FIVE separate Arrow passes over the same
    representative payloads). Output: one row per payload —
    features + dhash for images, features + spectral fingerprint for
    audio, sampled-frame dHash SET (``fhashes``) for video; columns of
    the other modalities are null. Values are produced by the
    IDENTICAL codec calls as the single-purpose operators (pinned by
    ``tests/test_multimodal_fused.py``), so downstream relations are
    bit-equal to the unfused composition."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.multimodal import _decode_all_one

        decode_one = lambda kind, payload: _decode_all_one(  # noqa: E731
            kind, payload, every_ms
        )

        cols = (
            "media_id", "kind", "width", "height", "duration_ms",
            "rms", "features", "dhash", "afp", "fhashes",
        )
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                # the fold feeds FIRST-SEEN payloads, so within one
                # wave these memos are mostly cold — they exist so the
                # decode is shared with the single-purpose passes in
                # the same worker, per derivation key (r13 memo, r14
                # per-derivation keying — codecs.payload_memo)
                row = (mid, kind) + decode_one(kind, payload)
                for c, v in zip(cols, row):
                    out[c].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, MEDIA_DECODE_ALL_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """media (kind='image') → fixed-size payloads.

    Real path (``fake=False``): PNG decode → nearest-neighbor resample
    → PNG re-encode, all in operators/codecs.py. Fake path keeps the
    md5 stand-in for synthetic payloads."""

    def real_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from aggregator_spark.operators.codecs import (
            decode_png,
            encode_png,
            resize_nearest,
        )

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = resize_nearest(decode_png(payload), width, height)
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(encode_png(px))
            yield pd.DataFrame(out)

    def fake_fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                hashlib.md5(
                    (p or b"") + f"{width}x{height}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": payloads,
                }
            )

    return df.filter(df.kind == "image").mapInPandas(
        fake_fn if fake else real_fn, RESIZE_SCHEMA
    )
