"""Content-stamped STREAMING media store over the sf corpus — the
persisted artifact behind the ``served_media_near_dup`` catalog entry
(r13, VERDICT r12 item 2: the streaming perceptual serve gets its own
driver CORRECTNESS row, the index-cache precedent of
``index_queries.py``).

Build (cold): every document of the scale factor becomes one media
arrival — kind by residue (even doc_id → image, ``% 4 == 1`` → audio,
``% 4 == 3`` → video; the image/audio payload builders key parity, so
the residue map keeps doc parity == payload parity) — landed as
warclite containers in TWO waves split by alternating 256-id blocks
(every payload key recurs across waves, so cross-wave dedup is
exercised, not just within-wave), with a full-store compaction
(``compact_media``) between the waves so wave 2 folds against
compacted signature bases. The warclite ingest stream
(streaming/warclite_ingest_stream.py) drains each wave as one
micro-batch; the store then serves the three perceptual near-dup
views decode-free forever.

The container WRITER here is fixture scaffolding (the driver-side
generator the tests use) — in production containers arrive from the
crawl; the engine path under test is everything after landing. The
store is stamped by documents.parquet content + the builder modules'
code (sources/stamped_cache.py), so a regenerated corpus or a codec
change rebuilds instead of serving stale signatures.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from aggregator_spark.sources.stamped_cache import _ensure_built, cache_dir

_WAVE_BLOCK = 256  # wave = (doc_id // _WAVE_BLOCK) % 2
_CODE_MODULES = (
    "aggregator_spark.sources.media_store",
    "aggregator_spark.streaming.warclite_ingest_stream",
    "aggregator_spark.streaming.ingest_dedup_stream",
    "aggregator_spark.operators.multimodal",
    "aggregator_spark.operators.codecs",
    "aggregator_spark.operators.media_fixture",
)


def store_kind(doc_id: int) -> str:
    """Modality of a doc's media arrival: even → image, % 4 == 1 →
    audio, % 4 == 3 → video. Keeps doc parity == payload parity for
    the image/audio payload builders (whose kind keys on k's parity)
    while giving the store all three modalities; the oracle SQL
    filters on the same residues."""
    if doc_id % 2 == 0:
        return "image"
    return "audio" if doc_id % 4 == 1 else "video"


def store_row(doc_id: int) -> tuple[int, str, bytes]:
    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        N_VIDEO_KEYS,
        build_payload,
        build_video_payload,
    )

    kind = store_kind(doc_id)
    if kind == "video":
        return (doc_id, "video", build_video_payload(doc_id % N_VIDEO_KEYS))
    return (doc_id, kind, build_payload(doc_id % N_KEYS))


def _build(spark: SparkSession, scratch: str, doc_ids: list[int]) -> None:
    from aggregator_spark.sources.warclite import write_warclite
    from aggregator_spark.streaming.warclite_ingest_stream import (
        compact_media,
        warclite_ingest_session,
    )

    landing = os.path.join(scratch, "landing")
    root = os.path.join(scratch, "store")
    os.makedirs(landing, exist_ok=True)
    waves = (
        [d for d in doc_ids if (d // _WAVE_BLOCK) % 2 == 0],
        [d for d in doc_ids if (d // _WAVE_BLOCK) % 2 == 1],
    )
    # ONE long-lived ingest query drains both waves (r13 session 5:
    # query/reader startup paid once; batch boundaries and store bytes
    # identical to the per-wave one-shot form — pinned in
    # tests/test_streaming_warclite_ingest.py). Containers are written
    # OUTSIDE the landing dir and renamed in atomically: the live
    # query polls while we write, and must never list a half-written
    # container.
    with warclite_ingest_session(spark, landing, root) as drain:
        for i, wave in enumerate(w for w in waves if w):
            tmp = os.path.join(scratch, f"w{i}.wlc.tmp")
            write_warclite(tmp, (store_row(d) for d in sorted(wave)))
            os.replace(tmp, os.path.join(landing, f"w{i}.wlc"))
            drain()
            if i == 0:
                # wave 2 must fold against COMPACTED signature bases —
                # the steady-state shape of a long-lived store; the
                # query is idle between drains, so compaction sees the
                # same quiesced store as the stopped-query form
                compact_media(spark, root)
    with open(os.path.join(scratch, "_STORE_SUCCESS"), "w") as f:
        f.write("ok")


def media_store_cache_dir(sf_dir: str) -> str:
    """The stamped cache location for this scale factor's store (the
    bench removes it to time the true cold build)."""
    return cache_dir(
        sf_dir,
        "documents.parquet",
        "mediastore",
        code_modules=_CODE_MODULES,
    )


def cached_media_store(spark: SparkSession, sf_dir: str) -> str:
    """The store root for this scale factor, building it if cold (the
    bench key ``media_store_build`` times that build). Returns the
    path to pass to the ``served_*_near_dup`` views."""
    from aggregator_spark.testdata_queries import load_testdata

    out = media_store_cache_dir(sf_dir)

    def build(scratch: str) -> None:
        doc_ids = [
            r["doc_id"]
            for r in load_testdata(spark, sf_dir, "documents")
            .select("doc_id")
            .collect()
        ]
        _build(spark, scratch, doc_ids)

    _ensure_built(
        out,
        build,
        lambda d: os.path.exists(os.path.join(d, "_STORE_SUCCESS")),
    )
    return os.path.join(out, "store")
