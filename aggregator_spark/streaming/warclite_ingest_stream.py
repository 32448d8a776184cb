"""Streaming multimodal ingest from LANDED WARCLITE CONTAINERS —
closing the loop VERDICT r10 item 7 asked for: the batch multimodal
pipeline reads archived containers (``media_archive_features``); this
module is its standing-ingest twin. Containers land in a directory,
each micro-batch folds the newly-landed records through ingest-time
payload dedup, and ONLY first-seen payloads pay the decode.

Shape::

    warcland source (landing-dir watcher; offset = consumed-frontier
                     NAME — replay reads the (start, end] name range,
                     exact regardless of later landings)
      → foreachBatch (batch N):
          fp      = md5(payload)                     (JVM-side)
          verdict = bloom fast path + exact verify vs batches < N
                    (the ingest_dedup_stream discipline, same store
                     layout/compaction — its compact() works here)
          decode  = features_from_media over ONE representative per
                    first-seen fp (real PNG/WAV codecs), features
                    copied to every new doc of that fp
          writes verdicts/batch_id=N, fps/batch_id=N, bloom/batch_id=N,
                 features/batch_id=N, dhash/batch_id=N (all overwrite-keyed;
                 dhash = perceptual signature per first-seen image
                 payload, feeding the served near-dup view)

Exactly-once: same argument as ingest_dedup_stream — every read is
self-excluding (batch_id < N), every write overwrites its own
batch_id dir, so a retried fold reproduces itself byte-identically.

Scale notes: the dedup probe cost is flat per arriving record at any
archive size (bloom words + the maybe-sliver verify join); decode work
is proportional to NEW DISTINCT payloads, not arrivals — the whole
point of ingest-time dedup for a media crawl where the same asset
arrives from thousands of pages. The landing source here is a
SimpleDataSourceStreamReader (driver-side read, the Spark API's
simple form) — fine for the landing-watcher role at test scale; a
production source pairs the same offset log with the batch warclite
reader's offset-indexed splits so payload bytes never pass through
the driver (sources/warclite.py already implements that split logic).

Reference analogue: the reference's S3 landing loop (main.py download
step) — files arrive, get folded once, serve queries; here the fold
is dedup+decode instead of a COPY.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

from aggregator_spark.sources.warclite import WARCLITE_SCHEMA
from aggregator_spark.streaming.ingest_dedup_stream import (
    STREAM_BLOOM_K,
    STREAM_BLOOM_M,
    _p,
    _served_bloom_words,
    _served_fps,
)


class WarcLandStreamReader(SimpleDataSourceStreamReader):
    """Landing-dir watcher: offset = the NAME of the last consumed
    container (the consumed frontier) plus how many files sorted at or
    below it when the frontier committed. A container is immutable
    once landed (the write_warclite temp+rename discipline) and names
    must land sort-monotone (the writers' timestamp/part naming does),
    so the name range (start, end] is a pure function of the offsets —
    the replay contract ``readBetweenOffsets`` answers checkpoint
    recovery with, IMMUNE to files that land after the frontier (an
    offset that merely counted files would shift the replayed slice —
    the ADVICE r11 bug). A straggler that lands sorting BELOW the
    already-committed frontier can never be consumed by a frontier
    offset; the ``n_upto`` count detects exactly that state and the
    reader refuses loudly instead of silently skipping it."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warcland source requires .option('path', ...)")
        self.path = path

    def _files(self) -> list[str]:
        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(self.path, "*.wlc"))
        )

    def _rows(self, files: list[str]) -> list[tuple]:
        from aggregator_spark.sources.warclite import _read_footer

        import struct

        out: list[tuple] = []
        for name in files:
            p = os.path.join(self.path, name)
            offsets = _read_footer(p)
            with open(p, "rb") as f:
                f.seek(offsets[0] if offsets else 0)
                for _ in offsets:
                    doc_id, mlen = struct.unpack(">qH", f.read(10))
                    mime = f.read(mlen).decode()
                    (plen,) = struct.unpack(">I", f.read(4))
                    out.append((doc_id, mime, f.read(plen)))
        return out

    def initialOffset(self) -> dict:
        return {"upto": "", "n_upto": 0}

    def _norm(self, off: dict, files: list[str]) -> dict:
        """Accept a legacy count offset ({'n': N}) from an old
        checkpoint: its meaning was 'the first N name-sorted files'.
        N is clamped to the present list — consumed files may have
        been pruned from the landing dir since the checkpoint."""
        if "upto" in off:
            return off
        n = off["n"]
        k = min(n, len(files))
        return {"upto": files[k - 1] if k else "", "n_upto": n}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        files = self._files()
        start = self._norm(start, files)
        consumed = [f for f in files if f <= start["upto"]]
        # MORE files below the frontier than were consumed = a NEW
        # container landed with a name the frontier already passed —
        # it can never be ingested, refuse loudly. FEWER is benign:
        # the operator pruned already-consumed containers to reclaim
        # space (their content lives in the store).
        if len(consumed) > start["n_upto"]:
            raise ValueError(
                f"out-of-order landing under {self.path}: "
                f"{len(consumed)} files sort at or below the consumed "
                f"frontier {start['upto']!r} but only {start['n_upto']} "
                "were consumed — a container landed with a name below "
                "the frontier and can never be ingested; landing names "
                "must be sort-monotone"
            )
        new = [f for f in files if f > start["upto"]]
        if not new:
            return iter([]), start
        end = {"upto": new[-1], "n_upto": len(consumed) + len(new)}
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()
        start = self._norm(start, files)
        end = self._norm(end, files)
        return iter(
            self._rows(
                [f for f in files if start["upto"] < f <= end["upto"]]
            )
        )


class WarcLandDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcland"

    def schema(self) -> T.StructType:
        return WARCLITE_SCHEMA

    def simpleStreamReader(
        self, schema: T.StructType
    ) -> WarcLandStreamReader:
        return WarcLandStreamReader(dict(self.options))


def register_warcland_source(spark: SparkSession) -> None:
    spark.dataSource.register(WarcLandDataSource)


def ingest_media_batch(
    batch_df: DataFrame, batch_id: int, root: str
) -> None:
    """Fold one landed wave: payload-fingerprint verdicts from the
    PRE-wave state, decode features for one representative per
    first-seen fingerprint, append this batch's deltas."""
    from aggregator_spark.analytics_queries4 import features_from_media
    from aggregator_spark.operators.runtime_filter import (
        build_bloom_words,
        membership_col,
    )

    spark = batch_df.sparkSession
    if not batch_df.take(1):
        return
    recs = batch_df.select(
        "doc_id", "mime", "payload", F.md5("payload").alias("fp")
    ).localCheckpoint(eager=True)

    prior = _served_fps(spark, root, batch_id)
    fps = recs.select("doc_id", "fp")
    if prior is None:
        verdicts = fps.select("doc_id", "fp", F.lit(True).alias("is_new"))
    else:
        words = _served_bloom_words(spark, root, batch_id)
        marked = fps.withColumn(
            "maybe",
            membership_col(
                F.col("fp"), words, m_bits=STREAM_BLOOM_M,
                k_hashes=STREAM_BLOOM_K,
            ),
        )
        hits = prior.withColumn("hit", F.lit(True))
        verified = (
            marked.filter(F.col("maybe"))
            .join(hits, "fp", "left")
            .select("doc_id", "fp", F.col("hit").isNull().alias("is_new"))
        )
        misses = marked.filter(~F.col("maybe")).select(
            "doc_id", "fp", F.lit(True).alias("is_new")
        )
        verdicts = verified.unionByName(misses)
    verdicts = verdicts.localCheckpoint(eager=True)
    verdicts.write.mode("overwrite").parquet(
        _p(root, "verdicts", f"batch_id={batch_id}")
    )

    # decode once per FIRST-SEEN fingerprint: representative = min
    # doc_id of the fp within the batch; features copied back to every
    # new doc of that fp (identical bytes ⇒ identical features)
    new = verdicts.filter("is_new")
    rep_ids = new.groupBy("fp").agg(F.min("doc_id").alias("media_id"))
    rep = rep_ids.join(
        recs.select(
            F.col("doc_id").alias("media_id"),
            F.col("mime").alias("kind"),
            "payload",
        ),
        "media_id",
    )
    feats = features_from_media(rep.select("media_id", "kind", "payload"))
    out = (
        new.select("doc_id", "fp")
        .join(rep_ids, "fp")
        .join(feats, "media_id")
        .drop("media_id")
    )
    out.write.mode("overwrite").parquet(
        _p(root, "features", f"batch_id={batch_id}")
    )

    # perceptual signature per FIRST-SEEN image payload (r12: the
    # streaming side of image near-dup dedup — exact md5 dedup above
    # catches byte-identical arrivals; the dHash store lets the served
    # view catch re-encoded/edited ones): hashed once per distinct
    # payload on the same representative rows the decode already
    # touches, keyed by fp so verdict-level fan-out stays serve-time
    from aggregator_spark.operators.multimodal import image_dhash

    dh = image_dhash(rep.select("media_id", "kind", "payload")).join(
        rep_ids, "media_id"
    )
    dh.select("fp", "dhash").write.mode("overwrite").parquet(
        _p(root, "dhash", f"batch_id={batch_id}")
    )

    # this batch's state deltas (same layout as ingest_dedup_stream,
    # so its compact() applies to this store unchanged)
    fps.select("fp").distinct().write.mode("overwrite").parquet(
        _p(root, "fps", f"batch_id={batch_id}")
    )
    wave_words = build_bloom_words(
        fps, "fp", m_bits=STREAM_BLOOM_M, k_hashes=STREAM_BLOOM_K
    )
    spark.createDataFrame(
        [(w, word) for w, word in enumerate(wave_words) if word != 0],
        "w INT, word BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(
        _p(root, "bloom", f"batch_id={batch_id}")
    )


def run_warclite_ingest_stream(
    spark: SparkSession, landing_dir: str, root: str
) -> None:
    """Drain every landed container into the store (one drain = one
    micro-batch of all not-yet-consumed containers)."""
    register_warcland_source(spark)
    stream = (
        spark.readStream.format("warcland")
        .option("path", landing_dir)
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest_media_batch(df, bid, root)
        )
        .option("checkpointLocation", _p(root, "checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def served_media_verdicts(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(_p(root, "verdicts")).select(
        "doc_id", "fp", "is_new"
    )


def served_media_features(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(_p(root, "features"))


def _served_dhash(spark: SparkSession, root: str) -> DataFrame:
    """Distinct (fp, dhash) over every batch's delta plus any
    compacted base — the exact-fold semantics of the fps relation
    (identical payload ⇒ identical hash, so distinct IS the merge)."""
    from aggregator_spark.streaming.ingest_dedup_stream import _base_dir

    paths = _prior_dhash_batches(root)
    base = _base_dir(root, "dhash")
    if base is not None:
        paths.append(base)
    if not paths:
        raise FileNotFoundError(f"no dhash state under {root}")
    return spark.read.parquet(*paths).select("fp", "dhash").distinct()


def _prior_dhash_batches(root: str) -> list[str]:
    d = _p(root, "dhash")
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, n)
        for n in os.listdir(d)
        if n.startswith("batch_id=")
    )


def served_image_near_dup(spark: SparkSession, root: str) -> DataFrame:
    """The streaming perceptual image dedup view: every landed image
    doc (verdict log ⋈ its payload fingerprint's dHash — the inner
    join filters to images, since only image payloads carry a dHash)
    through the SAME contraction → banded-Hamming → components
    composition as the batch operator. Parity with batch
    ``image_near_dup_keep`` over the landed corpus is pinned in the
    tests — the store pays one decode+hash per DISTINCT payload ever
    landed, while the served view fans out to every arrival."""
    from aggregator_spark.operators.multimodal import (
        signature_near_dup_keep,
    )

    sigs = (
        served_media_verdicts(spark, root)
        .select("doc_id", "fp")
        .join(_served_dhash(spark, root), "fp")
        .select(F.col("doc_id").alias("media_id"), "dhash")
    )
    return signature_near_dup_keep(sigs, "dhash")


def compact_media(spark: SparkSession, root: str) -> None:
    """The shared fps+bloom compaction plus the dHash fold: distinct
    (fp, dhash) to a temp dir, old base parked aside, atomic rename,
    delta dirs dropped, ``.old`` dropped LAST — the
    ingest_dedup_stream.compact discipline applied to the third
    relation this store maintains."""
    import shutil

    from aggregator_spark.streaming.ingest_dedup_stream import compact

    compact(spark, root)
    dh = _served_dhash(spark, root)
    dh.write.mode("overwrite").parquet(_p(root, "base", "_dhash_tmp"))
    final = _p(root, "base", "dhash")
    old = final + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(final):
        os.rename(final, old)
    os.rename(_p(root, "base", "_dhash_tmp"), final)
    shutil.rmtree(_p(root, "dhash"), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
