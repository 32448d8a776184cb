"""WARC-like binary record container with OFFSET-INDEXED SPLITS —
``spark.read.format("warclite")``.

The crawl-scale ingestion problem the reference never had: corpus
payloads (documents, images, audio) arrive as large sequential
container files (WARC et al.), and a single file must split across
tasks without a byte-scan. Parquet/ORC solve it with a footer index;
this container does the same, minimally:

    header : b"WLC1"
    record : [8B doc_id][2B mime_len][mime utf8][4B payload_len][payload]
    footer : [4B n_records][8B record_start_offset] * n
    trailer: [8B footer_start] b"WLC1"

``partitions()`` reads ONLY the footer (one seek per file), chunks
the offset index into ``records_per_split`` ranges, and each task
seeks straight to its range — the Python-DataSource analogue of a
Hadoop input split, and unlike the per-file partitioning of the
datapackage source it parallelizes WITHIN one large file. All
integers big-endian; payloads opaque ``binary`` (the multimodal
column contract — operators/codecs.py decodes them downstream).

The writer here is a driver/test-side convenience; a production
ingest writes containers inside ``foreachPartition`` tasks with the
same byte layout.
"""

from __future__ import annotations

import glob
import os
import struct
from collections.abc import Iterable

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

MAGIC = b"WLC1"
DEFAULT_RECORDS_PER_SPLIT = 1000

WARCLITE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def write_warclite(
    path: str, records: Iterable[tuple[int, str, bytes]]
) -> int:
    """Write (doc_id, mime, payload) records; returns record count.
    Atomic enough for the test/cache uses here (callers wrap in the
    stamped-cache scratch-dir + rename discipline for shared dirs)."""
    offsets: list[int] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for doc_id, mime, payload in records:
            offsets.append(f.tell())
            m = mime.encode()
            f.write(struct.pack(">qH", int(doc_id), len(m)))
            f.write(m)
            f.write(struct.pack(">I", len(payload)))
            f.write(payload)
        footer_start = f.tell()
        f.write(struct.pack(">I", len(offsets)))
        for off in offsets:
            f.write(struct.pack(">q", off))
        f.write(struct.pack(">q", footer_start))
        f.write(MAGIC)
    return len(offsets)


def _read_footer(path: str) -> list[int]:
    """Record-start offsets, from one seek to the trailer + one to
    the footer — never a body scan."""
    with open(path, "rb") as f:
        f.seek(0, os.SEEK_END)
        end = f.tell()
        f.seek(end - 12)
        footer_start, magic = struct.unpack(">q4s", f.read(12))
        if magic != MAGIC:
            raise ValueError(f"not a warclite container: {path}")
        f.seek(footer_start)
        (n,) = struct.unpack(">I", f.read(4))
        return list(struct.unpack(f">{n}q", f.read(8 * n)))


class _Split(InputPartition):
    def __init__(self, path: str, offset: int, n_records: int):
        self.path = path
        self.offset = offset
        self.n_records = n_records


# Arrow emission cap: a split's records accumulate into one RecordBatch
# up to this many payload bytes, then flush — bounds task memory to
# ~one batch even when records_per_split × payload size is large
_ARROW_BATCH_BYTES = 16 * 1024 * 1024


def read_split_batches(path: str, offset: int, n_records: int):
    """Read one offset-indexed split as pyarrow RecordBatches (r14,
    guide §4.1: batches cross the Python→JVM boundary as Arrow instead
    of pickled row tuples). Measured FLAT at fixture scale (warm scans
    0.48–0.68 s both forms, text and media containers) — kept because
    the Arrow binary column is one contiguous buffer + offsets, the
    documented right shape for multi-MB crawl payloads, where per-row
    pickling pays per-object overhead the fixture's ~KB payloads hide.
    Shared by the batch reader and the streaming landing reader.
    Flushes a batch every ``_ARROW_BATCH_BYTES`` of accumulated
    payload so peak memory is one batch, not one split."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
        ]
    )
    ids: list[int] = []
    mimes: list[str] = []
    payloads: list[bytes] = []

    def flush():
        return pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(mimes, pa.string()),
                pa.array(payloads, pa.binary()),
            ],
            schema=schema,
        )

    acc = 0
    with open(path, "rb") as f:
        f.seek(offset)
        for _ in range(n_records):
            doc_id, mlen = struct.unpack(">qH", f.read(10))
            mime = f.read(mlen).decode()
            (plen,) = struct.unpack(">I", f.read(4))
            ids.append(doc_id)
            mimes.append(mime)
            payloads.append(f.read(plen))
            acc += plen + mlen + 12
            if acc >= _ARROW_BATCH_BYTES:
                yield flush()
                ids, mimes, payloads, acc = [], [], [], 0
    if ids:
        yield flush()


class WarcliteReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warclite source requires .option('path', ...)")
        if os.path.isdir(path):
            self._files = sorted(glob.glob(os.path.join(path, "*.wlc")))
        elif os.path.isfile(path):
            self._files = [path]
        else:
            # fail at option-validation time, not as a late
            # FileNotFoundError inside partitions()
            self._files = []
        if not self._files:
            raise ValueError(f"no .wlc containers under {path}")
        self._per_split = int(
            options.get("records_per_split", DEFAULT_RECORDS_PER_SPLIT)
        )
        if self._per_split <= 0:
            raise ValueError("records_per_split must be positive")

    def partitions(self):
        out = []
        for p in self._files:
            offsets = _read_footer(p)
            for i in range(0, len(offsets), self._per_split):
                chunk = offsets[i : i + self._per_split]
                out.append(_Split(p, chunk[0], len(chunk)))
        return out

    def read(self, split: _Split):
        yield from read_split_batches(
            split.path, split.offset, split.n_records
        )


class WarcliteDataSource(DataSource):
    """``spark.read.format('warclite')`` with options ``path`` (a
    container file or a dir of ``*.wlc``) and ``records_per_split``."""

    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self) -> T.StructType:
        return WARCLITE_SCHEMA

    def reader(self, schema: T.StructType) -> WarcliteReader:
        return WarcliteReader(dict(self.options))


def register_warclite_source(spark) -> None:
    spark.dataSource.register(WarcliteDataSource)


def write_containers(
    df, out_dir: str, order_col: str = "doc_id"
) -> None:
    """DISTRIBUTED container writer: each partition of ``df``
    (columns doc_id, mime, payload) writes one ``part-<id>.wlc`` via
    ``foreachPartition`` — the production ingest path the module
    docstring promises (the driver never sees a payload). Files land
    under a temp name and rename into place so a re-run/retried task
    never leaves a readable half-container (the footer+trailer are
    only present in complete files — ``_read_footer`` rejects
    anything else). Sort/partition the input beforehand if container
    locality matters; records within a partition write in
    ``order_col`` order for determinism under a fixed partitioning —
    ordered by a JVM ``sortWithinPartitions`` (spillable) and STREAMED
    through the Python worker one row at a time, so peak worker memory
    is one record, not one container (ADVICE r11: ``sorted(it)``
    materialized the whole partition, payloads included).
    Output names are the DETERMINISTIC partition id (not a uuid), so
    a task retry or speculative attempt re-renames the same bytes
    over the same ``part-<pid>.wlc`` instead of adding a duplicate
    container; the temp name carries the attempt number so two live
    attempts never interleave writes into one temp file. Pre-existing
    ``part-*.wlc``/temp files in ``out_dir`` are cleared first —
    without that, a re-run with fewer partitions would leave stale
    containers the reader's glob silently includes (ADVICE r11)."""
    _clear_containers(out_dir, "part-")

    def write_part(it):
        from pyspark import TaskContext

        first = next(it, None)
        if first is None:
            return
        ctx = TaskContext.get()
        pid, att = ctx.partitionId(), ctx.taskAttemptId()
        tmp = os.path.join(out_dir, f".tmp-{pid:05d}-{att}")
        write_warclite(
            tmp,
            (
                (r["doc_id"], r["mime"], bytes(r["payload"]))
                for r in _chain([first], it)
            ),
        )
        os.rename(tmp, os.path.join(out_dir, f"part-{pid:05d}.wlc"))

    (
        df.select("doc_id", "mime", "payload")
        .sortWithinPartitions(order_col)
        .foreachPartition(write_part)
    )


def _chain(head, it):
    yield from head
    yield from it


def _clear_containers(out_dir: str, prefix: str) -> None:
    """Make the container sinks overwrite-semantics for real: drop
    stale ``<prefix>*.wlc`` outputs and orphaned temp files from any
    previous run before emitting into ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    for p in glob.glob(os.path.join(out_dir, f"{prefix}*.wlc")) + glob.glob(
        os.path.join(out_dir, ".tmp-*")
    ):
        os.remove(p)


# ------------------------------------------------- cached test corpus


def warclite_cache_path(sf_dir: str) -> str:
    from aggregator_spark.sources.stamped_cache import cache_dir

    return cache_dir(
        sf_dir,
        "documents.parquet",
        "warclite",
        code_modules=("aggregator_spark.sources.warclite",),
    )


def cached_media_container(spark, sf_dir: str) -> str:
    """The media-fixture payloads (real PNG/WAV bytes keyed on doc_id,
    operators/media_fixture.py) packed as a warclite container — the
    on-disk archive the container-fed multimodal entry reads. Built
    once per source content stamp."""
    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        build_payload,
        media_kind,
    )
    from aggregator_spark.sources.stamped_cache import _ensure_built, cache_dir

    import pyarrow.parquet as pq

    out = cache_dir(
        sf_dir,
        "documents.parquet",
        "warcmedia",
        code_modules=(
            "aggregator_spark.sources.warclite",
            "aggregator_spark.operators.media_fixture",
        ),
    )

    def build(scratch: str) -> None:
        os.makedirs(scratch, exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        ).sort_by("doc_id")
        recs = (
            (d, media_kind(d), build_payload(d % N_KEYS))
            for d in tbl.column("doc_id").to_pylist()
        )
        write_warclite(os.path.join(scratch, "media.wlc"), recs)

    _ensure_built(
        out, build, lambda d: bool(glob.glob(os.path.join(d, "*.wlc")))
    )
    return out


def cached_documents_container(spark, sf_dir: str) -> str:
    """The documents table re-packed as a warclite container (payload
    = utf-8 text bytes, mime = 'text/<lang>'), built once per source
    content stamp via the shared stamped cache. Returns the container
    dir. Driver-side build is fine at test SF; see module docstring
    for the production write path."""
    import pyarrow.parquet as pq

    from aggregator_spark.sources.stamped_cache import _ensure_built

    out = warclite_cache_path(sf_dir)

    def build(scratch: str) -> None:
        os.makedirs(scratch, exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        ).sort_by("doc_id")
        recs = (
            (d, f"text/{lang}", text.encode())
            for d, lang, text in zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("lang").to_pylist(),
                tbl.column("text").to_pylist(),
            )
        )
        write_warclite(os.path.join(scratch, "documents.wlc"), recs)

    _ensure_built(
        out,
        build,
        lambda d: bool(glob.glob(os.path.join(d, "*.wlc"))),
    )
    return out
