"""Streaming incremental corpus preparation: the r8 steady-state
batch-arrival job (``llm_queries.corpus_prepare_incremental``)
composed as a Structured Streaming pipeline (VERDICT r8 item 4).

Reference analogue: the weekly ASN refresh loop
(reference load_asn_ref_data.py:4-12) — a standing job that folds each
arriving drop into a served reference table. Here the "drop" is a
crawl batch of documents and the served state is the PREPARED CORPUS:
the survivor doc set plus the three serving indexes the next batch
dedups against (LSH survivor buckets, decontamination probes,
span-gram archive — ``sources/prepared_index.py``).

Shape::

    docwave source (replayable, offset-tracked micro-batches of docs)
      → foreachBatch:
          batch quality gate vs persisted probes
          → incremental fuzzy dedup vs persisted survivor buckets
          → cross-corpus span removal vs persisted gram archive
          → chunk → pack            (all: llm_queries fragments)
        writes, per batch:
          packed/batch_id=N         (the training-stream append)
          delta/batch_id=N/{kept_docs, survivor_buckets, span_grams}
                                    (the index GENERATION ADVANCE)
        and merges the kept docs into the VERSIONED corpus table
        (sources/versioned_table.py — one committed version per batch,
        the reader-visible generation counter).

Exactly-once without a transactional store: every per-batch artifact
is an overwrite keyed by batch_id (a retry replaces its own output),
and the state a batch READS is self-excluding — the corpus is
anti-joined on the batch's own doc_ids and index deltas are filtered
to batch_id < N — so a half-applied previous attempt of the SAME
batch can never feed back into its retry. The versioned-corpus merge
is an upsert on doc_id (content-idempotent). Batch boundaries ARE
semantics for incremental dedup (a transitive duplicate chain broken
across batches keeps different docs than one resolved within a
batch — inherent to index-based dedup, not an implementation choice),
so the batch-twin parity test drives both sides at identical
boundaries (tests/test_streaming_corpus_prepare.py).

At 100 TB: the per-batch delta dirs are the scale path (pure
batch-proportional appends; the bucket/gram stores are bucketed by
key so only the batch side shuffles — SCALE.md §incremental
preparation); the versioned full-table merge stands in for a
Delta/Iceberg ``MERGE INTO`` exactly like ``merge_upsert`` documents.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

DOCWAVE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def wave_doc_ids(sf_dir: str, mod: int, n_waves: int) -> list[list[int]]:
    """The deterministic wave split: all batch doc_ids (doc_id % mod
    == 0) sorted ascending, cut into ``n_waves`` contiguous chunks.
    Contiguity matters: ascending-id arrival means a duplicate's
    min-id member always lands in the earliest wave of its component,
    which keeps the per-wave keep-sets stable however adjacent waves
    are grouped — only TRANSITIVE chains depend on boundaries, which
    is why the parity test pins identical boundaries on both sides.
    Pure function of (sf_dir, mod, n_waves) — the source worker and
    the batch twin both call it."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ids = sorted(i for i in tbl.column("doc_id").to_pylist() if i % mod == 0)
    per = -(-len(ids) // n_waves)  # ceil
    return [ids[w * per : (w + 1) * per] for w in range(n_waves)]


class DocWaveStreamReader(SimpleDataSourceStreamReader):
    """Replayable document-wave source: offset = wave index; wave w's
    rows are a pure function of (sf_dir, mod, n_waves, w) — the
    determinism contract checkpoint recovery replays against
    (``readBetweenOffsets``), same as the scanlog source."""

    def __init__(self, options: dict):
        self.sf_dir = options["sf_dir"]
        self.mod = int(options["mod"])
        self.n_waves = int(options["n_waves"])
        self.max_waves = int(options.get("max_waves", self.n_waves))

    def _wave_rows(self, w: int) -> list:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        ids = wave_doc_ids(self.sf_dir, self.mod, self.n_waves)[w]
        tbl = pq.read_table(
            os.path.join(self.sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        mask = pc.is_in(
            tbl.column("doc_id"), value_set=pa.array(ids, type=pa.int64())
        )
        sel = tbl.filter(mask).sort_by("doc_id")
        return list(
            zip(
                sel.column("doc_id").to_pylist(),
                sel.column("text").to_pylist(),
            )
        )

    def initialOffset(self) -> dict:
        return {"wave": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        w = start["wave"]
        if w >= min(self.max_waves, self.n_waves):
            return iter([]), {"wave": w}
        return iter(self._wave_rows(w)), {"wave": w + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list = []
        for w in range(start["wave"], end["wave"]):
            rows.extend(self._wave_rows(w))
        return iter(rows)


class DocWaveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docwave"

    def schema(self) -> T.StructType:
        return DOCWAVE_SCHEMA

    def simpleStreamReader(
        self, schema: T.StructType
    ) -> DocWaveStreamReader:
        return DocWaveStreamReader(dict(self.options))


def register_docwave_source(spark: SparkSession) -> None:
    spark.dataSource.register(DocWaveDataSource)


# ---------------------------------------------------------------------
# prepared-corpus state: generation-0 seed + per-batch advance


def _p(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


def init_prepared_state(
    spark: SparkSession, sf_dir: str, root: str, mod: int
) -> None:
    """Generation 0: the previous full run's survivor corpus and its
    three serving indexes over the EXISTING slice (doc_id % mod != 0)
    — exactly what ``sources/prepared_index.py`` persists, written
    into this pipeline's own state root so the stream can advance it
    without touching the shared cache."""
    from aggregator_spark.sources.prepared_index import (
        cached_prepared_index,
    )
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.versioned_table import write_version

    idx = cached_prepared_index(spark, sf_dir)
    docs = load_testdata(spark, sf_dir, "documents")
    survivors = idx["survivor_buckets"].select("doc_id").distinct()
    sdocs = docs.join(survivors, "doc_id").select("doc_id", "text")
    write_version(sdocs, _p(root, "corpus"))
    idx["survivor_buckets"].write.mode("overwrite").parquet(
        _p(root, "base", "survivor_buckets")
    )
    idx["probes"].write.mode("overwrite").parquet(_p(root, "base", "probes"))
    idx["span_grams"].write.mode("overwrite").parquet(
        _p(root, "base", "span_grams")
    )


def _read_with_deltas(
    spark: SparkSession, root: str, table: str, before_batch: int
) -> DataFrame:
    """base/<table> ∪ delta/batch_id=K/<table> for all K <
    ``before_batch`` — the index generation as of the previous batch.
    Filtering K < N (not ≠ N) keeps a retry blind to its own earlier
    partial delta AND to any future state, so replays are pure."""
    df = spark.read.parquet(_p(root, "base", table))
    delta_root = _p(root, "delta")
    if os.path.isdir(delta_root):
        for d in sorted(os.listdir(delta_root)):
            if not d.startswith("batch_id="):
                continue
            k = int(d.split("=")[1])
            if k < before_batch:
                df = df.unionByName(
                    spark.read.parquet(_p(delta_root, d, table))
                )
    return df


def prepare_micro_batch(
    batch_df: DataFrame, batch_id: int, root: str
) -> None:
    """The foreachBatch body: gate → incremental dedup → span removal
    → chunk/pack against the persisted state as of batch_id-1, then
    the idempotent writes (packed + index delta, overwrite-by-
    batch_id) and the versioned-corpus merge (generation advance).
    Safe to re-run with the same (batch, batch_id) — see module doc."""
    from aggregator_spark.llm_queries import (
        DUP_SPAN_N,
        incremental_kept_docs,
    )
    from aggregator_spark.operators import corpus as C
    from aggregator_spark.operators import dedup as D
    from aggregator_spark.sources.versioned_table import (
        merge_upsert,
        read_table,
    )

    spark = batch_df.sparkSession
    batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
    if not batch.head(1):
        return
    buckets = _read_with_deltas(spark, root, "survivor_buckets", batch_id)
    span_grams = _read_with_deltas(spark, root, "span_grams", batch_id)
    probes = spark.read.parquet(_p(root, "base", "probes"))
    # self-exclusion retry guard: a half-applied previous attempt of
    # THIS batch may already sit in the corpus — its rows must not
    # make the retry see its own docs as existing duplicates
    corpus = (
        read_table(spark, _p(root, "corpus"))
        .join(batch.select("doc_id"), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    kept = incremental_kept_docs(
        batch, corpus, buckets, probes
    ).localCheckpoint(eager=True)
    # packed tail over the CHECKPOINTED keep set — the same three
    # stages corpus_prepare_incremental composes, fed the kept docs
    # directly so the gate+dedup sub-plan runs exactly once per batch
    rewritten = D.dedup_span_rewrite(
        kept, n=DUP_SPAN_N, corpus_grams=span_grams
    )
    nonempty = rewritten.filter(F.length("clean_text") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    packed = C.pack_sequences(C.doc_chunks(nonempty))
    packed.write.mode("overwrite").parquet(
        _p(root, "packed", f"batch_id={batch_id}")
    )
    delta = _p(root, "delta", f"batch_id={batch_id}")
    kept.write.mode("overwrite").parquet(_p(delta, "kept_docs"))
    D.lsh_buckets(kept).write.mode("overwrite").parquet(
        _p(delta, "survivor_buckets")
    )
    D.span_gram_hashes(kept, n=DUP_SPAN_N).write.mode(
        "overwrite"
    ).parquet(_p(delta, "span_grams"))
    # publish point: the versioned merge commits the new corpus
    # generation (upsert on doc_id — content-idempotent on retry)
    merge_upsert(spark, _p(root, "corpus"), kept, ["doc_id"])


def run_corpus_prepare_stream(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    mod: int,
    n_waves: int,
    max_waves: int | None = None,
) -> None:
    """Start the stream against ``root``'s checkpoint, drain all
    available waves (``processAllAvailable`` — availableNow snapshots
    only the first prefetched batch of a Simple reader, the known
    trap), stop. Calling again with a larger ``max_waves`` resumes
    from the checkpoint — the restart seam the parity test exercises."""
    register_docwave_source(spark)
    stream = (
        spark.readStream.format("docwave")
        .option("sf_dir", sf_dir)
        .option("mod", str(mod))
        .option("n_waves", str(n_waves))
        .option("max_waves", str(max_waves or n_waves))
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: prepare_micro_batch(df, bid, root)
        )
        .option("checkpointLocation", _p(root, "checkpoint"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
