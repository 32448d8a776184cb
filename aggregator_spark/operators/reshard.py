"""Deterministic balanced shard emission — the last mile of the
training-data pipeline (VERDICT r10 what's-missing #1): the gated,
deduped, packed corpus leaves the engine as N size-balanced shards
whose assignment AND intra-shard order are a pure function of the
data — stable across runs, cluster sizes, and input partitionings —
so a training run is reproducible byte-for-byte from the same corpus
snapshot, and resuming a crashed emission re-produces identical files.

Scheme (hash-ordered round-robin): each row's shard key hashes to
``md5(key)``; the row takes its exact 0-based GLOBAL rank ``r`` under
``ORDER BY md5 DESC, key`` — computed with the bounded-rank machinery
(operators/rankdist.py), never a single-task global sort — and then

    shard_id   = r %  n_shards
    shard_rank = r // n_shards

Properties: shard sizes differ by at most 1 for ANY input (round-robin
on a total order); the hash order is a deterministic global shuffle,
so corpus neighbors (same source, same crawl day) spread across
shards — the trainer's within-shard stream is already mixed; and both
outputs are closed-form in ``r``, so the whole assignment is plain
SQL (the DuckDB oracle is one ROW_NUMBER).

Scale: the rank uses the two-level carry (a 4-hex-digit coarse
quantizer → 65 536 cells), so per-task input is ~n/65 536 summary
rows; no stage sees a group larger than that. The global rank has no
real group key, so Catalyst constant-folds the partition spec of the
two carry windows and WindowExec warns "No Partition Defined" — those
windows run over the COARSE ROLLUP (≤ 65 536 rows by construction,
independent of n), never raw rows; the raw-row windows stay
partitioned by (hash, id-bucket). The emission sinks below write with
one shuffle on ``shard_id``.

Reference parity note: the reference (cybergreen-net/aggregator
main.py) ends at a serving DB bulk load; shard emission is the
beyond-reference training-consumer analogue of its S8 sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from aggregator_spark.operators.rankdist import (
    DEFAULT_ID_BUCKET,
    _guard_reserved,
    _rank0_bucketed,
)

# 4 hex digits of the md5 — 65 536 coarse cells for the two-level
# carry (the hash is continuous-unique, exactly the tie-density regime
# the rankdist docstring sends to score_coarse)
_COARSE_HEX = 4


def reshard_deterministic(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    id_bucket: int = DEFAULT_ID_BUCKET,
) -> DataFrame:
    """``df`` + ``shard_id`` (int, [0, n_shards)) + ``shard_rank``
    (bigint, 0-based dense order within the shard). ``key_col`` must
    be a unique numeric row key (uniqueness makes the order total and
    the assignment a pure function of the key set)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    _guard_reserved(df, "__shard_h", "__shard_g", "shard_id", "shard_rank")
    keyed = df.withColumn(
        "__shard_h", F.md5(F.col(key_col).cast("string").cast("binary"))
    ).withColumn("__shard_g", F.lit(0))
    ranked = _rank0_bucketed(
        keyed,
        "__shard_g",
        "__shard_h",
        key_col,
        id_bucket,
        score_coarse=lambda s: F.substring(s, 1, _COARSE_HEX),
    )
    n = F.lit(int(n_shards))
    return ranked.select(
        *df.columns,
        F.pmod(F.col("__rank0"), n).cast("int").alias("shard_id"),
        F.floor(F.col("__rank0") / n).cast("bigint").alias("shard_rank"),
    )


def emit_shards_parquet(
    sharded: DataFrame, out_dir: str, n_shards: int
) -> None:
    """Write ``reshard_deterministic`` output as one parquet dir per
    shard (``shard_id=K/``), rows stored in ``shard_rank`` order: one
    shuffle on shard_id co-locates each shard on one task, so a shard
    is one rank-ordered file — re-running produces identical content
    per shard for identical input."""
    (
        sharded.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shard_rank")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


def emit_shard_containers(
    sharded: DataFrame, out_dir: str, n_shards: int
) -> None:
    """Write each shard as one warclite container
    ``shard-<id>.wlc``, records in ``shard_rank`` order — the binary
    twin of the parquet emission for payload-bearing rows (columns
    shard_id, shard_rank, doc_id, mime, payload). Deterministic names
    + temp-per-attempt + rename, so a task retry re-renames the same
    bytes over the same file (the write_containers discipline). The
    rank order comes from a JVM ``sortWithinPartitions`` (spillable)
    and the worker STREAMS the already-ordered iterator through
    ``itertools.groupby`` — peak Python memory is one record, not one
    shard (ADVICE r11: ``sorted(it)`` held a whole shard's payloads;
    at 100 TB that is shard-sized worker RSS). Stale ``shard-*.wlc``
    files from a previous run are cleared first (a re-run with fewer
    shards must not leave extras the reader's glob includes)."""
    from aggregator_spark.sources.warclite import (
        _clear_containers,
        write_warclite,
    )

    _clear_containers(out_dir, "shard-")

    def write_part(it):
        from itertools import groupby

        from pyspark import TaskContext

        att = TaskContext.get().taskAttemptId()
        for sid, grp in groupby(it, key=lambda r: r["shard_id"]):
            tmp = os.path.join(out_dir, f".tmp-{sid:05d}-{att}")
            write_warclite(
                tmp,
                (
                    (r["doc_id"], r["mime"], bytes(r["payload"]))
                    for r in grp
                ),
            )
            os.rename(tmp, os.path.join(out_dir, f"shard-{sid:05d}.wlc"))

    (
        sharded.select("shard_id", "shard_rank", "doc_id", "mime", "payload")
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shard_rank")
        .foreachPartition(write_part)
    )
