"""Log-structured count-delta store shared by the streaming monitors.

The discipline (first built for the drift monitor, now generic):

- each micro-batch's ONLY write is an overwrite of its own
  ``deltas/batch_id=N`` dir — a retried batch replaces its own delta,
  so a half-written previous attempt can never double-count
  (exactly-once without a transactional store);
- the additive merge happens at READ time: sum the count column over
  every committed delta plus the compacted base generation;
- compaction folds deltas (and any previous base) into a new base via
  temp-dir + rename, so a crash leaves either the old state or the
  new one, never a half-merged store.

At 100 TB/day the per-batch delta is an already-aggregated relation
(orders smaller than the batch text), the store grows by that small
relation per batch, and the read-time SUM is one hash aggregate;
compaction bounds the store like any LSM level-0 fold.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def _p(root: str, *parts: str) -> str:
    return os.path.join(root, *parts)


def write_delta(delta: DataFrame, root: str, batch_id: int) -> None:
    """Overwrite this batch's delta dir (idempotent under retries)."""
    delta.write.mode("overwrite").parquet(
        _p(root, "deltas", f"batch_id={batch_id}")
    )


def served_counts(
    spark: SparkSession,
    root: str,
    key_cols: tuple[str, ...],
    cnt_col: str = "cnt",
) -> DataFrame:
    """The running summed relation: additive merge of every committed
    batch delta plus the compacted base generation, at read time."""
    cols = [*key_cols, cnt_col]
    parts = []
    deltas = _p(root, "deltas")
    if os.path.isdir(deltas) and os.listdir(deltas):
        # project away the batch_id partition-discovery column so the
        # delta and base relations union cleanly
        parts.append(spark.read.parquet(deltas).select(*cols))
    if os.path.isdir(_p(root, "base")):
        parts.append(spark.read.parquet(_p(root, "base")).select(*cols))
    if not parts:
        raise FileNotFoundError(f"no delta-store state under {root}")
    union = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return union.groupBy(*key_cols).agg(F.sum(cnt_col).alias(cnt_col))


def compact(
    spark: SparkSession,
    root: str,
    key_cols: tuple[str, ...],
    cnt_col: str = "cnt",
) -> None:
    """Fold every accumulated delta (and any previous base) into a
    single summed base generation, then drop the delta dirs. Written
    base-first via temp dir + rename; the served relation reads
    identically before and after."""
    merged = served_counts(spark, root, key_cols, cnt_col)
    tmp = _p(root, "base_next")
    merged.write.mode("overwrite").parquet(tmp)
    base = _p(root, "base")
    shutil.rmtree(base, ignore_errors=True)
    os.rename(tmp, base)
    deltas = _p(root, "deltas")
    shutil.rmtree(deltas, ignore_errors=True)
    os.makedirs(deltas, exist_ok=True)
