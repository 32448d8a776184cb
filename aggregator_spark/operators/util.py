"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def scatter(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    CPU-bound operators (shingling, hashing, vector math) must not
    inherit the scan's partitioning: a small parquet file arrives as ONE
    input split, which would serialize the whole computation on one
    core. At 100 TB the scan already yields thousands of splits and this
    repartition is a cheap rebalance; on small inputs it is the
    difference between 1× and N× parallelism. The shuffle it introduces
    is negligible next to the per-row work these operators do.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # already at least as parallel as the session? Don't pay a full
    # shuffle of the payload for nothing — at 100 TB the scan arrives
    # as thousands of splits and this must be a no-op. (getNumPartitions
    # plans the RDD lineage but runs no job.)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
