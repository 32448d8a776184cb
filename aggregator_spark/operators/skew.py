"""Skew-handling patterns: salted two-stage aggregation and bucketed
(pre-shuffled) table layout for co-located joins.

At 100 TB the two dominant shuffle pathologies are (a) low-cardinality
or hot group keys concentrating an aggregation onto a handful of
reducers, and (b) repeated fact⋈fact joins re-shuffling the same key
every query. AQE's skew-join splitting covers the join-side read skew;
these helpers cover the aggregation write skew and the layout fix.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_group_count(
    df: DataFrame,
    keys: Sequence[str],
    count_alias: str = "cnt",
    salt_col: str | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage COUNT(*) over ``keys`` with a deterministic salt:
    stage 1 aggregates on (keys, salt) — spreading each hot key over
    ``buckets`` reducers — stage 2 sums the partials on keys alone.

    The salt is ``pmod(hash(salt_col), buckets)`` (or hash of all
    columns when no high-cardinality column is given) — deterministic,
    no RNG, so results are reproducible and oracle-checkable. Results
    are identical to a direct groupBy; only the shuffle distribution
    changes. Catalyst already does map-side partial aggregation, which
    handles *moderate* skew; explicit salting matters when a single
    key's partials still overwhelm one reducer (billions of rows per
    key at 100 TB).
    """
    salt_src = F.col(salt_col) if salt_col else F.struct(*df.columns)
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(buckets)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial").alias(count_alias)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``: joins and
    aggregations on ``key`` between tables bucketed with the SAME bucket
    count then run with NO exchange — the shuffle is paid once at write
    time instead of per query. This is the Spark-native analogue of the
    reference's Redshift DISTKEY."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
