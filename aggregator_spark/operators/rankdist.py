"""Distributed exact per-group percentile ranking.

A plain ``percent_rank() OVER (PARTITION BY group ORDER BY ...)``
lands each group's ENTIRE membership on one task — at crawl scale a
"group" is a source with billions of documents, so the plain window is
a scale killer exactly like the per-key expanding window the zscore
family buckets away (operators/anomaly.py:expanding_zscore_bucketed,
the pattern this module follows).

``percent_rank_bucketed`` computes the SAME doubles with bounded
per-task input: rows partition by (group, score, id-range bucket) — a
tie-group larger than one bucket splits by id range, which is
order-aligned because the tiebreak is the id itself — local row
numbers come from a window over that bounded partition, and the
carry-in (how many rows of the group sort strictly before the
partition) comes from a cumulative window over the per-partition
COUNT SUMMARY, a relation that is tie-groups × buckets sized (built
with map-side partial aggregation), never raw-row sized. Integer
rank plus integer carry equals the plain form's integer rank, so
(rank-1)/(n-1) is the identical double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_ID_BUCKET = 100_000  # rows of one tie-group per task, worst case


def percent_rank_bucketed(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    id_bucket: int = DEFAULT_ID_BUCKET,
) -> DataFrame:
    """Append ``pct_rank`` = percent_rank over
    ``PARTITION BY part_col ORDER BY score_col DESC NULLS LAST,
    id_col`` — bit-identical to the plain window (the id tiebreak
    makes the order total, so rank == row_number and ties never share
    a rank), with every task bounded by ``id_bucket`` rows.

    ``id_col`` must be numeric and unique within a group (the usual
    dense doc_id); NULL scores sort last as their own tie-group.
    Single-row groups get pct_rank 0.0, matching Spark's and the SQL
    standard's (rank-1)/(n-1) convention.
    """
    base = df.withColumn(
        "__db", F.floor(F.col(id_col) / F.lit(int(id_bucket)))
    )
    wl = Window.partitionBy(part_col, score_col, "__db").orderBy(id_col)
    local = base.withColumn("__rn", F.row_number().over(wl))

    summary = base.groupBy(part_col, score_col, "__db").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wc = (
        Window.partitionBy(part_col)
        .orderBy(F.col(score_col).desc_nulls_last(), "__db")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy(part_col)
    carry = summary.select(
        F.col(part_col).alias("__p"),
        F.col(score_col).alias("__s"),
        F.col("__db").alias("__cb"),
        F.coalesce(F.sum("__c").over(wc), F.lit(0)).alias("__before"),
        F.sum("__c").over(wn).alias("__n"),
    )
    # null-safe on the score: a NULL tie-group must join its own carry
    # row, not drop out (the plain window ranks NULL scores last, it
    # never drops them)
    joined = local.join(
        carry,
        (F.col(part_col) == F.col("__p"))
        & F.col(score_col).eqNullSafe(F.col("__s"))
        & (F.col("__db") == F.col("__cb")),
    )
    rank0 = F.col("__before") + F.col("__rn") - F.lit(1)
    pct = F.when(
        F.col("__n") > 1, rank0 / (F.col("__n") - F.lit(1))
    ).otherwise(F.lit(0.0))
    return joined.select(*df.columns, pct.alias("pct_rank"))
