"""Distributed exact per-group ranking (percentile, NTILE).

A plain ``percent_rank()/ntile() OVER (PARTITION BY group ORDER BY
...)`` lands each group's ENTIRE membership on one task — at crawl
scale a "group" is a source with billions of documents, so the plain
window is a scale killer exactly like the per-key expanding window the
zscore family buckets away (operators/anomaly.py:
expanding_zscore_bucketed, the pattern this module follows).

The shared core computes each row's exact 0-based rank under
``ORDER BY score DESC NULLS LAST, id`` with bounded per-task input:
rows partition by (group, score, id-range bucket) — a tie-group larger
than one bucket splits by id range, which is order-aligned because the
tiebreak is the id itself — local row numbers come from a window over
that bounded partition, and the carry-in (how many rows of the group
sort strictly before the partition) comes from a cumulative window
over the per-partition COUNT SUMMARY, a relation that is tie-groups ×
buckets sized (built with map-side partial aggregation), never
raw-row sized. Integer rank plus integer carry equals the plain
form's integer rank, so every finisher below is bit-identical to its
plain-window twin:

- ``percent_rank_bucketed``: (rank)/(n-1) — the id tiebreak makes the
  order total, so rank == row_number and ties never share a rank.
- ``ntile_bucketed``: Spark/SQL NTILE places the remainder in the
  FIRST n%k buckets (sizes ceil then floor), a closed form of
  (rank0, n, k) alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_ID_BUCKET = 100_000  # rows of one tie-group per task, worst case


def _rank0_bucketed(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    id_bucket: int,
) -> DataFrame:
    """``df`` + ``__rank0`` (0-based exact rank within ``part_col``
    under ORDER BY score DESC NULLS LAST, id) + ``__n`` (group size),
    every task bounded by ``id_bucket`` rows. ``id_col`` must be
    numeric and unique within a group; NULL scores sort last as their
    own tie-group."""
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
    rank0 = (F.col("__before") + F.col("__rn") - F.lit(1)).alias("__rank0")
    return joined.select(*df.columns, rank0, "__n")


def topk_per_group(
    df: DataFrame,
    part_col: str,
    order_cols: list[Column],
    k: int,
    salt_col: Column,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact top-k rows per group under ``ORDER BY order_cols`` (must
    be a total order within a group), with bounded task input — the
    two-phase pattern: the global top-k is a subset of the union of
    per-salt-partition top-ks for ANY row partitioning, so phase 1
    takes a local top-k within (group, salt) and phase 2 ranks only
    the buckets×k survivors per group. Returns the winning rows plus
    ``rk`` (1-based rank within the group).

    Use where a plain ``row_number() OVER (PARTITION BY group)``
    window would drag a crawl-scale group onto one task just to label
    its first k rows (the eval-split quota shape). ``salt_col`` should
    be a deterministic function of a unique row id (determinism is for
    reproducible EXPLAIN/metrics only — the result is salt-invariant
    by construction)."""
    salted = df.withColumn(
        "__salt", F.pmod(salt_col, F.lit(int(salt_buckets)))
    )
    w1 = Window.partitionBy(part_col, "__salt").orderBy(*order_cols)
    local = (
        salted.withColumn("__lrn", F.row_number().over(w1))
        .filter(F.col("__lrn") <= k)
    )
    w2 = Window.partitionBy(part_col).orderBy(*order_cols)
    return (
        local.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(*df.columns, "rk")
    )


def percent_rank_bucketed(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    id_bucket: int = DEFAULT_ID_BUCKET,
) -> DataFrame:
    """Append ``pct_rank`` = percent_rank over
    ``PARTITION BY part_col ORDER BY score_col DESC NULLS LAST,
    id_col`` — bit-identical to the plain window. Single-row groups
    get pct_rank 0.0, matching Spark's and the SQL standard's
    (rank-1)/(n-1) convention."""
    ranked = _rank0_bucketed(df, part_col, score_col, id_col, id_bucket)
    pct = F.when(
        F.col("__n") > 1, F.col("__rank0") / (F.col("__n") - F.lit(1))
    ).otherwise(F.lit(0.0))
    return ranked.select(*df.columns, pct.alias("pct_rank"))


def ntile_bucketed(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    n_tiles: int,
    id_bucket: int = DEFAULT_ID_BUCKET,
) -> DataFrame:
    """Append ``bin`` = ntile(n_tiles) over the same total order —
    bit-identical to the plain window: the first n%k buckets take
    ceil(n/k) rows, the rest floor(n/k) (the SQL-standard remainder
    placement Spark implements), in closed form from the exact rank."""
    ranked = _rank0_bucketed(df, part_col, score_col, id_col, id_bucket)
    k = F.lit(int(n_tiles))
    big = F.floor(F.col("__n") / k) + F.lit(1)  # ceil size where n%k>0
    nbig = F.col("__n") % k  # buckets of that size
    cut = nbig * big  # rows covered by the big buckets
    r = F.col("__rank0")
    # greatest(…, 1): when n < k the small-bucket size is 0 but every
    # row lands in the first branch — the guard only keeps the
    # unreached division ANSI-safe
    small = F.greatest(F.floor(F.col("__n") / k), F.lit(1))
    bin_col = F.when(r < cut, F.floor(r / big) + F.lit(1)).otherwise(
        nbig + F.floor((r - cut) / small) + F.lit(1)
    )
    return ranked.select(
        *df.columns, bin_col.cast("int").alias("bin")
    )
