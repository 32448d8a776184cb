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

Tie-density precondition (single-level carry): the summary is
tie-groups × id-buckets sized, so its per-group cumulative window is
bounded ONLY when scores are discrete (the current callers use an
8-level quality score). With near-unique continuous scores the
summary degenerates to ~n rows per group and the carry window becomes
the one-task-per-group shape this module exists to avoid. For that
regime pass ``score_coarse`` — a NON-DECREASING quantization of the
score (e.g. ``lambda s: F.floor(s * 1024)`` for scores in [0, 1]) —
and the carry runs TWO-LEVEL: a |coarse-buckets|-per-group cumulative
window plus a within-coarse-bucket window whose task input is bounded
by the score density inside one quantization cell. Both levels are
exact (integer counts), so the result stays bit-identical to the
plain window for ANY monotone quantizer.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_ID_BUCKET = 100_000  # rows of one tie-group per task, worst case

# internal / output names this module appends; an input already carrying
# one would make the self-join ambiguous or silently select the wrong
# column (e.g. re-ranking a frame that already has pct_rank)
_RESERVED = (
    "__db", "__rn", "__n", "__c", "__cc", "__coarse", "__salt", "__lrn",
    "__p", "__s", "__cb", "__before", "__rank0",
)


def _guard_reserved(df: DataFrame, *extra: str) -> None:
    clash = [c for c in df.columns if c in _RESERVED or c in extra]
    if clash:
        raise ValueError(
            f"rankdist reserved column name(s) already present: {clash}; "
            "rename them before ranking (the operator appends these)"
        )


def _rank0_bucketed(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    id_bucket: int,
    score_coarse: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """``df`` + ``__rank0`` (0-based exact rank within ``part_col``
    under ORDER BY score DESC NULLS LAST, id) + ``__n`` (group size),
    every task bounded by ``id_bucket`` rows. ``id_col`` must be
    numeric and unique within a group; ``part_col`` may be NULL (a
    NULL group ranks like any other, matching the plain window); NULL
    scores sort last as their own tie-group. ``score_coarse`` (see
    module docstring) bounds the carry for continuous scores; it must
    be non-decreasing over non-NULL scores and map NULL to NULL."""
    _guard_reserved(df)
    base = df.withColumn(
        "__db", F.floor(F.col(id_col) / F.lit(int(id_bucket)))
    )
    wl = Window.partitionBy(part_col, score_col, "__db").orderBy(id_col)
    local = base.withColumn("__rn", F.row_number().over(wl))

    summary = base.groupBy(part_col, score_col, "__db").agg(
        F.count(F.lit(1)).alias("__c")
    )
    if score_coarse is None:
        # single-level carry: bounded iff scores are discrete (see
        # module docstring tie-density precondition)
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
    else:
        # two-level carry: rows-before = (rows in strictly-later coarse
        # buckets) + (rows earlier within my coarse bucket). The coarse
        # rollup is |coarse buckets| per group; the fine window is
        # partitioned by (group, coarse bucket) — both bounded for any
        # fixed quantization width, independent of group size.
        fine = summary.withColumn("__coarse", score_coarse(F.col(score_col)))
        ctot = fine.groupBy(part_col, "__coarse").agg(
            F.sum("__c").alias("__cc")
        )
        wcc = (
            Window.partitionBy(part_col)
            .orderBy(F.col("__coarse").desc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wnn = Window.partitionBy(part_col)
        ccarry = ctot.select(
            F.col(part_col).alias("__cp"),
            F.col("__coarse").alias("__cg"),
            F.coalesce(F.sum("__cc").over(wcc), F.lit(0)).alias("__bc"),
            F.sum("__cc").over(wnn).alias("__n"),
        )
        wfine = (
            Window.partitionBy(part_col, "__coarse")
            .orderBy(F.col(score_col).desc_nulls_last(), "__db")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        fine = fine.withColumn(
            "__bf", F.coalesce(F.sum("__c").over(wfine), F.lit(0))
        )
        carry = fine.join(
            ccarry,
            F.col(part_col).eqNullSafe(F.col("__cp"))
            & F.col("__coarse").eqNullSafe(F.col("__cg")),
        ).select(
            F.col(part_col).alias("__p"),
            F.col(score_col).alias("__s"),
            F.col("__db").alias("__cb"),
            (F.col("__bc") + F.col("__bf")).alias("__before"),
            "__n",
        )
    # null-safe on BOTH keys: a NULL tie-group (score) and a NULL group
    # key (partition) must each join their own carry row, not drop out
    # — the plain window ranks NULL partitions and NULL scores, it
    # never drops them
    joined = local.join(
        carry,
        F.col(part_col).eqNullSafe(F.col("__p"))
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
    _guard_reserved(df, "rk")
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
    score_coarse: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Append ``pct_rank`` = percent_rank over
    ``PARTITION BY part_col ORDER BY score_col DESC NULLS LAST,
    id_col`` — bit-identical to the plain window. Single-row groups
    get pct_rank 0.0, matching Spark's and the SQL standard's
    (rank-1)/(n-1) convention. Pass ``score_coarse`` for continuous
    scores (module docstring: tie-density precondition)."""
    _guard_reserved(df, "pct_rank")
    ranked = _rank0_bucketed(
        df, part_col, score_col, id_col, id_bucket, score_coarse
    )
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
    score_coarse: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """Append ``bin`` = ntile(n_tiles) over the same total order —
    bit-identical to the plain window: the first n%k buckets take
    ceil(n/k) rows, the rest floor(n/k) (the SQL-standard remainder
    placement Spark implements), in closed form from the exact rank.
    Pass ``score_coarse`` for continuous scores (module docstring)."""
    _guard_reserved(df, "bin")
    ranked = _rank0_bucketed(
        df, part_col, score_col, id_col, id_bucket, score_coarse
    )
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
