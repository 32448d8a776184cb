"""As-of and band (range) joins — join families the reference lacks
entirely (SURVEY.md §2.9: "semi/theta/range/as-of joins absent") but a
time-series / feature-engineering workload needs at scale.

Both are expressed as compositions of built-in DataFrame ops so Catalyst
owns the physical plan:

- **as-of join**: the classic union-then-window formulation. Tag the
  right ("quote") side 0 and the left ("trade") side 1, union, then a
  single ``last(..., ignorenulls)`` window per key ordered by
  (time, side) carries the most recent right-side row forward onto each
  left-side row. One shuffle on the key, no range-explosion, no
  per-key driver loop — the same plan shape scales to 100 TB because
  the window is partitioned by the join key.
- **band join**: a small static bands table broadcast against the fact
  with a non-equi (``BETWEEN``-style) condition — BroadcastNestedLoopJoin
  on a tiny build side, the right physical plan for O(10) bands at any
  fact scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _struct_type(df: DataFrame, cols: Sequence[str]) -> str:
    inner = ",".join(f"{c}:{df.schema[c].dataType.simpleString()}" for c in cols)
    return f"struct<{inner}>"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every row of ``left``, attach ``right_cols`` from the most
    recent ``right`` row with the same ``on`` key and ``right_time <=
    left_time`` (inclusive, DuckDB/kdb+ ASOF semantics); NULLs when no
    such row (left-outer flavor).

    ``right`` must be unique per (on, right_time) — pre-dedup if not,
    otherwise which same-timestamp row wins is undefined.

    Plan: union(tagged) → window(last ignorenulls) → filter to left
    rows. Exactly one hash exchange on ``on``; the sort and carry-
    forward both happen inside the key partition.
    """
    lcols = list(left.columns)
    rcols = list(right_cols)

    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(_struct_type(right, rcols)).alias("__r"),
        F.lit(None).cast("timestamp").alias("__rt"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(_struct_type(left, lcols)).alias("__l"),
        F.struct(*rcols).alias("__r"),
        F.col(right_time).cast("timestamp").alias("__rt"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # side=0 (right) sorts before side=1 (left) at equal __t → inclusive <=
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__t",
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__match"),
        F.last("__rt", ignorenulls=True).over(w).alias("__match_t"),
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col("__t").cast("long") - F.col("__match_t").cast("long")
        ) <= F.lit(tolerance_seconds)
        carried = carried.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )

    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in rcols],
    )


def band_join(
    fact: DataFrame,
    value_col: str,
    bands: Sequence[tuple[str, float, float]],
) -> DataFrame:
    """Non-equi join of ``fact`` against a tiny (band, lo, hi) table:
    ``lo <= value < hi``. The bands side is broadcast →
    BroadcastNestedLoopJoin, O(rows × bands) with zero shuffle.
    """
    bands_df = fact.sparkSession.createDataFrame(
        list(bands), "band string, lo double, hi double"
    )
    v = F.col(value_col)
    return fact.join(
        F.broadcast(bands_df),
        (v >= F.col("lo")) & (v < F.col("hi")),
        "inner",
    )
