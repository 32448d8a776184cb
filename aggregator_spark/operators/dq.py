"""Data-quality validation checks as one declarative plan.

The reference enforces integrity with Postgres PK/FK constraints
(main.py:499–527, mirrored 1:1 in sources/jdbc.py); on a data lake
there is no database to reject bad rows, so the engine provides the
audit as a query: each check computes its violation count, and the
union of all checks is ONE DataFrame a pipeline can gate on
(`failed == 0`) or publish as a quality report — the Deequ/dbt-test
shape, Spark-first.

Every check is a plain aggregation/join the optimizer can fuse;
nothing collects to the driver. At 100 TB each check is one
partial-aggregated pass (or one broadcast/shuffle join for referential
checks) over columns the scan prunes to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _named(name: str, df: DataFrame) -> DataFrame:
    return df.select(
        F.lit(name).alias("check"),
        F.col("failed").cast("long").alias("failed"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Rows beyond the first per key — 0 when ``cols`` is a key."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("n") > 1, F.col("n") - 1)), F.lit(0)
            ).alias("failed")
        )
    )
    return _named(name, dup)


def check_not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    return _named(
        name,
        df.agg(
            F.count(F.when(F.col(col).isNull(), F.lit(1))).alias("failed")
        ),
    )


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str
) -> DataFrame:
    """NULLs don't fail a range check (that's check_not_null's job)."""
    bad = (F.col(col) < lo) | (F.col(col) > hi)
    return _named(
        name, df.agg(F.count(F.when(bad, F.lit(1))).alias("failed"))
    )


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str,
) -> DataFrame:
    """Orphan child rows (FK value not NULL, absent from parent) — the
    lake-side analogue of the reference's FK constraints. Anti-join;
    Catalyst broadcasts the parent key set when small."""
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            child_col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("failed"))
    )
    return _named(name, orphans)


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the report relation
    (check, failed), sorted by check name."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check")
