"""Re-aggregatable distinct-count sketches (Apache DataSketches HLL,
native in Spark 4: hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

THE pre-aggregation pattern for 100 TB: build per-partition (per-day)
sketches ONCE at ingest, store them as binary columns, and answer any
coarser-grain distinct question (weekly, monthly, all-time, any country
subset) by unioning sketches — never rescanning the raw fact. A daily
sketch is a few KB regardless of row count; the merge is
register-wise max, associative and order-independent, so map-side
partial merges are exact (the merged estimate equals the estimate of a
sketch built over the union of the raw inputs).

The reference has no sketch layer — its Redshift stage recomputes
COUNT(*) group-bys from raw logentry every run (reference
main.py:206-215); this module is the beyond-reference scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LG_K = 12  # 4 KiB registers — ~1.6% relative standard error


def daily_user_sketches(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_k: int = LG_K,
) -> DataFrame:
    """One HLL sketch per day over the id column; columns
    (day, sketch, est_users)."""
    return (
        events.groupBy(
            F.date_trunc("day", ts_col).cast("date").alias("day")
        )
        .agg(F.hll_sketch_agg(id_col, F.lit(lg_k)).alias("sketch"))
        .withColumn(
            "est_users",
            F.hll_sketch_estimate("sketch").cast("long"),
        )
    )


def merge_sketches(
    daily: DataFrame,
    period_expr,
    period_name: str = "period",
) -> DataFrame:
    """Roll daily sketches up to a coarser period WITHOUT touching raw
    data: union-merge the binary sketch column."""
    return (
        daily.groupBy(period_expr.alias(period_name))
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn(
            "est_users",
            F.hll_sketch_estimate("sketch").cast("long"),
        )
    )


def monthly_distinct_users(events: DataFrame) -> DataFrame:
    """Daily sketches → monthly merged estimates; output
    (month, est_users). The raw fact is scanned exactly once."""
    daily = daily_user_sketches(events)
    monthly = merge_sketches(
        daily, F.date_trunc("month", "day").cast("date"), "month"
    )
    return monthly.select("month", "est_users")


# ----------------------------------------------------------- Count-Min

CMS_DEPTH = 4
CMS_WIDTH = 64


def _cms_bucket(row, key, width: int):
    """Row-salted md5 bucket: first 8 hex digits of md5("r:key") mod
    width — an explicit, engine-reproducible hash family (NOT the
    engine's internal hash), so the sketch contents are deterministic
    and the DuckDB oracle can rebuild them bit-for-bit. ``row`` is a
    Column (build side explodes the row index; probe side carries it
    as data)."""
    h8 = F.substring(
        F.md5(
            F.concat(row.cast("string"), F.lit(":"), key.cast("string"))
            .cast("binary")
        ),
        1,
        8,
    )
    return (F.conv(h8, 16, 10).cast("long") % width).cast("int")


def _rows_array(depth: int):
    return F.explode(F.array(*[F.lit(r) for r in range(depth)]))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch of the key column's frequency distribution as
    a (row, bucket, cnt) counter table — depth × width rows TOTAL,
    regardless of key cardinality.

    This is the mergeable frequency twin of the HLL layer above: the
    counter table is a plain additive aggregate, so per-partition /
    per-day sketches merge by summing counters (map-side partial agg
    does it for free), and the build is ONE scan (the depth
    replication is an in-row explode, not repeated scans) + one
    depth×width shuffle. Point estimates are biased UP only (est >=
    true count, the classic CMS guarantee: each row's counter sums
    every colliding key; the min over rows is the tightest).

    Unlike the HLL estimates, the whole structure is deterministic
    (md5 hash family) — estimates hash-match across engines and runs.
    """
    key = F.col(key_col)
    return (
        df.filter(key.isNotNull())
        .select(key.alias("__k"))
        .select(_rows_array(depth).alias("row"), F.col("__k"))
        .select(
            "row", _cms_bucket(F.col("row"), F.col("__k"), width).alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate every probe key against a counter table from
    ``cms_build``: est = min over rows of the key's counter. Probes
    replicate ×depth and equi-join the depth×width counter table —
    broadcast-sized by construction. Returns (key_col, est_cnt)."""
    key = F.col(key_col)
    expanded = probes.filter(key.isNotNull()).select(
        key.alias(key_col), _rows_array(depth).alias("row")
    )
    expanded = expanded.withColumn(
        "bucket", _cms_bucket(F.col("row"), F.col(key_col), width)
    )
    # LEFT join: a probe key absent from the build data can hash to
    # cells with no counter row — those cells hold 0, and min(0, ...)
    # must see them (an inner join would silently over-estimate or
    # drop the key entirely)
    return (
        expanded.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("long")
            .alias("est_cnt")
        )
    )
