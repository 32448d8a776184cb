"""Write-side data layout optimization: Z-order clustering for
multi-dimensional data skipping.

At 100 TB the fastest scan is the one that never reads the file:
parquet row-group min/max statistics let the reader drop row groups
whose value range excludes the predicate — but only if the writer
clustered the data so per-row-group ranges are NARROW. Sorting by one
column gives perfect skipping on that column and none on any other;
interleaving the bits of several columns' rank-space positions (the
Z-order / Morton curve) gives good skipping on EVERY interleaved
column at once, which is what serving layouts for ad-hoc multi-column
predicates need (the same design as Delta Lake's OPTIMIZE ZORDER BY
and Iceberg's sort-order z-curve; implemented here with plain
DataFrame ops — no table-format dependency).

Shape: per-column range bounds come from one ``approxQuantile`` pass
(a driver-side list of at most 2^bits numbers per column — the
broadcast-equivalent); each row maps to its rank bucket via JVM
``width_bucket``-style binary search (a SQL CASE over the tiny bounds
array would also do, but Spark ships ``array_position``-free binary
search through ``F.expr``); bucket bits interleave with integer
shifts — all whole-stage-codegen expressions, zero Python in the row
path. The write is ``repartitionByRange`` on the z-key (contiguous
curve segments per file) + ``sortWithinPartitions`` (contiguous
segments per row group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 64 rank buckets per dimension: the bucket expression is a cut-count
# comparison chain, and 63 codegen'd branches per column keeps the
# whole z-key inside whole-stage codegen limits while 64 buckets
# already bounds any row group to ~1/64 of a dimension's rank space
DEFAULT_BITS = 6


def _rank_bucket(col: Column, bounds: list[float], bits: int) -> Column:
    """Map a value to its rank bucket [0, 2^bits) given the quantile
    bounds (len == 2^bits - 1 inner cut points). NULLs go to bucket 0
    (they sort together at the curve origin)."""
    b = F.lit(0)
    for cut in bounds:
        b = b + F.when(col > F.lit(cut), 1).otherwise(0)
    return F.coalesce(b.cast("long"), F.lit(0).cast("long"))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """Morton-interleaved z-value over ``cols`` as a LONG column
    expression. Rank-space (quantile) bucketing, not raw-value
    bucketing: skewed distributions still spread uniformly along the
    curve. len(cols) * bits must fit in 63 bits."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must be <= 63")
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (n_cuts + 1) for i in range(n_cuts)]
    # one distributed quantile pass per column; the bounds list is the
    # tiny driver-side artifact (<= 255 doubles per column)
    bounds = {
        c: df.approxQuantile(c, probs, 0.001) for c in cols
    }
    buckets = [
        _rank_bucket(F.col(c).cast("double"), bounds[c], bits) for c in cols
    ]
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, bcol in enumerate(buckets):
            out_pos = bit * len(cols) + ci
            z = z + F.shiftleft(
                F.shiftright(bcol, bit).bitwiseAND(F.lit(1)), out_pos
            ).cast("long")
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as parquet clustered along the z-curve of ``cols``:
    range-partition on the z-key (each output file covers a contiguous
    curve segment) and sort within partitions (each ROW GROUP covers a
    contiguous sub-segment), then drop the key column. Readers get
    multi-column min/max skipping for free from the parquet stats."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_skip_fraction(path: str, col: str, value) -> float:
    """Fraction of parquet row groups whose min/max stats EXCLUDE an
    equality predicate ``col = value`` — the measurable data-skipping
    win of a layout (1.0 = reader touches nothing; 0.0 = reader must
    scan every row group). Pure footer metadata, no data read."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isdir(path)
        else [path]
    )
    total = skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and st.has_min_max and (
                value < st.min or value > st.max
            ):
                skipped += 1
    return skipped / total if total else 0.0
