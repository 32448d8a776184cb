"""Per-key expanding-window anomaly detection: flag a value as an
outlier against the EXACT running moments of all strictly-earlier
values for the same key — the online feature-drift / sensor-outlier
primitive (batch form here; the streaming twin with identical
arithmetic lives in streaming/anomaly_stream.py).

Cross-engine determinism (the driver hashes values): the running
moments are EXACT — sum(x) and sum(x*x) accumulate as decimal(30,6)
window sums (order-independent, no float accumulation drift), cast to
double once at the end; mean/variance/z are then one fixed-shape IEEE
double expression over those exact inputs, bit-identical on any
engine. The continuous output column is floor-quantized to micro-units
(floor never has cross-engine tie semantics, unlike round).

Scale design: one shuffle on the key (the window partition), O(1)
state per row inside the partition, no self-join — the naive
formulation is a per-key range self-join, quadratic in the hot key.
For a hyper-hot key the same time-bucketing remedy as
``asof_join_bucketed`` applies (carry the (n, s1, s2) summary across
buckets); not needed at catalog scale and not implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MIN_PRIOR = 5  # fewer earlier observations than this -> never flagged
SIGMAS = 3.0


def expanding_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    min_prior: int = MIN_PRIOR,
    sigmas: float = SIGMAS,
) -> DataFrame:
    """(id, key, n_prior, z_micro, is_anomaly) per input row.

    ``n_prior`` counts strictly-earlier rows (ties broken by ``id_col``
    so the frame is total and reproducible). ``z_micro`` =
    floor(1e6 * (x - mean)/stddev) over the prior window, NULL when the
    window is short (< min_prior) or degenerate (zero variance).
    ``is_anomaly`` is true when |x - mean| > sigmas * stddev, with the
    zero-variance window flagging ANY deviation (all priors equal, so
    any change is infinitely surprising).
    """
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vq = F.col("__v").cast("decimal(30,6)")
    sq = (F.col("__v") * F.col("__v")).cast("decimal(30,6)")
    xq = vq.cast("double")

    base = events.select(
        F.col(id_col).alias("__id"),
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        F.col(value_col).alias("__v"),
    )
    stats = base.select(
        "__id",
        "__k",
        xq.alias("__x"),
        F.count(vq).over(w).alias("__n"),
        F.sum(vq).over(w).cast("double").alias("__s1"),
        F.sum(sq).over(w).cast("double").alias("__s2"),
    )
    mean = F.col("__s1") / F.col("__n")
    var = F.greatest(
        F.col("__s2") / F.col("__n") - mean * mean, F.lit(0.0)
    )
    dev = F.col("__x") - mean
    enough = F.col("__n") >= F.lit(min_prior)
    z = dev / F.sqrt(var)
    return stats.select(
        F.col("__id").alias(id_col),
        F.col("__k").alias(key_col),
        F.col("__n").cast("long").alias("n_prior"),
        F.when(enough & (var > F.lit(0.0)), F.floor(z * F.lit(1e6)))
        .cast("long")
        .alias("z_micro"),
        F.coalesce(
            enough
            & F.when(
                var > F.lit(0.0), F.abs(dev) > F.lit(sigmas) * F.sqrt(var)
            ).otherwise(F.abs(dev) > F.lit(0.0)),
            F.lit(False),
        ).alias("is_anomaly"),
    )
