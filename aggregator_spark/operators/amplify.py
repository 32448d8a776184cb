"""Amplification join (Q9).

Reference (reference main.py:219-229):

    UPDATE count SET count_amplified = count * amplification_factor
    FROM dim_risk WHERE risk = id

UPDATE-FROM has inner-join semantics: rows whose risk has no dim match keep
their previous value (the 0 placeholder). Immutable DataFrames express this
as a LEFT broadcast join + ``coalesce(count*factor, old)`` — same observable
result, strictly cheaper than an in-place second pass at scale.

Scale notes: dim_risk is tiny (dozens of rows) → ``F.broadcast`` makes this
a zero-shuffle map-side hash join; the fact side streams through without
repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def amplified_counts(
    fact: DataFrame,
    dim_risk: DataFrame,
    fact_key: str = "risk",
    dim_key: str = "id",
    factor_col: str = "amplification_factor",
) -> DataFrame:
    dim = F.broadcast(
        dim_risk.select(F.col(dim_key).alias("__dim_id"), F.col(factor_col))
    )
    return (
        fact.join(dim, fact[fact_key] == dim["__dim_id"], "left")
        .withColumn(
            "count_amplified",
            F.coalesce(
                F.col("count") * F.col(factor_col), F.col("count_amplified")
            ),
        )
        .drop("__dim_id", factor_col)
    )
