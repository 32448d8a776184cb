from aggregator_spark.operators.aggregate import (
    aggregate_counts,
    dedup_observations,
    group_count,
    ordered_fact,
)
from aggregator_spark.operators.amplify import amplified_counts
from aggregator_spark.operators.calendar import derive_dim_date
from aggregator_spark.operators.cube import GRANULARITIES, rollup_cube
from aggregator_spark.operators.repair import (
    missing_asns,
    missing_countries,
    repair_dim_asn,
    repair_dim_country,
)

__all__ = [
    "aggregate_counts",
    "dedup_observations",
    "group_count",
    "ordered_fact",
    "amplified_counts",
    "derive_dim_date",
    "GRANULARITIES",
    "rollup_cube",
    "missing_countries",
    "missing_asns",
    "repair_dim_country",
    "repair_dim_asn",
]
