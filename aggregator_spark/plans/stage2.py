"""Stage 2 — the reference's ``LoadToRDS.run()`` as distributed dataflow.

Reference orchestration (reference main.py:279-288): load ref dims →
DDL → \\COPY fact_count → populate dim_date + 4 cubes + sentinels →
anti-join dimension repairs (driver round-trip per row) → constraints/
indexes. Here: the fact arrives as a DataFrame (no S3 round-trip),
derivations are lazy plans off one cached fact, repairs stay distributed
(left_anti + union), and publishing is a sink choice (parquet dir or
JDBC) instead of psql subprocesses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregator_spark.operators.calendar import derive_dim_date
from aggregator_spark.operators.cube import GRANULARITIES, rollup_cube
from aggregator_spark.operators.repair import (
    missing_asns,
    missing_countries,
    repair_dim_asn,
    repair_dim_country,
)

# cap on the missing-dimension key lists collected for the reference's
# log-line behavior (main.py logs them) — keeps the driver transfer
# bounded however skewed the fact is
MISSING_LOG_CAP = 10_000


def _capped_log(keys: DataFrame, overflow_marker):
    """Collect at most MISSING_LOG_CAP single-column key rows, appending
    ``overflow_marker`` iff more exist (fetch cap+1 and flag) so the log
    distinguishes 'exactly cap' from 'capped'. Caller pre-orders the
    frame so the logged sample is deterministic."""
    rows = [r[0] for r in keys.limit(MISSING_LOG_CAP + 1).collect()]
    if len(rows) > MISSING_LOG_CAP:
        return rows[:MISSING_LOG_CAP] + [overflow_marker]
    return rows


@dataclass
class Stage2Result:
    fact_count: DataFrame
    dim_date: DataFrame
    dim_risk: DataFrame
    dim_country: DataFrame
    dim_asn: DataFrame
    cubes: dict[str, DataFrame] = field(default_factory=dict)
    # warning-log equivalents of reference main.py:441-445, 473-478
    missing_countries: list[str] = field(default_factory=list)
    missing_asns: list[int] = field(default_factory=list)

    def tables(self) -> dict[str, DataFrame]:
        out = {
            "fact_count": self.fact_count,
            "dim_date": self.dim_date,
            "dim_risk": self.dim_risk,
            "dim_country": self.dim_country,
            "dim_asn": self.dim_asn,
        }
        for g, df in self.cubes.items():
            out[f"agg_risk_country_{g}"] = df
        return out


def run_stage2(
    spark: SparkSession,
    fact_count: DataFrame,
    dim_risk: DataFrame,
    dim_country: DataFrame,
    dim_asn: DataFrame,
    collect_missing_logs: bool = True,
) -> Stage2Result:
    # stage-2 fact is DATE-typed (TIMESTAMP→DATE widening, main.py:355-361)
    fact = fact_count.withColumn("date", F.col("date").cast("date")).cache()

    dim_date = derive_dim_date(fact)  # Q10-Q12, main.py:390-401
    cubes = {g: rollup_cube(fact, g) for g in GRANULARITIES}  # Q13+Q14

    miss_c: list[str] = []
    miss_a: list[int] = []
    if collect_missing_logs:
        # bounded driver transfer: the log list is observability only
        # (the repair itself stays distributed below) — countries are
        # naturally ≤ ~250 but a pathological fact could surface ~100k
        # missing ASNs, so cap what crosses to the driver
        # deterministic sample (orderBy before limit) + overflow marker:
        # fetch cap+1 so a reader of the log can tell "exactly cap"
        # from "capped" — the reference logs everything
        # (main.py:432-452); we bound the driver transfer but must not
        # silently truncate
        miss_c = _capped_log(
            missing_countries(fact, dim_country).orderBy("country"),
            "<TRUNCATED>",
        )
        miss_a = _capped_log(
            missing_asns(fact, dim_asn).select("asn").orderBy("asn"),
            -1,
        )

    return Stage2Result(
        fact_count=fact,
        dim_date=dim_date,
        dim_risk=dim_risk,
        dim_country=repair_dim_country(fact, dim_country),
        dim_asn=repair_dim_asn(fact, dim_asn),
        cubes=cubes,
        missing_countries=miss_c,
        missing_asns=miss_a,
    )


def publish_parquet(result: Stage2Result, out_dir: str) -> None:
    """Publish the star schema as parquet — the engine-native serving
    layout. The fact partitions by date (the reference's leading index,
    main.py:530-552, becomes partition pruning)."""
    for name, df in result.tables().items():
        writer = df.write.mode("overwrite")
        if name == "fact_count":
            writer = writer.partitionBy("date")
        writer.parquet(f"{out_dir}/{name}")
