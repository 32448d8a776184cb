"""Stage 1 — the reference's ``Aggregator.run()`` as ONE Catalyst plan.

Reference orchestration (reference main.py:71-84): upload manifest →
DDL → load risk dim → COPY logentry → count → aggregate → amplify →
UNLOAD single CSV → drop tables. Four SQL round-trips through Redshift
become one lazy DataFrame plan:

    read.csv(manifest paths)
      → distinct(ip, day, risk, asn, country)     [shuffle 1]
      → groupBy(day, asn, risk, country).count    [shuffle 2, partial agg]
      → filter(count > threshold)
      → broadcast-join dim_risk                   [no shuffle]
      → orderBy(date desc, country, asn, risk)    [range exchange]
      → coalesce(1).write.csv + rename            [single-file artifact]

The DDL/drop steps (main.py:128-158, 87-92) are metadata, not dataflow,
and vanish; the count(*) log line (main.py:196-200) is an optional action.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from aggregator_spark.operators.aggregate import aggregate_counts, ordered_fact
from aggregator_spark.operators.amplify import amplified_counts
from aggregator_spark.sources.csv_sink import write_single_csv
from aggregator_spark.sources.logentry import read_logentry_csv


@dataclass
class Stage1Result:
    logentry: DataFrame
    count: DataFrame  # the amplified fact, reference `count` table shape
    csv_path: str | None = None
    logentry_rows: int | None = None


def run_stage1(
    spark: SparkSession,
    logentry_paths: str | list[str] | DataFrame,
    dim_risk: DataFrame,
    threshold: int = 100,
    output_csv: str | None = None,
    count_rows: bool = False,
    approx_distinct: bool = False,
) -> Stage1Result:
    if isinstance(logentry_paths, DataFrame):
        logentry = logentry_paths
    else:
        logentry = read_logentry_csv(spark, logentry_paths)

    n = logentry.count() if count_rows else None  # main.py:196-200 sanity log

    # sort once, AFTER the amplify join — a join would destroy a prior
    # sort; the reference's observable order lives in the UNLOADed CSV
    # (main.py:213 feeding 232-247)
    fact = aggregate_counts(
        logentry, threshold=threshold, approx_distinct=approx_distinct,
        ordered=False,
    )
    fact = ordered_fact(amplified_counts(fact, dim_risk))

    csv_path = None
    if output_csv:
        # UNLOAD ... PARALLEL OFF + rename-to-.csv, main.py:232-256
        csv_path = write_single_csv(fact, output_csv, header=False)

    return Stage1Result(
        logentry=logentry, count=fact, csv_path=csv_path, logentry_rows=n
    )
