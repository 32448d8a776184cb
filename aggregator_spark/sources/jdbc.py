"""JDBC publishing (the reference's RDS sink).

Reference stage 2 publishes 9 tables to Postgres (reference
main.py:272-276) via ``psql \\COPY`` subprocesses (main.py:304-309) —
here it's ``df.write.jdbc`` which streams partitions in parallel from
the executors, no driver round-trip, no subprocess.

The container has no Postgres and no JDBC driver jar, so this module is
exercised through plan-only tests; at deploy time it needs
``--jars postgresql-*.jar``. The constraint/index DDL of the reference
(main.py:499-552) is a serving-DB concern emitted optionally after load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict | None = None,
    batchsize: int = 10_000,
) -> None:
    props = {"batchsize": str(batchsize)}
    props.update(properties or {})
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)


# The reference's post-load DDL, kept as data so a deployment can apply it
# through any SQL connection (reference main.py:499-552). Not executed by
# the engine: Spark neither needs nor enforces PK/FK/indexes; behavioral
# FK integrity is preserved by the repair operators
# (aggregator_spark.operators.repair).

# the reference applies every cube-templated statement once per
# granularity (main.py:379-384 create_or_update_cubes)
CUBE_GRANULARITIES = ["week", "month", "quarter", "year"]

# 17 constraints, 1:1 with reference main.py:499-527: four PKs, the
# dim_asn->dim_country FK, four fact_count FKs, and risk+country FKs on
# each of the four agg_risk_country_<time> cubes.
CONSTRAINT_DDL = [
    "ALTER TABLE dim_risk ADD PRIMARY KEY (id)",
    "ALTER TABLE dim_country ADD PRIMARY KEY (id)",
    "ALTER TABLE dim_asn ADD PRIMARY KEY (number)",
    "ALTER TABLE dim_asn ADD CONSTRAINT fk_country_asn FOREIGN KEY (country) REFERENCES dim_country(id)",
    "ALTER TABLE dim_date ADD PRIMARY KEY (date)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_risk FOREIGN KEY (risk) REFERENCES dim_risk(id)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_country FOREIGN KEY (country) REFERENCES dim_country(id)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_asn FOREIGN KEY (asn) REFERENCES dim_asn(number)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_time FOREIGN KEY (date) REFERENCES dim_date(date)",
] + [
    ddl
    for t in CUBE_GRANULARITIES
    for ddl in (
        f"ALTER TABLE agg_risk_country_{t} ADD CONSTRAINT fk_cube_risk_{t} "
        f"FOREIGN KEY (risk) REFERENCES dim_risk(id)",
        f"ALTER TABLE agg_risk_country_{t} ADD CONSTRAINT fk_cube_country_{t} "
        f"FOREIGN KEY (country) REFERENCES dim_country(id)",
    )
]

# 27 indexes, 1:1 with reference main.py:530-552: seven on fact_count
# (serving-API paths) and five per cube granularity. On the Spark side
# the analogue is partitionBy('date') at write time (plans/stage2.py) —
# these strings exist so a Postgres deployment can reproduce the
# reference's serving schema exactly.
INDEX_DDL = [
    "CREATE INDEX idx_date_country ON fact_count(date DESC, country)",
    "CREATE INDEX idx_all ON fact_count(date, country, risk, asn)",
    "CREATE INDEX idx_all_desc ON fact_count(date DESC, country, risk, asn)",
    "CREATE INDEX idx_risk ON fact_count(risk)",
    "CREATE INDEX idx_asn ON fact_count(asn)",
    "CREATE INDEX idx_country ON fact_count(country)",
    "CREATE INDEX idx_date ON fact_count(date)",
] + [
    ddl
    for t in CUBE_GRANULARITIES
    for ddl in (
        f"CREATE INDEX idx_all_cube_{t} ON agg_risk_country_{t}(date, country, risk)",
        f"CREATE INDEX idx_all_desc_cube_{t} ON agg_risk_country_{t}(date DESC, country, risk)",
        f"CREATE INDEX idx_risk_cube_{t} ON agg_risk_country_{t}(risk)",
        f"CREATE INDEX idx_country_cube_{t} ON agg_risk_country_{t}(country)",
        f"CREATE INDEX idx_date_cube_{t} ON agg_risk_country_{t}(date)",
    )
]
