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
CONSTRAINT_DDL = [
    "ALTER TABLE dim_risk ADD PRIMARY KEY (id)",
    "ALTER TABLE dim_country ADD PRIMARY KEY (id)",
    "ALTER TABLE dim_asn ADD PRIMARY KEY (number)",
    "ALTER TABLE dim_date ADD PRIMARY KEY (date)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_risk FOREIGN KEY (risk) REFERENCES dim_risk(id)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_country FOREIGN KEY (country) REFERENCES dim_country(id)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_asn FOREIGN KEY (asn) REFERENCES dim_asn(number)",
    "ALTER TABLE fact_count ADD CONSTRAINT fk_count_time FOREIGN KEY (date) REFERENCES dim_date(date)",
]
