"""LIVE JDBC round-trip of the stage-2 publish path (reference
main.py:272-552, tests/aggregation_tests.py:433-486).

Apache Derby 10.16 ships on Spark's classpath (it backs the Hive
metastore), so the JDBC sink can be exercised against a REAL embedded
database — no external server or extra jar: the 9 tables are written
through ``df.write.jdbc``, the reference's constraint/index DDL is
applied over a real java.sql connection, Derby's system catalog is
asserted to hold the reference's 17 constraint names (the same check
aggregation_tests.py:458-486 runs against information_schema) and all
27 index names, and every table is read back through ``spark.read.jdbc``
with its contents intact. FK enforcement is real here: the ADD
CONSTRAINT statements would fail if the repair operators had left
orphan keys in the fact or cubes.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aggregator_spark.plans.stage2 import run_stage2
from aggregator_spark.schemas import FACT_COUNT
from aggregator_spark.sources.jdbc import (
    constraint_ddl,
    execute_ddl,
    fetch_single_column,
    index_ddl,
    read_jdbc,
    write_jdbc,
)

FACT_SEED = [
    (datetime.date(2016, 9, 3), 0, "AA", 111111, 1, 30.8),
    (datetime.date(2016, 11, 13), 0, "ZZ", 999999, 33, 1353.0),
    (datetime.date(2016, 5, 22), 0, "AA", 111111, 10, 410.0),
    (datetime.date(2014, 10, 21), 0, "ZZ", 999999, 4, 25.2),
    (datetime.date(2014, 10, 3), 0, "AA", 111111, 2, 1113.8),
]

# columns carrying PK/FK constraints must be NOT NULL for Derby to
# accept the DDL (Postgres sets NOT NULL implicitly on ADD PRIMARY KEY)
KEY_COLUMNS = {
    "dim_risk": ["id"],
    "dim_country": ["id"],
    "dim_asn": ["number", "country"],
    "dim_date": ["date"],
    "fact_count": ["date", "risk", "country", "asn"],
    **{
        f"agg_risk_country_{t}": ["risk", "country"]
        for t in ("week", "month", "quarter", "year")
    },
}


def _column_types(df) -> str:
    """createTableColumnTypes override: Spark's Derby dialect maps
    StringType to CLOB, which cannot carry PKs/FKs/indexes — force
    VARCHAR instead."""
    parts = [
        f"{f.name} VARCHAR(255)"
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
    ]
    return ", ".join(parts)


@pytest.fixture(scope="module")
def derby(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


@pytest.fixture(scope="module")
def published(spark, derby):
    fact = spark.createDataFrame(FACT_SEED, FACT_COUNT)
    # reference dims carry the cube sentinels (risk 100 / country 'T'),
    # which is what lets Postgres validate the cube FKs — same here
    dim_risk = spark.createDataFrame(
        [(0, "test-risk", 0.13456), (100, "total", 0.0)],
        "id int, slug string, amplification_factor double",
    )
    dim_country = spark.createDataFrame(
        [("AA", "Test country"), ("ZZ", "Test country"), ("T", "global")],
        "id string, name string",
    )
    dim_asn = spark.createDataFrame(
        [(111111, "Test title", "AA")],
        "number long, title string, country string",
    )
    res = run_stage2(spark, fact, dim_risk, dim_country, dim_asn)
    tables = res.tables()
    for name, df in tables.items():
        types = _column_types(df)
        w = df.write.mode("overwrite")
        if types:
            w = w.option("createTableColumnTypes", types)
        w.jdbc(url=derby, table=f'"{name}"', properties={})
        execute_ddl(
            spark,
            derby,
            [
                f'ALTER TABLE "{name}" ALTER COLUMN "{c}" NOT NULL'
                for c in KEY_COLUMNS[name]
            ],
        )
    execute_ddl(spark, derby, constraint_ddl("derby"))
    execute_ddl(spark, derby, index_ddl("derby"))
    return {name: df for name, df in tables.items()}


def test_all_17_constraint_names_in_catalog(spark, derby, published):
    # the reference's own assertion list, aggregation_tests.py:462-467
    c_names = [
        "dim_risk_pkey", "dim_country_pkey", "dim_asn_pkey", "dim_date_pkey",
        "fk_country_asn", "fk_count_risk", "fk_count_country", "fk_count_asn",
        "fk_count_time", "fk_cube_risk_week", "fk_cube_risk_month",
        "fk_cube_risk_quarter", "fk_cube_risk_year", "fk_cube_country_week",
        "fk_cube_country_month", "fk_cube_country_quarter",
        "fk_cube_country_year",
    ]
    got = set(
        fetch_single_column(
            spark, derby, "SELECT constraintname FROM sys.sysconstraints"
        )
    )
    missing = [c for c in c_names if c not in got]
    assert missing == [], f"constraints not created: {missing}"


def test_all_27_indexes_created(spark, derby, published):
    """All 27 CREATE INDEX statements executed (the fixture would have
    raised otherwise). Catalog visibility: Derby SHARES the physical
    conglomerate when an index exactly duplicates a constraint's
    backing index (warning 01504), so single-column indexes on FK
    columns don't get their own sysconglomerates row — every other
    index must appear by name."""
    from aggregator_spark.sources.jdbc import FOREIGN_KEYS, INDEXES

    fk_backed = {(t, (c,)) for t, _, c, _, _ in FOREIGN_KEYS}
    got = set(
        fetch_single_column(
            spark,
            derby,
            "SELECT conglomeratename FROM sys.sysconglomerates "
            "WHERE isindex",
        )
    )
    assert len(INDEXES) == 27
    shared, own = [], []
    for name, table, cols in INDEXES:
        key = (table, tuple(c for c, _ in cols))
        (shared if key in fk_backed else own).append(name)
    missing = sorted(n for n in own if n not in got)
    assert missing == [], f"indexes not created: {missing}"
    # the shared ones really are the FK-duplicate set, nothing else
    assert len(shared) == 12
    assert all(n not in got for n in shared)


def test_round_trip_contents(spark, derby, published):
    for name, df in published.items():
        back = read_jdbc(spark, derby, f'"{name}"')
        assert back.count() == df.count(), name
        assert sorted(back.columns) == sorted(df.columns), name
    fact = read_jdbc(spark, derby, '"fact_count"')
    total = fact.agg(F.sum("count")).collect()[0][0]
    assert total == sum(r[4] for r in FACT_SEED)
    # the repaired ASN row (999999 was missing from dim_asn) made it to
    # the serving DB — and its FK validated against dim_asn
    asn = {
        r["number"]: r
        for r in read_jdbc(spark, derby, '"dim_asn"').collect()
    }
    assert asn[999999]["title"] == "unknown"
    assert asn[999999]["country"] == "ZZ"


def test_fk_enforcement_is_real(spark, derby, published):
    # Derby must REJECT an orphan fact row — proving the constraints
    # are live, not just names in a catalog
    with pytest.raises(Exception, match="fk_count_asn|foreign key"):
        execute_ddl(
            spark,
            derby,
            [
                "INSERT INTO \"fact_count\" VALUES "
                "('2016-01-01', 0, 'AA', 42424242, 1, 1.0)"
            ],
        )
