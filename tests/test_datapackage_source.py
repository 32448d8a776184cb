"""Spark 4 Python DataSource wrapping the datapackage reader:
``spark.read.format('datapackage')`` must match the plain
``read_datapackage_resource`` path row-for-row, split multi-file
resources into one partition per file, and apply the reference's
empty-string→NULL rule (reference main.py:307)."""

from __future__ import annotations

import json

from tests.test_stage2_and_sources import RISK_CSV, RISK_DP

from aggregator_spark.sources.datapackage import read_datapackage_resource
from aggregator_spark.sources.datapackage_source import (
    register_datapackage_source,
)


def _write_fixture(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "risk.csv").write_text(RISK_CSV)
    desc = tmp_path / "datapackage.json"
    desc.write_text(json.dumps(RISK_DP))
    return str(desc)


def test_source_matches_plain_reader(spark, tmp_path):
    desc = _write_fixture(tmp_path)
    register_datapackage_source(spark)
    via_source = (
        spark.read.format("datapackage").option("descriptor", desc).load()
    )
    via_plain = read_datapackage_resource(spark, desc)
    assert via_source.schema == via_plain.schema
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_plain.collect())
    )
    # empty-string description → NULL (not ''), number → double
    rows = sorted(map(tuple, via_source.collect()))
    assert rows[1][0] == 100.0 and rows[1][7] is None


def test_multi_file_resource_partitioning(spark, tmp_path):
    # a path LIST (manifest-style, reference main.py:95-103) becomes
    # one input partition per file
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "a.csv").write_text("id,slug\n1,one\n")
    (data_dir / "b.csv").write_text("id,slug\n2,two\n")
    dp = {
        "name": "multi",
        "resources": [
            {
                "name": "r",
                "path": ["data/a.csv", "data/b.csv"],
                "schema": {
                    "fields": [
                        {"name": "id", "type": "integer"},
                        {"name": "slug", "type": "string"},
                    ]
                },
            }
        ],
    }
    desc = tmp_path / "datapackage.json"
    desc.write_text(json.dumps(dp))
    register_datapackage_source(spark)
    df = (
        spark.read.format("datapackage")
        .option("descriptor", str(desc))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, df.collect())) == [(1, "one"), (2, "two")]
