"""Every queries() entry must hash-match its DuckDB oracle — the same
gate the driver runs (CORRECTNESS_r{N}.json) at sf0.01; we run sf0.001
for speed plus sf0.01 for the flagship."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare_query

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_every_query_has_callable_shape():
    assert QUERIES, "queries() must not be empty"
    for name, sql in ORACLES.items():
        assert name in QUERIES, f"oracle {name} has no query"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match_sf0001(spark, sf_dir, name):
    ok, msg = compare_query(spark, sf_dir, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match_sf001(spark, name):
    ok, msg = compare_query(
        spark, "/root/testdata/sf0.01", QUERIES[name], ORACLES[name]
    )
    assert ok, f"{name}: {msg}"
