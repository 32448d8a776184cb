"""Local replica of the driver's correctness gate: run a ``queries()``
entry on Spark and its ``oracle_sql()`` on DuckDB over the same parquet
tables, then compare row count, column names, and (column-name-sorted,
row-sorted) values — the same contract CORRECTNESS_r{N}.json grades.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from aggregator_spark.schemas import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int) and not isinstance(v, bool):
        return v
    return v


def _rows_sorted(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, sf_dir: str, qfn, sql: str):
    """Returns (ok, message). Exact equality — the driver hashes values."""
    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()
    con.close()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        a = _rows_sorted(s_cols, s_rows)
        b = _rows_sorted(d_cols, d_rows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            problems.append(f"values differ; first diffs: {diffs}")
    return (not problems, "; ".join(problems) or "ok")
