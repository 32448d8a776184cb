"""Sessionize gap-boundary semantics: both engine and oracle use integer
microsecond arithmetic, so a fractional-second gap (1800.5 s) classifies
identically on both sides (ADVICE round 1: ts.cast('long') truncated to
whole seconds and silently disagreed with the oracle's epoch()).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aggregator_spark.analytics_queries import q_sessionize
from aggregator_spark.oracles_analytics import ANALYTICS_ORACLES

US = 1_000_000
T0 = 1_700_000_000 * US  # epoch micros


def _write_events(tmpdir: str) -> str:
    # user 1: gaps of exactly 1800.0s (same session: not > 1800s) then
    # 1800.5s (new session: 1800500000us > 1800000000us) then 0.5s (same)
    # user 2: gap of 1800.000001s -> new session by a single microsecond
    rows = [
        (1, T0, 100),
        (1, T0 + 1800 * US, 101),
        (1, T0 + 3600 * US + 500_000, 102),
        (1, T0 + 3601 * US, 103),
        (2, T0, 200),
        (2, T0 + 1800 * US + 1, 201),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            # tz-aware so Spark reads TimestampType (matching the real
            # testdata path), not TIMESTAMP_NTZ which unix_micros rejects
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.fixture(scope="module")
def boundary_dir(tmp_path_factory):
    return _write_events(str(tmp_path_factory.mktemp("sess_boundary")))


def test_sessionize_boundary_matches_oracle(spark, boundary_dir):
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_sessionize(spark, boundary_dir).collect()
    }
    # exact expected classification at the boundary
    assert got == {1: (2, 4), 2: (2, 2)}

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{boundary_dir}/events.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.sql(ANALYTICS_ORACLES["sessionize"]).fetchall()
    }
    con.close()
    assert got == oracle
