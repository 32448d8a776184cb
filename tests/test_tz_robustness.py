"""Timezone robustness of the read path and the query outputs.

Two hazards, both hit in earlier rounds:

1. The driver regenerates testdata between rounds and has already
   flipped the parquet timestamp physical type once (r3: TIMESTAMP
   NANOS → naive micros/TIMESTAMP_NTZ, which broke 9 queries). The
   read-side normalization in ``schemas._read_one`` is the chokepoint —
   pin it by reading the SAME instants through every physical encoding
   and requiring identical results.

2. Raw-timestamp outputs are OS-TZ-sensitive at collect() time (PySpark
   deserializes via ``datetime.fromtimestamp`` in the process TZ, which
   session-TZ pinning does NOT fix). All catalog outputs were moved to
   epoch-micros longs / dates; assert that by re-running the
   timestamp-heavy queries against their oracles in a subprocess with
   TZ=America/New_York.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WALL_CLOCKS_US = [
    1706227200_000000,  # 2024-01-26 00:00:00 UTC — a day boundary
    1706313599_999999,  # 2024-01-26 23:59:59.999999 — last µs of day
    1706313600_000001,  # 2024-01-27 00:00:00.000001
    1706400000_500000,  # mid-day with fractional second
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(ts_array)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, path, version="2.6", store_schema=False)


def _collect_normalized(spark, path_dir: str):
    from pyspark.sql import functions as F

    from aggregator_spark.schemas import load_testdata

    df = load_testdata(spark, path_dir, "events")
    out = df.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
    ).orderBy("event_id")
    return [tuple(r) for r in out.collect()]


def test_ntz_and_tz_aware_fixtures_round_trip_identically(spark, tmp_path):
    """The same instants through naive-µs (TIMESTAMP_NTZ), UTC-aware µs,
    and naive-ns (nanosAsLong path) parquet must load to identical
    epoch-micros and day truncations."""
    fixtures = {}

    d = tmp_path / "ntz"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array(WALL_CLOCKS_US, pa.timestamp("us")),
    )
    fixtures["ntz_us"] = str(d)

    d = tmp_path / "aware"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array(WALL_CLOCKS_US, pa.timestamp("us", tz="UTC")),
    )
    fixtures["aware_us"] = str(d)

    d = tmp_path / "nanos"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        pa.array(
            [us * 1000 + 999 for us in WALL_CLOCKS_US], pa.timestamp("ns")
        ),  # +999ns: must TRUNCATE to the same µs, never round up
    )
    fixtures["nanos"] = str(d)

    results = {k: _collect_normalized(spark, v) for k, v in fixtures.items()}
    assert results["ntz_us"] == results["aware_us"], (
        f"NTZ vs tz-aware drift: {results['ntz_us']} != {results['aware_us']}"
    )
    assert results["nanos"] == results["ntz_us"], (
        f"nanos path drift: {results['nanos']} != {results['ntz_us']}"
    )


# The timestamp-heavy catalog queries (raw-instant outputs were the r1
# failure class; they now emit epoch-micros/dates).
TZ_SENSITIVE = [
    "daily_counts",
    "dim_date",
    "calendar_funcs",
    "clicks_before_purchase",
    "zscore_outliers",
    "sessionize",
    "profile_events",
    "session_window_native",
    "tumbling_hourly",
    "sliding_halfhour",
    "latest_event_per_user",
    "asof_click_purchase",
    "gap_fill_daily",
    "rolling_7d_avg",
]

_SUBPROC_SCRIPT = """
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + "/tests")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("tz-audit")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as m
from oracle_harness import compare_query
qs, osql = m.queries(), m.oracle_sql()
fails = []
for name in {names!r}:
    ok, msg = compare_query(
        spark, "/root/testdata/sf0.001", qs[name], osql[name])
    if not ok:
        fails.append((name, msg[:200]))
spark.stop()
assert not fails, fails
print("TZ-AUDIT-OK")
"""


@pytest.mark.tz_audit
def test_oracle_parity_under_non_utc_os_tz():
    """Run the timestamp-heavy queries against their oracles with the
    PROCESS timezone set to America/New_York. OS TZ reaches Python's
    datetime.fromtimestamp during collect(), which session-TZ pinning
    cannot fix — only TZ-neutral output types pass this."""
    env = dict(os.environ, TZ="America/New_York")
    script = _SUBPROC_SCRIPT.format(repo=REPO, names=TZ_SENSITIVE)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0 and "TZ-AUDIT-OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )
