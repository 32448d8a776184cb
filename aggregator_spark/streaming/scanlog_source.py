"""Deterministic scan-log STREAMING source (Spark 4 Python DataSource
API, ``SimpleDataSourceStreamReader``): ``spark.readStream.format(
"scanlog")`` emits reference-shaped logentry rows
(date, ip, risk, asn, country — reference main.py:134-139) in
offset-tracked micro-batches.

Why it exists: the reference ingests scan logs as batch S3 drops; the
streaming twin of that ingest (``streaming/ingest.py``) needs a
replayable, deterministic source to test recovery semantics without
files. Offsets are plain batch indices; every batch's rows are a pure
function of the offset (congruential mix, no RNG state), so
``readBetweenOffsets`` replays EXACTLY the rows of the original read —
the contract checkpoint recovery depends on.

Options: ``rows_per_batch`` (default 100), ``max_batches`` (default 3;
after that ``read`` reports no new data so availableNow/
processAllAvailable terminate), ``start_day`` (ISO date, default
2016-08-05 — the README's example scan date, reference README.md:20).
"""

from __future__ import annotations

import datetime
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

SCANLOG_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("ip", T.StringType()),
        T.StructField("risk", T.IntegerType()),
        T.StructField("asn", T.LongType()),
        T.StructField("country", T.StringType()),
    ]
)

_COUNTRIES = ["US", "DE", "JP", "BR", "IN", "T"]
_RISKS = [1, 2, 4, 5]


def batch_rows(
    batch: int, rows_per_batch: int, start_day: datetime.date
) -> list:
    """Pure function (batch, config) → rows; the determinism contract."""
    base = datetime.datetime.combine(
        start_day, datetime.time()
    ) + datetime.timedelta(hours=batch)
    out = []
    for j in range(rows_per_batch):
        # congruential mix keyed only by (batch, j) — replayable
        h = (batch * 1_000_003 + j * 7919 + 12345) & 0x7FFFFFFF
        out.append(
            (
                base + datetime.timedelta(seconds=j * 13 % 3600),
                f"10.{h % 256}.{(h >> 8) % 256}.{(h >> 16) % 256}",
                _RISKS[h % len(_RISKS)],
                64496 + h % 32,
                _COUNTRIES[h % len(_COUNTRIES)],
            )
        )
    return out


class ScanlogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_batches = int(options.get("max_batches", 3))
        self.start_day = datetime.date.fromisoformat(
            options.get("start_day", "2016-08-05")
        )

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        b = start["batch"]
        if b >= self.max_batches:
            return iter([]), {"batch": b}  # caught up — lets
            # availableNow / processAllAvailable terminate
        return (
            iter(batch_rows(b, self.rows_per_batch, self.start_day)),
            {"batch": b + 1},
        )

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        rows: list = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(
                batch_rows(b, self.rows_per_batch, self.start_day)
            )
        return iter(rows)


class ScanlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scanlog"

    def schema(self) -> T.StructType:
        return SCANLOG_SCHEMA

    def simpleStreamReader(
        self, schema: T.StructType
    ) -> ScanlogStreamReader:
        return ScanlogStreamReader(dict(self.options))


def register_scanlog_source(spark) -> None:
    spark.dataSource.register(ScanlogDataSource)
