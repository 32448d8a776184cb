"""Frictionless datapackage as a first-class Spark data source
(Spark 4 Python DataSource API): ``spark.read.format("datapackage")``.

Upgrades the helper in ``datapackage.py`` (reference main.py:178-185,
320-333 semantics) into a real pluggable source: the descriptor's field
list is the source schema (never inferred), each file of a resource's
``path`` list becomes one input partition (the reference's S3 manifest
maps resources to many objects, reference main.py:95-103 — here that
IS the parallelism unit), and rows stream to the JVM Arrow-batched.

Semantics matched to the plain-CSV path used elsewhere:
- header row skipped (position-based, header names ignored — the
  reference's COPY ignores headers, reference main.py:164-171),
- empty string → NULL for every column (Spark CSV default nullValue,
  and the reference's ``null ''`` RDS load, reference main.py:307),
- datapackage ``number`` → double, ``integer`` → long, etc. via
  ``datapackage.datapackage_schema``'s mapping.

Register per-session with ``register_datapackage_source(spark)``.
"""

from __future__ import annotations

import csv
import datetime
import io
import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T

from aggregator_spark.sources.datapackage import (
    _find_resource,
    datapackage_schema,
    load_descriptor,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _resource_files(dp: dict, resource: str | None, base: str | None):
    res = _find_resource(dp, resource)
    path = res["path"]
    paths = path if isinstance(path, list) else [path]
    if base:
        paths = [os.path.join(base, p) for p in paths]
    return paths


def _converter(dt: T.DataType):
    if isinstance(dt, T.DoubleType):
        return float
    if isinstance(dt, T.LongType):
        return int
    if isinstance(dt, T.BooleanType):
        return lambda v: v.lower() in ("true", "t", "1", "yes")
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat
    if isinstance(dt, T.TimestampType):
        return lambda v: datetime.datetime.fromisoformat(
            v.replace("Z", "+00:00")
        )
    return lambda v: v


class DatapackageReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self._schema = schema
        descriptor = options.get("descriptor")
        if not descriptor:
            raise ValueError(
                "datapackage source requires .option('descriptor', ...)"
            )
        dp = load_descriptor(descriptor)
        base = options.get("base")
        if (
            base is None
            and isinstance(descriptor, str)
            and os.path.exists(descriptor)
        ):
            base = os.path.dirname(os.path.abspath(descriptor))
        self._files = _resource_files(dp, options.get("resource"), base)
        self._convs = [_converter(f.dataType) for f in schema.fields]

    def partitions(self):
        # one partition per resource file — the manifest entry is the
        # unit of parallelism, matching the reference's S3 manifest
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        convs = self._convs
        ncols = len(convs)
        with open(partition.path, newline="") as f:
            rows = csv.reader(f)
            next(rows, None)  # header skipped; position is what matters
            for row in rows:
                yield tuple(
                    convs[i](row[i])
                    if i < len(row) and row[i] != ""
                    else None
                    for i in range(ncols)
                )


class DatapackageDataSource(DataSource):
    """``spark.read.format('datapackage')`` with options:
    ``descriptor`` (path or JSON string — required), ``resource``
    (name, default first), ``base`` (override for relative paths).
    """

    @classmethod
    def name(cls) -> str:
        return "datapackage"

    def schema(self) -> T.StructType:
        descriptor = self.options.get("descriptor")
        if not descriptor:
            raise ValueError(
                "datapackage source requires .option('descriptor', ...)"
            )
        return datapackage_schema(
            load_descriptor(descriptor), self.options.get("resource")
        )

    def reader(self, schema: T.StructType) -> DatapackageReader:
        return DatapackageReader(dict(self.options), schema)


def register_datapackage_source(spark) -> None:
    spark.dataSource.register(DatapackageDataSource)


def read_via_source(
    spark, descriptor: str, resource: str | None = None
):
    """Convenience: register + read in one call."""
    register_datapackage_source(spark)
    reader = spark.read.format("datapackage").option(
        "descriptor", descriptor
    )
    if resource:
        reader = reader.option("resource", resource)
    return reader.load()
