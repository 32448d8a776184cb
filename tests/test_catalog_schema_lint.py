"""Catalog-wide output-schema lint.

The driver's correctness canonicalizer sorts and hashes collected
column values. Two output-type traps have fired repeatedly:

- Array/Map columns: Python lists/dicts are unhashable →
  ``TypeError: unhashable type: 'list'`` (r2 embedding_normalize /
  embedding_quantize, r5 user_type_arrays). The fix idiom is a
  NULL-faithful comma-joined string serialization in the catalog
  wrapper (llm_queries.py) with ``array_to_string`` on the oracle side.
- Raw TIMESTAMP columns: PySpark deserializes via
  ``datetime.fromtimestamp`` (OS timezone) at collect while DuckDB
  returns naive UTC — session-TZ pinning does not help (pinned by
  test_tz_robustness.py). Emit ``unix_micros`` longs or dates instead.

This lint ends the trap: every ``queries()`` entry — including the
rows-only approximates, whose rows the driver still collects — must
build a DataFrame whose schema contains no ArrayType/MapType anywhere
and no TimestampType at any level.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _offending(dt: T.DataType, path: str) -> list[str]:
    bad: list[str] = []
    if isinstance(dt, (T.ArrayType, T.MapType)):
        bad.append(f"{path}: {dt.simpleString()}")
        # still recurse so nested arrays-of-maps report fully
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        bad.append(f"{path}: {dt.simpleString()}")
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            bad.extend(_offending(f.dataType, f"{path}.{f.name}"))
    elif isinstance(dt, T.ArrayType):
        bad.extend(_offending(dt.elementType, f"{path}[]"))
    elif isinstance(dt, T.MapType):
        bad.extend(_offending(dt.keyType, f"{path}<key>"))
        bad.extend(_offending(dt.valueType, f"{path}<value>"))
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unhashable_or_tz_trap_columns(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    bad: list[str] = []
    for field in df.schema.fields:
        bad.extend(_offending(field.dataType, field.name))
    assert bad == [], (
        f"{name} emits driver-canonicalizer-unsafe column types "
        f"(serialize arrays/maps to strings, timestamps to unix_micros): "
        f"{bad}"
    )
