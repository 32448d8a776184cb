"""Physical-plan linting: mechanical detection of the plan shapes
that kill jobs at 100 TB, applied across the WHOLE catalog (the plan
analog of tests/test_catalog_schema_lint.py — individual queries pin
their specific shapes in test_plan_shapes.py; this is the floor every
query must clear).

Checked antipatterns:

- ``CartesianProduct`` — a SHUFFLED cartesian (both sides
  materialized against each other). Never acceptable; a deliberate
  small-side nested loop must be a BroadcastNestedLoopJoin.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan: every
  row round-trips pickled through a Python worker. The Arrow-batched
  forms (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsInPandas``)
  are the sanctioned Python escape hatches.

``plan_report`` also counts the structural features (exchanges, scans,
joins by strategy, codegen spans) so callers can assert budgets the
way test_plan_shapes.py does — one place to parse explain output
instead of ad-hoc string counting.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# tree nodes appear once in the tree ("+- Node (n)" / ":- Node (n)")
# and again in the formatted detail section ("(n) Node"); count tree
# occurrences only
_NODE = re.compile(r"[+:]- (\w+)")


def explain_formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_report(df: DataFrame) -> dict[str, int]:
    """Node-name → tree-occurrence count for a DataFrame's physical
    plan (AQE initial plan — the shapes pinned here are static)."""
    counts: dict[str, int] = {}
    for m in _NODE.finditer(explain_formatted(df)):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def lint_plan(df: DataFrame) -> list[str]:
    """Names of forbidden node types present in the plan (empty =
    clean)."""
    report = plan_report(df)
    return [n for n in FORBIDDEN if report.get(n)]
