"""User-defined function surface — one exemplar per extension point
(SURVEY §2.8: the reference has none; these complete the engine's
extensibility story):

- scalar **Pandas UDF** (Arrow-vectorized, Series→Series)
- grouped-agg **Pandas UDAF** (Series→scalar per group)
- Python **UDTF** (table function: one row in, N rows out)

Each is deterministic so results stay oracle-checkable where the math
is SQL-expressible.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def log1p_scaled(v: pd.Series) -> pd.Series:
    """Scalar Pandas UDF: log1p feature scaling, Arrow-vectorized
    (numpy under the hood — no per-row Python)."""
    import numpy as np

    return pd.Series(np.log1p(v.to_numpy()))


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg Pandas UDAF: exp(mean(log1p(x))) - 1 — a robust
    central tendency for heavy-tailed values. numpy reduction per
    group, Arrow transfer, no Python loop."""
    import numpy as np

    return float(np.expm1(np.log1p(v.to_numpy()).mean()))


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Python UDTF: text → one row per whitespace token with position.
    The generator-function analogue of explode(split(...)), shown as a
    UDTF so the extension point is exercised; for plain tokenization
    the built-in explode is the faster path (see top_tokens)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield i, tok


def register_udfs(spark) -> list[str]:
    """Register the exemplars for SQL use; returns registered names."""
    spark.udf.register("log1p_scaled", log1p_scaled)
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udtf.register("tokenize", TokenizeUDTF)
    return ["log1p_scaled", "geometric_mean", "tokenize"]


class SplitFieldsUDTF:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): splits a
    delimited string into N named columns where N and the column names
    come from a constant argument AT PLAN TIME — the output schema is
    computed per call site, not fixed at registration.

    ``SELECT * FROM split_fields(props_csv, 'k1,k2,k3')`` yields
    columns (k1, k2, k3). The analyze hook is the UDTF analogue of a
    datasource's schema(): resolution-time metadata, executor-time
    rows.
    """

    @staticmethod
    def analyze(row_arg, names_arg):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if not names_arg.isConstantExpression:
            raise ValueError(
                "split_fields: column-name argument must be a constant"
            )
        schema = StructType()
        for name in str(names_arg.value).split(","):
            schema = schema.add(name.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, row, names):  # noqa: D102
        if row is None:
            return
        n = len(names.split(","))
        parts = (row.split(",") + [None] * n)[:n]
        yield tuple(parts)


def register_polymorphic_udtf(spark) -> str:
    from pyspark.sql.functions import udtf

    spark.udtf.register("split_fields", udtf(SplitFieldsUDTF))
    return "split_fields"
