"""Streaming heavy hitters with bounded state: a sharded Misra-Gries
summary maintained via ``applyInPandasWithState``.

Native streaming ``groupBy(token).count()`` keeps one state row PER
DISTINCT TOKEN — unbounded state on an open vocabulary, the thing that
kills a 100 TB/day token stream. This operator instead shards tokens by
hash and keeps ONE mergeable Misra-Gries summary per shard
(``k_mg`` counters, operators/heavy_hitters.py:mg_merge), so total
state is O(shards × k_mg) forever, while guaranteeing (standard MG
bounds, per shard):

- est_count <= true count,
- true count - est_count <= n_shard/(k_mg+1),
- every token with true count > n_shard/(k_mg+1) is present.

Each micro-batch emits the shard's refreshed summary in update mode,
tagged with the shard's cumulative item count ``n_seen`` — consumers
take the latest (max n_seen) row set per shard; the exact-verification
second pass, if wanted, is the batch operator over the candidates.

Tokens shard by hash, so one shard holds ALL occurrences of a given
token — estimates are per-token global, and shards scale the operator
horizontally exactly like a parallel aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aggregator_spark.operators.heavy_hitters import mg_merge

OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

# the summary itself is the state: parallel token/count arrays plus the
# shard's cumulative item count (array-typed state exercises the Arrow
# state serializer's variable-length path)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _hh_fn(k_mg: int):
    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        shard = key[0]
        counters: dict = {}
        n_seen = 0
        if state.exists:
            toks, cnts, n_seen = state.get
            counters = dict(zip(toks, cnts))
        for pdf in pdf_iter:
            vc = pdf["token"].value_counts()
            n_seen += int(vc.sum())
            counters = mg_merge(
                counters, {t: int(c) for t, c in vc.items()}, k_mg
            )
        state.update(
            (
                list(counters.keys()),
                [int(v) for v in counters.values()],
                int(n_seen),
            )
        )
        yield pd.DataFrame(
            {
                "shard": shard,
                "token": list(counters.keys()),
                "est_count": [int(v) for v in counters.values()],
                "n_seen": int(n_seen),
            }
        )

    return fn


def heavy_hitters_stream(
    items: DataFrame,
    token_col: str = "token",
    k_mg: int = 64,
    shards: int = 16,
) -> DataFrame:
    """Token stream → update-mode stream of per-shard MG summaries
    (shard, token, est_count, n_seen). State stays O(shards × k_mg)
    regardless of vocabulary size."""
    return (
        items.select(
            F.col(token_col).alias("token"),
            F.pmod(F.xxhash64(token_col), F.lit(shards))
            .cast("int")
            .alias("shard"),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _hh_fn(k_mg),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
