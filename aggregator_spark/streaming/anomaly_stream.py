"""Streaming twin of operators/anomaly.py:expanding_zscore — per-key
online outlier flagging with O(1) state per key via
``applyInPandasWithState``.

State per key is exactly the sufficient statistic of the batch
operator's expanding window: (n, sum, sum-of-squares), held as EXACT
integer micro-units (the same decimal(30,6) quantization the batch
plan applies, reproduced bit-for-bit: Spark's double→decimal cast
rounds HALF_UP on the SHORTEST decimal representation — Python
``repr`` — see operators/media_fixture._micro for the pinned
semantics). Every derived double (mean, variance, z) is then computed
by the same IEEE expression sequence as the batch plan, so replaying a
log through this stream yields BIT-IDENTICAL rows to the batch
operator (pinned by test) — the lambda-architecture contract.

Ordering contract: rows are processed in (time, id) order WITHIN each
micro-batch (sorted here); across micro-batches the source must feed
per-key in time order (an append-log replay does). Late rows update
state in arrival order — the documented streaming relaxation.

State is three longs per key — bounded forever; sum-of-squares in
micro-units stays under 2^63 for |value| ≤ ~3e4 over 1e9 rows per key.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aggregator_spark.operators.anomaly import MIN_PRIOR, SIGMAS

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("z_micro", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1_micro", T.LongType()),
        T.StructField("s2_micro", T.LongType()),
    ]
)

_ONE = Decimal(1)


def _micro6(x: float) -> int:
    """decimal(30,6) quantization of a double, Spark cast semantics
    (HALF_UP on the shortest decimal repr)."""
    return int(
        Decimal(repr(float(x))).scaleb(6).quantize(_ONE, rounding=ROUND_HALF_UP)
    )


def _dbl(micro: int) -> float:
    """Exact micro-unit integer → the correctly-rounded double, same
    one-rounding path as Spark's decimal→double cast (float(Decimal)
    is correctly rounded; float(micro)/1e6 would round twice)."""
    return float(Decimal(micro).scaleb(-6))


def _zscore_fn(min_prior: int, sigmas: float):
    def fn(key, pdf_iter, state: GroupState):
        import math

        import pandas as pd

        (user_id,) = key
        uid = None if user_id is None else int(user_id)
        n, s1, s2 = (0, 0, 0)
        if state.exists:
            n, s1, s2 = state.get

        out: dict[str, list] = {c.name: [] for c in OUT_SCHEMA.fields}
        # one micro-batch can arrive as SEVERAL Arrow chunks (above
        # arrow.maxRecordsPerBatch) — the (ts, id) ordering contract
        # is per micro-batch, so concatenate before sorting; per-chunk
        # sorts would interleave chunks in source order
        chunks = [p for p in pdf_iter]
        # na_position='first': the batch window orderBy('__t','__id')
        # sorts NULL timestamps FIRST (Spark asc_nulls_first default);
        # pandas defaults NaT last, which would break bit-parity for a
        # key mixing NULL and non-NULL ts in one micro-batch (ADVICE r6)
        pdf = (
            pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        ).sort_values(["ts", "event_id"], na_position="first")
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            v = None if v is None else float(v)
            if v is None or math.isnan(v):
                # NULL value: the batch operator emits the row (its
                # window count/sum skip nulls) but never flags it and
                # contributes nothing to the running moments
                out["event_id"].append(int(eid))
                out["user_id"].append(uid)
                out["n_prior"].append(n)
                out["z_micro"].append(None)
                out["is_anomaly"].append(False)
                continue
            vm = _micro6(v)
            x = _dbl(vm)
            z_micro = None
            flag = False
            if n > 0:
                mean = _dbl(s1) / n
                var = max(_dbl(s2) / n - mean * mean, 0.0)
                dev = x - mean
                if n >= min_prior:
                    if var > 0.0:
                        z = dev / math.sqrt(var)
                        z_micro = math.floor(z * 1e6)
                        flag = abs(dev) > sigmas * math.sqrt(var)
                    else:
                        flag = abs(dev) > 0.0
            out["event_id"].append(int(eid))
            out["user_id"].append(uid)
            out["n_prior"].append(n)
            out["z_micro"].append(z_micro)
            out["is_anomaly"].append(flag)
            n += 1
            s1 += vm
            s2 += _micro6(v * v)

        state.update((n, s1, s2))
        yield pd.DataFrame(out)

    return fn


def zscore_outliers_stream(
    events: DataFrame,
    min_prior: int = MIN_PRIOR,
    sigmas: float = SIGMAS,
) -> DataFrame:
    """Streaming (event_id, user_id, n_prior, z_micro, is_anomaly) in
    append mode; bit-identical to the batch operator when the stream
    replays the log in per-key time order."""
    return (
        events.select("event_id", "user_id", "ts", "value")
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _zscore_fn(min_prior, sigmas),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
