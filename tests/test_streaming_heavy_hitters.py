"""Streaming sharded Misra-Gries heavy hitters: bounded per-shard
state across micro-batches (array-typed state round-trip), and the MG
estimate/survivor guarantees checked against exact batch counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregator_spark.streaming.heavy_hitters_stream import (
    heavy_hitters_stream,
)

K_MG = 8
SHARDS = 4


def _skewed_tokens(spark, n_rows: int, offset: int = 0):
    # geometric skew over 11 items: item_9 ~half the rows, item_8 ~a
    # quarter, ... item_0 ~1/1024 (deterministic; see _zipfish in
    # test_heavy_hitters.py)
    return spark.range(offset, offset + n_rows).select(
        F.concat(
            F.lit("item_"),
            F.floor(F.log2(F.col("id") % 1024 + 1)).cast("int"),
        ).alias("token")
    )


@pytest.fixture
def hh_run(spark, tmp_path):
    src = str(tmp_path / "tok_stream")
    _skewed_tokens(spark, 4_000).coalesce(2).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema("token string").parquet(src)
    out = heavy_hitters_stream(stream, k_mg=K_MG, shards=SHARDS)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch: state (token/count arrays) must survive
        # the round-trip and keep accumulating
        _skewed_tokens(spark, 4_000, offset=4_000).coalesce(2).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM hh_out").collect()
    # latest summary per shard = the rows carrying that shard's max
    # cumulative n_seen
    latest_n = {}
    for r in rows:
        latest_n[r["shard"]] = max(latest_n.get(r["shard"], 0), r["n_seen"])
    final = {
        (r["shard"], r["token"]): r["est_count"]
        for r in rows
        if r["n_seen"] == latest_n[r["shard"]]
    }
    return final, latest_n


def _truth(spark):
    all_items = _skewed_tokens(spark, 4_000).union(
        _skewed_tokens(spark, 4_000, offset=4_000)
    )
    with_shard = all_items.select(
        "token",
        F.pmod(F.xxhash64("token"), F.lit(SHARDS)).cast("int").alias("shard"),
    )
    true_counts = {
        (r["shard"], r["token"]): r["cnt"]
        for r in with_shard.groupBy("shard", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    shard_totals = {}
    for (shard, _), c in true_counts.items():
        shard_totals[shard] = shard_totals.get(shard, 0) + c
    return true_counts, shard_totals


def test_mg_guarantees_vs_exact(spark, hh_run):
    final, latest_n = hh_run
    true_counts, shard_totals = _truth(spark)

    # shard item totals seen by the stream match the truth exactly
    assert latest_n == shard_totals

    for (shard, token), est in final.items():
        true = true_counts[(shard, token)]
        err_bound = shard_totals[shard] // (K_MG + 1)
        assert est <= true, f"{token}: est {est} > true {true}"
        assert true - est <= err_bound, (
            f"{token}: error {true - est} exceeds n/(k+1)={err_bound}"
        )

    # survivor guarantee: anything above the per-shard error bar is in
    # the final summary
    for (shard, token), true in true_counts.items():
        if true > shard_totals[shard] // (K_MG + 1):
            assert (shard, token) in final, (
                f"heavy {token} (cnt {true}) missing from shard {shard}"
            )


def test_state_is_bounded(spark, hh_run):
    final, _ = hh_run
    per_shard = {}
    for shard, _ in final:
        per_shard[shard] = per_shard.get(shard, 0) + 1
    assert per_shard, "no summaries emitted"
    assert all(v <= K_MG for v in per_shard.values()), per_shard
