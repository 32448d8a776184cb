"""Deterministic balanced shard emission (operators/reshard.py):
bit-parity with the plain-window closed form, invariance to input
partitioning (the determinism claim), balance within 1, and both
emission sinks (parquet dirs / warclite containers) — rank-ordered
content, re-run identical, no duplicate containers on rerun."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Window, functions as F

from aggregator_spark.operators.reshard import (
    emit_shard_containers,
    emit_shards_parquet,
    reshard_deterministic,
)

N = 8


def _docs(spark, sf_dir):
    from aggregator_spark.schemas import load_testdata

    return load_testdata(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )


def _assign(df):
    return {
        r["doc_id"]: (r["shard_id"], r["shard_rank"])
        for r in reshard_deterministic(df, N, "doc_id").collect()
    }


def test_parity_with_plain_window(spark, sf_dir):
    """shard_id/shard_rank must equal the single-window closed form:
    r = row_number() over (ORDER BY md5 DESC, key) - 1."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.orderBy(h.desc(), "doc_id")
    plain = {
        r["doc_id"]: (r["r"] % N, r["r"] // N)
        for r in docs.select(
            "doc_id", (F.row_number().over(w) - 1).alias("r")
        ).collect()
    }
    assert _assign(docs) == plain


def test_invariant_to_input_partitioning(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = _assign(docs.repartition(3))
    b = _assign(docs.repartition(17, "lang"))
    assert a == b


def test_shards_balanced_within_one(spark, sf_dir):
    from collections import Counter

    sizes = Counter(s for s, _ in _assign(_docs(spark, sf_dir)).values())
    assert set(sizes) == set(range(N))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_shard_rank_dense_per_shard(spark, sf_dir):
    from collections import defaultdict

    by_shard = defaultdict(list)
    for sid, rank in _assign(_docs(spark, sf_dir)).values():
        by_shard[sid].append(rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(len(ranks)))


def test_bad_args_rejected(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="n_shards"):
        reshard_deterministic(docs, 0, "doc_id")
    with pytest.raises(ValueError, match="reserved"):
        reshard_deterministic(
            docs.withColumn("shard_id", F.lit(1)), N, "doc_id"
        )


def test_parquet_emission_rank_ordered_and_rerun_identical(
    spark, sf_dir, tmp_path
):
    sharded = reshard_deterministic(_docs(spark, sf_dir), N, "doc_id")
    out = str(tmp_path / "shards_pq")
    emit_shards_parquet(sharded, out, N)

    def snapshot():
        snap = {}
        for d in sorted(glob.glob(out + "/shard_id=*")):
            sid = int(d.split("=")[1])
            rows = spark.read.parquet(d).collect()
            # file order IS rank order: one task per shard, sorted
            assert [r["shard_rank"] for r in rows] == list(
                range(len(rows))
            )
            snap[sid] = [r["doc_id"] for r in rows]
        return snap

    first = snapshot()
    assert sorted(first) == list(range(N))
    emit_shards_parquet(sharded, out, N)  # re-run: identical shards
    assert snapshot() == first


def test_container_emission_roundtrip_and_rerun(spark, sf_dir, tmp_path):
    from aggregator_spark.sources.warclite import register_warclite_source

    docs = _docs(spark, sf_dir).withColumn(
        "mime", F.lit("text/x-seq")
    ).withColumn("payload", F.col("doc_id").cast("string").cast("binary"))
    sharded = reshard_deterministic(docs, N, "doc_id")
    expected = {
        r["doc_id"]: (r["shard_id"], r["shard_rank"])
        for r in sharded.collect()
    }
    out = str(tmp_path / "shards_wlc")
    emit_shard_containers(sharded, out, N)
    files = sorted(glob.glob(out + "/shard-*.wlc"))
    assert len(files) == N
    register_warclite_source(spark)
    for f in files:
        sid = int(os.path.basename(f)[6:11])
        rows = (
            spark.read.format("warclite").option("path", f).load().collect()
        )
        # record order within the container == shard_rank order
        got_ids = [r["doc_id"] for r in rows]
        want = sorted(
            (rank, d)
            for d, (s, rank) in expected.items()
            if s == sid
        )
        assert got_ids == [d for _, d in want]
        assert all(bytes(r["payload"]) == str(r["doc_id"]).encode()
                   for r in rows)
    emit_shard_containers(sharded, out, N)  # rerun overwrites in place
    assert sorted(glob.glob(out + "/shard-*.wlc")) == files


def test_mixing_report_colocation_near_chance(spark, sf_dir):
    """Hash-ordered round-robin must destroy corpus adjacency:
    adjacent sequence pairs co-locate at ~1/N_SHARDS (chance), never
    the ~100% a contiguous assignment would give. Deterministic
    fixture, so the bounds are a stable pin."""
    from aggregator_spark.analytics_queries12 import (
        N_SHARDS,
        q_shard_mixing_report,
    )

    rows = q_shard_mixing_report(spark, sf_dir).collect()
    n_adj_total = sum(r["n_seqs"] for r in rows) - 1  # pairs overall
    colocated = sum(r["adj_colocated"] for r in rows)
    frac = colocated / n_adj_total
    assert 0.2 / N_SHARDS <= frac <= 3.0 / N_SHARDS, frac
