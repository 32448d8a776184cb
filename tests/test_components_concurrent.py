"""Thread-safety of the CC loops' checkpoint bookkeeping (r13).

The r12 form discovered each localCheckpoint's RDD id by diffing the
GLOBAL persistent-RDD set before/after the call; a concurrent driver
thread's fresh checkpoint landed in the diff and was unpersisted by the
other loop's round cleanup (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — observed
when the served-media views ran from a thread pool). `_ckpt_ids` now
reads the id straight off the checkpointed Dataset's LogicalRDD plan,
so each loop owns exactly its own blocks. These tests pin:

- `_ckpt_ids` returns precisely the persisted id (eager and lazy);
- concurrent star/propagate loops on driver threads produce the same
  labels as serial runs (the failure mode was a lost checkpoint block
  mid-loop, i.e. an exception, not silent corruption);
- the loops leak no persistent RDDs even when interleaved.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from aggregator_spark.operators.components import (
    _ckpt_ids,
    connected_components,
    connected_components_star,
)


def _persistent_set(spark) -> set[int]:
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def test_ckpt_ids_matches_persisted_rdd(spark):
    before = _persistent_set(spark)
    eager = spark.range(100).withColumn("x", F.col("id") * 2).localCheckpoint(
        eager=True
    )
    lazy = spark.range(50).withColumn("y", F.col("id") + 1).localCheckpoint(
        eager=False
    )
    created = _persistent_set(spark) - before
    assert _ckpt_ids(eager) | _ckpt_ids(lazy) == created
    # cleanup so the suite's global set is unchanged (subset: the async
    # ContextCleaner may concurrently collect blocks from earlier tests)
    from aggregator_spark.operators.components import _unpersist_ids

    _unpersist_ids(spark, created)
    assert _persistent_set(spark) <= before


def _expected_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in members.values() for n in ms}


def test_concurrent_cc_loops_are_isolated(spark):
    # graphs with enough rounds each that the loops interleave; the
    # propagate variant needs diameter within its round budget (25)
    chain = [(i, i + 1) for i in range(60)]
    forest = [(i, i + 7) for i in range(0, 200, 3)] + [
        (1000 + i, 1000 + i + 1) for i in range(40)
    ]
    short_chain = [(i, i + 1) for i in range(18)]
    short_forest = [(i, i + 7) for i in range(0, 200, 3)] + [
        (1000 + i, 1000 + i + 1) for i in range(20)
    ]
    before = _persistent_set(spark)

    # driver_max_edges=0 forces the DISTRIBUTED loops: these pins are
    # about the iterative machinery's checkpoint bookkeeping, which the
    # r13 small-graph union-find path (taken by default at this scale)
    # would bypass entirely
    def run_star(edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return {
            r["doc_id"]: r["component"]
            for r in connected_components_star(
                df, driver_max_edges=0
            ).collect()
        }

    def run_prop(edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return {
            r["doc_id"]: r["component"]
            for r in connected_components(df, driver_max_edges=0).collect()
        }

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(run_star, chain),
            pool.submit(run_star, forest),
            pool.submit(run_prop, short_chain),
            pool.submit(run_prop, short_forest),
        ]
        got = [f.result() for f in futs]

    assert got[0] == _expected_labels(chain)
    assert got[1] == _expected_labels(forest)
    assert got[2] == _expected_labels(short_chain)
    assert got[3] == _expected_labels(short_forest)
    # each loop releases every intermediate block even when interleaved;
    # the only survivors are the (up to) four RETURNED label relations —
    # one final checkpoint each, kept by design for the caller, and
    # possibly already collected by the async ContextCleaner once the
    # DataFrames went out of scope, so pin an upper bound, not equality
    # (a leaked round intermediate would push this far above 4: the
    # loops above run ~18-60 rounds each)
    leftovers = _persistent_set(spark) - before
    assert len(leftovers) <= 4
    from aggregator_spark.operators.components import _unpersist_ids

    _unpersist_ids(spark, leftovers)
