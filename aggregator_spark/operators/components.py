"""Connected components over candidate duplicate pairs — the iterative
resolution step that turns pairwise near-dup evidence (MinHash-LSH,
embedding cosine, ...) into dedup clusters: every document gets the min
doc_id of its component as cluster label.

Algorithm: iterative min-label propagation as pure DataFrame ops —
each round every node takes the min of its own label and its
neighbors' labels; converged when no label changes. Rounds needed =
graph diameter (near-dup graphs are shallow: mostly stars and short
chains), each round is one shuffle on node id. This is the standard
large-graph CC shape (cf. GraphFrames' label propagation) without any
graph library dependency, and the driver only ever sees the
changed-row COUNT, never the data.

The DuckDB oracle computes the same labels with a recursive CTE
(transitive closure → min reachable id), cross-checking the iterative
dataflow against a declarative fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _persistent_ids(spark) -> set[int]:
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _unpersist_ids(spark, ids: set[int]) -> None:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(False)


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, component) with
    component = min doc_id reachable. Only nodes appearing in ``pairs``
    are returned (callers union in singletons if needed)."""
    edges = pairs.select(
        F.col(left_col).alias("src"), F.col(right_col).alias("dst")
    )
    # localCheckpoint, NOT persist: an iterative loop whose next plan
    # references the previous one twice doubles the logical plan every
    # round — by iteration ~25 the planner itself OOMs. Checkpointing
    # truncates lineage so each round plans against a materialized
    # leaf. (Found the hard way on a 50k-doc / 55k-pair stress run.)
    spark = pairs.sparkSession
    before_sym = _persistent_ids(spark)
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym_ids = _persistent_ids(spark) - before_sym

    before = _persistent_ids(spark)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_ckpt_ids = _persistent_ids(spark) - before

    for _ in range(max_iterations):
        # every node's candidate label = min over neighbors' labels
        nbr_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the previous label through the projection so convergence
        # is a filter on the checkpointed result, not an extra join
        before = _persistent_ids(spark)
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("prev_label"),
            )
            .localCheckpoint(eager=True)
        )
        # the previous round's checkpoint blocks are now unreachable —
        # release them eagerly instead of leaving them to occupy the
        # block manager for the rest of the session (they degraded
        # queries run AFTER this operator in the same session)
        new_ids = _persistent_ids(spark) - before
        _unpersist_ids(spark, prev_ckpt_ids)
        prev_ckpt_ids = new_ids
        changed = stepped.filter(
            F.col("label") != F.col("prev_label")
        ).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            break

    # the edge table is no longer referenced by the returned plan
    # (labels is checkpointed) — free it too
    _unpersist_ids(spark, sym_ids)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Full dedup resolution: every document labeled with its component
    (singletons label themselves). Downstream keeps one doc per
    component (e.g. min id = the component label itself)."""
    comp = connected_components(pairs, left_col, right_col)
    return docs.select(F.col(id_col).alias("doc_id")).join(
        comp, "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
