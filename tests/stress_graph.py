"""10M-doc stress for the graph queries (SCALE.md stress table).

Not a pytest — run ad hoc: ``python tests/stress_graph.py [n_docs]``.

Corpus model: each doc is a 20-token walk on a bounded-branching token
chain (successor = (t*7 + salt) % V, salt < B), which is the property
that makes word-adjacency graphs tractable at scale — the DISTINCT edge
set is vocabulary-bounded (≤ V*B) no matter how large the corpus gets,
so corpus growth only scales the linear edge-extraction (explode +
distinct) stage, never the per-round graph joins. Reports wall time and
total shuffle read/write observed via the Spark status REST API.
"""

from __future__ import annotations

import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

V = 50_000  # vocabulary size
B = 20  # max out-degree per token (branching factor)
DOC_LEN = 20


def synth_docs(spark, n_docs: int):
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    start = F.pmod(F.xxhash64("doc_id"), F.lit(V))
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(DOC_LEN - 1)),
        F.array(start),
        lambda acc, k: F.concat(
            acc,
            F.array(
                F.pmod(
                    F.element_at(acc, -1) * 7
                    + F.pmod(F.xxhash64(F.col("doc_id"), k), F.lit(B)),
                    F.lit(V),
                )
            ),
        ),
    )
    return ids.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform(walk, lambda t: F.concat(F.lit("t"), t))
        ).alias("text"),
    )


from stress_util import shuffle_totals  # noqa: E402  (path set above)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from aggregator_spark.graph_queries import textrank_scores, triangle_count
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="graph-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/graph_stress_docs_{n_docs}"
    t0 = time.perf_counter()
    synth_docs(spark, n_docs).write.mode("overwrite").parquet(path)
    print(f"synth+write {n_docs} docs: {time.perf_counter()-t0:.1f}s")
    docs = spark.read.parquet(path)

    for name, fn in (("textrank", textrank_scores), ("triangles", triangle_count)):
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        out = fn(docs)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        print(
            f"{name}: {dt:.1f}s  shuffle_read={(rd1-rd0)/1e9:.2f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.2f}GB"
        )
        if name == "triangles":
            print("  n_triangles =", out.collect()[0][0])

    edges = docs.count()
    print("docs:", edges)
    spark.stop()


if __name__ == "__main__":
    main()
