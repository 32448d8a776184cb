"""Capture the physical plan of ONE large-star/small-star round of
``connected_components_star`` (the CC core under every *_near_dup_keep /
dedup_fuzzy_* key).

The operator is iterative and eagerly checkpoints each round, so
``.explain`` on its result only shows a scan of the checkpointed RDD.
For plan *visibility only*, this script monkeypatches
``DataFrame.localCheckpoint`` to the identity (the checkpoint is purely
a lineage-truncation / reuse device — removing it does not change the
computed rows) and runs the real repo function with
``max_iterations=1`` on a tiny edge list, then prints
``explain("formatted")`` of the returned labels DataFrame: the full
lineage of edges -> one round -> star-join labels.

Usage: python plans/r13/capture_cc_plan.py <components.py path> <out.txt>
"""

import importlib.util
import sys

from pyspark.sql import DataFrame, SparkSession


def main(mod_path: str, out_path: str) -> None:
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("cc-plan-capture")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location("cc_capture_mod", mod_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which overrides the base method — patch the concrete class.
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    ClassicDF.localCheckpoint = lambda self, eager=True: self  # lineage visible
    DataFrame.localCheckpoint = lambda self, eager=True: self

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 1)], ["doc_a", "doc_b"]
    )
    out = mod.connected_components_star(pairs, max_iterations=1)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(out_path, "w") as f:
        f.write(plan)
    n_exchange = plan.count("Exchange")
    print(f"wrote {out_path}: {n_exchange} Exchange nodes")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
