"""Capture the formatted plan of ``served_media_near_dup`` for the
serve-overlap change (r13 session 3). The physical plan is IDENTICAL
before and after by construction — the change moves the three view
builders onto concurrent driver threads (each runs its star-CC loop
eagerly at plan-build time); the returned union plan does not change.
This capture is the evidence FOR that identity claim: run it from both
trees and diff.

Run from the tree to capture:  python plans/r13/capture_serve_overlap_plan.py <out.txt>
Uses sf0.001 (warm stamped cache under the default root).
"""

import io
import sys
from contextlib import redirect_stdout

from pyspark.sql import SparkSession


def main() -> None:
    out_path = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("serve-overlap-plan")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from aggregator_spark.analytics_queries13 import q_served_media_near_dup

    df = q_served_media_near_dup(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
