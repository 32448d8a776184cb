"""Capture before/after formatted plans for the r13 small-graph CC
path (session 4): BEFORE = the distributed star loop's labels
(forced via AGGREGATOR_SPARK_CC_DRIVER_EDGES=0 — plan-identical to
the pre-change tree: the threshold count() is a driver job, not a
plan node), AFTER = the size-gated driver union-find whose
broadcast-hinted labels flip the downstream label joins SMJ -> BHJ.

Run from the repo root:
    python plans/r13/capture_cc_small_path_plan.py
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession  # noqa: E402

KEYS = ["dedup_fuzzy_keep_union", "audio_near_dup_keep",
        "corpus_prepare_ppl_e2e"]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("cc-small-path-plans")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as m  # noqa: E402

qs = m.queries()
for mode, env in (("before", "0"), ("after", str(1 << 17))):
    os.environ["AGGREGATOR_SPARK_CC_DRIVER_EDGES"] = env
    for key in KEYS:
        df = qs[key](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r13/{key}_ccsmall_{mode}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path, len(buf.getvalue().splitlines()), "lines")
spark.stop()
