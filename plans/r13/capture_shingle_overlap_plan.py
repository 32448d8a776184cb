"""Capture .explain('formatted') for the shingle-pair-overlap consumers
(change 17: single-subtree window sizes + hashed join keys).

Run BEFORE the change with OUT_SUFFIX=shingle_before and AFTER with
OUT_SUFFIX=shingle_after:
    OUT_SUFFIX=shingle_before python plans/r13/capture_shingle_overlap_plan.py
"""
import io, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
from aggregator_spark.sources.stamped_cache import CACHE_ROOT_ENV
os.environ.setdefault(CACHE_ROOT_ENV, "/tmp/aggregator_spark_bench_cache")
from aggregator_spark.session import get_spark

suffix = os.environ.get("OUT_SUFFIX", "shingle_before")
out_dir = os.path.dirname(os.path.abspath(__file__))
spark = get_spark(app_name="plan-capture")
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry_mod
qs = entry_mod.queries()
sf_dir = "/root/testdata/sf0.1"
for key in ("ngram_containment_pairs", "ngram_jaccard_capped",
            "minhash_est_accuracy", "dedup_fuzzy_keep"):
    df = qs[key](spark, sf_dir)
    buf = io.StringIO()
    _stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = _stdout
    path = os.path.join(out_dir, f"{key}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{key}: Exchange={txt.count('Exchange')} MapInPandas={txt.count('MapInPandas')} "
          f"SMJ={txt.count('SortMergeJoin')} BHJ={txt.count('BroadcastHashJoin')} -> {path}")
spark.stop()
