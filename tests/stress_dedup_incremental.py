"""Batch-proportional cost stress for incremental fuzzy dedup
(SCALE.md stress table).

Not a pytest — run ad hoc:
``python tests/stress_dedup_incremental.py [n_corpus] [n_batch]``.

Corpus: n_corpus existing docs + n_batch new docs (deterministic
20-word texts over a 5k-word vocabulary; ~1% of new docs are verbatim
copies of an existing doc, so the batch genuinely collides). Compares:

- full re-dedup (``minhash_dedup_keep`` over corpus+batch — what a
  pipeline without an incremental path must run per snapshot), vs
- ``minhash_dedup_incremental`` (batch buckets vs full bucket table).

Both scan everything once to build signatures (irreducible); the
incremental form's win is the candidate stage: O(batch buckets) join
output and a components run over candidates only, vs the full form's
corpus-wide self-join and corpus-wide components. Reports wall and
shuffle volume for both, and cross-checks the incremental keep
decisions against the full run on the batch rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stress_util import shuffle_totals

VOCAB = 5_000
WORDS = 20
DUP_FRAC_PCT = 1  # % of new docs duplicating an existing doc


def synth_docs(spark, n: int, id_offset: int, dup_of_mod: int | None = None):
    """doc_id, text: 20 words drawn deterministically from the vocab.
    When dup_of_mod is set, docs with doc_id % 100 < DUP_FRAC_PCT copy
    the text of existing doc (doc_id % dup_of_mod) instead."""
    base = spark.range(n).select((F.col("id") + id_offset).alias("doc_id"))
    src_id = (
        F.when(
            F.col("doc_id") % 100 < DUP_FRAC_PCT,
            F.col("doc_id") % dup_of_mod,
        ).otherwise(F.col("doc_id"))
        if dup_of_mod
        else F.col("doc_id")
    )
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src_id, F.lit(i)), F.lit(VOCAB)),
        )
        for i in range(WORDS)
    ]
    return base.select("doc_id", F.concat_ws(" ", *words).alias("text"))


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from aggregator_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_dedup_keep,
    )
    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="incr-dedup-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/incr_dedup_docs"
    existing = synth_docs(spark, n_corpus, 0)
    new = synth_docs(spark, n_batch, 10**9, dup_of_mod=n_corpus)
    existing.withColumn("is_new", F.lit(False)).union(
        new.withColumn("is_new", F.lit(True))
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    print(f"corpus={n_corpus} batch={n_batch} dup_frac={DUP_FRAC_PCT}%")

    # the production posture: the corpus's (doc_id, band, bucket) table
    # is persisted from the prior run — only the batch gets signed
    from aggregator_spark.operators.dedup import lsh_buckets

    bpath = "/tmp/incr_dedup_buckets"
    lsh_buckets(docs.filter(~F.col("is_new")).select("doc_id", "text")).write.mode(
        "overwrite"
    ).parquet(bpath)
    stored_buckets = spark.read.parquet(bpath)

    results = {}
    for name, fn in (
        (
            "full_rededup",
            lambda: minhash_dedup_keep(docs, threshold=0.5),
        ),
        (
            "incremental",
            lambda: minhash_dedup_incremental(
                docs, F.col("is_new"), threshold=0.5
            ),
        ),
        (
            "incremental_stored_buckets",
            lambda: minhash_dedup_incremental(
                docs,
                F.col("is_new"),
                threshold=0.5,
                corpus_buckets=stored_buckets,
            ),
        ),
    ):
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        rd1, wr1 = shuffle_totals(spark)
        results[name] = rows
        print(
            f"{name}: {dt:.1f}s  rows={len(rows)}"
            f"  shuffle_read={(rd1-rd0)/1e9:.3f}GB"
            f"  shuffle_write={(wr1-wr0)/1e9:.3f}GB"
        )

    # cross-check: for batch docs, incremental keep == full-run keep
    # (both keep a doc iff it is its component's minimum id; existing
    # ids are all smaller than batch ids, so "component contains an
    # existing doc" == "not the min" for batch rows)
    full_keep = {
        r["doc_id"]: r["keep"] for r in results["full_rededup"]
        if r["doc_id"] >= 10**9
    }
    for variant in ("incremental", "incremental_stored_buckets"):
        inc_keep = {r["doc_id"]: r["keep"] for r in results[variant]}
        diff = {d for d in inc_keep if inc_keep[d] != full_keep[d]}
        assert not diff, (
            f"{variant}: {len(diff)} keep mismatches, e.g. {sorted(diff)[:5]}"
        )
    n_dropped = sum(
        1 for r in results["incremental"] if not r["keep"]
    )
    print(f"equality on batch rows: OK ({n_dropped} batch docs dropped)")
    spark.stop()


if __name__ == "__main__":
    main()
