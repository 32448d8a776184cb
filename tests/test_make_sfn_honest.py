"""The stopword-honest sfN generator mode (tests/make_sf1.py
``honest``): absolute gates must keep survivors from EVERY copy (the
sf-proportional survivor fix, VERDICT r10 item 5) while the cross-copy
near-dup structure stays dead — shared stopwords must not re-create
LSH candidate pairs between copies."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = "/tmp/testdata_sfn_honest_pin"
COPIES = 2
DOCS_PER_COPY = 5000  # the sf0.1 documents stride


def _build():
    from make_sf1 import build

    marker = os.path.join(OUT, "documents.parquet")
    if not os.path.exists(marker):
        build(OUT, COPIES, honest=True)
    return OUT


def test_gate_keeps_survivors_from_every_copy(spark):
    from aggregator_spark.llm_queries import corpus_keep_flags
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, _build(), "documents")
    per_copy = dict(
        corpus_keep_flags(docs)
        .filter("keep")
        .groupBy(
            (F.col("doc_id") / DOCS_PER_COPY).cast("int").alias("copy")
        )
        .count()
        .collect()
    )
    assert set(per_copy) == set(range(COPIES)), per_copy
    # copies are the same corpus modulo tags: keep counts within 1%
    lo, hi = min(per_copy.values()), max(per_copy.values())
    assert hi - lo <= max(5, hi // 100), per_copy


def test_cross_copy_candidates_stay_dead(spark):
    """Unprefixed stopwords share tokens across copies, but a full
    shingle needs DEFAULT_SHINGLE consecutive lexicon tokens in both
    copies — cross-copy LSH candidate pairs must stay ~0 (the scaling
    model's reason for prefixing at all)."""
    from aggregator_spark.operators import dedup as D
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, _build(), "documents")
    pairs = D.lsh_candidate_pairs(docs)
    cross = pairs.filter(
        (F.col("doc_a") / DOCS_PER_COPY).cast("int")
        != (F.col("doc_b") / DOCS_PER_COPY).cast("int")
    ).count()
    within = pairs.count() - cross
    assert within > 0  # the within-copy duplicate structure replicated
    assert cross == 0, f"{cross} cross-copy candidate pairs leaked"
