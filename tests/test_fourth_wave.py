"""Property pins for the round-9 fourth-wave entries (the hash-match
against the oracle proves value equality; these pin the SEMANTIC
contracts a refactor could silently break while still matching a
co-refactored oracle)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_quality_percentile_top_frac_contract(spark, sf_dir):
    """Per source: pct_rank is (rank-1)/(n-1) over a total order, so
    exactly 1 + floor(p*(n-1)) docs are kept, every kept doc's quality
    is >= every dropped doc's quality (DESC ordering), and pct_rank
    spans [0, 1]."""
    from aggregator_spark.llm_queries import (
        QUALITY_TOP_FRAC,
        q_quality_percentile,
    )

    rows = q_quality_percentile(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rs in by_src.items():
        n = len(rs)
        kept = [r for r in rs if r["keep_top"]]
        want = 1 + math.floor(QUALITY_TOP_FRAC * (n - 1)) if n > 1 else 1
        assert len(kept) == want, (src, n, len(kept), want)
        ranks = sorted(r["pct_rank"] for r in rs)
        assert ranks[0] == 0.0 and ranks[-1] == 1.0
        dropped = [r for r in rs if not r["keep_top"]]
        if kept and dropped:
            assert min(r["quality"] for r in kept) >= max(
                r["quality"] for r in dropped
            ), src


def test_quality_percentile_bucketed_bit_parity(spark, sf_dir):
    """The bucketed twin must equal the plain window BIT-FOR-BIT, with
    a bucket small enough that carry-in is exercised across many
    (source, quality, id-range) partitions."""
    from aggregator_spark.llm_queries import (
        QUALITY_TOP_FRAC,
        q_quality_percentile,
    )
    from aggregator_spark.operators.rankdist import percent_rank_bucketed
    from aggregator_spark.operators.text import quality_score
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source", quality_score(F.col("text")))
    bucketed = percent_rank_bucketed(
        scored, "source", "quality", "doc_id", id_bucket=7
    ).select(
        "doc_id",
        "source",
        "quality",
        F.round("pct_rank", 6).alias("pct_rank"),
        (F.col("pct_rank") <= F.lit(QUALITY_TOP_FRAC)).alias("keep_top"),
    )
    plain = {r["doc_id"]: r for r in q_quality_percentile(spark, sf_dir).collect()}
    got = {r["doc_id"]: r for r in bucketed.collect()}
    assert set(plain) == set(got)
    for k in plain:
        assert tuple(plain[k]) == tuple(got[k]), (k, plain[k], got[k])


def test_percent_rank_bucketed_null_scores_and_singletons(spark):
    """NULL scores rank LAST as one tie-group (never dropped) and a
    single-row group gets pct_rank 0.0 — the two edge contracts a
    null-unsafe join or a (n-1) division would silently break."""
    from aggregator_spark.operators.rankdist import percent_rank_bucketed

    df = spark.createDataFrame(
        [
            ("a", 1, 0.9),
            ("a", 2, None),
            ("a", 3, 0.9),
            ("a", 4, 0.1),
            ("a", 5, None),
            ("b", 6, 0.5),
        ],
        "g string, id long, s double",
    )
    rows = {
        r["id"]: r["pct_rank"]
        for r in percent_rank_bucketed(df, "g", "s", "id", id_bucket=2).collect()
    }
    assert rows == {1: 0.0, 3: 0.25, 4: 0.5, 2: 0.75, 5: 1.0, 6: 0.0}


def test_ntile_bucketed_bit_parity_with_curriculum_bins(spark, sf_dir):
    """The graded curriculum binning (which RUNS ntile_bucketed since
    the fourth wave) must equal the plain per-stratum NTILE window
    built here from scratch — the independent expected value, so the
    pin cannot become tautological. A second bucketing (id_bucket=7,
    forcing many carry partitions) must agree too."""
    from pyspark.sql import Window

    from aggregator_spark.llm_queries import (
        CURRICULUM_BINS,
        q_curriculum_bins,
    )
    from aggregator_spark.operators.rankdist import ntile_bucketed
    from aggregator_spark.operators.text import quality_score
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("source").alias("stratum"),
        quality_score(F.col("text")),
    )
    w = Window.partitionBy("stratum").orderBy(
        F.col("quality").desc_nulls_last(), "doc_id"
    )
    plain = {
        r["doc_id"]: tuple(r)
        for r in scored.select(
            "doc_id",
            "stratum",
            "quality",
            F.ntile(CURRICULUM_BINS).over(w).alias("bin"),
        ).collect()
    }
    graded = {
        r["doc_id"]: tuple(r)
        for r in q_curriculum_bins(spark, sf_dir).collect()
    }
    rebucketed = {
        r["doc_id"]: tuple(r)
        for r in ntile_bucketed(
            scored, "stratum", "quality", "doc_id", CURRICULUM_BINS,
            id_bucket=7,
        ).collect()
    }
    assert graded == plain
    assert rebucketed == plain


def test_ntile_bucketed_edges_match_plain_window(spark):
    """NULL scores, a group smaller than the tile count, and an exact
    multiple — bucketed NTILE must equal Spark's own ntile() in all
    three regimes."""
    from pyspark.sql import Window

    from aggregator_spark.operators.rankdist import ntile_bucketed

    rows = [("a", i, float(v) if v is not None else None)
            for i, v in enumerate([9, 7, 7, 7, 5, None, 3, 2, 1, None, 8])]
    rows += [("b", 100 + i, float(i)) for i in range(2)]   # n < k
    rows += [("c", 200 + i, float(i % 3)) for i in range(8)]  # n % k == 0
    df = spark.createDataFrame(rows, "g string, id long, s double")
    w = Window.partitionBy("g").orderBy(
        F.col("s").desc_nulls_last(), "id"
    )
    plain = {
        r["id"]: r["bin"]
        for r in df.select("id", F.ntile(4).over(w).alias("bin")).collect()
    }
    got = {
        r["id"]: r["bin"]
        for r in ntile_bucketed(df, "g", "s", "id", 4, id_bucket=3).collect()
    }
    assert got == plain


def test_topk_per_group_reproduces_eval_split_quota(spark, sf_dir):
    """The graded ``eval_split_quota`` (which RUNS the two-phase top-k
    since the fourth wave) must equal the plain per-stratum window
    form built here from scratch — the independent expected value, so
    the pin cannot become tautological."""
    from pyspark.sql import Window

    from aggregator_spark.llm_queries import (
        SPLIT_TEST_N,
        SPLIT_VAL_N,
        q_eval_split_quota,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    rn = F.row_number().over(w)
    plain = {
        tuple(r)
        for r in docs.select(
            "doc_id",
            F.col("source").alias("stratum"),
            F.when(rn <= SPLIT_VAL_N, "val")
            .when(rn <= SPLIT_VAL_N + SPLIT_TEST_N, "test")
            .otherwise("train")
            .alias("split"),
        ).collect()
    }
    got = {tuple(r) for r in q_eval_split_quota(spark, sf_dir).collect()}
    assert got == plain


def test_corpus_prepare_keep_ids_seam_identity(spark, sf_dir):
    """Passing the DEFAULT gate's ids through the new ``keep_ids``
    seam must be byte-identical to not passing it — the seam exists
    to swap gates, never to perturb the graded default pipeline."""
    from aggregator_spark.llm_queries import (
        _mh_buckets,
        corpus_keep_flags,
        corpus_prepare,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    buckets = _mh_buckets(spark, sf_dir)

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    default = rows(corpus_prepare(docs, buckets))
    explicit = rows(
        corpus_prepare(
            docs,
            buckets,
            keep_ids=corpus_keep_flags(docs)
            .filter("keep")
            .select("doc_id"),
        )
    )
    assert default == explicit


def test_bpe_fertility_bounds_and_consistency(spark, sf_dir):
    """Fertility >= 1 (every word encodes to at least one symbol) and
    the per-source sums must equal aggregating the already-oracled
    encode pass directly — the report is a pure rollup, never a
    re-tokenization."""
    from aggregator_spark.analytics_queries10 import (
        q_bpe_encode_docs,
        q_bpe_fertility,
    )
    from aggregator_spark.schemas import load_testdata

    fert = {r["source"]: r for r in q_bpe_fertility(spark, sf_dir).collect()}
    assert fert
    docs = load_testdata(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    manual = {
        r["source"]: r
        for r in q_bpe_encode_docs(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").alias("w"),
            F.sum("n_symbols").alias("s"),
            F.count(F.lit(1)).alias("d"),
        )
        .collect()
    }
    assert set(fert) == set(manual)
    for src, r in fert.items():
        m = manual[src]
        assert (r["n_words"], r["n_bpe_tokens"], r["n_docs"]) == (
            m["w"],
            m["s"],
            m["d"],
        )
        assert r["fertility"] >= 1.0, (src, r["fertility"])
        assert r["chars_per_token"] > 0.0


def test_percent_rank_two_level_carry_continuous_scores(spark):
    """ADVICE r9 medium: with near-unique CONTINUOUS scores the
    single-level carry degenerates to one task per group; the
    two-level form (score_coarse quantizer) must stay bit-identical
    to the plain window in exactly that regime — near-unique doubles,
    duplicates straddling coarse-bucket boundaries, NULLs, and a
    quantizer coarse enough that many scores share a cell."""
    import random

    from pyspark.sql import Window

    from aggregator_spark.operators.rankdist import (
        ntile_bucketed,
        percent_rank_bucketed,
    )

    rng = random.Random(9)
    rows = []
    i = 0
    for g in ("a", "b"):
        for _ in range(400):
            rows.append((g, i, round(rng.random(), 9)))
            i += 1
        # exact duplicates that share a coarse cell AND ones at a cell
        # boundary (floor(s*16) edges), plus NULLs
        rows += [(g, i, 0.5), (g, i + 1, 0.5), (g, i + 2, 0.0625),
                 (g, i + 3, 0.0625), (g, i + 4, None), (g, i + 5, None)]
        i += 6
    df = spark.createDataFrame(rows, "g string, id long, s double")
    coarse = lambda c: F.floor(c * 16)  # noqa: E731

    w = Window.partitionBy("g").orderBy(F.col("s").desc_nulls_last(), "id")
    plain_pct = {
        r["id"]: r["p"]
        for r in df.select(
            "id", F.percent_rank().over(w).alias("p")
        ).collect()
    }
    got_pct = {
        r["id"]: r["pct_rank"]
        for r in percent_rank_bucketed(
            df, "g", "s", "id", id_bucket=37, score_coarse=coarse
        ).collect()
    }
    assert got_pct == plain_pct

    plain_bin = {
        r["id"]: r["b"]
        for r in df.select("id", F.ntile(7).over(w).alias("b")).collect()
    }
    got_bin = {
        r["id"]: r["bin"]
        for r in ntile_bucketed(
            df, "g", "s", "id", 7, id_bucket=37, score_coarse=coarse
        ).collect()
    }
    assert got_bin == plain_bin


def test_percent_rank_bucketed_null_group_key(spark):
    """ADVICE r9 low: rows with a NULL group key must rank within
    their own (NULL) partition exactly like the plain window — a
    non-null-safe join on part_col silently dropped them."""
    from pyspark.sql import Window

    from aggregator_spark.operators.rankdist import percent_rank_bucketed

    df = spark.createDataFrame(
        [(None, 1, 0.9), (None, 2, 0.3), (None, 3, 0.9), (None, 4, None),
         ("a", 5, 0.7), ("a", 6, 0.1)],
        "g string, id long, s double",
    )
    w = Window.partitionBy("g").orderBy(F.col("s").desc_nulls_last(), "id")
    plain = {
        r["id"]: r["p"]
        for r in df.select("id", F.percent_rank().over(w).alias("p")).collect()
    }
    got = {
        r["id"]: r["pct_rank"]
        for r in percent_rank_bucketed(df, "g", "s", "id", id_bucket=2).collect()
    }
    assert got == plain  # 4 NULL-group rows present, not dropped
    assert len(got) == 6


def test_rankdist_reserved_name_guard(spark):
    """ADVICE r9 low: an input already carrying an internal/output
    name (re-ranking a ranked frame) must fail loudly, not select the
    wrong column."""
    import pytest

    from aggregator_spark.operators.rankdist import (
        ntile_bucketed,
        percent_rank_bucketed,
        topk_per_group,
    )

    base = spark.createDataFrame([("a", 1, 0.5)], "g string, id long, s double")
    ranked = percent_rank_bucketed(base, "g", "s", "id")
    with pytest.raises(ValueError, match="pct_rank"):
        percent_rank_bucketed(ranked, "g", "s", "id")
    with pytest.raises(ValueError, match="__rn"):
        percent_rank_bucketed(base.withColumn("__rn", F.lit(1)), "g", "s", "id")
    with pytest.raises(ValueError, match="bin"):
        ntile_bucketed(
            base.withColumn("bin", F.lit(1)), "g", "s", "id", 4
        )
    with pytest.raises(ValueError, match="rk"):
        topk_per_group(
            base.withColumn("rk", F.lit(1)), "g", [F.col("s")], 1, F.col("id")
        )


def test_quality_percentile_continuous_matches_plain_window(spark, sf_dir):
    """The driver entry runs the TWO-LEVEL carry (continuous scores);
    it must equal the plain per-source window built here from scratch
    — the independent expected value on real data."""
    from pyspark.sql import Window

    from aggregator_spark.llm_queries import (
        QUALITY_TOP_FRAC,
        q_quality_percentile_continuous,
    )
    from aggregator_spark.operators.text import avg_token_len
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", avg_token_len(F.col("text")).alias("cscore")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cscore").desc_nulls_last(), "doc_id"
    )
    pr = F.percent_rank().over(w)
    plain = {
        r["doc_id"]: tuple(r)
        for r in scored.select(
            "doc_id",
            "source",
            F.round("cscore", 6).alias("cscore"),
            F.round(pr, 6).alias("pct_rank"),
            (pr <= F.lit(QUALITY_TOP_FRAC)).alias("keep_top"),
        ).collect()
    }
    got = {
        r["doc_id"]: tuple(r)
        for r in q_quality_percentile_continuous(spark, sf_dir).collect()
    }
    assert got == plain
    # the regime is really continuous: most scores are unique
    n = len(plain)
    uniq = len({v[2] for v in plain.values()})
    assert uniq > 0.5 * n, (uniq, n)
