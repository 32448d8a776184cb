"""The three ingest-cost caches (VARIANT materialization, IVF
assignment, LSH signature index) key on the SOURCE CONTENT STAMP
(mtime+size), not just the path: the driver regenerates testdata
between rounds at the same path, and a path-keyed cache would silently
serve stale bytes (the r3 failure class, one layer deeper).
"""

from __future__ import annotations

import os
import shutil


def _stage(tmp_path, tables):
    sf = tmp_path / "sfcache"
    sf.mkdir()
    for t in tables:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", str(sf / f"{t}.parquet")
        )
    return str(sf)


def _cache_dir_of(df):
    # parquet reads carry their input location in the plan's file index
    return df.inputFiles()[0]


def test_variant_cache_invalidates_on_source_change(spark, tmp_path):
    from aggregator_spark.sources.variant_ingest import cached_events_variant

    sf = _stage(tmp_path, ["events"])
    first = _cache_dir_of(cached_events_variant(spark, sf))
    # same content → same materialization
    again = _cache_dir_of(cached_events_variant(spark, sf))
    assert first == again
    # regenerated source (new mtime) → NEW materialization
    os.utime(os.path.join(sf, "events.parquet"))
    rebuilt = _cache_dir_of(cached_events_variant(spark, sf))
    assert os.path.dirname(rebuilt) != os.path.dirname(first)


def test_ann_index_caches_invalidate_on_source_change(spark, tmp_path):
    from aggregator_spark.sources.ivf_index import cached_ivf_assignment
    from aggregator_spark.sources.lsh_index import cached_lsh_index

    sf = _stage(tmp_path, ["embeddings"])
    ivf1 = _cache_dir_of(cached_ivf_assignment(spark, sf))
    lsh1 = _cache_dir_of(cached_lsh_index(spark, sf))
    os.utime(os.path.join(sf, "embeddings.parquet"))
    ivf2 = _cache_dir_of(cached_ivf_assignment(spark, sf))
    lsh2 = _cache_dir_of(cached_lsh_index(spark, sf))
    assert os.path.dirname(ivf2) != os.path.dirname(ivf1)
    assert os.path.dirname(lsh2) != os.path.dirname(lsh1)


def test_code_token_changes_key_and_root_env_override(tmp_path, monkeypatch):
    """r6: the cache key folds in (a) a hash of the builder modules'
    source — a code change mints a new key instead of serving an index
    built by old logic — and (b) an env-overridable cache root so bench
    cold-builds are hermetic."""
    from aggregator_spark.sources import stamped_cache as sc

    sf = _stage(tmp_path, ["events"])
    base = sc.cache_dir(sf, "events.parquet", "t")
    # different builder code → different scope key (same content key)
    a = sc.cache_dir(
        sf, "events.parquet", "t",
        code_modules=("aggregator_spark.sources.variant_ingest",),
    )
    b = sc.cache_dir(
        sf, "events.parquet", "t",
        code_modules=("aggregator_spark.sources.lsh_index",),
    )
    assert len({base, a, b}) == 3
    assert base.rsplit("_", 1)[1] == a.rsplit("_", 1)[1]  # content key same

    # env override moves the root
    private = tmp_path / "private_cache"
    monkeypatch.setenv(sc.CACHE_ROOT_ENV, str(private))
    moved = sc.cache_dir(sf, "events.parquet", "t")
    assert moved.startswith(str(private))
    assert os.path.basename(moved) == os.path.basename(base)


def test_materialize_is_atomic_and_sweeps_after_rename(spark, tmp_path, monkeypatch):
    """Cold builds land in a .build-* scratch dir and rename into
    place; stale content generations sweep afterwards, but scratch
    dirs of in-flight builds survive the sweep."""
    from aggregator_spark.sources import stamped_cache as sc

    monkeypatch.setenv(sc.CACHE_ROOT_ENV, str(tmp_path / "root"))
    sf = _stage(tmp_path, ["region"])
    out1 = sc.cache_dir(sf, "region.parquet", "t")

    seen_scratch = {}

    def build(path):
        seen_scratch["path"] = path
        spark.range(3).write.parquet(path)

    df = sc.materialize_cached(spark, out1, build)
    assert df.count() == 3
    assert seen_scratch["path"] != out1  # built in scratch, not in place
    assert ".build-" in seen_scratch["path"]
    assert not os.path.exists(seen_scratch["path"])  # renamed away

    # an in-flight scratch dir of another generation must survive the
    # sweep a new content generation triggers
    inflight = f"{out1.rsplit('_', 1)[0]}_deadbeef.build-123-abc"
    os.makedirs(inflight)
    os.utime(os.path.join(sf, "region.parquet"))  # new content stamp
    out2 = sc.cache_dir(sf, "region.parquet", "t")
    assert out2 != out1
    sc.materialize_cached(
        spark, out2, lambda p: spark.range(4).write.parquet(p)
    )
    assert os.path.exists(inflight)  # scratch survived
    assert not os.path.exists(out1)  # stale generation swept


def test_materialize_replaces_unfinished_generation(spark, tmp_path, monkeypatch):
    """A leftover target dir WITHOUT _SUCCESS (crashed pre-atomic
    build) must be replaced by the fresh build — not treated as a lost
    race, which would discard the good build and read garbage forever."""
    from aggregator_spark.sources import stamped_cache as sc

    monkeypatch.setenv(sc.CACHE_ROOT_ENV, str(tmp_path / "root"))
    sf = _stage(tmp_path, ["region"])
    out = sc.cache_dir(sf, "region.parquet", "t2")
    os.makedirs(out)  # corrupt: exists, no _SUCCESS
    with open(os.path.join(out, "part-garbage"), "w") as f:
        f.write("not parquet")
    df = sc.materialize_cached(
        spark, out, lambda p: spark.range(5).write.parquet(p)
    )
    assert df.count() == 5
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_minhash_bucket_cache_invalidates_and_matches_fresh(spark, tmp_path):
    from pyspark.sql import functions as F

    from aggregator_spark.operators.dedup import lsh_buckets
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.minhash_index import cached_minhash_buckets

    sf = _stage(tmp_path, ["documents"])
    first = _cache_dir_of(cached_minhash_buckets(spark, sf))
    again = _cache_dir_of(cached_minhash_buckets(spark, sf))
    assert first == again
    os.utime(os.path.join(sf, "documents.parquet"))
    rebuilt = _cache_dir_of(cached_minhash_buckets(spark, sf))
    assert os.path.dirname(rebuilt) != os.path.dirname(first)

    # cache contents are bit-identical to a fresh computation
    cached = cached_minhash_buckets(spark, sf)
    fresh = lsh_buckets(load_testdata(spark, sf, "documents"))
    assert cached.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(cached).count() == 0


def test_bm25_postings_cache_invalidates_and_matches_fresh(spark, tmp_path):
    from aggregator_spark.operators.retrieval import bm25_postings
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.bm25_index import cached_bm25_postings

    sf = _stage(tmp_path, ["documents"])
    first = _cache_dir_of(cached_bm25_postings(spark, sf))
    again = _cache_dir_of(cached_bm25_postings(spark, sf))
    assert first == again
    os.utime(os.path.join(sf, "documents.parquet"))
    rebuilt = _cache_dir_of(cached_bm25_postings(spark, sf))
    assert os.path.dirname(rebuilt) != os.path.dirname(first)

    # cache contents are bit-identical to a fresh tokenization
    cached = cached_bm25_postings(spark, sf)
    fresh = bm25_postings(load_testdata(spark, sf, "documents"))
    assert cached.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(cached).count() == 0


def test_bpe_dict_cache_invalidates_and_matches_fresh(spark, tmp_path):
    from aggregator_spark.operators.bpe import bpe_train_full
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.bpe_index import cached_bpe_index

    sf = _stage(tmp_path, ["documents"])
    first = _cache_dir_of(cached_bpe_index(spark, sf)["merges"])
    again = _cache_dir_of(cached_bpe_index(spark, sf)["merges"])
    assert first == again
    os.utime(os.path.join(sf, "documents.parquet"))
    rebuilt = _cache_dir_of(cached_bpe_index(spark, sf)["merges"])
    assert os.path.dirname(rebuilt) != os.path.dirname(first)

    # cached dictionary is bit-identical to retraining
    idx = cached_bpe_index(spark, sf)
    merges, states = bpe_train_full(load_testdata(spark, sf, "documents"))
    assert sorted(map(tuple, idx["merges"].collect())) == sorted(
        map(tuple, merges.collect())
    )
    assert sorted(map(tuple, idx["dict"].collect())) == sorted(
        map(tuple, states.collect())
    )


def test_prepared_index_cache_invalidates_and_matches_fresh(spark, tmp_path):
    """The r8 prepared-corpus index (survivor buckets + probes + span
    grams): same content-stamp contract as the sibling caches, and the
    probe member must be bit-identical to a fresh derivation over the
    existing slice (the survivor members are validated transitively by
    corpus_prepare_incremental's full-recompute oracle)."""
    from pyspark.sql import functions as F

    from aggregator_spark.llm_queries import NEW_BATCH_MOD, benchmark_probes
    from aggregator_spark.schemas import load_testdata
    from aggregator_spark.sources.prepared_index import cached_prepared_index

    sf = _stage(tmp_path, ["documents"])
    first = _cache_dir_of(cached_prepared_index(spark, sf)["probes"])
    again = _cache_dir_of(cached_prepared_index(spark, sf)["probes"])
    assert first == again
    os.utime(os.path.join(sf, "documents.parquet"))
    rebuilt = _cache_dir_of(cached_prepared_index(spark, sf)["probes"])
    assert os.path.dirname(os.path.dirname(rebuilt)) != os.path.dirname(
        os.path.dirname(first)
    )

    idx = cached_prepared_index(spark, sf)
    docs = load_testdata(spark, sf, "documents")
    fresh = benchmark_probes(
        docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
    )
    assert idx["probes"].exceptAll(fresh).count() == 0
    assert fresh.exceptAll(idx["probes"]).count() == 0
    # survivor tables exist and are batch-free (no batch doc ids)
    assert (
        idx["survivor_buckets"]
        .filter(F.col("doc_id") % NEW_BATCH_MOD == 0)
        .count()
        == 0
    )
    assert idx["span_grams"].columns == ["gh"]
