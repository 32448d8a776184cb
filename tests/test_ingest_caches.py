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
