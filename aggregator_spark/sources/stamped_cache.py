"""Shared content-stamped materialization cache.

One implementation for the three ingest-cost caches (VARIANT parse,
IVF assignment, LSH signatures). The cache key has two parts:

- a PATH key (md5 of the absolute source dir) — separates scale
  factors sharing a temp dir;
- a CONTENT key (md5 of the source file's mtime_ns:size plus any
  build parameters) — a regenerated source at the same path mints a
  new key instead of being served stale bytes (the r3 failure class).

A missing source file RAISES instead of degrading to a path-only key:
a silent 'unknown' stamp would cache the first build forever.

On each cold build, stale generations of the same (prefix, path) pair
are removed, so temp space is bounded at one materialization per
source dir rather than one per regeneration.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def cache_dir(
    sf_dir: str, src_name: str, prefix: str, extra: str = ""
) -> str:
    """Deterministic cache location for (source dir, params, content).
    Raises OSError if the source file is missing/unreadable. The param
    key sits OUTSIDE the swept suffix: only stale CONTENT generations
    of the same (source, params) pair are removed on rebuild — caches
    for different build parameters coexist (a sweep across params would
    delete directories still referenced by live lazy DataFrames)."""
    base = os.path.abspath(sf_dir)
    st = os.stat(os.path.join(base, src_name))  # raise, never guess
    scope_key = hashlib.md5(f"{base}|{extra}".encode()).hexdigest()[:8]
    content_key = hashlib.md5(
        f"{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(),
        f"aggregator_spark_{prefix}_{scope_key}_{content_key}",
    )


def materialize_cached(
    spark: SparkSession,
    out: str,
    build: Callable[[str], None],
) -> DataFrame:
    """Build into ``out`` unless its _SUCCESS marker exists; stale
    generations (same prefix+path key, different content key) are
    removed on a cold build."""
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        stem = out.rsplit("_", 1)[0]
        for old in glob.glob(f"{stem}_*"):
            if old != out:
                shutil.rmtree(old, ignore_errors=True)
        build(out)
    return spark.read.parquet(out)
