"""Shared content-stamped materialization cache.

One implementation for the three ingest-cost caches (VARIANT parse,
IVF assignment, LSH signatures). The cache key has three parts:

- a PATH key (md5 of the absolute source dir + build params) —
  separates scale factors sharing a temp dir and parameterizations of
  the same source;
- a CODE key (md5 of the builder modules' source bytes) — a code
  change to the builder mints a new key instead of silently serving a
  materialization built by old logic (the approximate-index caches are
  rows-only checked downstream, so a stale-code index would otherwise
  degrade recall invisibly);
- a CONTENT key (md5 of the source file's mtime_ns:size) — a
  regenerated source at the same path mints a new key instead of being
  served stale bytes (the r3 failure class).

A missing source file RAISES instead of degrading to a path-only key:
a silent 'unknown' stamp would cache the first build forever.

Builds are atomic: each cold build writes into a unique ``.build-*``
scratch dir and renames into place, so a concurrent session never
reads a half-written materialization; losing a build race discards the
duplicate and reads the winner. After the rename, stale CONTENT
generations of the same (prefix, path, params, code) pair are removed,
so temp space stays bounded at one materialization per source dir.

The cache root honors ``AGGREGATOR_SPARK_CACHE_DIR`` (bench.py points
it at a private root so its cold-build timings can't race a concurrent
session's caches).
"""

from __future__ import annotations

import glob
import hashlib
import importlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

CACHE_ROOT_ENV = "AGGREGATOR_SPARK_CACHE_DIR"


def _cache_root() -> str:
    root = os.environ.get(CACHE_ROOT_ENV)
    if root:
        os.makedirs(root, exist_ok=True)
        return root
    return tempfile.gettempdir()


@lru_cache(maxsize=None)
def code_token(module_names: tuple[str, ...]) -> str:
    """md5 over the given modules' source bytes — the builder-version
    component of the cache key. Hashing the actual source beats a
    manually-bumped constant: it cannot be forgotten."""
    h = hashlib.md5()
    for name in module_names:
        mod = importlib.import_module(name)
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:8]


def cache_dir(
    sf_dir: str,
    src_name: str,
    prefix: str,
    extra: str = "",
    code_modules: tuple[str, ...] = (),
) -> str:
    """Deterministic cache location for (source dir, params, builder
    code, content). Raises OSError if the source file is missing/
    unreadable. The param and code keys sit OUTSIDE the swept suffix:
    only stale CONTENT generations of the same (source, params, code)
    tuple are removed on rebuild — caches for different build
    parameters or code versions coexist (a sweep across them would
    delete directories still referenced by live lazy DataFrames)."""
    base = os.path.abspath(sf_dir)
    st = os.stat(os.path.join(base, src_name))  # raise, never guess
    code = code_token(code_modules) if code_modules else "nocode"
    scope_key = hashlib.md5(
        f"{base}|{extra}|{code}".encode()
    ).hexdigest()[:8]
    content_key = hashlib.md5(
        f"{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:8]
    return os.path.join(
        _cache_root(),
        f"aggregator_spark_{prefix}_{scope_key}_{content_key}",
    )


def _ensure_built(
    out: str, build: Callable[[str], None], done: Callable[[str], bool]
) -> None:
    """Atomic build-and-rename shared by the single- and multi-table
    materializers: the build lands in a unique scratch dir and renames
    into place (atomic on one filesystem); a lost race discards the
    duplicate build. Stale generations (same prefix+scope key,
    different content key) are swept after the rename — in-flight
    ``.build-*`` scratch dirs are never touched."""
    if done(out):
        return
    scratch = f"{out}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    build(scratch)
    try:
        os.rename(scratch, out)
    except OSError:
        if done(out):
            # a concurrent session renamed its completed build in
            # first — discard ours and use theirs
            shutil.rmtree(scratch, ignore_errors=True)
        else:
            # `out` exists but is NOT a finished build (crashed
            # pre-atomic-era build, or a partially-swept dir):
            # replace it with our good build rather than discarding
            # the fresh one and reading garbage forever
            shutil.rmtree(out, ignore_errors=True)
            os.rename(scratch, out)
    stem = out.rsplit("_", 1)[0]
    for old in glob.glob(f"{stem}_*"):
        if old != out and ".build-" not in os.path.basename(old):
            shutil.rmtree(old, ignore_errors=True)


def materialize_cached(
    spark: SparkSession,
    out: str,
    build: Callable[[str], None],
) -> DataFrame:
    """Build unless ``out``'s _SUCCESS marker exists; see
    ``_ensure_built`` for the atomicity/race/sweep contract."""
    _ensure_built(
        out, build, lambda d: os.path.exists(os.path.join(d, "_SUCCESS"))
    )
    return spark.read.parquet(out)


def materialize_cached_tables(
    spark: SparkSession,
    out: str,
    build: Callable[[str], None],
    tables: tuple[str, ...],
) -> dict[str, DataFrame]:
    """Multi-table variant for ingest artifacts that are a SET of
    datasets (e.g. an inverted index: postings + term stats + corpus
    scalars): ``build(scratch)`` writes one parquet dataset per name
    under ``scratch/<name>``; the whole set renames into place in one
    atomic step, so readers never see a partial index. Done = every
    member's _SUCCESS marker."""

    def done(d: str) -> bool:
        return all(
            os.path.exists(os.path.join(d, t, "_SUCCESS")) for t in tables
        )

    _ensure_built(out, build, done)
    return {
        t: spark.read.parquet(os.path.join(out, t)) for t in tables
    }
