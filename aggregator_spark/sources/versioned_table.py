"""Versioned parquet table: snapshot manifests + MERGE upsert,
from scratch on plain parquet (no table-format jar in the container —
this is the minimal Delta/Iceberg-shaped layer the pipeline needs).

Layout:
    <root>/v=<n>/part-*.parquet     immutable snapshot data
    <root>/_versions.json           ordered manifest: [{"version": n}]

Write protocol (single-writer, reader-safe):
1. write the new snapshot dir COMPLETELY (`v=<n+1>/`),
2. atomically swap the manifest (os.replace of a temp file).
Readers resolve the manifest first, then read only that version's dir —
they never see a half-written snapshot, and old versions stay readable
(time travel) until vacuumed.

MERGE semantics (keyed upsert, the reference's UPDATE-FROM generalized,
reference main.py:219-229): target rows matched by key are replaced by
the source row, unmatched source rows are inserted, unmatched target
rows are kept. Expressed as target LEFT-ANTI source (keep) UNION source
(new image) — two hash joins, no window, no full-outer null-juggling;
at scale both sides shuffle on the merge key once (or co-bucketed:
zero exchanges, see operators/skew.py:write_bucketed).

Compaction: rewrite the latest snapshot into ceil(bytes/target) files
as a NEW version — readers of the old version are unaffected.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_versions.json")


def list_versions(root: str) -> list[int]:
    try:
        with open(_manifest_path(root)) as f:
            return [e["version"] for e in json.load(f)]
    except FileNotFoundError:
        return []


def latest_version(root: str) -> int | None:
    vs = list_versions(root)
    return vs[-1] if vs else None


def _commit(root: str, version: int) -> None:
    entries = [{"version": v} for v in list_versions(root)] + [
        {"version": version}
    ]
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f)
    os.replace(tmp, _manifest_path(root))  # atomic manifest swap


def write_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next immutable snapshot and commit it.

    The snapshot dir is written with overwrite: a crash after the data
    write but before ``_commit`` leaves an orphan ``v=<n>`` dir that the
    manifest never references, and the retry recomputes the same n —
    with errorifexists the table would be permanently wedged on that
    orphan. Under the documented single-writer protocol the overwrite
    can only ever replace such an uncommitted orphan; the manifest swap
    remains the sole publish point, so committed snapshots stay
    immutable."""
    os.makedirs(root, exist_ok=True)
    v = (latest_version(root) or 0) + 1
    df.write.mode("overwrite").parquet(os.path.join(root, f"v={v}"))
    _commit(root, v)
    return v


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the latest snapshot, or any still-listed ``version``
    (time travel)."""
    vs = list_versions(root)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {root}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in manifest {vs}")
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def merge_upsert(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    keys: list[str],
) -> int:
    """MERGE: replace matched target rows with source rows, insert
    unmatched source rows, keep the rest; commits a new version."""
    target = read_table(spark, root)
    kept = target.join(
        source.select(*keys).dropDuplicates(keys), keys, "left_anti"
    )
    merged = kept.unionByName(
        source.dropDuplicates(keys).select(*target.columns)
    )
    return write_version(merged, root)


def compact(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the latest snapshot with right-sized files as a new
    version (small-files maintenance; data unchanged)."""
    vs = list_versions(root)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {root}")
    vdir = os.path.join(root, f"v={vs[-1]}")
    size = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(vdir)
        for fn in fns
        if fn.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    return write_version(
        spark.read.parquet(vdir).repartition(n_files), root
    )


def vacuum(root: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (manifest first,
    then data dirs — a concurrent reader of a dropped version fails
    cleanly at manifest resolution, never mid-read)."""
    import shutil

    vs = list_versions(root)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump([{"version": v} for v in keep], f)
    os.replace(tmp, _manifest_path(root))
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return keep
