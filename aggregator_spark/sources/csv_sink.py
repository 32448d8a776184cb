"""Sorted single-file CSV sink.

Reference UNLOAD (reference main.py:232-256): export the fact table as
ONE unquoted, headerless, comma-delimited CSV (``PARALLEL OFF
ALLOWOVERWRITE``), then rename the part file to ``count.csv`` and delete
the original. Spark shape: ``orderBy → coalesce(1) → write.csv`` — a
narrow coalesce after a global sort keeps the sorted order in the single
output partition — then rename the ``part-*`` file to the target name.

Deliberately anti-parallel, like the reference: the post-aggregation
output is small; the input side stays fully parallel.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_single_csv(
    df: DataFrame,
    target_path: str,
    header: bool = False,
    overwrite: bool = True,
) -> str:
    """Write ``df`` as exactly one CSV file at ``target_path`` (a file
    path, not a directory). Row order of ``df`` is preserved. Returns
    the final path."""
    tmp_dir = target_path + "__spark_tmp"
    # Redshift UNLOAD emits `yyyy-MM-dd HH:mm:ss` timestamps, not ISO-T
    writer = (
        df.coalesce(1)
        .write.option("header", header)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    )
    if overwrite:
        writer = writer.mode("overwrite")
    writer.csv(tmp_dir)
    parts = sorted(glob.glob(os.path.join(tmp_dir, "part-*")))
    if len(parts) != 1:
        raise RuntimeError(f"expected one part file in {tmp_dir}, got {parts}")
    if overwrite and os.path.exists(target_path):
        os.remove(target_path)
    shutil.move(parts[0], target_path)
    shutil.rmtree(tmp_dir)
    return target_path
