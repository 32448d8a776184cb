"""One-off measurement: the shard EMISSION SINKS at scale (VERDICT r11
what's-missing #4 / next-round item 4) plus the worker-memory note for
the streamed container sink.

Usage: python tests/measure_sinks.py SF_DIR N_SHARDS [containers_only]

Times emit_shards_parquet and emit_shard_containers over the documents
table (payload = utf-8 text bytes — the honest payload-bearing shape),
from a checkpointed deterministic assignment, then reports the MAX
Python-worker peak RSS (VmHWM) across the reused worker pool — the
streamed sink's peak must stay ~flat as shards grow (fewer shards =
bigger shards), which is the ADVICE r11 fix's claim.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def worker_peak_rss_mb(spark) -> float:
    """Max VmHWM (peak RSS) over the reused Python worker pool, MB."""

    def probe(_):
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    yield int(line.split()[1])
                    return

    vals = (
        spark.sparkContext.parallelize(range(64), 64)
        .mapPartitions(probe)
        .collect()
    )
    return round(max(vals) / 1024.0, 1)


def main() -> None:
    sf_dir = sys.argv[1]
    n_shards = int(sys.argv[2])
    containers_only = len(sys.argv) > 3 and sys.argv[3] == "containers_only"

    from pyspark.sql import functions as F

    from aggregator_spark.session import get_spark

    spark = get_spark(app_name="sink-measure")
    from aggregator_spark.operators.reshard import (
        emit_shard_containers,
        emit_shards_parquet,
        reshard_deterministic,
    )
    from aggregator_spark.schemas import load_testdata

    docs = load_testdata(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("text/"), F.col("lang")).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    sharded = reshard_deterministic(
        docs, n_shards, "doc_id"
    ).localCheckpoint(eager=True)
    n_rows = sharded.count()
    out: dict = {"sf_dir": sf_dir, "n_shards": n_shards, "rows": n_rows}

    base = f"/tmp/sink_measure_{n_shards}"
    shutil.rmtree(base, ignore_errors=True)

    if not containers_only:
        t0 = time.time()
        emit_shards_parquet(sharded, f"{base}/parquet", n_shards)
        out["emit_shards_parquet_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    emit_shard_containers(sharded, f"{base}/wlc", n_shards)
    out["emit_shard_containers_sec"] = round(time.time() - t0, 2)
    out["container_bytes_mb"] = round(
        sum(
            os.path.getsize(os.path.join(f"{base}/wlc", f))
            for f in os.listdir(f"{base}/wlc")
        )
        / 1e6,
        1,
    )
    out["worker_peak_rss_mb"] = worker_peak_rss_mb(spark)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
