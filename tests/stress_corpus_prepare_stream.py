"""sf1 stress for STREAMING incremental corpus preparation
(VERDICT r9 item 5): the restart-identity pins run at test scale
(sf0.001/0.01); this drives `streaming/corpus_prepare_stream.py` over
a scaled directory in waves — with a stop/restart boundary at EVERY
wave, the worst case for checkpoint recovery — then runs the plain
batch-loop twin at identical boundaries and asserts final-generation
identity, recording wall + shuffle per wave for SCALE.md
§streaming-at-sf1.

Not a pytest — run ad hoc (never concurrently with another Spark
session):
``python tests/stress_corpus_prepare_stream.py [sf_dir] [n_waves]``
(defaults /tmp/testdata_sf1 and 4).

The questions this answers for a standing 100 TB ingest job:
  1. Is the per-wave cost flat in wave count (the index reads are
     base + K deltas — does the delta union stay negligible)?
  2. Does a restart at every boundary still converge to the batch
     twin's corpus generation bit-for-bit (driver memory, straggler
     wedging, and checkpoint-recovery failure modes only appear at
     size — HANDOFF trap list)?
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession, functions as F

from stress_util import shuffle_totals


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from aggregator_spark.llm_queries import NEW_BATCH_MOD
    from aggregator_spark.sources.versioned_table import (
        list_versions,
        read_table,
    )
    from aggregator_spark.streaming.corpus_prepare_stream import (
        init_prepared_state,
        prepare_micro_batch,
        run_corpus_prepare_stream,
        wave_doc_ids,
    )
    from aggregator_spark.schemas import load_testdata

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-corpus-prepare-stream")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="cps_sf1_")
    roots = {k: os.path.join(work, k) for k in ("stream", "batch")}
    waves = wave_doc_ids(sf_dir, NEW_BATCH_MOD, n_waves)
    print(
        f"# sf_dir={sf_dir} waves={n_waves} "
        f"batch_docs={sum(len(w) for w in waves)} work={work}"
    )

    # generation-0 state (survivor corpus + 3 serving indexes) — the
    # previous full run's artifacts, UNTIMED on both sides
    t0 = time.monotonic()
    for root in roots.values():
        init_prepared_state(spark, sf_dir, root, NEW_BATCH_MOD)
    print(f"# init_prepared_state x2: {time.monotonic() - t0:.1f}s")

    # STREAM side: one query start per wave (stop/restart at every
    # boundary), wall + shuffle per wave
    stream_walls = []
    for k in range(1, n_waves + 1):
        rd0, wr0 = shuffle_totals(spark)
        t0 = time.monotonic()
        run_corpus_prepare_stream(
            spark, sf_dir, roots["stream"], NEW_BATCH_MOD, n_waves,
            max_waves=k,
        )
        wall = time.monotonic() - t0
        rd1, wr1 = shuffle_totals(spark)
        stream_walls.append(wall)
        print(
            f"stream wave {k - 1}: {wall:.1f}s "
            f"shuffle_w={(wr1 - wr0) / 1e6:.1f}MB "
            f"shuffle_r={(rd1 - rd0) / 1e6:.1f}MB "
            f"docs={len(waves[k - 1])}"
        )

    # BATCH twin: plain driver loop, identical boundaries
    docs = load_testdata(spark, sf_dir, "documents")
    batch_walls = []
    for w in range(n_waves):
        wave = docs.filter(F.col("doc_id").isin(waves[w])).select(
            "doc_id", "text"
        )
        t0 = time.monotonic()
        prepare_micro_batch(wave, w, roots["batch"])
        batch_walls.append(time.monotonic() - t0)
        print(f"batch wave {w}: {batch_walls[-1]:.1f}s")

    # final-generation identity, distributed compare (no driver pull)
    s = read_table(spark, os.path.join(roots["stream"], "corpus"))
    b = read_table(spark, os.path.join(roots["batch"], "corpus"))
    sc, bc = s.count(), b.count()
    d1 = s.exceptAll(b).count()
    d2 = b.exceptAll(s).count()
    assert sc == bc and d1 == 0 and d2 == 0, (
        f"stream/batch corpus diverged: counts {sc}/{bc}, "
        f"diffs {d1}/{d2}"
    )
    vs = list_versions(os.path.join(roots["stream"], "corpus"))
    vb = list_versions(os.path.join(roots["batch"], "corpus"))
    assert vs == vb == list(range(1, n_waves + 2)), (vs, vb)
    print(
        f"PARITY OK: corpus rows={sc}, generations={vs[-1]}, "
        f"stream_total={sum(stream_walls):.1f}s "
        f"batch_total={sum(batch_walls):.1f}s"
    )

    # flat-in-wave-count check: the LAST wave (reads base + K-1
    # deltas) must not cost more than 2x the FIRST (reads base only)
    # — delta-union creep would show here first
    if stream_walls[0] > 0:
        ratio = stream_walls[-1] / stream_walls[0]
        print(f"last/first stream wave ratio: {ratio:.2f}")
        assert ratio < 2.0, (
            f"per-wave cost grew {ratio:.2f}x across {n_waves} waves — "
            "delta-union creep"
        )

    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
