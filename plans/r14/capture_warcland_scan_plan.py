"""Capture the microbatch scan plan of the warcland landing source
(the streaming source under ``media_store_build`` and every
``served_*`` media key).

Lands one small container, runs one drain whose foreachBatch writes
``batch_df.explain("formatted")`` to the output file instead of
folding. The r14 change (SimpleDataSourceStreamReader → partition-based
DataSourceStreamReader) is about WHERE the payload bytes are read —
driver prefetch vs executor splits — which the logical plan cannot
show; the captures document that the plan is otherwise unchanged, and
the split/replay pins in tests/test_streaming_warclite_ingest.py plus
the reader class itself are the mechanical evidence.

Usage: python plans/r14/capture_warcland_scan_plan.py <out.txt>
(run against the tree whose reader you want to capture)
"""

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main(out_path: str) -> None:
    from pyspark.sql import SparkSession

    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        build_payload,
        media_kind,
    )
    from aggregator_spark.sources.warclite import write_warclite
    from aggregator_spark.streaming.warclite_ingest_stream import (
        register_warcland_source,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("warcland-plan-capture")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tmp = tempfile.mkdtemp(prefix="warcland_plan_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    write_warclite(
        os.path.join(landing, "c0.wlc"),
        ((d, media_kind(d), build_payload(d % N_KEYS)) for d in range(8)),
    )
    register_warcland_source(spark)
    captured: list[str] = []

    def grab(df, bid):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        captured.append(buf.getvalue())

    q = (
        spark.readStream.format("warcland")
        .option("path", landing)
        .load()
        .writeStream.foreachBatch(grab)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    with open(out_path, "w") as f:
        f.write("".join(captured))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
