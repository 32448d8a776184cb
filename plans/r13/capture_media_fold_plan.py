"""Capture the decode subtree plans of the streaming media-store fold
(``ingest_media_batch``): BEFORE = the r12 composition (features pass +
three signature passes = five Arrow decode subtrees, PNG and WAV each
decoded twice), AFTER = the fused single-pass ``media_decode_all`` with
``features_from_decoded`` as a pure projection.

Run from /root/repo:  python plans/r13/capture_media_fold_plan.py
Writes media_store_build_before.txt / media_store_build_after.txt.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("media-fold-plan")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from aggregator_spark.analytics_queries4 import (
        features_from_decoded,
        features_from_media,
    )
    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        build_payload,
        media_kind,
    )
    from aggregator_spark.operators.multimodal import (
        audio_fp64,
        image_dhash,
        media_decode_all,
        video_frame_dhash,
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    rows = [
        (i, media_kind(i), bytearray(build_payload(i % N_KEYS)))
        for i in range(12)
    ]
    rep_media = spark.createDataFrame(rows, schema)

    def grab(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    before = [
        "=== BEFORE (r12 fold): five separate Arrow decode subtrees ===",
        "--- features_from_media(rep_media)  [decodes PNG + WAV] ---",
        grab(features_from_media(rep_media)),
        "--- image_dhash(rep_media)  [decodes PNG AGAIN] ---",
        grab(image_dhash(rep_media)),
        "--- audio_fp64(rep_media)  [decodes WAV AGAIN] ---",
        grab(audio_fp64(rep_media)),
        "--- video_frame_dhash(rep_media)  [decodes AVI] ---",
        grab(video_frame_dhash(rep_media)),
    ]
    with open("plans/r13/media_store_build_before.txt", "w") as f:
        f.write("\n".join(before))

    dec = media_decode_all(rep_media)
    after = [
        "=== AFTER (r13 fold): ONE fused Arrow decode pass;",
        "    signatures and features are projections of it ===",
        "--- media_decode_all(rep_media) ---",
        grab(dec),
        "--- features_from_decoded(dec)  [projection, no new decode] ---",
        grab(features_from_decoded(dec)),
    ]
    with open("plans/r13/media_store_build_after.txt", "w") as f:
        f.write("\n".join(after))

    for name in ("before", "after"):
        with open(f"plans/r13/media_store_build_{name}.txt") as f:
            txt = f.read()
        print(
            name,
            "FlatMapsInPandas/ArrowEval nodes:",
            txt.count("FlatMapGroupsInPandas")
            + txt.count("MapInPandas")
            + txt.count("ArrowEvalPython"),
        )
    spark.stop()


if __name__ == "__main__":
    main()
