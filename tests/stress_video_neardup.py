"""Survivor-side stress for perceptual VIDEO dedup: distinct frame
hashes and the hub-star edge graph GROWING with the corpus (the
driver fixture's 64-key AVI space keeps the graph constant across
SFs — this script is the honest-mode analogue, the
``stress_image_neardup`` pattern on the frame-set modality).

Usage: python tests/stress_video_neardup.py N [twin_every] [common_every]

Corpus: N deterministic 4-frame noise AVIs (RandomState-keyed frames
— every base video a distinct frame-hash set), with

- every ``twin_every``-th id a SHARED-FRAME copy of its predecessor
  (it keeps 2 of the 4 frames and replaces the rest — a partial edit
  that must merge through the untouched frames), and
- every ``common_every``-th id carrying a UBIQUITOUS title-card frame
  (the same frame in all of them) — the B² hazard: B videos sharing
  one frame hash must contribute B−1 hub-star edges, never B²,
  and they all merge into one component through the hub.

Times demux+hash, hub/edge build, and components separately and
reports the edge count so the B−1 bound is checkable in the output
(edges ≈ n_twins + B−1 + small exact-dup corrections, vs ~B²/2 if the
star contraction ever regressed to all-pairs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FRAMES = 4
H, W = 24, 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    twin_every = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    common_every = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aggregator_spark.session import get_spark

    spark = get_spark(app_name="stress-video-neardup")
    spark.sparkContext.setLogLevel("ERROR")

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def encode(batches):
        import numpy as np
        import pandas as pd

        from aggregator_spark.operators.codecs import encode_avi

        def frame(key: int) -> np.ndarray:
            rng = np.random.RandomState(key)
            return rng.randint(0, 200, size=(H, W, 3)).astype(np.uint8)

        title_card = frame(2_000_000_001)

        def frames_of(i: int) -> list:
            if twin_every and i % twin_every == 1 and i > 0:
                # shared-frame copy: keep the predecessor's first two
                # frames, fresh tail — merges through the shared pair
                prev = i - 1
                keys = [prev * FRAMES, prev * FRAMES + 1,
                        i * FRAMES + 2, i * FRAMES + 3]
            else:
                keys = [i * FRAMES + j for j in range(FRAMES)]
            fr = [frame(k) for k in keys]
            if common_every and i % common_every == 2:
                fr[0] = title_card  # the ubiquitous-frame hazard
            return fr

        for pdf in batches:
            ids = [int(v) for v in pdf["id"]]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(["video"] * len(ids), dtype="object"),
                    "payload": pd.Series(
                        [encode_avi(frames_of(i), fps=2) for i in ids],
                        dtype="object",
                    ),
                }
            )

    media = spark.range(n).mapInPandas(encode, media_schema)

    from aggregator_spark.operators.components import dedup_clusters
    from aggregator_spark.operators.multimodal import video_frame_dhash

    out: dict = {
        "n": n, "twin_every": twin_every, "common_every": common_every,
    }

    t0 = time.time()
    fh = (
        video_frame_dhash(media)
        .select("media_id", "fhash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    out["fh_rows"] = fh.count()
    out["distinct_fhashes"] = fh.select("fhash").distinct().count()
    out["t_sig_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    hubs = fh.groupBy("fhash").agg(F.min("media_id").alias("hub"))
    edges = (
        fh.join(hubs, "fhash")
        .filter(F.col("media_id") != F.col("hub"))
        .select(
            F.col("hub").alias("doc_a"), F.col("media_id").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    out["star_edges"] = edges.count()
    out["t_edges_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    videos = fh.select("media_id").distinct().withColumnRenamed(
        "media_id", "doc_id"
    )
    comp = dedup_clusters(videos, edges)
    keep = comp.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )
    out["n_dropped"] = keep.filter(~F.col("keep")).count()
    out["t_components_sec"] = round(time.time() - t0, 2)

    n_twins = len(
        [i for i in range(n) if twin_every and i % twin_every == 1 and i > 0]
    )
    n_common = len(
        [i for i in range(n) if common_every and i % common_every == 2]
    )
    out["n_twins_planted"] = n_twins
    out["n_title_card_videos"] = n_common
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
