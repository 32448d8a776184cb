"""Survivor-side stress for perceptual image dedup: distinct
signatures GROWING with the corpus (the driver fixture's 256-key
payload space keeps the node graph constant, so it never exercises
the banding stage at scale — this script does).

Usage: python tests/stress_image_neardup.py N [twin_every]

Corpus: N deterministic noise images (RandomState(id) — every base
image a distinct signature), with every ``twin_every``-th id a
patch-edited near-dup of its predecessor (flips 0–4 dHash bits, ~97%
within the banded radius — the realistic recall boundary). Times the
three stages separately so the linear decode and the node-bounded
banding are visible apart, and reports how many twins the banded path
actually merged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    twin_every = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aggregator_spark.session import get_spark

    spark = get_spark(app_name="stress-image-neardup")
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

        from aggregator_spark.operators.codecs import encode_png

        def base(i: int):
            rng = np.random.RandomState(i)
            return rng.randint(0, 200, size=(24, 32)).astype(np.uint8)

        def patched(px):
            v = px.copy()
            v[8:12, 10:14] = np.minimum(
                v[8:12, 10:14].astype(int) + 55, 255
            ).astype(np.uint8)
            return v

        for pdf in batches:
            ids = [int(v) for v in pdf["id"]]
            payloads = []
            for i in ids:
                if twin_every and i % twin_every == 1 and i > 0:
                    payloads.append(encode_png(patched(base(i - 1))))
                else:
                    payloads.append(encode_png(base(i)))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(["image"] * len(ids), dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = spark.range(n).mapInPandas(encode, media_schema)

    from aggregator_spark.operators.components import dedup_clusters
    from aggregator_spark.operators.dedup import banded_hamming_pairs
    from aggregator_spark.operators.multimodal import image_dhash

    out: dict = {"n": n, "twin_every": twin_every}

    t0 = time.time()
    sigs = image_dhash(media).localCheckpoint(eager=True)
    out["t_sig_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    nodes = (
        sigs.groupBy("dhash")
        .agg(F.min("media_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    out["distinct_sigs"] = nodes.count()
    pairs = banded_hamming_pairs(
        nodes.select("doc_id", "dhash"), "dhash"
    ).localCheckpoint(eager=True)
    out["banded_pairs"] = pairs.count()
    out["t_band_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    comp = dedup_clusters(nodes, pairs.select("doc_a", "doc_b"))
    rep_comp = nodes.join(comp, "doc_id").select("dhash", "component")
    keep = sigs.join(rep_comp, "dhash").select(
        F.col("media_id").alias("doc_id"),
        "component",
        (F.col("media_id") == F.col("component")).alias("keep"),
    )
    out["n_dropped"] = keep.filter(~F.col("keep")).count()
    out["t_components_sec"] = round(time.time() - t0, 2)

    n_twins = len(
        [i for i in range(n) if twin_every and i % twin_every == 1 and i > 0]
    )
    out["n_twins_planted"] = n_twins
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
