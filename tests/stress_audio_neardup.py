"""Survivor-side stress for perceptual AUDIO dedup: distinct
fingerprints GROWING with the corpus (the driver fixture's 128-key
clip space keeps the node graph constant across SFs, so it never
exercises the banding stage at scale — this script is the honest-mode
analogue the r12 HANDOFF called for, the ``stress_image_neardup``
pattern on the audio modality).

Usage: python tests/stress_audio_neardup.py N [twin_every]

Corpus: N deterministic WAV clips whose spectral bit-grid is drawn
directly: per segment, RandomState(id) picks 4 of the fingerprint's 8
log-spaced bands to be HOT and synthesizes a band-center tone for
each — so the 64-bit fingerprint is ~an 8×C(8,4) random code
(~5.7e14 patterns, distinct per id at any N here) and spurious
near-collisions are negligible. Every ``twin_every``-th id is an
EDITED re-synthesis of its predecessor: 0, 1 or 2 random (segment,
band) hot-set swaps (Hamming 0 / 2 / 4 — two bits per swap) plus 2%
noise, so the banded ≤3 radius's recall boundary is REAL (the
2-swap third of the twins sits outside it by design). Times the
three stages separately so the linear decode+rFFT and the
node-bounded banding are visible apart, and reports how many twins
the banded path actually merged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

RATE = 8000
N_SAMPLES = 4096  # ~0.5 s per clip


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    twin_every = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aggregator_spark.session import get_spark

    spark = get_spark(app_name="stress-audio-neardup")
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

        from aggregator_spark.operators.codecs import (
            AUDIO_FP_BANDS,
            AUDIO_FP_SEGS,
            _fp_band_edges,
            encode_wav,
        )

        seg_len = N_SAMPLES // AUDIO_FP_SEGS
        edges = _fp_band_edges(seg_len // 2 + 1)
        # one synthesis frequency per fingerprint band: the band's
        # middle rFFT bin, exact in the segment-local spectrum; the
        # fingerprint's band energy is the MEAN |spec| over the band's
        # bins, so a tone's contribution dilutes by the band width —
        # width-proportional amplitudes make every hot band equally
        # hot regardless of which band it is
        band_bins = [
            (edges[b] + edges[b + 1]) // 2 for b in range(AUDIO_FP_BANDS)
        ]
        band_amp = [
            0.001 * (edges[b + 1] - edges[b])
            for b in range(AUDIO_FP_BANDS)
        ]
        ts = np.arange(seg_len)

        def hot_sets(i: int) -> list[np.ndarray]:
            rng = np.random.RandomState(i)
            return [
                rng.choice(AUDIO_FP_BANDS, size=4, replace=False)
                for _ in range(AUDIO_FP_SEGS)
            ]

        def synth(hots: list[np.ndarray], noise_key: int) -> np.ndarray:
            segs = []
            for hot in hots:
                s = np.zeros(seg_len)
                for b in hot:
                    s += band_amp[b] * np.sin(
                        2 * np.pi * band_bins[b] * ts / seg_len
                    )
                segs.append(s)
            x = np.concatenate(segs)
            rng = np.random.RandomState(noise_key)
            return (
                x + rng.normal(0.0, 0.002, size=x.shape)
            ).astype(np.float32)

        def twin_hots(i: int) -> list[np.ndarray]:
            # re-synthesize the predecessor with 0/1/2 (segment, band)
            # hot-set swaps -> Hamming 0/2/4 vs the base fingerprint
            hots = hot_sets(i - 1)
            rng = np.random.RandomState(10_000_019 + i)
            for _ in range(int(rng.randint(0, 3))):
                s = int(rng.randint(0, AUDIO_FP_SEGS))
                hot = set(int(b) for b in hots[s])
                cold = [
                    b for b in range(AUDIO_FP_BANDS) if b not in hot
                ]
                hot.discard(int(rng.choice(sorted(hot))))
                hot.add(int(rng.choice(cold)))
                hots[s] = np.array(sorted(hot))
            return hots

        for pdf in batches:
            ids = [int(v) for v in pdf["id"]]
            payloads = []
            for i in ids:
                if twin_every and i % twin_every == 1 and i > 0:
                    payloads.append(
                        encode_wav(synth(twin_hots(i), 77_000 + i), RATE)
                    )
                else:
                    payloads.append(
                        encode_wav(synth(hot_sets(i), 88_000 + i), RATE)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(["audio"] * len(ids), dtype="object"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = spark.range(n).mapInPandas(encode, media_schema)

    from aggregator_spark.operators.components import dedup_clusters
    from aggregator_spark.operators.dedup import banded_hamming_pairs
    from aggregator_spark.operators.multimodal import audio_fp64

    out: dict = {"n": n, "twin_every": twin_every}

    t0 = time.time()
    sigs = audio_fp64(media).localCheckpoint(eager=True)
    out["t_sig_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    nodes = (
        sigs.groupBy("afp")
        .agg(F.min("media_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    out["distinct_sigs"] = nodes.count()
    pairs = banded_hamming_pairs(
        nodes.select("doc_id", "afp"), "afp"
    ).localCheckpoint(eager=True)
    out["banded_pairs"] = pairs.count()
    out["t_band_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    comp = dedup_clusters(nodes, pairs.select("doc_a", "doc_b"))
    rep_comp = nodes.join(comp, "doc_id").select("afp", "component")
    keep = sigs.join(rep_comp, "afp").select(
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
