"""Capture the INTERNAL plan of the r14 fused-gate CANDIDATE —
REJECTED on measurement (OPTIMIZATION_r14.md §Item 4); the construction
below is inlined verbatim so the rejected plan stays reproducible
after the operator was removed from operators/dedup.py.

The candidate fused the gate's two Arrow gram passes (8-gram
contamination + 16-gram span stats) into one tokenization and lazily
localCheckpointed the partitioned stream (the per-branch kind filters
would otherwise push below the repartition and triple-execute the
pass), so the gate's visible plan truncated at LogicalRDD leaves —
plans/r14/corpus_keep_list_fusedgate_rejected.txt; this script prints
exactly the subtree that checkpoint materialized (scan → ONE
MapInPandas → broadcast probe join → map-side prune/hash projection →
pinned doc_id exchange) = plans/r14/gate_fused_internal_rejected.txt.

Usage: python plans/r14/capture_gate_fused_internal.py <out.txt> [sf_dir]
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main(out_path: str, sf_dir: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from aggregator_spark.session import get_spark

    spark = get_spark("plan-capture")
    import pyspark.sql.functions as F

    from aggregator_spark import llm_queries as L
    from aggregator_spark.operators.util import scatter
    from aggregator_spark.testdata_queries import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    probes = L.benchmark_probes(docs)

    # the rejected candidate's Arrow worker, inlined (one tokenization
    # per doc; kind 0 = totals row, kind 1 = distinct 8-grams,
    # kind 2 = per-doc-counted 16-grams; tokenizer parity with
    # text._gram_batches)
    def _gate_gram_batches(n8: int, n16: int):
        import re as _re

        pat = _re.compile(r"[^a-z0-9]+")

        def fn(batches):
            import pandas as pd

            for pdf in batches:
                ids, kinds, gs, occs = [], [], [], []
                for did, text in zip(pdf["doc_id"], pdf["text"]):
                    toks = [
                        t for t in pat.split((text or "").lower()) if t
                    ]
                    ids.append(did)
                    kinds.append(0)
                    gs.append(None)
                    occs.append(max(len(toks) - (n16 - 1), 0))
                    if len(toks) >= n8:
                        seen = set()
                        for i in range(len(toks) - n8 + 1):
                            g = " ".join(toks[i : i + n8])
                            if g not in seen:
                                seen.add(g)
                                ids.append(did)
                                kinds.append(1)
                                gs.append(g)
                                occs.append(0)
                    if len(toks) >= n16:
                        cnt: dict = {}
                        for i in range(len(toks) - n16 + 1):
                            g = " ".join(toks[i : i + n16])
                            cnt[g] = cnt.get(g, 0) + 1
                        for g, c in cnt.items():
                            ids.append(did)
                            kinds.append(2)
                            gs.append(g)
                            occs.append(c)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "kind": pd.Series(kinds, dtype="int32"),
                        "g": pd.Series(gs, dtype="object"),
                        "occ": pd.Series(occs, dtype="int64"),
                    }
                )

        return fn

    fused = scatter(docs.select("doc_id", "text")).mapInPandas(
        _gate_gram_batches(L.DECONTAM_N, L.DUP_SPAN_N),
        "doc_id long, kind int, g string, occ long",
    )
    hit = fused.join(
        F.broadcast(probes),
        (fused.g == probes.probe) & (fused.kind == F.lit(1)),
        "left",
    )
    n_exch = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        hit.filter((F.col("kind") != 1) | F.col("probe").isNotNull())
        .select(
            "doc_id",
            "kind",
            F.when(F.col("kind") == 2, F.xxhash64("g")).alias("gh"),
            "occ",
        )
        .repartition(n_exch, "doc_id")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        part.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001",
    )
