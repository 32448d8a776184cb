"""Ingest-time LSH signature index materialization.

Same ingest/query split as ``ivf_index.py``: the multi-table hyperplane
signatures (one L×b matmul over the corpus + vector norms) are an
offline ANN index-build cost, not a per-query cost. Materialized
content-keyed; queries pay only the bucket join + exact re-rank.

At 100 TB: the index row is (id, vec, vnorm, sigs[L]) — the vectors
ride along so the re-rank needs no join back to the corpus; for very
wide embeddings store (id, vnorm, sigs) instead and co-bucket with the
embedding table on id.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def cached_lsh_index(
    spark: SparkSession,
    sf_dir: str,
    n_tables: int = 12,
    planes_per_table: int = 5,
    n_dims: int = 64,
) -> DataFrame:
    """Materialize ``lsh_signature_index`` once per (sf_dir, source
    content stamp, LSH params), reuse after."""
    from aggregator_spark.operators.similarity import lsh_signature_index
    from aggregator_spark.schemas import load_testdata

    src = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "unknown"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{stamp}|{n_tables}x{planes_per_table}"
        f"x{n_dims}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"aggregator_spark_lsh_{key}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        emb = load_testdata(spark, sf_dir, "embeddings")
        lsh_signature_index(
            emb,
            n_tables=n_tables,
            planes_per_table=planes_per_table,
            n_dims=n_dims,
        ).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)
