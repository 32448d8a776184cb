"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce``: exact cosine top-k — the correctness
  baseline. Query side broadcast, corpus streamed: no shuffle of the
  corpus, one window per query for the top-k cut.
- ``ann_topk_lsh``: random-hyperplane LSH scale path — deterministic
  pseudo-planes derived from md5 (no RNG state), bucket on sign
  signature, exact re-rank within bucket.

Scale/plan notes:
- Vector norms are computed ONCE per row as a column before any join;
  recomputing ``sqrt(dot(v,v))`` inside the pair-scoring expression
  would redo the fold for every candidate pair (O(pairs·dim) extra).
- The corpus side is ``scatter``-ed: similarity scoring is CPU-bound,
  and a small parquet arrives as one input split — without the
  rebalance the whole cross/bucket join runs on a single core.
- Plane weights are plain Python constants (hashlib.md5 of the
  (plane, dim) pair) shipped as array literals; deriving them with md5
  *expressions* built a 512-node tree that Catalyst re-evaluated per
  row outside codegen.

Cosines are rounded to 6 decimals BEFORE ranking so rank order (and the
DuckDB oracle comparison) is independent of float summation order; the
fold accumulates sequentially, matching DuckDB's list_dot_product order.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from aggregator_spark.operators.util import scatter


def _as_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a, b):
    """Sequential fold — deterministic accumulation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def _with_vec_norm(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    )
    return base.withColumn("vnorm", norm(F.col("vec")))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank); ties break on
    neighbor_id so the result is a deterministic set.
    """
    base = _with_vec_norm(embeddings, id_col, vec_col)
    queries = base
    if query_ids is not None:
        queries = base.filter(F.col(id_col).isin(query_ids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    c = scatter(base).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("vnorm").alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random weight in [-0.5, 0.5): md5 of the
    (plane, dim) pair → first 6 hex digits → uniform fraction. Computed
    in Python (constants), identical to the previous SQL-side formula
    ``conv(substring(md5(...),1,6),16,10)/16777216 - 0.5``."""
    h = hashlib.md5(f"plane{plane}_dim{dim}".encode()).hexdigest()
    return int(h[:6], 16) / 16777216.0 - 0.5


# hyperplane signatures are computed Arrow-side (numpy matmul over the
# _plane_weight family — tables are independent because their plane
# index ranges are disjoint)


def lsh_signature_index(
    embeddings: DataFrame,
    n_tables: int = 12,
    planes_per_table: int = 5,
    n_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The LSH index table: (id, vec, vnorm, sigs[L]) with one b-bit
    sign signature per table. Arrow-vectorized numpy — one matmul for
    all L×b planes (the interpreted per-plane HOF fold measured ~6×
    slower at sf0.1; same precedent as shingling in operators/dedup.py).
    This is the offline index-build step; ``sources/lsh_index.py``
    materializes it content-keyed for reuse across queries."""
    import numpy as np

    W = np.array(
        [
            [_plane_weight(p, d) for d in range(n_dims)]
            for p in range(n_tables * planes_per_table)
        ]
    )
    b = planes_per_table

    def add_sigs(batches):
        for pdf in batches:
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            P = V @ W.T >= 0
            pdf = pdf.copy()
            pdf["sigs"] = [
                [
                    "".join("1" if x else "0" for x in row[t * b : (t + 1) * b])
                    for t in range(n_tables)
                ]
                for row in P
            ]
            yield pdf

    return scatter(_with_vec_norm(embeddings, id_col, vec_col)).mapInPandas(
        add_sigs,
        schema=(
            f"{id_col} long, vec array<double>, vnorm double, "
            "sigs array<string>"
        ),
    )


def ann_topk_lsh(
    embeddings: DataFrame | None,
    query_ids: list[int] | None = None,
    k: int = 3,
    n_tables: int = 12,
    planes_per_table: int = 5,
    n_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
    indexed: DataFrame | None = None,
    validate_index: bool = True,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: L independent
    sign-bit signatures (b planes each); candidates = corpus vectors
    sharing ANY table's bucket with the query, deduped, then exact
    cosine re-rank. Recall ≈ 1-(1-p^b)^L for per-plane agreement p —
    single-probe (L=1) collapses to ~p^b, which is why it measured ~0
    recall on weakly-correlated embeddings; L=12×b=5 measures ~0.6
    recall@5 probing ~1/3 of this corpus (tune b up as the corpus
    grows: bucket occupancy ~n/2^b per table).

    Pass ``indexed`` (columns id, vec, vnorm, sigs — the output of
    ``lsh_signature_index``) to skip the signature build: like any real
    ANN system the signature table is an offline index, materialized
    once at ingest (see ``sources/lsh_index.py``) and reused per query.

    ``multiprobe=1`` (default) additionally probes every bucket at
    Hamming distance 1 from the query's signature in each table — the
    standard multiprobe-LSH trick: the near-miss buckets (one plane
    voted wrong) hold most of the lost neighbors. Only the QUERY side
    fans out (×(1+b) bucket keys per table — queries are few); the
    corpus keeps exactly one bucket per table, so index size and the
    shuffle key count are unchanged. Measured here: recall@5 0.6→0.9
    at ~2× the probed-candidate share. ``multiprobe=0`` is the
    exact-bucket form.

    Scale shape: the bucket join is keyed on (table, signature) —
    shuffle O(n·L) keys instead of the O(n·q) cross product; dedup of
    candidate pairs happens pre-scoring so each survivor is scored
    once.
    """
    if indexed is not None:
        # geometry guard: a cached index built with different LSH params
        # would generate malformed multiprobe bucket keys and silently
        # collapse recall — fail loudly instead. The one-row probe is a
        # small eager Spark job, so callers that derive the index and
        # the query params from the same constants (the catalog path)
        # pass validate_index=False to keep plan construction lazy.
        if validate_index:
            probe = indexed.select(
                F.size("sigs").alias("n_t"),
                F.length(F.element_at("sigs", 1)).alias("b"),
            ).first()
            if probe is not None and (
                probe["n_t"] != n_tables or probe["b"] != planes_per_table
            ):
                raise ValueError(
                    f"indexed LSH table has geometry {probe['n_t']}x"
                    f"{probe['b']}, query expects {n_tables}x"
                    f"{planes_per_table} — rebuild the index"
                )
        base = indexed
    else:
        if embeddings is None:
            raise ValueError("need embeddings when no index is passed")
        base = lsh_signature_index(
            embeddings,
            n_tables=n_tables,
            planes_per_table=planes_per_table,
            n_dims=n_dims,
            id_col=id_col,
            vec_col=vec_col,
        )
    keyed = base.select(
        id_col,
        "vec",
        "vnorm",
        F.posexplode("sigs").alias("table", "sig"),
    )
    queries = keyed
    if query_ids is not None:
        queries = keyed.filter(F.col(id_col).isin(query_ids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("table").alias("qtable"),
        F.col("sig").alias("qsig"),
    )
    if multiprobe:
        if multiprobe != 1:
            raise ValueError("only multiprobe in {0, 1} is implemented")
        # fan the query side out to its signature plus every Hamming-1
        # variant: flip bit i of the b-char '0'/'1' string
        flips = F.array(
            F.col("qsig"),
            *[
                F.concat(
                    F.substring("qsig", 1, i),
                    F.when(
                        F.substring("qsig", i + 1, 1) == "1", F.lit("0")
                    ).otherwise(F.lit("1")),
                    F.substring("qsig", i + 2, planes_per_table - i - 1),
                )
                for i in range(planes_per_table)
            ],
        )
        q = q.withColumn("qsig", F.explode(flips))
    candidates = (
        keyed.join(
            F.broadcast(q),
            (F.col("table") == F.col("qtable"))
            & (F.col("sig") == F.col("qsig")),
        )
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", "qvec", "qnorm", id_col, "vec", "vnorm")
        .dropDuplicates(["query_id", id_col])
    )
    scored = candidates.withColumn(
        "cosine",
        F.round(
            dot(F.col("qvec"), F.col("vec"))
            / (F.col("qnorm") * F.col("vnorm")),
            6,
        ),
    ).select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 3,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    kmeans_rounds: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantization by a GEOMETRIC
    k-means assignment (default: ``kmeans_fit`` over the embeddings —
    a metadata label column is NOT a valid quantizer: on this corpus
    the true top-1 neighbor shares the label only at chance rate, so
    label-routing measured ~0.3 recall vs ~0.6 with geometric
    clusters at nprobe=3). Per-cluster mean centroids; queries probe
    the ``nprobe`` nearest centroids and re-rank exactly inside.
    One Lloyd round measured best here (0.625 recall@5, and each
    extra round shrinks clusters enough to split true neighbors:
    0.600 at 2, 0.550 at 3) — kmeans_rounds is the quality/cost knob.

    Scale shape: centroids are O(n_clusters × dim) — broadcastable at
    any corpus size; the candidate join touches ~nprobe/n_clusters of
    the corpus instead of all of it, and the corpus side never
    shuffles (cluster routing rides the broadcast join). The k-means
    fit is the offline index-build step (iterations × one corpus
    pass); pass ``cluster_col`` to reuse a precomputed assignment.
    """
    if cluster_col is None:
        assignment = kmeans_fit(
            embeddings, iterations=kmeans_rounds, id_col=id_col,
            vec_col=vec_col,
        ).select(F.col(id_col).alias("a_id"), F.col("assigned"))
        clustered = embeddings.join(
            assignment, F.col(id_col) == F.col("a_id")
        )
        base = scatter(
            clustered.select(
                F.col(id_col),
                F.col("assigned").alias("cluster"),
                _as_double(F.col(vec_col)).alias("vec"),
            )
        ).withColumn("vnorm", norm(F.col("vec")))
    else:
        base = scatter(
            embeddings.select(
                F.col(id_col),
                F.col(cluster_col).alias("cluster"),
                _as_double(F.col(vec_col)).alias("vec"),
            )
        ).withColumn("vnorm", norm(F.col("vec")))

    # centroid per cluster: element-wise mean via posexplode → avg →
    # re-assemble ordered by position (tiny result, broadcast later)
    exploded = base.select(
        "cluster", F.posexplode("vec").alias("pos", "x")
    )
    centroids = (
        exploded.groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            F.col("cluster").alias("c_cluster"),
            F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"),
        )
        .withColumn("c_norm", norm(F.col("cvec")))
    )

    queries = base
    if query_ids is not None:
        queries = base.filter(F.col(id_col).isin(query_ids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )

    # route each query to its nprobe nearest centroids
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_cosine").desc(), F.col("c_cluster")
    )
    probed = (
        q.join(F.broadcast(centroids))
        .withColumn(
            "c_cosine",
            dot(F.col("qvec"), F.col("cvec"))
            / (F.col("qnorm") * F.col("c_norm")),
        )
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "qvec", "qnorm", F.col("c_cluster").alias("cluster"))
    )

    scored = (
        base.join(F.broadcast(probed), "cluster")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("qvec"), F.col("vec"))
                / (F.col("qnorm") * F.col("vnorm")),
                6,
            ),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _seq_rowdot(A, B):
    """Row-wise dot with SEQUENTIAL accumulation in dimension order —
    bit-identical to the F.aggregate fold (and DuckDB list_dot_product):
    acc_d+1 = acc_d + a_d*b_d, all IEEE double ops. numpy's own sum()
    uses pairwise summation, which would drift in the last bits."""
    import numpy as np

    acc = np.zeros(A.shape[0])
    for d in range(A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def _near_dup_batches(b_ids, b_mat, b_norms, threshold):
    """mapInPandas worker over the A side: all-pairs cosine against the
    broadcast corpus matrix, vectorized per dimension with sequential
    accumulation (see _seq_rowdot). Survivors near the threshold are
    re-rounded exactly with decimal HALF_UP on the shortest decimal
    representation — the same rule as Spark's F.round — so output is
    bit-identical to the declarative fold form this replaces."""

    def fn(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        q6 = Decimal("0.000001")
        for pdf in batches:
            if not len(pdf):
                continue
            ids_a = pdf["vec_id"].to_numpy()
            A = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            m, n = A.shape[0], b_mat.shape[0]
            dots = np.zeros((m, n))
            for d in range(A.shape[1]):
                dots = dots + np.outer(A[:, d], b_mat[:, d])
            na = np.sqrt(_seq_rowdot(A, A))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (na[:, None] * b_norms[None, :])
            cand = (cos >= threshold - 1e-6) & (
                ids_a[:, None] < b_ids[None, :]
            )
            ia, ib = np.nonzero(cand)
            out_a, out_b, out_c = [], [], []
            for i, j in zip(ia, ib):
                c = float(
                    Decimal(repr(float(cos[i, j]))).quantize(
                        q6, rounding=ROUND_HALF_UP
                    )
                )
                if c >= threshold:
                    out_a.append(int(ids_a[i]))
                    out_b.append(int(b_ids[j]))
                    out_c.append(c)
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cosine": out_c}
            )

    return fn


def _block_pair_worker(threshold: float):
    """applyInPandas worker for one (b1, b2) block pair: exact pairwise
    cosine between the two blocks (cross pairs for b1 < b2, the upper
    triangle for the diagonal pair). Same numeric discipline as
    _near_dup_batches — per-dimension sequential accumulation plus
    decimal HALF_UP re-rounding of near-threshold survivors — so the
    union over all block pairs is bit-identical to the single-matrix
    brute-force form."""

    def fn(pdf):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        if not len(pdf):
            return empty
        b1 = int(pdf["b1"].iloc[0])
        b2 = int(pdf["b2"].iloc[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )
        blocks = pdf["block"].to_numpy()
        if b1 == b2:
            left = right = np.arange(len(ids))
        else:
            left = np.nonzero(blocks == b1)[0]
            right = np.nonzero(blocks == b2)[0]
            if not len(left) or not len(right):
                return empty
        A, Bm = mat[left], mat[right]
        dots = np.zeros((A.shape[0], Bm.shape[0]))
        for d in range(A.shape[1]):
            dots = dots + np.outer(A[:, d], Bm[:, d])
        na = np.sqrt(_seq_rowdot(A, A))
        nb = np.sqrt(_seq_rowdot(Bm, Bm))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (na[:, None] * nb[None, :])
        ids_a, ids_b = ids[left], ids[right]
        cand = cos >= threshold - 1e-6
        if b1 == b2:
            # diagonal: strict upper triangle by id so each within-block
            # pair is computed exactly once
            cand &= ids_a[:, None] < ids_b[None, :]
        # off-diagonal: every cross pair appears exactly once in the
        # cross matrix already (one member per block) — emit them all
        # and normalize id order at output; an id-order mask here would
        # drop pairs whose lower id sits in the higher block
        ia, ib = np.nonzero(cand)
        q6 = Decimal("0.000001")
        out_a, out_b, out_c = [], [], []
        for i, j in zip(ia, ib):
            c = float(
                Decimal(repr(float(cos[i, j]))).quantize(
                    q6, rounding=ROUND_HALF_UP
                )
            )
            if c >= threshold:
                lo, hi = int(ids_a[i]), int(ids_b[j])
                if lo > hi:
                    lo, hi = hi, lo
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(c)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return fn


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    strategy: str = "blocked",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).
    Exact — every qualifying pair is emitted (the oracle is an all-pairs
    SQL join, so an LSH candidate path with < 1.0 recall cannot serve
    here; LSH IS the right filter when approximate recall is acceptable,
    see ann_topk_lsh).

    Default ``strategy="blocked"``: distributed block-pair replication
    join. Each vector is hashed to one of ``n_blocks`` blocks and
    shipped to the B block-pair groups containing its block (O(n·B)
    shuffle rows); each (b1, b2) group computes its cross/triangle pairs
    with the vectorized numpy kernel. Exactly one group owns any given
    pair, per-task memory is two blocks (corpus/B each — tune n_blocks
    so a block fits an executor), and nothing touches the driver: the
    round-1 form collected the whole corpus driver-side, which is an
    OOM at real scale. Compute stays O(n²) — that is what exact
    all-pairs means — but it is spread over B(B+1)/2 independent tasks.

    ``strategy="broadcast"``: the round-1 small-corpus form (corpus
    matrix collected and closed over — one pass, no shuffle). Kept for
    tests and tiny corpora; both strategies are bit-identical
    (sequential dimension-order accumulation + exact HALF_UP rounding).
    """
    if strategy == "broadcast":
        import numpy as np

        rows = embeddings.select(F.col(id_col), F.col(vec_col)).collect()
        b_ids = np.array([r[0] for r in rows], dtype=np.int64)
        b_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
        b_norms = np.sqrt(_seq_rowdot(b_mat, b_mat))

        return scatter(
            embeddings.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
            )
        ).mapInPandas(
            _near_dup_batches(b_ids, b_mat, b_norms, threshold),
            "id_a long, id_b long, cosine double",
        )
    if strategy != "blocked":
        raise ValueError(f"unknown strategy: {strategy!r}")

    B = int(n_blocks)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).withColumn("block", F.pmod(F.xxhash64("vec_id"), F.lit(B)).cast("int"))
    # replicate each vector to every block pair containing its block:
    # (min(block, j), max(block, j)) for j in 0..B-1 — B destinations,
    # all distinct, so each unordered pair is owned by exactly one group
    dests = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda j: F.struct(
            F.least(F.col("block"), j).alias("b1"),
            F.greatest(F.col("block"), j).alias("b2"),
        ),
    )
    exploded = base.withColumn("dest", F.explode(dests)).select(
        F.col("dest.b1").alias("b1"),
        F.col("dest.b2").alias("b2"),
        "block",
        "vec_id",
        "embedding",
    )
    return exploded.groupBy("b1", "b2").applyInPandas(
        _block_pair_worker(threshold),
        "id_a long, id_b long, cosine double",
    )


def l2_normalize(embeddings: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Unit-norm embeddings: v / ||v||, each component rounded to 6
    decimals (cross-engine float safety). Zero vectors pass through
    unchanged (guard against divide-by-zero NULLs). Pure column
    algebra over the array — no Python, no shuffle."""
    # Materialize the norm as its own column FIRST: inlining norm(vec)
    # inside the transform lambda would splice the whole O(dim) fold
    # into every element slot — an O(dim²) expression tree that took
    # seconds to codegen and re-ran the fold per element.
    staged = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("n", norm(F.col("vec")))
    unit = F.when(F.col("n") == 0.0, F.col("vec")).otherwise(
        F.transform(F.col("vec"), lambda x: F.round(x / F.col("n"), 6))
    )
    return staged.select(F.col(id_col), unit.alias("unit_vec"))


def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127/max(|x|),
    q_i = floor(x_i*scale + 0.5) (round-half-up — identical in both
    engines, unlike banker's-rounding `round`). Returns the int8 codes
    and the dequantization scale — 4× memory cut for ANN at scale.
    Zero vectors quantize to zeros with scale 0."""
    # scale staged as a column (not inlined in the lambda) — same
    # O(dim²)-tree trap as l2_normalize, see comment there.
    staged = (
        embeddings.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
        )
        .withColumn(
            "amax",
            F.aggregate(
                F.col("vec"), F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            ),
        )
        .withColumn(
            "scale",
            F.when(F.col("amax") == 0.0, F.lit(0.0)).otherwise(
                F.lit(127.0) / F.col("amax")
            ),
        )
    )
    q = F.transform(
        F.col("vec"),
        lambda x: F.floor(x * F.col("scale") + 0.5).cast("int"),
    )
    return staged.select(
        F.col(id_col),
        q.alias("q_vec"),
        F.round(F.col("scale"), 6).alias("scale"),
    )


def label_centroids(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid, one row per (label, dim): posexplode the
    vectors and average per dimension. The long form shuffles
    (label, dim) keyed partial sums — fully parallel in the dimension
    axis too, and the natural shape for a downstream broadcast join
    (assignment = join on dim, aggregate over dim)."""
    return (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


def _assign_step(base: DataFrame, assignment: DataFrame,
                 id_col: str = "vec_id") -> DataFrame:
    """One Lloyd iteration given the current assignment: centroids
    from (id → assigned) membership, every vector reassigned to the
    nearest centroid (ties → lowest label). ``base`` is (id, vec
    double[]); ``assignment`` is (id, assigned).

    Centroid means stay a distributed aggregate; the k×dim result is
    collected (always tiny — the broadcast-equivalent) and the
    reassignment runs Arrow-vectorized per batch with SEQUENTIAL
    dimension-order accumulation + decimal HALF_UP rounding before the
    argmin — bit-identical to the declarative zip_with/aggregate fold
    it replaces (same precedent as _near_dup_batches; the interpreted
    fold × k crossJoin measured ~2× slower at sf0.1). The corpus side
    still never shuffles."""
    cents_rows = (
        base.join(assignment, id_col)
        .select(
            F.col("assigned").alias("c_label"),
            F.posexplode("vec").alias("pos", "x"),
        )
        .groupBy("c_label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("c_label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("c_label", F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec"))
        .orderBy("c_label")
        .collect()
    )
    import numpy as np

    labels = np.array([r["c_label"] for r in cents_rows])
    C = np.array([r["cvec"] for r in cents_rows], dtype=np.float64)

    def reassign(batches):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        q6 = Decimal("0.000001")
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            acc = np.zeros((V.shape[0], C.shape[0]))
            for d in range(V.shape[1]):
                diff = V[:, d, None] - C[None, :, d]
                acc = acc + diff * diff
            dist = np.sqrt(acc)
            rd = np.array(
                [
                    [
                        float(
                            Decimal(repr(float(x))).quantize(
                                q6, rounding=ROUND_HALF_UP
                            )
                        )
                        for x in row
                    ]
                    for row in dist
                ]
            )
            # first occurrence of the row min = lowest label (labels
            # sorted ascending) — the declarative tie-break preserved
            idx = rd.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "assigned": labels[idx].astype("int32"),
                    "dist": rd[np.arange(len(idx)), idx],
                }
            )

    return base.mapInPandas(
        reassign, schema=f"{id_col} long, assigned int, dist double"
    )


def kmeans_assign(embeddings: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  label_col: str = "label") -> DataFrame:
    """Nearest-centroid (re)assignment — one Lloyd half-step, and the
    oracle-checkable core of IVF routing: centroids from the current
    ``label_col`` partition, every vector reassigned to the centroid
    with the smallest Euclidean distance (ties → lowest label).

    Scale shape: centroids are O(k × dim) — ALWAYS broadcast; the
    corpus side never shuffles (the k-way fan-out rides the broadcast
    nested-loop, one window per vec_id cuts the argmin). Distances are
    rounded to 6 decimals BEFORE the argmin so the winner (and the
    DuckDB oracle comparison) is independent of float summation order.
    Composing assign → label_centroids = one full k-means iteration.
    """
    base = scatter(
        embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("vec"))
    )
    assignment = embeddings.select(
        F.col(id_col), F.col(label_col).alias("assigned")
    )
    return _assign_step(base, assignment, id_col)


def kmeans_fit(embeddings: DataFrame, iterations: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               label_col: str = "label") -> DataFrame:
    """Full Lloyd k-means for a fixed iteration count, initialized
    from ``label_col``: alternate centroid update and nearest-centroid
    reassignment. Each round is one tiny (k × dim) aggregate broadcast
    back over the corpus — the corpus itself never shuffles, so wall
    time is iterations × one corpus pass, the right shape at 100 TB.
    Fixed iterations keep it oracle-checkable (the DuckDB twin unrolls
    the same rounds as a CTE chain); a convergence-loop variant would
    follow the connected-components pattern (localCheckpoint per
    round) with a rows-only check."""
    base = scatter(
        embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("vec"))
    )
    assignment = embeddings.select(
        F.col(id_col), F.col(label_col).alias("assigned")
    )
    res = None
    for _ in range(iterations):
        res = _assign_step(base, assignment, id_col)
        assignment = res.select(id_col, "assigned")
    return res.select(id_col, "assigned", "dist")


def _semantic_drop_worker(threshold: float, id_col: str):
    """applyInPandas worker over ONE cluster: drop every vector that
    has a lower-id cluster-mate at cosine >= threshold. Same numeric
    discipline as _near_dup_batches (per-dimension sequential
    accumulation, decimal HALF_UP re-round of near-threshold
    survivors) so the drop set is bit-identical to the declarative
    round(dot/(na*nb), 6) >= threshold form it replaces (which spent
    its time in interpreted higher-order folds — measured 6.2 s vs
    0.9 s at sf0.1)."""

    def fn(pdf):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64")})
        if len(pdf) < 2:
            return empty
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
        )
        n, dims = mat.shape
        norms = np.sqrt(_seq_rowdot(mat, mat))
        # Two-tier evaluation so the cluster stays tractable when its
        # size grows with the corpus (the r8 sf10 finding: the old
        # per-dimension np.outer full matrix was O(n²·d) time AND an
        # n×n temp per dimension — 33k-vector clusters ran minutes and
        # allocated ~9 GB per temp):
        #   1. SCREEN with blocked BLAS matmul at threshold-1e-4 — the
        #      dgemm error vs sequential accumulation is ~d·eps (1e-14
        #      scale), five orders inside the margin, so the candidate
        #      set provably contains every pair the exact rule accepts;
        #   2. re-derive the EXACT sequential-accumulation cosine only
        #      for candidates (vectorized per dimension, ascending d —
        #      the same IEEE op order as the fold/DuckDB), and let the
        #      decimal HALF_UP re-round decide, as before. Results are
        #      bit-identical to the full exact matrix.
        mt = mat.T.copy()
        block = max(1, min(4096, int(2**27 // max(n, 1))))
        cia: list[np.ndarray] = []
        cij: list[np.ndarray] = []
        for s in range(0, n, block):
            e = min(s + block, n)
            with np.errstate(divide="ignore", invalid="ignore"):
                approx = (mat[s:e] @ mt) / (
                    norms[s:e, None] * norms[None, :]
                )
            m = (approx >= threshold - 1e-4) & (
                ids[None, :] < ids[s:e, None]
            )
            bi, bj = np.nonzero(m)
            cia.append(bi + s)
            cij.append(bj)
        ia = np.concatenate(cia) if cia else np.empty(0, dtype=np.int64)
        ij = np.concatenate(cij) if cij else np.empty(0, dtype=np.int64)
        if not len(ia):
            return empty
        dots = np.zeros(len(ia))
        for d in range(dims):
            dots = dots + mat[ia, d] * mat[ij, d]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (norms[ia] * norms[ij])
        # exact rule, unchanged: candidates within 1e-6 of the
        # threshold go through the Decimal re-round; clear passes need
        # no per-pair Decimal work
        sure = cos >= threshold + 1e-6
        near = (cos >= threshold - 1e-6) & ~sure
        q6 = Decimal("0.000001")
        dropped: set[int] = {int(ids[i]) for i in ia[sure]}
        for i, c in zip(ia[near], cos[near]):
            if int(ids[i]) in dropped:
                continue
            cq = Decimal(repr(float(c))).quantize(
                q6, rounding=ROUND_HALF_UP
            )
            if float(cq) >= threshold:
                dropped.add(int(ids[i]))
        if not dropped:
            return empty
        return pd.DataFrame({id_col: sorted(dropped)}).astype("int64")

    return fn


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then drop any vector
    whose cluster contains a LOWER-id vector with cosine >= threshold —
    one survivor per semantic duplicate group, quadratic work confined
    to within-cluster pairs.

    Returns (id, cluster, keep). Scale shape: the all-pairs comparison
    that makes naive embedding dedup O(n²) becomes a grouped
    per-cluster task — per-task memory is O(cluster_size × dim +
    cluster_size²), bounded because cluster COUNT scales with the
    corpus while cluster size stays capacity-sized (the SemDeDup
    contract; k grows with n). Centroids ride the kmeans_assign
    broadcast; the corpus shuffles ONCE on cluster id into the Arrow
    worker. Cosines are rounded to 6 decimals before the threshold
    compare so the keep set is float-order-independent
    (oracle-stable)."""
    # the (id, cluster) assignment is referenced by every downstream
    # consumer (the per-cluster drop worker, the final keep labels,
    # and the capacity sizes when max_cluster is set) — without the
    # checkpoint each consumer re-runs the Arrow reassignment pass
    # over the full embedding table (r13 session 5; the keep-ids
    # checkpoint precedent). Ints only, batch-proportional, never
    # vectors.
    assign = (
        kmeans_assign(embeddings, id_col, vec_col, label_col)
        .select(F.col(id_col), F.col("assigned").alias("cluster"))
        .localCheckpoint(eager=True)
    )
    base = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    )
    v = base.join(assign, id_col)
    group_cols = ["cluster"]
    if max_cluster is not None:
        # capacity sub-sharding — the 100-TB posture when cluster
        # COUNT cannot be scaled with the corpus (SemDeDup's k-grows-
        # with-n contract; here k is pinned by the label init): split
        # every cluster into ceil(size/max_cluster) hash cells so the
        # per-task quadratic work is capacity-bounded forever. Hash
        # assignment (md5 — the repo-wide deterministic selector), not
        # a row_number window: a window would sort each whole cluster
        # in ONE task, re-creating the bottleneck being removed.
        # Comparisons are within-cell only — a documented recall trade
        # (drops are a SUBSET of the exact within-cluster drops,
        # pinned by test); measured sf10: 298 s exact → see SCALE.md.
        sizes = assign.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("c_n")
        )
        h8 = F.conv(
            F.substring(
                F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        v = (
            v.join(F.broadcast(sizes), "cluster")
            .withColumn(
                "cell",
                (h8 % F.ceil(F.col("c_n") / max_cluster).cast("long"))
                .cast("int"),
            )
            .drop("c_n")
        )
        group_cols = ["cluster", "cell"]
    dropped = (
        v.groupBy(*group_cols)
        .applyInPandas(
            _semantic_drop_worker(threshold, id_col), f"{id_col} long"
        )
        .withColumn("_dropped", F.lit(True))
    )
    return (
        v.select(id_col, "cluster")
        .join(dropped, id_col, "left")
        .select(
            id_col, "cluster", F.col("_dropped").isNull().alias("keep")
        )
    )


def semantic_contamination_flags(
    embeddings: DataFrame,
    probe_mod: int = 20,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic benchmark decontamination — the embedding-space twin
    of the n-gram ``contamination_flags``: every ``probe_mod``-th
    vector plays a held-out benchmark embedding; each remaining corpus
    vector reports its max cosine to ANY probe and is flagged when it
    reaches ``threshold`` (paraphrased contamination that exact n-gram
    overlap misses).

    Returns (vec_id, max_probe_cosine, contaminated) for every
    NON-probe vector — including when the probe set is EMPTY
    (max_probe_cosine NULL, contaminated false), so a caller joining
    the flags back never silently drops the corpus.

    Scale shape: identical to the brute ANN scorer — the probe set
    broadcasts (a benchmark is small by definition), the corpus
    streams through once with a JVM fold per pair, the per-vector max
    collapses map-side. No corpus shuffle; for benchmark sets too big
    to broadcast, the LSH bucket route (``ann_topk_lsh``) is the
    probe-side prefilter.
    """
    from aggregator_spark.operators.util import scatter

    base = _with_vec_norm(embeddings, id_col, vec_col)
    is_probe = F.col(id_col) % probe_mod == 0
    probes = base.filter(is_probe).select(
        F.col("vec").alias("pvec"), F.col("vnorm").alias("pnorm")
    )
    corpus = scatter(base.filter(~is_probe))
    scored = (
        corpus.join(F.broadcast(probes))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("vec"), F.col("pvec"))
                / (F.col("vnorm") * F.col("pnorm")),
                6,
            ),
        )
        .groupBy(id_col)
        .agg(F.max("cos").alias("max_probe_cosine"))
    )
    # totality: the cross join yields NOTHING when the probe set is
    # empty — re-anchor on the corpus ids so every non-probe vector
    # gets a row (NULL max -> contaminated false via coalesce)
    return (
        corpus.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            "max_probe_cosine",
            F.coalesce(
                F.col("max_probe_cosine") >= F.lit(threshold), F.lit(False)
            ).alias("contaminated"),
        )
    )


def _sqdist(a, b):
    """Sequential-fold squared L2 — deterministic accumulation order
    (the ``dot`` discipline; matches DuckDB's left-to-right list
    fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subdim(embeddings, vec_col: str, n_blocks: int) -> int:
    """Sub-vector width = dims // n_blocks, probed from one row. The
    composed PQ operators (encode + LUT + codebooks) share ONE probe
    via their ``sub`` parameter instead of each paying a driver
    head(1) job (r13, guide §1.2)."""
    dims = embeddings.select(
        F.size(_as_double(F.col(vec_col))).alias("d")
    ).head(1)
    return dims[0]["d"] // n_blocks


def pq_codebooks(
    embeddings: DataFrame,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sub: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): the
    vector splits into ``n_blocks`` contiguous sub-vectors and each
    block gets its own codebook — here label-initialized (codeword =
    per-label mean of the block's sub-vectors), the same deterministic
    no-RNG seeding as ``kmeans_assign``. Returns (block, code, cvec) —
    an O(blocks × labels × subdim) relation, ALWAYS broadcast-sized
    regardless of corpus scale."""
    if sub is None:
        sub = _subdim(embeddings, vec_col, n_blocks)
    exploded = embeddings.select(
        F.col(label_col).alias("code"),
        F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x"),
    ).withColumn("block", (F.col("dim") / F.lit(sub)).cast("int"))
    return (
        exploded.groupBy("block", "code", "dim")
        .agg(F.avg("x").alias("m"))
        .groupBy("block", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )


def pq_encode(
    embeddings: DataFrame,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    codebooks: DataFrame | None = None,
    sub: int | None = None,
) -> DataFrame:
    """PQ encoding: each vector → ``n_blocks`` codes (nearest codeword
    per block under rounded L2, ties → lowest code). Returns (vec_id,
    block, code, dist). This is the 100-TB ANN memory story: a
    D-double vector compresses to n_blocks small ints, the corpus
    scan for ADC search reads codes instead of floats.

    Scale shape: the codebook is broadcast (blocks × labels × subdim
    — bounded by construction); the corpus explodes to n_blocks rows
    per vector (constant factor) and never self-joins. Distances are
    rounded to 6 decimals BEFORE the argmin (the ``kmeans_assign``
    float-order discipline) so the winning code — and the DuckDB
    oracle comparison — is engine-independent."""
    if sub is None:
        sub = _subdim(embeddings, vec_col, n_blocks)
    if codebooks is None:
        codebooks = pq_codebooks(
            embeddings, n_blocks, id_col, vec_col, label_col, sub=sub
        )
    blocks = scatter(
        embeddings.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
        )
    ).select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.slice("vec", 1 + b * sub, sub)
                    for b in range(n_blocks)
                ]
            )
        ).alias("block", "subvec"),
    )
    scored = blocks.join(F.broadcast(codebooks), "block").withColumn(
        "dist", F.round(F.sqrt(_sqdist(F.col("subvec"), F.col("cvec"))), 6)
    )
    w = Window.partitionBy(id_col, "block").orderBy("dist", "code")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "block", "code", "dist")
    )


def _pq_lut(
    embeddings: DataFrame,
    cb: DataFrame,
    query_ids: list[int],
    n_blocks: int,
    id_col: str,
    vec_col: str,
    sub: int | None = None,
) -> DataFrame:
    """Per-query ADC lookup table: (query_id, block, code) → round-6
    squared sub-distance as decimal(30,6) — queries × blocks ×
    codewords, always broadcast-sized. Shared by ``pq_adc_topk`` (full
    ADC scan) and ``ann_topk_ivfpq`` (cell-routed ADC)."""
    dims = embeddings.select(
        F.size(_as_double(F.col(vec_col))).alias("d")
    ).head(1)
    sub = dims[0]["d"] // n_blocks
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    qblocks = queries.select(
        "query_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("qvec", 1 + b * sub, sub)
                    for b in range(n_blocks)
                ]
            )
        ).alias("block", "qsub"),
    )
    return qblocks.join(cb, "block").select(
        "query_id",
        "block",
        "code",
        F.round(_sqdist(F.col("qsub"), F.col("cvec")), 6)
        .cast("decimal(30,6)")
        .alias("d2"),
    )


def ann_topk_ivfpq(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nprobe: int = 3,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-PQ — the production ANN composition (Jégou et al. 2011,
    §IVFADC): coarse ROUTING by inverted lists + ADC scoring over PQ
    codes INSIDE the probed lists only, so a query touches
    ~nprobe/n_cells of the code table and never a raw vector. Both
    stages here are the DETERMINISTIC variants the catalog already
    oracles — cells are the label-centroid assignment
    (``kmeans_assign``: round-6 distances, ties → lowest label) and
    scoring is the ``pq_adc_topk`` decimal-summed LUT — so unlike the
    rows-only geometric-kmeans ``ann_topk_ivf``, the full composition
    is SQL-expressible and hash-checked. Returns (query_id,
    neighbor_id, adc_dist, rank), rank ≤ k, ties → lowest neighbor_id.

    Scale shape: centroids and the LUT are broadcast-sized; the cell
    assignment and code table are one-pass corpus projections (built
    offline in production); the probe join filters the code table to
    the probed cells BEFORE the LUT join, so scored work is
    nprobe/n_cells of the corpus. No stage shuffles the raw vectors.
    """
    cells = kmeans_assign(embeddings, id_col, vec_col, label_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("assigned").alias("cell"),
    )
    # routing table: per query, the nprobe nearest label centroids
    # (same centroid definition as kmeans_assign; round-6 distances,
    # ties → lowest label — the engine-neutral argmin discipline)
    cent = (
        embeddings.select(
            F.col(label_col).alias("cell"),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x"),
        )
        .groupBy("cell", "dim")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    qdist = queries.join(F.broadcast(cent)).select(
        "query_id",
        "cell",
        F.round(F.sqrt(_sqdist(F.col("qvec"), F.col("cvec"))), 6).alias(
            "qcdist"
        ),
    )
    wprobe = Window.partitionBy("query_id").orderBy("qcdist", "cell")
    probes = (
        qdist.withColumn("__rn", F.row_number().over(wprobe))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )

    sub = _subdim(embeddings, vec_col, n_blocks)
    cb = pq_codebooks(
        embeddings, n_blocks, id_col, vec_col, label_col, sub=sub
    )
    codes = pq_encode(
        embeddings, n_blocks, id_col, vec_col, label_col, codebooks=cb,
        sub=sub,
    ).select(F.col(id_col).alias("neighbor_id"), "block", "code")
    lut = _pq_lut(
        embeddings, cb, query_ids, n_blocks, id_col, vec_col, sub=sub
    )

    routed = scatter(codes.join(cells, "neighbor_id")).join(
        F.broadcast(probes), "cell"
    )
    scored = (
        routed.join(F.broadcast(lut), ["query_id", "block", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.round(F.sqrt(F.sum("d2").cast("double")), 6).alias(
                "adc_dist"
            )
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ codes: per query,
    a lookup table of (block, code) → squared sub-distance to the
    RAW query sub-vector, then every corpus vector's approximate
    distance is the sum of n_blocks LUT entries — the corpus is
    touched only through its CODES. Returns (query_id, neighbor_id,
    adc_dist, rank), ties → lowest neighbor_id.

    Scale shape: the LUT is queries × blocks × codewords (broadcast);
    the code table joins it on (block, code) — an equi join, never a
    raw-vector product — and the per-(query, vec) sum runs as a
    map-side-combining aggregate. Per-block squared distances round
    to 6 decimals and SUM as decimal(30,6) (the repo's float-sum
    discipline) so the block-order of the aggregation — and the
    DuckDB oracle — cannot perturb the ranking."""
    sub = _subdim(embeddings, vec_col, n_blocks)
    cb = pq_codebooks(
        embeddings, n_blocks, id_col, vec_col, label_col, sub=sub
    )
    codes = pq_encode(
        embeddings, n_blocks, id_col, vec_col, label_col, codebooks=cb,
        sub=sub,
    )
    lut = _pq_lut(
        embeddings, cb, query_ids, n_blocks, id_col, vec_col, sub=sub
    )
    scored = (
        scatter(codes.select(F.col(id_col).alias("neighbor_id"), "block", "code"))
        .join(F.broadcast(lut), ["block", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.round(F.sqrt(F.sum("d2").cast("double")), 6).alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
