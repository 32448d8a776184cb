"""Bloom-filter runtime join reduction — prune the fact BEFORE the
shuffle with a compact membership sketch of the dim-side keys.

The 100 TB problem: a fact⋈dim join where the dim side is too large to
broadcast as a hash relation but the fact side is dominated by rows
that will never match. Spark's AQE injects bloom runtime filters for
exactly this; the operator here builds the same structure explicitly
from public primitives so the technique is visible, testable, and
tunable:

1. build (distributed): each dim key sets k bit positions
   ``pmod(xxhash64(key, seed_i), m)``; positions aggregate into
   64-bit words via ``bit_or(shiftleft(1, bit))`` — one tiny
   (m/64)-row result regardless of dim size;
2. ship: only the m-bit bitset (not the keys) is collected and
   attached to the fact scan as an array literal — m/8 bytes, e.g.
   1 KiB for m=8192, vs an arbitrarily large broadcast hash table;
3. probe (scan-side, codegen): a row survives iff ALL k bits are set —
   false positives possible, false negatives impossible;
4. the exact join afterwards removes false positives, so the composed
   result EQUALS the plain join — which is the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M_BITS = 8192
DEFAULT_K_HASHES = 3


def bloom_words_relation(
    keys: DataFrame, key_col: str,
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """The bitset as a DISTRIBUTED (w int, word long) relation —
    nonzero words only, never collected. The scale form: a 100 TB
    corpus's bloom lives here and is probed by broadcast join
    (``membership_via_join``); only the small-m fast path
    (``build_bloom_words`` → literal) ever pulls it to the driver."""
    pos = None
    for i in range(k_hashes):
        p = keys.select(
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)).alias(
                "bit"
            )
        )
        pos = p if pos is None else pos.union(p)
    return (
        pos.distinct()
        .select(
            (F.col("bit") / 64).cast("int").alias("w"),
            (F.col("bit") % 64).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word"))
    )


def build_bloom_words(
    keys: DataFrame, key_col: str,
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
) -> list[int]:
    """Distributed bitset build: returns the m_bits/64 words. Only
    this list (m/8 bytes) ever reaches the driver. For large m prefer
    ``bloom_words_relation`` + ``membership_via_join``: the py4j hop
    back into a Column literal costs ~150 µs/word (measured 151 s for
    the 1M-word bitset a 4M-key corpus needs — SCALE.md)."""
    words = {
        r["w"]: r["word"]
        for r in bloom_words_relation(
            keys, key_col, m_bits, k_hashes
        ).collect()
    }
    return [words.get(w, 0) for w in range(m_bits // 64)]


def bloom_probe(
    fact: DataFrame, key_col: str, bloom_words: list[int],
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Scan-side probe: keep rows whose key has ALL k bloom bits set.
    Pure codegen'd bit arithmetic on an array literal — no join, no
    shuffle, no Python."""
    out = fact.withColumn(
        "__bloom", F.array(*[F.lit(w).cast("long") for w in bloom_words])
    )
    cond = None
    for i in range(k_hashes):
        out = out.withColumn(
            f"__h{i}",
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)),
        )
        test = F.expr(
            f"(element_at(__bloom, CAST(__h{i} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(__h{i} % 64 AS INT))) != 0"
        )
        cond = test if cond is None else cond & test
    drop = ["__bloom"] + [f"__h{i}" for i in range(k_hashes)]
    return out.filter(cond).drop(*drop)


def membership_col(
    key: Column, bloom_words: list[int],
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
) -> Column:
    """Pure-Column bloom membership test (no filter applied): TRUE iff
    all k bits for ``key`` are set in ``bloom_words``. Lets a caller
    SPLIT on the verdict — definite-miss rows skip the exact verify
    join entirely (the ingest-dedup fast path) — instead of only
    filtering like ``bloom_probe``. Same bit math as the probe: false
    positives possible, false negatives impossible."""
    import numpy as np

    # F.lit(np.int64 array) builds ONE ArrayType(LongType) Literal —
    # the two rejected forms are both scale killers on a big bitset:
    # F.array of m/64 scalar literals re-inlines thousands of
    # expression nodes into every one of the k conditions (analysis/
    # codegen stall), and F.lit(list).cast("array<bigint>") leaves a
    # per-ROW Cast that re-allocates the whole array for every row
    # (measured 17.9 s vs 1.6 s for a 1 MB bitset × 100k rows).
    arr = F.lit(np.asarray(bloom_words, dtype=np.int64))
    # shiftleft(1L, b) needs a literal shift in the Python API; a
    # 64-entry power table keeps this a pure Column expression
    # (1<<63 wraps to long min — the sign bit mask, AND still works)
    pow2 = F.lit(np.array(_POW2, dtype=np.int64))
    cond = None
    for i in range(k_hashes):
        h = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (h / 64).cast("int") + F.lit(1))
        bit = F.element_at(pow2, (h % 64).cast("int") + F.lit(1))
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else cond & test
    return cond


_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def membership_via_join(
    df: DataFrame, key_col: str, words: DataFrame,
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
    maybe_col: str = "maybe",
) -> DataFrame:
    """Large-m bloom membership: ``df`` + a boolean ``maybe_col``,
    with the bitset probed as k BROADCAST JOINS against the
    distributed (w, word) relation instead of a Column literal — the
    bitset never reaches the driver and never bloats the plan (the
    literal path pays ~150 µs/word in py4j transfer and re-serializes
    the whole array into every task). Missing words are absent rows →
    NULL → bit unset. Row multiplicity is preserved (w is unique in
    ``words``; left joins)."""
    import numpy as np

    pow2 = F.lit(np.array(_POW2, dtype=np.int64))
    out = df
    tests = []
    for i in range(k_hashes):
        h = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        out = out.withColumn(f"__w{i}", (h / 64).cast("int")).withColumn(
            f"__b{i}", (h % 64).cast("int")
        )
        wtab = words.select(
            F.col("w").alias(f"__w{i}"), F.col("word").alias(f"__word{i}")
        )
        out = out.join(F.broadcast(wtab), f"__w{i}", "left")
        bit = F.element_at(pow2, F.col(f"__b{i}") + F.lit(1))
        tests.append(
            F.col(f"__word{i}").isNotNull()
            & (F.col(f"__word{i}").bitwiseAND(bit) != 0)
        )
    cond = tests[0]
    for t in tests[1:]:
        cond = cond & t
    drop = [c for i in range(k_hashes) for c in (f"__w{i}", f"__b{i}", f"__word{i}")]
    return out.withColumn(maybe_col, cond).drop(*drop)


def bloom_prefiltered_join(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
    m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Exact inner join with a bloom pre-filter on the fact side: the
    probe drops non-matching fact rows before any shuffle; the join
    then removes bloom false positives. Result ≡ fact ⋈ dim."""
    words = build_bloom_words(dim.select(dim_key), dim_key, m_bits, k_hashes)
    pruned = bloom_probe(fact, fact_key, words, m_bits, k_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
