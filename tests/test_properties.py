"""Property-based tests (hypothesis): the distributed implementations
must equal straightforward single-process reference computations on
arbitrary small inputs — catching edge cases fixed datasets miss
(empty groups, ties, singletons, all-duplicates)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st

from aggregator_spark.operators.asof import asof_join
from aggregator_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from aggregator_spark.operators.skew import salted_group_count

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from aggregator_spark.session import get_spark

        _spark = get_spark(app_name="property-tests", shuffle_partitions=4)
    return _spark


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 5)),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_salted_count_equals_direct(rows):
    spark = _get_spark()
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        r["k"]: r["cnt"]
        for r in salted_group_count(df, ["k"], salt_col="v", buckets=4).collect()
    }
    want: dict[str, int] = {}
    for k, _ in rows:
        want[k] = want.get(k, 0) + 1
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_components_equal_union_find(edges):
    spark = _get_spark()
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # normalize: min node per root
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    want = {n: min(ms) for r, ms in members.items() for n in ms}
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_star_components_equal_union_find(edges):
    spark = _get_spark()
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(df, driver_max_edges=0).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    want = {n: min(ms) for _, ms in members.items() for n in ms}
    assert got == want


def test_star_components_deep_chain():
    """A 200-hop path — the propagation variant's worst case (one
    shuffle round per hop, capped at max_iterations). The star variant
    must resolve it fully within its default round budget."""
    spark = _get_spark()
    chain = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    rows = connected_components_star(df, driver_max_edges=0).collect()
    assert len(rows) == 201
    assert all(r["component"] == 0 for r in rows)


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=0,
        max_size=12,
    ),
)
@SET
def test_asof_join_equals_reference(lefts, rights):
    spark = _get_spark()
    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    # right side must be unique per (key, time) — dedup keeping max id
    rmap: dict[tuple[int, int], int] = {}
    for i, (k, m) in enumerate(rights):
        rmap[(k, m)] = max(rmap.get((k, m), -1), 1000 + i)
    rrows = [(k, ts(m), rid) for (k, m), rid in rmap.items()]

    lrows = [(k, ts(m), i) for i, (k, m) in enumerate(lefts)]
    left = spark.createDataFrame(
        lrows, "k long, lt timestamp, lid long"
    )
    right = spark.createDataFrame(
        rrows, "k long, rt timestamp, rid long"
    ) if rrows else spark.createDataFrame([], "k long, rt timestamp, rid long")

    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["rid", "rt"],
    ).collect()
    got = {r["lid"]: r["asof_rid"] for r in out}

    want = {}
    for k, m, lid in [(k, m, i) for i, (k, m) in enumerate(lefts)]:
        best = None
        for (rk, rm), rid in rmap.items():
            if rk == k and rm <= m and (best is None or rm > best[0]):
                best = (rm, rid)
        want[lid] = best[1] if best else None
    assert got == want


@given(
    base=st.dictionaries(
        st.integers(0, 9), st.sampled_from(["a", "b", "c"]), max_size=8
    ),
    updates=st.lists(
        st.dictionaries(
            st.integers(0, 9),
            st.sampled_from(["x", "y", "z"]),
            max_size=5,
        ),
        max_size=3,
    ),
)
@SET
def test_versioned_merge_equals_dict_semantics(tmp_path_factory, base, updates):
    """A chain of MERGEs must equal plain dict.update() semantics —
    last writer wins per key, nothing lost, nothing invented."""
    from aggregator_spark.sources.versioned_table import (
        merge_upsert,
        read_table,
        write_version,
    )

    spark = _get_spark()
    root = str(tmp_path_factory.mktemp("vt") / "t")
    expected = dict(base)
    write_version(
        spark.createDataFrame(
            list(base.items()) or [(None, None)], "id int, val string"
        ).filter("id IS NOT NULL"),
        root,
    )
    for up in updates:
        expected.update(up)
        src = spark.createDataFrame(
            list(up.items()) or [(None, None)], "id int, val string"
        ).filter("id IS NOT NULL")
        merge_upsert(spark, root, src, keys=["id"])
    got = {
        r["id"]: r["val"] for r in read_table(spark, root).collect()
    }
    assert got == expected


@given(
    stream=st.lists(
        st.lists(st.sampled_from("abcdefghij"), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    ),
    k_mg=st.integers(2, 6),
)
@SET
def test_mg_merge_bounds(stream, k_mg):
    """Pure-Python Misra-Gries invariants under arbitrary batch splits:
    summary size <= k_mg; stored <= true; under-estimate <= n/(k_mg+1);
    every item with true count > n/(k_mg+1) survives. (No Spark — this
    is the kernel both the batch candidate pass and the streaming state
    update run.)"""
    from collections import Counter

    from aggregator_spark.operators.heavy_hitters import mg_merge

    counters = {}
    truth = Counter()
    n = 0
    for batch in stream:
        truth.update(batch)
        n += len(batch)
        counters = mg_merge(counters, dict(Counter(batch)), k_mg)

    assert len(counters) <= k_mg
    bound = n // (k_mg + 1)
    for item, est in counters.items():
        assert est <= truth[item]
        assert truth[item] - est <= bound
    for item, true_cnt in truth.items():
        if true_cnt > bound:
            assert item in counters, (item, true_cnt, bound, dict(counters))


@given(
    masses=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    num=st.integers(1, 20),
    den=st.integers(20, 40),
)
@SET
def test_waterfill_invariants(masses, num, den):
    """Water-filling invariants on arbitrary strata: allocations sum
    EXACTLY to the budget (or to the total when the budget covers
    everything), never exceed a stratum's mass, and any stratum at or
    under the water level keeps everything."""
    from aggregator_spark.operators.corpus import token_budget_waterfill

    frac = min(num / den, 1.0)
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * m), f"s{i:02d}") for i, m in enumerate(masses)],
        "doc_id long, text string, source string",
    )
    rows = token_budget_waterfill(docs, budget_frac=frac).collect()
    total = sum(masses)
    budget = int(total * frac)  # floor, matching the operator
    allocs = {r["stratum"]: r["allocated_tokens"] for r in rows}
    mass_by = {f"s{i:02d}": m for i, m in enumerate(masses)}
    assert len(allocs) == len(masses)
    assert all(0 <= allocs[s] <= mass_by[s] for s in allocs)
    assert sum(allocs.values()) == min(budget, total)
    # strata the level does not clip keep everything
    level = max(
        (mass_by[s] for s in allocs if allocs[s] < mass_by[s]),
        default=None,
    )
    if level is not None:
        kept_whole = [s for s in allocs if mass_by[s] < min(
            allocs[t] for t in allocs if allocs[t] < mass_by[t]
        )]
        for s in kept_whole:
            assert allocs[s] == mass_by[s]


@given(
    sigs=st.lists(st.integers(0, 2**64 - 1), min_size=2, max_size=40),
    flips=st.lists(st.integers(0, 63), min_size=0, max_size=3),
)
@settings(max_examples=60, deadline=None)
def test_simhash_banding_pigeonhole_exact(sigs, flips):
    """The 6-choose-3 block-combination banding used by
    ``simhash_near_dup`` (r10 — Manku §3; replaced the r9 4x16 single
    blocks whose 2^16 buckets saturate at crawl scale) is
    candidate-EXACT for Hamming <= 3 on ARBITRARY signatures: <= 3
    differing bits touch at most 3 of the 6 blocks, so some
    combination of 3 blocks is entirely clean and its table key
    matches. Pure-Python model over the SAME block bounds the operator
    computes — no Spark; the Spark-level twin is
    test_llm_ops.test_simhash_near_dup_equals_bruteforce."""
    from itertools import combinations

    from aggregator_spark.operators.dedup import (
        SIMHASH_BLOCKS,
        SIMHASH_MAX_HAMMING,
        _block_bounds,
    )

    # plant a guaranteed near pair: sigs[1] = sigs[0] with <=3 flips
    planted = sigs[0]
    for b in set(flips):
        planted ^= 1 << b
    sigs = [planted] + sigs

    bounds = _block_bounds(SIMHASH_BLOCKS)
    k = SIMHASH_BLOCKS - SIMHASH_MAX_HAMMING
    combos = list(combinations(range(SIMHASH_BLOCKS), k))

    def keys(v):
        s = format(v, "064b")  # stand-in for the 64-char simhash string
        blocks = [s[start - 1: start - 1 + w] for (start, w) in bounds]
        return {
            (ci, "".join(blocks[i] for i in combo))
            for ci, combo in enumerate(combos)
        }

    def hamming(a, b):
        return bin(a ^ b).count("1")

    n = len(sigs)
    true_pairs = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if hamming(sigs[i], sigs[j]) <= SIMHASH_MAX_HAMMING
    }
    candidates = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if keys(sigs[i]) & keys(sigs[j])
    }
    assert true_pairs <= candidates
