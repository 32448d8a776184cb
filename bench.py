"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Stdout carries exactly ONE short JSON line (metric/value/unit/sf +
per-query count) as the LAST line, small enough to survive any capture
truncation — round 1's ~5 KB line with the inline per-query map was
truncated by the driver and recorded as unparseable. The full per-query
timing map goes to stderr and to BENCH_DETAIL.json next to this script.

Execution is forced with the noop sink (full plan runs, nothing collected
to the driver), which is what a cluster job would look like — measuring
compute + shuffle, not driver serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time


def merge_detail(old: dict, detail: dict, section: str) -> dict:
    """Merge rules for BENCH_DETAIL.json (unit-tested without Spark —
    tests/test_bench_merge.py): a sectioned run (SPARK_GRAFT_DETAIL_KEY,
    e.g. the sf1/sf10 scaling points) stores its payload under
    old[section] and preserves everything else; a main run replaces the
    top-level payload but carries over existing ``sf*`` SECTIONS (dict
    values only — the scalar ``sf`` field of the payload itself is not
    a section) so the driver's per-round run never erases the scaling
    curve."""
    if section:
        out = dict(old)
        out[section] = detail
        return out
    out = dict(detail)
    for k, v in old.items():
        if k.startswith("sf") and isinstance(v, dict):
            out[k] = v
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # bench-private cache root: the cold-ingest keys rmtree + rebuild
    # their caches, which must not race a concurrent session's lazy
    # DataFrames over the shared default root (hermetic cold timings)
    import tempfile

    from aggregator_spark.sources.stamped_cache import CACHE_ROOT_ENV

    os.environ.setdefault(
        CACHE_ROOT_ENV,
        os.path.join(tempfile.gettempdir(), "aggregator_spark_bench_cache"),
    )

    from aggregator_spark.session import get_spark

    spark = get_spark(app_name="aggregator-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm the JVM + parquet footers so per-query numbers measure the
    # query, not session startup
    from aggregator_spark.schemas import TESTDATA_TABLES, load_testdata

    for t in TESTDATA_TABLES:
        load_testdata(spark, sf_dir, t).count()
    # one throwaway noop write warms the write path + codegen pipeline
    # so the alphabetically-first timed query doesn't absorb it
    load_testdata(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()

    # SPARK_GRAFT_WARM=1: steady-state mode — run every query once
    # untimed (pays per-shape codegen/JIT), then time the second pass.
    # Default off: the driver's recorded number is the one-shot cost.
    if os.environ.get("SPARK_GRAFT_WARM") == "1":
        for name in sorted(qs):
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    total = 0.0

    # Ingest costs timed as their own keys (one-time pipeline costs —
    # folding them into the first query run misreported steady-state
    # cost; the r4 variant "3.5x regression" was exactly that). Each
    # cache dir is removed first so the recorded number is the true
    # COLD build, reproducible run-to-run, while the query that follows
    # gets the warm cache.
    import shutil

    from aggregator_spark.sources.ivf_index import (
        cached_ivf_assignment,
        ivf_cache_dir,
    )
    from aggregator_spark.sources.lsh_index import (
        cached_lsh_index,
        lsh_cache_dir,
    )
    from aggregator_spark.sources.minhash_index import (
        cached_minhash_buckets,
        minhash_cache_dir,
    )
    from aggregator_spark.sources.bm25_index import (
        bm25_cache_dir,
        cached_bm25_postings,
    )
    from aggregator_spark.sources.bpe_index import (
        bpe_cache_dir,
        cached_bpe_merges,
    )
    from aggregator_spark.sources.variant_ingest import (
        cached_events_variant,
        variant_cache_dir,
    )

    ingests = [
        ("variant_ingest", variant_cache_dir, cached_events_variant),
        ("ann_ivf_index_build", ivf_cache_dir, cached_ivf_assignment),
        ("ann_lsh_index_build", lsh_cache_dir, cached_lsh_index),
        ("dedup_bucket_index_build", minhash_cache_dir, cached_minhash_buckets),
        ("bm25_index_build", bm25_cache_dir, cached_bm25_postings),
        ("bpe_dict_build", bpe_cache_dir, cached_bpe_merges),
    ]

    # SPARK_GRAFT_KEYS: comma list restricting the run to named keys
    # (catalog, ingest, and split keys alike) — used for the sf1
    # scaling point, where only the headline families run against the
    # 10x directory built by tests/make_sf1.py
    only_env = os.environ.get("SPARK_GRAFT_KEYS", "").strip()
    only = {k.strip() for k in only_env.split(",") if k.strip()} or None

    def wanted(key: str) -> bool:
        return only is None or key in only

    ingests = [i for i in ingests if wanted(i[0])]
    for key, dir_fn, cache_fn in ingests:
        shutil.rmtree(dir_fn(sf_dir), ignore_errors=True)
        t0 = time.perf_counter()
        cache_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        timings[key] = round(dt, 3)
        total += dt
        print(f"# {key}: {dt:.3f}s", file=sys.stderr)

    # incremental-dedup accounting split (VERDICT r6 #3, the
    # *_index_build precedent): `dedup_batch_sign` = the one-time
    # signing of a landed crawl batch, materialized like a real
    # pipeline would; `dedup_incremental_serve` = the steady-state
    # serving cost (bucket join + bounded verify + component rounds)
    # reading that persisted batch table. The catalog entry
    # `dedup_incremental` below still times the self-contained form.
    from aggregator_spark.llm_queries import (
        dedup_incremental_batch_buckets,
        q_dedup_incremental_served,
    )

    if wanted("dedup_batch_sign") or wanted("dedup_incremental_serve"):
        batch_dir = os.path.join(
            os.environ[CACHE_ROOT_ENV], f"bench_batch_buckets_sf{sf}"
        )
        shutil.rmtree(batch_dir, ignore_errors=True)
        t0 = time.perf_counter()
        dedup_incremental_batch_buckets(spark, sf_dir).write.mode(
            "overwrite"
        ).parquet(batch_dir)
        dt = time.perf_counter() - t0
        if wanted("dedup_batch_sign"):
            timings["dedup_batch_sign"] = round(dt, 3)
            total += dt
        print(f"# dedup_batch_sign: {dt:.3f}s", file=sys.stderr)
        if wanted("dedup_incremental_serve"):
            batch_buckets = spark.read.parquet(batch_dir)
            t0 = time.perf_counter()
            q_dedup_incremental_served(
                spark, sf_dir, batch_buckets
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings["dedup_incremental_serve"] = round(dt, 3)
            total += dt
            print(f"# dedup_incremental_serve: {dt:.3f}s", file=sys.stderr)

    for name in sorted(k for k in qs if wanted(k)):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    detail = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    # SPARK_GRAFT_DETAIL_KEY: store this run under a named section of
    # BENCH_DETAIL.json (e.g. "sf1") instead of replacing the main
    # payload; the main-run path below preserves any such sections so
    # the driver's per-round run doesn't erase the scaling point.
    section = os.environ.get("SPARK_GRAFT_DETAIL_KEY", "").strip()
    old: dict = {}
    try:
        with open(detail_path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        pass
    with open(detail_path, "w") as f:
        json.dump(merge_detail(old, detail, section), f, indent=1,
                  sort_keys=True)
    print(json.dumps(timings), file=sys.stderr)

    summary = json.dumps(
        {
            "metric": "bench_total_sec",
            "value": round(total, 3),
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
        }
    )
    assert len(summary) <= 200, summary
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
