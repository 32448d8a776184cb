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


# dict-valued fields that belong to the PAYLOAD itself, not named
# sections — everything else dict-valued is a section to preserve
_PAYLOAD_DICT_FIELDS = ("queries", "run_conditions", "shuffle")


def merge_detail(old: dict, detail: dict, section: str) -> dict:
    """Merge rules for BENCH_DETAIL.json (unit-tested without Spark —
    tests/test_bench_merge.py): a sectioned run (SPARK_GRAFT_DETAIL_KEY,
    e.g. the sf1/sf10 scaling points) stores its payload under
    old[section] and preserves everything else; a main run replaces the
    top-level payload but carries over EVERY existing named section
    (any dict-valued key that is not one of the payload's own dict
    fields) so a full run never erases the scaling curve or the
    round-history sections. (r13: the old rule kept only ``sf*``
    sections, which silently dropped r12_main_payload/r13_* on every
    main run — both optimization sessions had to hand-restore them.)"""
    if section:
        out = dict(old)
        out[section] = detail
        return out
    out = dict(detail)
    for k, v in old.items():
        if (
            isinstance(v, dict)
            and k not in _PAYLOAD_DICT_FIELDS
            and k not in out
        ):
            out[k] = v
    return out


def degraded_regime_section(run_conditions: dict, old: dict,
                            force: bool) -> str | None:
    """Clean-regime payload-of-record guard (VERDICT r9 item 3,
    unit-tested in tests/test_bench_merge.py): a full run measured in a
    degraded machine regime (slower_than_prior_run / contended) must
    not replace a CLEAN main payload — returns the side section to
    store it under instead, or None to write the main payload."""
    if force:
        return None
    degraded = bool(run_conditions.get("slower_than_prior_run")
                    or run_conditions.get("contended"))
    old_rc = old.get("run_conditions") or {}
    old_clean = bool(old.get("queries")) and not (
        old_rc.get("slower_than_prior_run") or old_rc.get("contended")
    )
    if degraded and old_clean:
        return "slow_regime_last"
    return None


class ShuffleProbe:
    """Per-key shuffle byte meter over the Spark status REST API:
    after each bench key, sum shuffle read/write of the stage attempts
    COMPLETED since the previous probe (stage ids are monotonic; only
    terminal-status attempts are marked seen, so a stage finishing
    late is picked up by the next delta). Degrades to zeros if the UI
    is unreachable — metrics must never fail the timing run."""

    _DONE = {"COMPLETE", "FAILED", "SKIPPED"}

    def __init__(self, spark) -> None:
        sc = spark.sparkContext
        self.base = sc.uiWebUrl
        self.app = sc.applicationId
        self.seen: set[tuple[int, int]] = set()

    def _stages(self) -> list[dict]:
        if not self.base:
            return []
        import urllib.request

        url = f"{self.base}/api/v1/applications/{self.app}/stages"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                return json.load(r)
        except Exception:
            return []

    def _quiesce(self, timeout_s: float = 5.0) -> None:
        """Bounded wait until no stage attempt is ACTIVE/PENDING, so a
        straggler or speculative attempt finishing late cannot land in
        the NEXT key's delta (ADVICE r8: completion-order attribution).
        `.save()` is synchronous, so this is normally one no-op poll."""
        if not self.base:
            return
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if not any(
                s.get("status") in ("ACTIVE", "PENDING")
                for s in self._stages()
            ):
                return
            time.sleep(0.05)

    def delta_mb(self) -> tuple[float, float]:
        """(shuffle_write_mb, shuffle_read_mb) of newly-finished
        stages."""
        self._quiesce()
        w = r = 0
        for s in self._stages():
            if s.get("status") not in self._DONE:
                continue
            key = (s.get("stageId", -1), s.get("attemptId", 0))
            if key in self.seen:
                continue
            self.seen.add(key)
            w += s.get("shuffleWriteBytes", 0) or 0
            r += s.get("shuffleReadBytes", 0) or 0
        return round(w / 1e6, 2), round(r / 1e6, 2)


def _canary_queries():
    """Three fixed shapes covering the bench's cost classes — JVM
    scan+agg, shuffle-heavy distinct+agg, Arrow mapInPandas — run at
    the START and END of the bench to make the run self-defending
    against machine contention (r7→r8 comparisons were eaten twice by
    uniform drift). Deliberately NOT catalog keys: running them must
    not warm any timed query's shape."""
    import pandas as pd
    from pyspark.sql import functions as F

    from aggregator_spark.schemas import load_testdata

    def scan_agg(spark, sf_dir):
        ev = load_testdata(spark, sf_dir, "events")
        return ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.avg("value").alias("v")
        )

    def shuffle_distinct(spark, sf_dir):
        ev = load_testdata(spark, sf_dir, "events")
        return (
            ev.select("user_id", "event_type")
            .distinct()
            .groupBy("user_id")
            .count()
        )

    def arrow_pass(spark, sf_dir):
        docs = load_testdata(spark, sf_dir, "documents")

        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame({"n": pdf["text"].str.len()})

        return docs.select("text").mapInPandas(gen, "n bigint")

    return {
        "canary_scan_agg": scan_agg,
        "canary_shuffle": shuffle_distinct,
        "canary_arrow": arrow_pass,
    }


def _time_canaries(spark, sf_dir, passes: int = 3) -> dict[str, float]:
    """Convergent best-of per canary. History: the single-pass form
    flagged the r9 shakedown run 'contended' on pure JIT tiering (one
    untimed pass doesn't finish C2 compilation); then min-of-3 STILL
    stamped two clean r9 full runs contended in the fast direction
    (start canaries ~25% slower than end — the JIT/page-cache ramp
    outlasts 3 passes on 0.15 s shapes). Now each canary keeps
    passing until the running best stops improving by >3% for two
    consecutive passes (min ``passes``, cap 10), so both measurement
    points sit at steady state and the ±15% verdict compares the
    MACHINE, not the ramp."""
    out: dict[str, float] = {}
    for name, fn in _canary_queries().items():
        best = float("inf")
        stale = 0
        n = 0
        while n < passes or (stale < 2 and n < 10):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            stale = stale + 1 if dt > best * 0.97 else 0
            best = min(best, dt)
            n += 1
        out[name] = round(best, 3)
    return out


def _run_conditions() -> dict:
    """One-sample snapshot of machine load: loadavg triple + comm names
    of currently-RUNNING processes (competing CPU consumers)."""
    cond: dict = {}
    try:
        cond["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    try:
        me = os.getpid()
        running = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    if f.read().split()[2] != "R":
                        continue
                with open(f"/proc/{pid}/comm") as f:
                    running.append(f.read().strip())
            except OSError:
                continue
        cond["running_procs"] = sorted(running)
    except OSError:
        pass
    return cond


def canary_verdict(
    start: dict,
    end: dict,
    thresh: float = 1.15,
    fast_thresh: float = 0.55,
    exclude: tuple = ("canary_arrow",),
):
    """(per-key end/start ratios, contended?) — ASYMMETRIC: contended
    iff any canary's end run is >``thresh`` SLOWER than its start run
    (load arrived mid-run — the signature that matters for trusting
    the timings), or faster than ``fast_thresh`` (load that was there
    at the start drained mid-run). The slow and fast bounds differ
    because a clean 170-query run systematically lands its end
    canaries 10–33% FASTER than its start ones: the canary-specific
    shapes converge (min-until-stable warm-up) but the SHARED JVM
    infrastructure — parquet reader, hash-agg, Arrow codecs — keeps
    collecting C2 profile wins across the whole run, a drift four r9
    clean-machine runs reproduced (ratios 0.67–0.93). Symmetric ±15%
    stamped every clean full run "contended" and would have
    discredited the mechanism; the fast bound sits at 0.55, under the
    observed clean span but above the drained-contention signature
    (jit_drift × 1/contention ≈ 0.8 × ≤0.6 for the ≥1.3× drifts that
    matter). The cross-RUN end-canary comparison in main() covers the
    uniform-drift class within-run deltas can't see.

    ``exclude`` names canaries RECORDED in the ratios but left out of
    the verdict: canary_arrow is bimodal across clean runs (end
    best-of ~0.22 vs ~0.33 s — Python worker-pool reuse vs respawn,
    pool state rather than machine load) and stamped two of four
    clean-machine r9 runs; the two JVM canaries alone gave the
    correct verdict on all four (including catching the one genuinely
    loaded run at shuffle ratio 1.21). Pure function (unit-tested in
    tests/test_bench_merge.py).
    """
    ratios = {
        k: round(end[k] / start[k], 3)
        for k in start
        if k in end and start[k] > 0
    }
    judged = [v for k, v in ratios.items() if k not in exclude]
    worst_slow = max(judged, default=1.0)
    worst_fast = min(judged, default=1.0)
    return ratios, worst_slow > thresh or worst_fast < fast_thresh


def bulk_env_ratio(
    prior_queries: dict, timings: dict, min_shared: int = 50
) -> float | None:
    """MEDIAN per-key ratio of this run's timings vs the prior clean
    payload's — the bulk-degradation estimator behind ``value_norm_bulk``
    (r13, VERDICT r12 what's-wrong #2): the canary-only ``env_ratio``
    overcorrected ~9% on the r12 capture because the tiny canary shapes
    (like all sub-second keys) degrade MORE than the bulk under mild
    contention — validated on that capture, the cheap keys read
    1.12–1.38× while the 214-key geomean was 1.033 and the true total
    ratio 1.027. The per-key MEDIAN over the whole shared catalog reads
    1.037 there (value estimate within ~1% of the actual clean total vs
    9% for the canary geomean), and the median is robust to the
    minority of keys a round's code changes legitimately move. Returns
    None when fewer than ``min_shared`` keys are shared (a restricted
    probe or a first run — too few for a regime read). Pure function
    (unit-tested in tests/test_bench_merge.py)."""
    import statistics

    shared = [
        timings[k] / prior_queries[k]
        for k in timings
        if prior_queries.get(k, 0) > 0 and timings[k] > 0
    ]
    if len(shared) < min_shared:
        return None
    return round(statistics.median(shared), 3)


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

    # UI on for the status REST API only (shuffle byte metering)
    spark = get_spark(
        app_name="aggregator-spark-bench",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe = ShuffleProbe(spark)

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

    # SPARK_GRAFT_KEYS: comma list restricting the run to named keys —
    # resolved early because canaries only run on full sweeps (isolated
    # re-measures must not pay or pollute the canary cost), and the
    # warm pass below must warm only the keys it will time (r12: a
    # restricted WARM run at sf10 used to warm the WHOLE catalog —
    # hours of untimed work for a two-key probe)
    only_env = os.environ.get("SPARK_GRAFT_KEYS", "").strip()
    only = {k.strip() for k in only_env.split(",") if k.strip()} or None

    # SPARK_GRAFT_WARM=1: steady-state mode — run every (selected)
    # query once untimed (pays per-shape codegen/JIT), then time the
    # second pass. Default off: the driver's recorded number is the
    # one-shot cost.
    if os.environ.get("SPARK_GRAFT_WARM") == "1":
        for name in sorted(qs):
            if only is None or name in only:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

    # contention canaries (start point): one untimed pass first so both
    # canary points are warm — otherwise end/start conflates codegen
    # warm-up speedup with contention relief
    canary_start: dict[str, float] = {}
    cond_start: dict = {}
    if only is None:
        _time_canaries(spark, sf_dir)
        canary_start = _time_canaries(spark, sf_dir)
        cond_start = _run_conditions()
        print(f"# canary_start: {canary_start}", file=sys.stderr)

    timings: dict[str, float] = {}
    shuffle: dict[str, list[float]] = {}  # key -> [write_mb, read_mb]
    total = 0.0
    probe.delta_mb()  # drain warmup stages so key deltas start clean

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
    from aggregator_spark.sources.prepared_index import (
        cached_survivor_buckets,
        prepared_cache_dir,
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
        # AFTER the bucket-index build: the prepared-corpus index READS
        # the persisted bucket table (its design), so its cold timing
        # must not re-pay the signing cost the previous key just timed
        ("corpus_prepared_index_build", prepared_cache_dir,
         cached_survivor_buckets),
        ("bm25_index_build", bm25_cache_dir, cached_bm25_postings),
        ("bpe_dict_build", bpe_cache_dir, cached_bpe_merges),
    ]

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
        shuffle[key] = list(probe.delta_mb())
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
            shuffle["dedup_batch_sign"] = list(probe.delta_mb())
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
            shuffle["dedup_incremental_serve"] = list(probe.delta_mb())
            total += dt
            print(f"# dedup_incremental_serve: {dt:.3f}s", file=sys.stderr)

    # streaming media store build split (r13, the *_index_build
    # precedent): `media_store_build` = the one-off land+drain+compact
    # of the container stream (every decode the store will ever pay);
    # the `served_media_near_dup` catalog key below then times the
    # steady-state decode-free serve off the warm store.
    if wanted("media_store_build"):
        from aggregator_spark.sources.media_store import (
            cached_media_store,
            media_store_cache_dir,
        )

        shutil.rmtree(media_store_cache_dir(sf_dir), ignore_errors=True)
        t0 = time.perf_counter()
        cached_media_store(spark, sf_dir)
        dt = time.perf_counter() - t0
        timings["media_store_build"] = round(dt, 3)
        shuffle["media_store_build"] = list(probe.delta_mb())
        total += dt
        print(f"# media_store_build: {dt:.3f}s", file=sys.stderr)

    for name in sorted(k for k in qs if wanted(k)):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        shuffle[name] = list(probe.delta_mb())
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    # mechanical shuffle-budget gate (VERDICT r7 item 4): compare the
    # sf0.1 run's measured shuffle writes against the per-key caps —
    # a plan regression fails HERE, not as wall-clock drift two rounds
    # later. Violations always recorded; SPARK_GRAFT_ENFORCE_SHUFFLE=1
    # turns them into a hard bench failure.
    from aggregator_spark.plans.shuffle_budgets import check_budgets

    shuffle_w = {k: v[0] for k, v in shuffle.items()}
    violations = check_budgets(shuffle_w, sf)
    for v in violations:
        print(f"# SHUFFLE BUDGET VIOLATION: {v}", file=sys.stderr)

    # contention canaries (end point): if the same three shapes now run
    # >15% differently than at the start, the whole run's wall-clock
    # numbers are suspect — stamp it so round-over-round comparisons
    # can filter instead of chasing phantom regressions
    run_conditions: dict = {}
    contended = False
    if canary_start:
        canary_end = _time_canaries(spark, sf_dir)
        ratios, contended = canary_verdict(canary_start, canary_end)
        run_conditions = {
            "canary_start": canary_start,
            "canary_end": canary_end,
            "canary_ratio_end_over_start": ratios,
            "contended": contended,
            "conditions_start": cond_start,
            "conditions_end": _run_conditions(),
        }
        print(f"# canary_end: {canary_end} contended={contended}",
              file=sys.stderr)

    detail = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "shuffle": shuffle,
        "shuffle_violations": violations,
        "run_conditions": run_conditions,
        "sf": sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    # SPARK_GRAFT_DETAIL_KEY: store this run under a named section of
    # BENCH_DETAIL.json (e.g. "sf1") instead of replacing the main
    # payload; the main-run path below preserves any such sections so
    # the driver's per-round run doesn't erase the scaling point.
    section = os.environ.get("SPARK_GRAFT_DETAIL_KEY", "").strip()
    if only is not None and not section:
        # a restricted run must never replace the payload of record
        # (the recorded r9 trap: a few-key probe erased the full key
        # map); auto-section it instead
        section = "probe_restricted"
        print("# restricted run auto-sectioned under 'probe_restricted'",
              file=sys.stderr)
    old: dict = {}
    try:
        with open(detail_path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        pass
    # Cross-RUN canary comparison (the round-over-round question the
    # within-run delta can't answer): END canaries are at JIT steady
    # state in every full run, so new-end/prior-end on the same box is
    # a clean environment ratio. >1.3× slower than the previously
    # recorded run stamps the run suspect — the r7/r8 "uniform drift"
    # class would have been flagged here mechanically.
    prior_end = (old.get("run_conditions") or {}).get("canary_end")
    if run_conditions.get("canary_end") and prior_end:
        vs_prior = {
            k: round(run_conditions["canary_end"][k] / prior_end[k], 3)
            for k in prior_end
            if k in run_conditions["canary_end"] and prior_end[k] > 0
        }
        run_conditions["canary_end_vs_prior_run"] = vs_prior
        if any(v > 1.3 for k, v in vs_prior.items()
               if k != "canary_arrow"):
            run_conditions["slower_than_prior_run"] = True
            print(f"# canary END slower than prior recorded run: "
                  f"{vs_prior}", file=sys.stderr)
    # clean-regime payload-of-record guard (VERDICT r9 item 3): a full
    # run measured in a degraded machine regime must not replace a
    # CLEAN main payload — the r9 headline overstated the catalog ~25%
    # exactly this way. The slow run is preserved under its own section
    # for comparison; SPARK_GRAFT_FORCE_DETAIL=1 to overrule (e.g.
    # after a real code-level slowdown was confirmed by isolated
    # re-measures).
    if not section:
        side = degraded_regime_section(
            run_conditions, old,
            os.environ.get("SPARK_GRAFT_FORCE_DETAIL") == "1",
        )
        if side:
            section = side
            print("# degraded-regime run NOT replacing the clean payload "
                  f"of record; stored under '{side}' "
                  "(SPARK_GRAFT_FORCE_DETAIL=1 to overrule)",
                  file=sys.stderr)
    with open(detail_path, "w") as f:
        json.dump(merge_detail(old, detail, section), f, indent=1,
                  sort_keys=True)
    print(json.dumps(timings), file=sys.stderr)

    summary_d = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
    }
    if violations:
        summary_d["shuffle_viol"] = len(violations)
    if contended:
        summary_d["contended"] = True
    # canary-normalized headline (VERDICT r11 item 6): the driver's
    # recorded number was a slow-regime capture two rounds running even
    # though the payload-of-record guard parked those runs aside. The
    # END canaries are at JIT steady state in every full run, so
    # new-end/prior-clean-end is a pure environment ratio; dividing the
    # total by its geomean estimates the clean-regime total WITHOUT
    # re-running the sweep. Only emitted when the regime is actually
    # degraded (>5%), and never inflates a fast run.
    vs_prior = run_conditions.get("canary_end_vs_prior_run") or {}
    env_vals = [v for k, v in vs_prior.items()
                if k != "canary_arrow" and v > 0]
    if env_vals:
        import math

        env_ratio = math.exp(
            sum(math.log(v) for v in env_vals) / len(env_vals)
        )
        if env_ratio > 1.05:
            summary_d["env_ratio"] = round(env_ratio, 3)
            summary_d["value_norm"] = round(total / env_ratio, 3)
            # r13 (VERDICT r12 what's-wrong #2): the better clean-total
            # estimate — median per-key ratio vs the prior clean
            # payload (see bulk_env_ratio). Old fields kept unchanged;
            # prefer value_norm_bulk when both are present.
            bulk = bulk_env_ratio(old.get("queries") or {}, timings)
            if bulk and bulk > 1.0:
                summary_d["env_ratio_bulk"] = bulk
                summary_d["value_norm_bulk"] = round(total / bulk, 3)
    summary = json.dumps(summary_d)
    assert len(summary) <= 250, summary
    print(summary)
    spark.stop()
    # enforcement ON by default since r9 (budgets re-derived from the
    # union of local + driver r8 measurements); export =0 to disable
    if violations and os.environ.get(
        "SPARK_GRAFT_ENFORCE_SHUFFLE", "1"
    ) == "1":
        raise SystemExit(f"shuffle budget violations: {violations}")


if __name__ == "__main__":
    main()
