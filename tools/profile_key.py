"""Per-key stage profiler (guide §1: measure first, §7.1: UI metrics).

Runs the named catalog keys exactly the way bench.py does (noop sink,
warm parquet footers) with the Spark UI's status REST API on, and dumps
per-STAGE wall/exec metrics for every job the key ran: where the
seconds go — scan, exchange, Python eval, checkpoint round-trips.

Usage:
    python tools/profile_key.py corpus_prepare_e2e [more_keys...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Output (stderr): per key, one line per stage with
  wall_s  executorRunTime_s  tasks  input_MB  shW_MB  shR_MB  name
plus the Python-worker time when the stage ran Arrow/Python evals.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    for attempt in range(5):
        try:
            with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
                return json.load(r)
        except Exception:
            if attempt == 4:
                raise
            time.sleep(1.0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: profile_key.py KEY [KEY...]")

    import tempfile

    from aggregator_spark.sources.stamped_cache import CACHE_ROOT_ENV

    os.environ.setdefault(
        CACHE_ROOT_ENV,
        os.path.join(tempfile.gettempdir(), "aggregator_spark_bench_cache"),
    )

    from aggregator_spark.session import get_spark

    spark = get_spark(
        app_name="aggregator-spark-profile",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    from aggregator_spark.schemas import TESTDATA_TABLES, load_testdata

    for t in TESTDATA_TABLES:
        load_testdata(spark, sf_dir, t).count()
    load_testdata(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()

    for key in keys:
        seen = {
            (s["stageId"], s["attemptId"])
            for s in _get(base, f"/api/v1/applications/{app}/stages")
        }
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        stages = _get(base, f"/api/v1/applications/{app}/stages")
        new = [
            s for s in stages if (s["stageId"], s["attemptId"]) not in seen
        ]
        new.sort(key=lambda s: s["stageId"])
        print(f"\n=== {key}: wall {wall:.3f}s  ({len(new)} stages) ===",
              file=sys.stderr)
        tot_exec = tot_py = 0.0
        for s in new:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            comp = s.get("completionTime")
            stage_wall = ""
            if sub and comp:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    dt = (datetime.strptime(comp, fmt)
                          - datetime.strptime(sub, fmt)).total_seconds()
                    stage_wall = f"{dt:7.3f}"
                except ValueError:
                    stage_wall = "      ?"
            run_s = (s.get("executorRunTime") or 0) / 1e3
            tot_exec += run_s
            name = (s.get("name") or "").split("\n")[0][:90]
            print(
                f"  id={s['stageId']:4d} wall={stage_wall or '      ?'}"
                f" exec={run_s:8.3f}s tasks={s.get('numCompleteTasks', 0):3d}"
                f" in={(s.get('inputBytes') or 0) / 1e6:7.1f}MB"
                f" shW={(s.get('shuffleWriteBytes') or 0) / 1e6:6.2f}"
                f" shR={(s.get('shuffleReadBytes') or 0) / 1e6:6.2f}"
                f"  {name}",
                file=sys.stderr,
            )
        print(f"  TOTAL executorRunTime {tot_exec:.2f}s across "
              f"{len(new)} stages (wall {wall:.3f}s)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
