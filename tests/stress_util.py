"""Shared helpers for the ad-hoc stress scripts (not pytest).

``shuffle_totals``/``task_stats`` read the Spark status REST API of
THIS session: the base URL comes from ``sc.uiWebUrl`` (not a hardcoded
port 4040 — if another Spark UI already holds 4040, this app binds
4041+ and a port-guess would scrape a different app) and the app is
matched by ``sc.applicationId``.
"""

from __future__ import annotations

import json
import urllib.request


def _api_base(spark) -> str:
    sc = spark.sparkContext
    ui = sc.uiWebUrl  # e.g. http://host:4041
    if not ui:
        raise RuntimeError("Spark UI disabled; enable spark.ui.enabled")
    return f"{ui}/api/v1/applications/{sc.applicationId}"


def shuffle_totals(spark) -> tuple[int, int]:
    stages = json.load(
        urllib.request.urlopen(f"{_api_base(spark)}/stages", timeout=10)
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def max_task_duration_ms(spark, min_stage_id: int = 0) -> tuple[int, int]:
    """(max single-task duration ms, max single-stage task count) over
    completed stages with id ≥ min_stage_id — the straggler measure for
    skew experiments."""
    base = _api_base(spark)
    stages = json.load(urllib.request.urlopen(f"{base}/stages", timeout=10))
    worst_ms, worst_tasks = 0, 0
    for s in stages:
        if s.get("stageId", 0) < min_stage_id:
            continue
        if s.get("status") != "COMPLETE":
            continue
        detail = json.load(
            urllib.request.urlopen(
                f"{base}/stages/{s['stageId']}/{s.get('attemptId', 0)}"
                "?details=true",
                timeout=10,
            )
        )
        if isinstance(detail, list):
            detail = detail[0]
        tasks = (detail.get("tasks") or {}).values()
        for t in tasks:
            worst_ms = max(worst_ms, t.get("duration", 0) or 0)
        worst_tasks = max(worst_tasks, len(tasks))
    return worst_ms, worst_tasks


def last_stage_id(spark) -> int:
    stages = json.load(
        urllib.request.urlopen(f"{_api_base(spark)}/stages", timeout=10)
    )
    return max((s.get("stageId", 0) for s in stages), default=0)
