"""bench.py's BENCH_DETAIL.json merge rules — pure unit tests (no
Spark): the driver's per-round main run must never erase the sf1/sf10
scaling sections, and a sectioned run must never clobber the main
payload."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import canary_verdict, merge_detail

MAIN_OLD = {
    "metric": "bench_total_sec",
    "value": 100.0,
    "sf": 0.1,
    "queries": {"a": 1.0},
    "sf1": {"value": 10.0, "queries": {"a": 2.0}, "sf": 1.0},
    "sf10": {"value": 20.0, "queries": {"a": 4.0}, "sf": 10.0},
}
NEW_MAIN = {
    "metric": "bench_total_sec",
    "value": 90.0,
    "sf": 0.1,
    "queries": {"a": 0.9, "b": 0.5},
}


def test_main_run_replaces_payload_but_keeps_sections():
    old = dict(MAIN_OLD)
    # r13: non-sf named sections (round history, parked runs) must
    # survive a main run too — the sf*-only rule silently dropped
    # r12_main_payload/r13_* on every main run
    old["r12_main_payload"] = {"value": 120.0, "queries": {"a": 1.2}}
    old["slow_regime_last"] = {"value": 150.0, "queries": {"a": 1.5}}
    out = merge_detail(old, NEW_MAIN, "")
    assert out["value"] == 90.0
    assert out["queries"] == {"a": 0.9, "b": 0.5}
    assert out["sf1"] == MAIN_OLD["sf1"]
    assert out["sf10"] == MAIN_OLD["sf10"]
    assert out["r12_main_payload"] == old["r12_main_payload"]
    assert out["slow_regime_last"] == old["slow_regime_last"]
    # the payload's own dict fields come from the NEW run, never old
    assert out["queries"] != {"a": 1.0}
    # the payload's own scalar "sf" field is NOT treated as a section
    assert out["sf"] == 0.1


def test_sectioned_run_preserves_main_payload():
    new_sf1 = {"value": 9.0, "queries": {"a": 1.8}, "sf": 1.0}
    out = merge_detail(MAIN_OLD, new_sf1, "sf1")
    assert out["sf1"] == new_sf1
    assert out["sf10"] == MAIN_OLD["sf10"]
    assert out["value"] == 100.0 and out["queries"] == {"a": 1.0}


def test_first_run_with_no_prior_file():
    assert merge_detail({}, NEW_MAIN, "") == NEW_MAIN
    out = merge_detail({}, {"value": 1.0}, "sf1")
    assert out == {"sf1": {"value": 1.0}}


def test_canary_verdict_clean_run():
    start = {"a": 1.0, "b": 2.0, "c": 0.5}
    end = {"a": 1.05, "b": 1.9, "c": 0.52}
    ratios, contended = canary_verdict(start, end)
    assert not contended
    assert ratios["a"] == 1.05


def test_canary_verdict_flags_slowdown_and_speedup():
    # slowdown >15% in ANY canary flags the run
    _, contended = canary_verdict({"a": 1.0, "b": 1.0}, {"a": 1.0, "b": 1.3})
    assert contended
    # a BIG speedup (start-time load drained mid-run) flags too, but
    # the fast bound is looser than the slow one: a clean full run
    # systematically ends 10-33% faster (shared-infra JIT drift, four
    # r9 clean runs: 0.67-0.93), so 0.67 must pass while 0.5 must flag
    _, contended = canary_verdict({"a": 1.0}, {"a": 0.67})
    assert not contended
    _, contended = canary_verdict({"a": 1.0}, {"a": 0.5})
    assert contended
    # canary_arrow is recorded in the ratios but excluded from the
    # verdict (bimodal Python worker-pool state, not machine load)
    ratios, contended = canary_verdict(
        {"canary_arrow": 1.0, "a": 1.0}, {"canary_arrow": 2.0, "a": 1.0}
    )
    assert ratios["canary_arrow"] == 2.0 and not contended


def test_canary_verdict_degenerate_inputs():
    # zero/missing start keys are skipped, empty set is never contended
    ratios, contended = canary_verdict({"a": 0.0, "b": 1.0}, {"a": 5.0}, 1.15)
    assert ratios == {} and not contended


def test_degraded_regime_guard():
    """A degraded-regime full run must NOT replace a clean payload of
    record (it gets its own section); it MAY replace an already-slow
    or empty payload, and force overrules everything (VERDICT r9
    item 3)."""
    from bench import degraded_regime_section

    clean_old = {"queries": {"q": 1.0}, "run_conditions": {}}
    slow_old = {
        "queries": {"q": 1.0},
        "run_conditions": {"slower_than_prior_run": True},
    }
    slow_rc = {"slower_than_prior_run": True}
    cont_rc = {"contended": True}
    clean_rc: dict = {}

    # slow/contended run vs clean record -> side section
    assert degraded_regime_section(slow_rc, clean_old, False) == \
        "slow_regime_last"
    assert degraded_regime_section(cont_rc, clean_old, False) == \
        "slow_regime_last"
    # clean run always writes the main payload
    assert degraded_regime_section(clean_rc, clean_old, False) is None
    # a slow run may replace an already-slow record (strictly better
    # than keeping the older slow one) or an empty/missing payload
    assert degraded_regime_section(slow_rc, slow_old, False) is None
    assert degraded_regime_section(slow_rc, {}, False) is None
    # force overrules
    assert degraded_regime_section(slow_rc, clean_old, True) is None


def test_bulk_env_ratio_tracks_bulk_not_tails():
    from bench import bulk_env_ratio

    # 60 shared keys: most degrade 1.04x, a few tiny keys blow up 1.4x
    # (the r12 signature: sub-second keys are hypersensitive) and a few
    # keys got legitimately FASTER from code changes — the median must
    # read the bulk, not the tails
    prior = {f"k{i}": 1.0 for i in range(60)}
    now = {f"k{i}": 1.04 for i in range(60)}
    for i in range(5):
        now[f"k{i}"] = 1.40          # contended tiny keys
    for i in range(5, 10):
        now[f"k{i}"] = 0.60          # code-change improvements
    assert bulk_env_ratio(prior, now) == 1.04


def test_bulk_env_ratio_needs_enough_shared_keys():
    from bench import bulk_env_ratio

    prior = {f"k{i}": 1.0 for i in range(10)}
    now = {f"k{i}": 1.2 for i in range(10)}
    assert bulk_env_ratio(prior, now) is None          # < min_shared
    assert bulk_env_ratio(prior, now, min_shared=10) == 1.2
    # zero/missing prior keys are ignored, not divided by
    prior["z"] = 0.0
    now["z"] = 5.0
    assert bulk_env_ratio(prior, now, min_shared=10) == 1.2
