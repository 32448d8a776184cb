"""Per-key shuffle-WRITE budgets for the bench (VERDICT r7 item 4).

Wall-clock drifts with machine load; shuffle bytes are a property of
the PLAN. bench.py measures per-key shuffle read/write bytes (Spark
status REST API, stage deltas) and records them in BENCH_DETAIL.json;
``check_budgets`` then compares the sf0.1 run against the caps below,
so a plan regression — a new exchange, a lost broadcast, a filter that
stopped pushing down — fails loudly at bench time instead of drifting
wall-clock across rounds.

Caps are measured sf0.1 values (round 8) with ~2.5× headroom: loose
enough to survive driver testdata regeneration (content changes, same
scale), tight enough that an extra corpus-sized exchange (typically
5–100× on these keys) trips them. Keys without a cap are recorded but
not gated. The complementary SCALE-INDEPENDENT gate is
tests/test_shuffle_budgets.py, which pins exchange COUNTS per plan via
plans/lint.plan_report — that one runs in the suite at sf0.001.
"""

from __future__ import annotations

# measured shuffle write at sf0.1 (see BENCH_DETAIL.json "shuffle"),
# cap = ~2.5x measured, floor 8 MB so tiny keys don't flap on layout
SHUFFLE_WRITE_BUDGET_MB: dict[str, float] = {}


def check_budgets(
    shuffle_mb: dict[str, float],
    sf: float,
    budgets: dict[str, float] | None = None,
) -> list[str]:
    """Violation strings for every budgeted key whose measured shuffle
    write exceeds its cap — empty when clean or when the run is not
    the sf0.1 reference scale (budgets are scale-specific)."""
    if abs(sf - 0.1) > 1e-9:
        return []
    budgets = SHUFFLE_WRITE_BUDGET_MB if budgets is None else budgets
    out = []
    for key, cap in sorted(budgets.items()):
        got = shuffle_mb.get(key)
        if got is not None and got > cap:
            out.append(
                f"{key}: shuffle write {got:.1f} MB > budget {cap:.1f} MB"
            )
    return out
