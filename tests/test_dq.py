"""Data-quality checks against crafted violations: each check must
count exactly the planted failures and nothing else."""

from __future__ import annotations

from aggregator_spark.operators import dq


def test_dq_counts_planted_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (1, 10, 50.0),    # dup id (1 extra row)
            (1, 20, -1.0),    # dup id again (another extra), range-low
            (2, None, 200.0), # null fk, range-high
            (3, 99, 42.0),    # orphan fk
        ],
        "id long, fk long, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")

    report = {
        r["check"]: r["failed"]
        for r in dq.dq_report(
            [
                dq.check_unique(child, ["id"], "id_unique"),
                dq.check_not_null(child, "fk", "fk_not_null"),
                dq.check_in_range(child, "v", 0.0, 100.0, "v_range"),
                dq.check_referential(
                    child, "fk", parent, "pk", "fk_orphans"
                ),
            ]
        ).collect()
    }
    assert report == {
        "id_unique": 2,     # three rows share id=1 -> two beyond first
        "fk_not_null": 1,
        "v_range": 2,       # -1.0 and 200.0; NULL v would not count
        "fk_orphans": 1,    # fk=99; NULL fk is not an orphan
    }


def test_dq_all_green_on_clean_data(spark):
    clean = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 6.0)], "id long, fk long, v double"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rows = dq.dq_report(
        [
            dq.check_unique(clean, ["id"], "u"),
            dq.check_not_null(clean, "fk", "n"),
            dq.check_in_range(clean, "v", 0.0, 100.0, "r"),
            dq.check_referential(clean, "fk", parent, "pk", "f"),
        ]
    ).collect()
    assert all(r["failed"] == 0 for r in rows)
    assert [r["check"] for r in rows] == ["f", "n", "r", "u"]
