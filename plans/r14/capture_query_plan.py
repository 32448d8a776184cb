"""Capture ``explain("formatted")`` of a declared catalog query.

Usage: python plans/r14/capture_query_plan.py <key> <out.txt> [sf_dir]
Run against the tree whose plan you want (git stash to flip).
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main(key: str, out_path: str, sf_dir: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from aggregator_spark.session import get_spark

    spark = get_spark("plan-capture")
    import __spark_entry__ as m

    df = m.queries()[key](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001",
    )
