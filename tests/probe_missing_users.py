"""Isolate the `missing_users` sf1→sf10 3.17x step (VERDICT r7 item 5).

Not a pytest — run ad hoc:
``python tests/probe_missing_users.py /tmp/testdata_sf1 /tmp/testdata_sf10``

Variants timed (warm, best of 2) per directory:
  full        the catalog entry as-is (distinct → broadcast anti → sort)
  no_sort     without the final total-order sort
  no_distinct anti-join first, distinct after (same result set)
  smj         no broadcast hint, auto-broadcast off (shuffle anti-join)
The deltas attribute the growth: the broadcast build cost scales with
the user POPULATION (make_sf1 scales users in population, not history
depth), the distinct exchange with |distinct user_id|, and the sort
adds a range-partitioning sample pass over the anti-join output.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from aggregator_spark.schemas import load_testdata
from aggregator_spark.session import get_spark


def variants(spark, sf_dir):
    events, customer = load_testdata(spark, sf_dir, "events", "customer")
    uid = (
        events.select("user_id")
        .where(F.col("user_id").isNotNull())
    )
    cust = customer.select("c_custkey")
    cond = F.col("user_id") == F.col("c_custkey")
    return {
        "full": uid.distinct()
        .join(F.broadcast(cust), cond, "left_anti")
        .orderBy("user_id"),
        "no_sort": uid.distinct().join(F.broadcast(cust), cond, "left_anti"),
        "no_distinct": uid.join(F.broadcast(cust), cond, "left_anti")
        .distinct()
        .orderBy("user_id"),
        "smj": uid.distinct().join(cust, cond, "left_anti").orderBy("user_id"),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/testdata_sf1", "/tmp/testdata_sf10"]
    spark = get_spark(app_name="probe-missing-users")
    spark.sparkContext.setLogLevel("ERROR")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for d in dirs:
        for name, df in variants(spark, d).items():
            if name == "smj":
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if name == "smj":
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            print(f"{d} {name}: {best:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
