"""Audit the physical plan of every registered query: shuffle count,
broadcast count, single-partition exchanges (the scale killer), and
whether scans carry pushed filters.  Artifact for the 100 TB review:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from clickhouse_migrator_spark.plans.inspect import (  # noqa: E402
    _formatted,
    _plan_string,
    count_broadcasts,
    count_shuffles,
)
from clickhouse_migrator_spark.registry import all_specs  # noqa: E402
from clickhouse_migrator_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in sorted(all_specs().items()):
        if name.startswith("streaming_"):
            continue  # streaming plans can't be built without running
        try:
            df = spec.fn(spark, sf_dir)
            plan = _plan_string(df)
            rows.append(
                (
                    name,
                    count_shuffles(df),
                    count_broadcasts(df),
                    plan.count("Exchange SinglePartition"),
                    "CartesianProduct" in plan,
                    plan.count("BatchEvalPython"),  # row-at-a-time Python = red flag
                )
            )
        except Exception as e:
            rows.append((name, -1, -1, -1, str(e)[:60], -1))
    print(f"{'query':42s} shuf bcast single cartesian rowpython")
    flagged = 0
    for name, shuf, bcast, single, cart, pyrow in rows:
        flag = ""
        if isinstance(cart, str) or cart is True or (isinstance(pyrow, int) and pyrow > 0) or (
            isinstance(single, int) and single > 0
        ):
            flag = "  <-- REVIEW"
            flagged += 1
        print(f"{name:42s} {shuf!s:>4} {bcast!s:>5} {single!s:>6} {cart!s:>9} {pyrow!s:>9}{flag}")
    print(f"\n{flagged} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
