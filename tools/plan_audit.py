"""Audit the physical plan of every registered query: shuffle count,
broadcast count, single-partition exchanges (the scale killer), and
whether scans carry pushed filters.  Artifact for the 100 TB review:

    python tools/plan_audit.py [sf_dir]

Single-partition exchanges are SELF-JUSTIFYING (VERDICT r5 #7): each
flagged query is joined against
``clickhouse_migrator_spark.plans.bounded_single_partition.BOUNDS`` and
its proven input bound printed inline.  REVIEW now means an actual
defect: a single-partition query with NO registered bound, a Cartesian
product, or row-at-a-time Python.  Stale registry entries (bound
registered but exchange gone from the plan) are reported at the end so
the registry never rots.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from clickhouse_migrator_spark.plans.bounded_single_partition import (  # noqa: E402
    BOUNDS,
)
from clickhouse_migrator_spark.plans.inspect import (  # noqa: E402
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
    seen_single: set[str] = set()
    errored: set[str] = set()
    for name, shuf, bcast, single, cart, pyrow in rows:
        note = ""
        if isinstance(cart, str):
            # plan build failed — don't let this query poison the stale
            # computation below (its bound may still be valid)
            errored.add(name)
        bad = isinstance(cart, str) or cart is True or (
            isinstance(pyrow, int) and pyrow > 0
        )
        if isinstance(single, int) and single > 0:
            seen_single.add(name)
            bound = BOUNDS.get(name)
            if bound is None:
                bad = True
                note = "  <-- UNJUSTIFIED single-partition"
            else:
                note = f"  [bounded: {bound}]"
        if bad:
            note += "  <-- REVIEW"
            flagged += 1
        print(
            f"{name:42s} {shuf!s:>4} {bcast!s:>5} {single!s:>6} "
            f"{cart!s:>9} {pyrow!s:>9}{note}"
        )
    stale = sorted(set(BOUNDS) - seen_single - errored)
    if stale:
        print(
            f"\nSTALE registry entries (no SinglePartition in plan now — "
            f"prune from bounded_single_partition.py): {stale}"
        )
    # ── fixed-entropy constant audit (VERDICT r9 #2) ─────────────────
    from clickhouse_migrator_spark.plans.entropy_constants import (
        ENTROPY_CONSTANTS,
        check as entropy_check,
    )

    problems = entropy_check()
    print(f"\nEntropy-constant registry ({len(ENTROPY_CONSTANTS)} entries):")
    for cname, ec in sorted(ENTROPY_CONSTANTS.items()):
        print(f"  [{ec.kind:12s}] {cname}")
    if problems:
        for p in problems:
            print(f"  ROTTED: {p}  <-- REVIEW")
        flagged += len(problems)

    print(f"\n{flagged} queries flagged; {len(seen_single)} bounded single-partition")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
