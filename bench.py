"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the `noop` sink (all columns computed,
nothing collected to the driver) — the same way a cluster job would be
measured, so the numbers reflect scan+shuffle+agg cost, not driver I/O.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_migrator_spark.registry import all_specs
from clickhouse_migrator_spark.session import get_spark


def materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    # warm the JVM + parquet footers once so per-query numbers are steady
    materialize(spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1))

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        try:
            materialize(spec.fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # pragma: no cover
            timings[name] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
