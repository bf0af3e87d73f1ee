"""Second-driver process for the REAL cross-process race test
(VERDICT r7 #2).

Launched by ``tests/test_migrate_xproc.py`` as ``python xproc_runner.py
<warehouse> <db> <migrations_home> <ready_file> <go_file> [prebind_sql]``.
Boots its OWN SparkSession (separate JVM) against the SAME warehouse
directory, binds the shared metadata/table locations into its private
in-memory catalog (two in-memory catalogs share the parquet data plane
but not catalog entries), computes the pending set, signals readiness,
spin-waits for the barrier file, then races ``apply_migration`` against
the parent process.  Prints one machine-readable result line:
``XPROC_APPLIED=<n>`` or ``XPROC_REFUSED``.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    warehouse, db, home, ready, go = sys.argv[1:6]
    prebind = sys.argv[6] if len(sys.argv) > 6 else None
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_migrator_spark import migrate as M
    from clickhouse_migrator_spark.session import get_spark

    spark = get_spark(
        app_name="xproc-runner",
        cpus=4,
        shuffle_partitions=4,
        warehouse_dir=warehouse,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        M.create_db(spark, db)
        M.init_db(spark, db)
        spark.catalog.setCurrentDatabase(db)
        if prebind:
            with open(prebind) as f:
                for stmt in f.read().split(";\n"):
                    if stmt.strip():
                        spark.sql(stmt)
        manifest = M.manifest_df(spark, M.scan_migrations(home))
        rows = M.migrations_to_apply(spark, db, manifest).collect()
        pend = spark.createDataFrame(rows, M.MANIFEST_SCHEMA)
        with open(ready, "w") as f:
            f.write("ready")
        deadline = time.time() + 60
        while not os.path.exists(go):
            if time.time() > deadline:
                print("XPROC_TIMEOUT")
                return
            time.sleep(0.02)
        try:
            n = M.apply_migration(spark, db, pend)
            print(f"XPROC_APPLIED={n}")
        except M.ConcurrentMigrationError:
            print("XPROC_REFUSED")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
