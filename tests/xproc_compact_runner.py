"""Second-driver process for the journal-compaction race test
(VERDICT r11 #5).

Launched by ``tests/test_migrate_xproc.py`` as ``python
xproc_compact_runner.py <warehouse> <db> <ready_file> <go_file>
<stop_file>``.  Boots its OWN SparkSession (separate JVM) against the
SAME warehouse directory, binds the shared metadata tables into its
private in-memory catalog, signals readiness, waits for the barrier,
then loops ``compact_journal`` against the shared journal location
until the parent writes the stop file — while the parent process is
mid-migration, appending and resuming through that same journal.
Prints one machine-readable result line:
``XPROC_COMPACT_DONE=<iterations>,<rows_removed>`` (or
``XPROC_COMPACT_FAILED=<err>`` if any iteration raised — a reader/
deleter race leaking out of compact_journal is a test failure).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    warehouse, db, ready, go, stop = sys.argv[1:6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from clickhouse_migrator_spark import migrate as M
    from clickhouse_migrator_spark.session import get_spark

    spark = get_spark(
        app_name="xproc-compactor",
        cpus=4,
        shuffle_partitions=4,
        warehouse_dir=warehouse,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        M.create_db(spark, db)
        # bind the SHARED (already-populated) metadata locations into
        # this JVM's private in-memory catalog: a plain managed CREATE
        # fails with LOCATION_ALREADY_EXISTS on the non-empty dirs the
        # parent has been writing to
        base = warehouse.rstrip("/") + f"/{db}.db"
        for name, schema in (
            (M.LEDGER, "version BIGINT, md5 STRING, script STRING, created_at TIMESTAMP"),
            (
                M.CLAIMS,
                "version BIGINT, owner STRING, started_at TIMESTAMP, "
                "released BOOLEAN, claim_id STRING",
            ),
            (
                M.JOURNAL,
                "version BIGINT, stmt_index BIGINT, md5 STRING, owner STRING, "
                "created_at TIMESTAMP",
            ),
        ):
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS `{db}`.`{name}` ({schema}) "
                f"USING PARQUET LOCATION '{base}/{name}'"
            )
        spark.catalog.setCurrentDatabase(db)
        with open(ready, "w") as f:
            f.write("ready")
        deadline = time.time() + 60
        while not os.path.exists(go):
            if time.time() > deadline:
                print("XPROC_TIMEOUT")
                return
            time.sleep(0.02)
        iters = 0
        removed = 0
        deadline = time.time() + 120
        try:
            while not os.path.exists(stop) and time.time() < deadline:
                removed += M.compact_journal(spark, db)
                iters += 1
        except Exception as e:  # any leak out of the tolerant paths
            print(f"XPROC_COMPACT_FAILED={type(e).__name__}:{e}"[:300])
            return
        print(f"XPROC_COMPACT_DONE={iters},{removed}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
