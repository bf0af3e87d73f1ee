"""REAL two-process concurrency test (VERDICT r7 #2).

The round-7 cross-process test simulated a second driver by
monkeypatching the in-process lock away; this one spawns an actual
second JVM (``tests/xproc_runner.py`` via subprocess) with its own
SparkSession against the SAME warehouse directory, so the claims
protocol is exercised over genuine cross-process parquet file-listing
visibility — exactly where the round-7 relation-cache staleness class
lived.

Catalog realism note: both drivers run Spark's default in-memory
catalog, so they share the *data plane* (warehouse parquet files) but
each holds a private catalog.  The test pre-binds the shared table
locations in both catalogs (CREATE TABLE IF NOT EXISTS over the same,
still-empty locations) and races ONE pending INSERT migration — the
ledger/claims appends and reads all flow through the shared
filesystem.  On a shared metastore (Hive/Delta/Iceberg) the same
protocol runs unchanged with shared DDL visibility too.

Invariants (every interleaving): at most one runner applies (no
duplicate ledger row, the INSERT's effect lands at most once), and a
serial rerun after ``clear_claims`` converges to exactly-once.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M

RUNNER = os.path.join(os.path.dirname(__file__), "xproc_runner.py")


@pytest.fixture()
def db(spark):
    name = "xprocdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    yield name
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_real_two_process_race_at_most_one_applies(spark, db, tmp_path):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    home = tmp_path / "mig"
    home.mkdir()
    # ONE pending migration: a bare INSERT into a pre-bound table, so
    # neither process needs to see the other's DDL (in-memory catalogs
    # don't share metadata; the parquet locations are shared)
    (home / "V1__insert.sql").write_text(f"INSERT INTO `{db}`.t_xp VALUES (7)")
    spark.sql(f"CREATE TABLE `{db}`.t_xp (v BIGINT) USING PARQUET")
    prebind = tmp_path / "prebind.sql"
    prebind.write_text(
        f"CREATE TABLE IF NOT EXISTS `{db}`.t_xp (v BIGINT) USING PARQUET;\n"
    )
    ready = tmp_path / "ready"
    go = tmp_path / "go"
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    proc = subprocess.Popen(
        [
            sys.executable,
            RUNNER,
            warehouse,
            db,
            str(home),
            str(ready),
            str(go),
            str(prebind),
        ],
        stdout=subprocess.PIPE,
        stderr=open(tmp_path / "xproc_stderr.log", "w"),
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(RUNNER)),
    )
    try:
        # parent computes its pending set while the second JVM boots
        manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
        rows = M.migrations_to_apply(spark, db, manifest).collect()
        pend = spark.createDataFrame(rows, M.MANIFEST_SCHEMA)
        deadline = time.time() + 180
        while not ready.exists():
            assert proc.poll() is None, "second driver died before ready"
            assert time.time() < deadline, "second driver never became ready"
            time.sleep(0.05)
        go.write_text("go")  # barrier release — both apply "now"
        spark.catalog.setCurrentDatabase(db)
        try:
            parent_applied: object
            try:
                parent_applied = M.apply_migration(spark, db, pend)
            except M.ConcurrentMigrationError:
                parent_applied = "refused"
        finally:
            spark.catalog.setCurrentDatabase("default")
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "XPROC_TIMEOUT" not in out, out
    child_applied = "XPROC_APPLIED=1" in out
    child_refused = "XPROC_REFUSED" in out or "XPROC_APPLIED=0" in out
    assert child_applied or child_refused, out

    # ── at-most-one, checked against the SHARED data plane ──────────
    spark.catalog.refreshTable(f"`{db}`.schema_versions")
    ledger = spark.table(f"`{db}`.schema_versions")
    dup = ledger.groupBy("version").count().filter(F.col("count") > 1).count()
    assert dup == 0, (parent_applied, out)
    spark.catalog.refreshTable(f"`{db}`.t_xp")
    n_rows = spark.table(f"`{db}`.t_xp").count()
    assert n_rows <= 1, (n_rows, parent_applied, out)
    # consistency between effect and ledger
    assert n_rows == ledger.filter(F.col("version") == 1).count()

    # ── serial rerun converges to exactly-once ──────────────────────
    M.clear_claims(spark, db)
    M.migrate(spark, db, str(home), create_db_if_no_exists=False)
    spark.catalog.refreshTable(f"`{db}`.schema_versions")
    spark.catalog.refreshTable(f"`{db}`.t_xp")
    assert [
        r.version
        for r in spark.table(f"`{db}`.schema_versions").orderBy("version").collect()
    ] == [1]
    assert spark.table(f"`{db}`.t_xp").count() == 1
