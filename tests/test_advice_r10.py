"""Round-10 ADVICE regressions (driver advisor findings on the round-9
diff):

1. ``sessionize_with_state``'s docstring no longer claims a plain
   availableNow drain flushes every open session — it documents the
   (delay + pad) trailing window and the sentinel-batch requirement.
2. ``bench.py`` hard-fails (exit 2) on unknown names in
   SPARK_GRAFT_BENCH_ONLY and on an empty filtered set, instead of
   producing a normal-looking artifact that silently benched fewer
   queries.
3. ``tools/close_check.py`` parses the porcelain path field (rename
   lines, quoted paths) and matches with ``startswith``; it also flags
   uncommitted modifications to the required artifact files themselves.
4. ALTER UPDATE/DELETE validate identifiers in the WHERE predicate and
   assignment RHS case-sensitively against the table's exact column
   names (ClickHouse rejects case-mismatched identifiers; Spark's
   case-insensitive analyzer silently resolved them).
5. The ``clickhouse.cow_inflight_*`` markers are excluded from the
   ``clickhouse.*`` property carry-over in ``_swap_overwrite``, so a
   leaked marker (crash between RENAME and journal/UNSET) can never
   propagate onto future swaps of the same table.
"""

from __future__ import annotations

import os
import subprocess
import sys
import uuid

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import close_check  # noqa: E402

from clickhouse_migrator_spark import migrate as M  # noqa: E402


# ── 1: docstring truthfulness ────────────────────────────────────────────────


def test_sessionizer_docstring_documents_trailing_window():
    from clickhouse_migrator_spark.streaming.events_stream import (
        sessionize_with_state,
    )

    doc = sessionize_with_state.__doc__ or ""
    assert "does NOT flush every open session" in doc
    assert "sentinel" in doc
    # the old false claim must be gone
    assert "flushes every open\n    session" not in doc


# ── 2: bench BENCH_ONLY hard failure ────────────────────────────────────────


def test_bench_only_unknown_name_exits_nonzero():
    env = {**os.environ, "SPARK_GRAFT_BENCH_ONLY": "definitely_not_a_query"}
    r = subprocess.run(
        [sys.executable, "-c", "import bench; bench.main()"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 2, r.stderr[-500:]
    assert "unknown queries" in r.stderr


# ── 3: close_check porcelain parsing ────────────────────────────────────────


def test_porcelain_paths_plain():
    assert close_check._porcelain_paths(" M bench.py") == ["bench.py"]
    assert close_check._porcelain_paths("?? tools/new.py") == ["tools/new.py"]


def test_porcelain_paths_rename_counts_both_sides():
    line = "R  clickhouse_migrator_spark/old.py -> tools/new.py"
    assert close_check._porcelain_paths(line) == [
        "clickhouse_migrator_spark/old.py",
        "tools/new.py",
    ]


def test_porcelain_paths_quoted():
    assert close_check._porcelain_paths('?? "weird name.py"') == ["weird name.py"]


def test_porcelain_startswith_not_substring():
    # a path merely CONTAINING "bench.py" must not be classed as code
    paths = close_check._porcelain_paths("?? notes/about_bench.py.md")
    assert paths == ["notes/about_bench.py.md"]
    assert not any(
        p.startswith(cp) for p in paths for cp in close_check.CODE_PATHS
    )


# ── 4: case-sensitive read-side identifiers in ALTER UPDATE/DELETE ──────────


@pytest.fixture()
def db(spark):
    name = "testdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(name)
    yield name
    spark.catalog.setCurrentDatabase(prev)
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def _mk(spark, db, rows="(1, 10), (2, 30)"):
    spark.sql(f"CREATE TABLE `{db}`.t (id BIGINT, v BIGINT) USING PARQUET")
    spark.sql(f"INSERT INTO `{db}`.t VALUES {rows}")


def test_alter_update_case_mismatch_in_predicate_rejected(spark, db):
    _mk(spark, db)
    with pytest.raises(ValueError, match="did you mean 'v'"):
        M.execute_statement(spark, "ALTER TABLE t UPDATE v = v + 1 WHERE V > 0")


def test_alter_update_case_mismatch_in_rhs_rejected(spark, db):
    _mk(spark, db)
    with pytest.raises(ValueError, match="did you mean 'v'"):
        M.execute_statement(spark, "ALTER TABLE t UPDATE v = V + 1 WHERE v > 0")


def test_alter_delete_case_mismatch_rejected(spark, db):
    _mk(spark, db)
    with pytest.raises(ValueError, match="did you mean 'id'"):
        M.execute_statement(spark, "ALTER TABLE t DELETE WHERE ID = 1")


def test_alter_update_exact_case_still_works(spark, db):
    _mk(spark, db)
    M.execute_statement(spark, "ALTER TABLE t UPDATE v = v + 1 WHERE v > 20")
    got = {
        (r.id, r.v) for r in spark.table(f"`{db}`.t").collect()
    }
    assert got == {(1, 10), (2, 31)}


def test_alter_update_function_names_not_misread_as_columns(spark, db):
    # upper(...) is a FUNCTION; the validator must not reject it even
    # though no column is named "upper"
    spark.sql(f"CREATE TABLE `{db}`.s (id BIGINT, name STRING) USING PARQUET")
    spark.sql(f"INSERT INTO `{db}`.s VALUES (1, 'a'), (2, 'b')")
    M.execute_statement(
        spark, "ALTER TABLE s UPDATE name = upper(name) WHERE id >= 1"
    )
    got = {r.name for r in spark.table(f"`{db}`.s").collect()}
    assert got == {"A", "B"}


def test_alter_update_string_literals_not_validated(spark, db):
    # 'V' inside a string literal is data, not an identifier
    spark.sql(f"CREATE TABLE `{db}`.s2 (id BIGINT, name STRING) USING PARQUET")
    spark.sql(f"INSERT INTO `{db}`.s2 VALUES (1, 'x')")
    M.execute_statement(spark, "ALTER TABLE s2 UPDATE name = 'V' WHERE id = 1")
    assert spark.table(f"`{db}`.s2").collect()[0].name == "V"


# ── 5: inflight markers never carried over ──────────────────────────────────


def test_cow_markers_excluded_from_carryover(spark, db):
    _mk(spark, db)
    qual = f"`{db}`.`t`"
    # simulate a leaked marker from a crash between RENAME and UNSET
    spark.sql(
        f"ALTER TABLE {qual} SET TBLPROPERTIES "
        f"('{M._COW_VERSION_PROP}' = '7', '{M._COW_STMT_PROP}' = '3', "
        f"'clickhouse.order_by' = 'id')"
    )
    M.execute_statement(spark, "ALTER TABLE t UPDATE v = v + 1 WHERE v > 0")
    props = M._table_props(spark, qual)
    # the real layout prop survives the swap; the leaked markers do not
    assert props.get("clickhouse.order_by") == "id"
    assert M._COW_VERSION_PROP not in props
    assert M._COW_STMT_PROP not in props
