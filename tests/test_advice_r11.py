"""Round-11 ADVICE regressions (driver advisor findings on the round-10
diff):

1. (medium) The ``crashj`` fuzz fault no longer has a nondeterministic
   failure mode: the engine itself is now exactly-once for INSERTs
   (staged-append commit, VERDICT r10 #1), so the fuzzer's
   every-statement-applies-once model is CORRECT for an ``after_stmt``
   crash on an insert — pinned here by running that exact scenario
   shape deterministically.
2. (low) A plain EXCEPTION (not crash) in the journal append after a
   COW swap's RENAME completed used to make the plain rerun re-execute
   the already-applied mutation (markers stripped from carry-over,
   recovery documented only for crashes).  ``migrate()`` now reconciles
   live tables still carrying ``_COW_MARKER_PROPS`` at start
   (``_reconcile_live_markers``) — the plain rerun is exactly-once with
   no operator action.
3. (low) ``_check_read_identifiers`` skipped entirely when the
   expression contains a subquery: ``WHERE k IN (SELECT K FROM other)``
   legitimately references ANOTHER relation's columns and must not be
   rejected against the target table's schema; SELECT/FROM/GROUP/ORDER/
   JOIN were also added to ``_EXPR_KEYWORDS``.
"""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M


@pytest.fixture()
def db(spark, request):
    name = "adb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(name)

    def fin():
        spark.catalog.setCurrentDatabase(prev)
        spark.sql(f"DROP DATABASE `{name}` CASCADE")

    request.addfinalizer(fin)
    return name


# ── 1: crashj / after_stmt on INSERT is exactly-once ─────────────────────────


def test_after_stmt_crash_on_insert_no_duplicates(spark, db, tmp_path, monkeypatch):
    """The exact fault shape ADVICE r11 #1 reproduced live under r10
    semantics (rows duplicated): crash at after_stmt on a plain INSERT,
    then the fuzzer's documented recovery (recover_cow + clear_claims +
    rerun).  The exact-multiset model demands zero duplicates."""
    M.execute_statement(
        spark, "CREATE TABLE az (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    home = tmp_path / "mig"
    home.mkdir()
    (home / "V1__i.json").write_text(
        json.dumps(["INSERT INTO az VALUES (0, 7), (1, 8), (2, 9)"])
    )
    fired = {"n": 0}

    def boom(s):
        if s == "after_stmt" and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("crashj")

    monkeypatch.setattr(M, "_crash_point", boom)
    with pytest.raises(RuntimeError, match="crashj"):
        M.migrate(spark, db, str(home))
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    M.recover_cow(spark, db)
    M.clear_claims(spark, db)
    M.migrate(spark, db, str(home))
    from collections import Counter

    got = Counter((r.k, r.v) for r in spark.table(f"`{db}`.az").collect())
    assert got == Counter({(0, 7): 1, (1, 8): 1, (2, 9): 1}), got


# ── 2: journal-append exception after COW RENAME → plain rerun heals ─────────


def test_cow_journal_append_failure_plain_rerun_exactly_once(
    spark, db, tmp_path, monkeypatch
):
    M.execute_statement(
        spark, "CREATE TABLE ac (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.ac VALUES (1, 1)")
    home = tmp_path / "mig"
    home.mkdir()
    (home / "V2__u.json").write_text(
        json.dumps(["ALTER TABLE ac UPDATE v = v + 5 WHERE k = 1"])
    )
    real = M._append_journal_row
    state = {"fail": True}

    def flaky(spark_, jq, version, i, md5, owner):
        if state["fail"] and version == 2:
            state["fail"] = False
            raise RuntimeError("journal io error")
        return real(spark_, jq, version, i, md5, owner)

    monkeypatch.setattr(M, "_append_journal_row", flaky)
    with pytest.raises(RuntimeError, match="journal io error"):
        M.migrate(spark, db, str(home))
    # the swap RENAME completed: the mutation is applied, markers linger
    assert spark.table(f"`{db}`.ac").collect()[0].v == 6
    props = M._table_props(spark, f"`{db}`.ac")
    assert props.get(M._COW_VERSION_PROP) == "2"
    assert M._live_claims(spark, f"`{db}`.`{M.CLAIMS}`").count() == 0
    # plain rerun — no recover_cow — must NOT re-apply v = v + 5
    monkeypatch.setattr(M, "_append_journal_row", real)
    assert M.migrate(spark, db, str(home)) == 1
    assert spark.table(f"`{db}`.ac").collect()[0].v == 6
    props = M._table_props(spark, f"`{db}`.ac")
    assert all(k not in props for k in M._COW_MARKER_PROPS)
    assert M.migrate(spark, db, str(home)) == 0
    assert spark.table(f"`{db}`.ac").collect()[0].v == 6


def test_reconcile_live_markers_returns_and_unsets(spark, db):
    M.execute_statement(
        spark, "CREATE TABLE ar (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(
        f"ALTER TABLE `{db}`.ar SET TBLPROPERTIES "
        f"('{M._COW_VERSION_PROP}' = '4', '{M._COW_STMT_PROP}' = '1', "
        f"'{M._COW_MD5_PROP}' = 'mmm')"
    )
    out = M._reconcile_live_markers(spark, db)
    assert out == {"ar": "4"}
    done, _ = M._journaled_stmts(spark, f"`{db}`.`{M.JOURNAL}`", 4, "mmm")
    assert done == {1}
    assert all(
        k not in M._table_props(spark, f"`{db}`.ar") for k in M._COW_MARKER_PROPS
    )
    # idempotent: second pass finds nothing and adds nothing
    assert M._reconcile_live_markers(spark, db) == {}


# ── 3: subquery predicates skip the case-sensitivity heuristic ───────────────


def test_update_with_subquery_predicate_not_rejected(spark, db):
    M.execute_statement(
        spark, "CREATE TABLE t_main (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    M.execute_statement(
        spark, "CREATE TABLE t_other (K Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.t_main VALUES (1, 10), (2, 20)")
    spark.sql(f"INSERT INTO `{db}`.t_other VALUES (1)")
    # `K` case-insensitively collides with t_main's `k` but belongs to
    # t_other — r10 rejected this valid migration with ValueError
    M.execute_statement(
        spark,
        "ALTER TABLE t_main UPDATE v = 99 WHERE k IN (SELECT K FROM t_other)",
    )
    assert sorted((r.k, r.v) for r in spark.table(f"`{db}`.t_main").collect()) == [
        (1, 99),
        (2, 20),
    ]
    M.execute_statement(
        spark, "ALTER TABLE t_main DELETE WHERE k IN (SELECT K FROM t_other)"
    )
    assert [(r.k, r.v) for r in spark.table(f"`{db}`.t_main").collect()] == [(2, 20)]


def test_case_mismatch_still_rejected_without_subquery(spark, db):
    """The heuristic still fires on plain expressions — only subqueries
    disable it."""
    M.execute_statement(
        spark, "CREATE TABLE t_case (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    with pytest.raises(ValueError, match="case-sensitive"):
        M.execute_statement(spark, "ALTER TABLE t_case UPDATE v = 0 WHERE K = 1")


def test_sql_keywords_in_predicate_not_treated_as_identifiers():
    # SELECT/FROM/JOIN/etc. must never reach the column matcher
    M._check_read_identifiers(
        ["select_x", "k"], "k > 0 AND k < 10", "WHERE"
    )  # no raise
