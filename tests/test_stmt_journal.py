"""Statement-level journal: exactly-once rerun convergence (VERDICT r9
directive #1).

A crash between a script's last durable effect and its ledger append
used to make the mandatory rerun re-execute the WHOLE script —
double-applying non-idempotent mutations (r8/r9 only disclosed this via
recover_cow's "completed:V<n>" + README warning).  Round 10 journals
every successfully executed statement (version, stmt_index, md5)
through the claims' atomic-rename channel; COW swaps stamp the triple
onto the temp table so recover_cow can write the journal row on the
crashed runner's behalf.

The headline test injects a crash at EVERY statement boundary of a
5-statement non-idempotent migration (v += 10^i, so any double-apply
perturbs a unique digit) — before each statement, after its effects are
durable but before the journal append, after the journal append but
before the marker unset, and inside the swap's DROP→RENAME window —
then runs the documented recovery (recover_cow + clear_claims + rerun)
and asserts the final value shows each statement applied EXACTLY once.
"""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M


@pytest.fixture()
def db(spark, request):
    name = "jdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(name)

    def fin():
        spark.catalog.setCurrentDatabase(prev)
        spark.sql(f"DROP DATABASE `{name}` CASCADE")

    request.addfinalizer(fin)
    return name


N_STMTS = 5
STMTS = [f"ALTER TABLE jt UPDATE v = v + {10 ** i} WHERE k = 1" for i in range(N_STMTS)]
EXPECTED = 1 + sum(10 ** i for i in range(N_STMTS))  # 11112 — every digit distinct


def _setup(spark, db, tmp_path, stmts=STMTS, version=3):
    M.execute_statement(
        spark, "CREATE TABLE jt (k Int64, v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.jt VALUES (1, 1)")
    home = tmp_path / "mig"
    home.mkdir(exist_ok=True)
    path = home / f"V{version}__m.json"
    path.write_text(json.dumps(stmts))
    return str(home), path


def _v(spark, db) -> int:
    return spark.table(f"`{db}`.jt").collect()[0].v


def _arm(monkeypatch, stage: str, occurrence: int):
    """Raise on the `occurrence`-th firing of `stage` (0-based)."""
    seen = {"n": 0}

    def boom(s):
        if s == stage:
            if seen["n"] == occurrence:
                seen["n"] += 1
                raise RuntimeError("injected crash")
            seen["n"] += 1

    monkeypatch.setattr(M, "_crash_point", boom)
    return seen


BOUNDARIES = [
    (stage, i)
    for stage in ("before_stmt", "after_stmt", "after_journal")
    for i in range(N_STMTS)
] + [("before_drop", 2), ("after_drop", 2)]


@pytest.mark.parametrize("stage,occ", BOUNDARIES, ids=[f"{s}-{i}" for s, i in BOUNDARIES])
def test_crash_at_every_boundary_converges_exactly_once(
    spark, db, tmp_path, monkeypatch, stage, occ
):
    home, _ = _setup(spark, db, tmp_path)
    _arm(monkeypatch, stage, occ)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.migrate(spark, db, home)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    # documented recovery: recover_cow, clear stale claim, rerun
    M.recover_cow(spark, db)
    M.clear_claims(spark, db)
    assert M.migrate(spark, db, home) == 1
    assert _v(spark, db) == EXPECTED, f"double/lost apply at {stage}:{occ}"
    led = spark.table(f"`{db}`.{M.LEDGER}").filter(F.col("version") == 3)
    assert led.count() == 1
    # converged: a further rerun is a no-op and changes nothing
    assert M.migrate(spark, db, home) == 0
    assert _v(spark, db) == EXPECTED


def test_transient_failure_resumes_same_script(spark, db, tmp_path, monkeypatch):
    """A statement that fails WITHOUT an edit (transient cause): the
    rerun of the identical script resumes at the failed statement —
    statements 0..2 execute exactly once across both runs."""
    home, _ = _setup(spark, db, tmp_path)
    real = M.execute_statement
    state = {"fail": True}

    def flaky(spark_, sql):
        if state["fail"] and sql == STMTS[3]:
            state["fail"] = False
            raise RuntimeError("transient")
        return real(spark_, sql)

    monkeypatch.setattr(M, "execute_statement", flaky)
    with pytest.raises(RuntimeError, match="transient"):
        M.migrate(spark, db, home)
    # fail-stop applied 0..2 once; failure released the claim
    assert _v(spark, db) == 1 + 1 + 10 + 100
    assert M._live_claims(spark, f"`{db}`.`{M.CLAIMS}`").count() == 0
    assert M.migrate(spark, db, home) == 1  # resumes at stmt 3
    assert _v(spark, db) == EXPECTED


def test_edited_script_discards_journal_whole_script_rerun(
    spark, db, tmp_path, monkeypatch
):
    """Editing the failed script changes its md5 → journaled progress is
    discarded and the rerun re-executes from statement 0 (the
    documented semantics for edits; indices no longer correspond)."""
    bad = STMTS[:2] + ["ALTER TABLE missing_tbl UPDATE v = 0 WHERE k = 0"]
    home, path = _setup(spark, db, tmp_path, stmts=bad)
    with pytest.raises(Exception):
        M.migrate(spark, db, home)
    assert _v(spark, db) == 1 + 1 + 10  # stmts 0,1 applied once
    path.write_text(json.dumps(STMTS[:2]))  # FIXED script, md5 differs
    assert M.migrate(spark, db, home) == 1
    # whole-script rerun: 0,1 applied AGAIN (documented double-apply on edit)
    assert _v(spark, db) == 1 + 2 * (1 + 10)


def test_clear_journal_forces_full_reexecution(spark, db, tmp_path, monkeypatch):
    home, _ = _setup(spark, db, tmp_path)
    _arm(monkeypatch, "before_stmt", 3)
    with pytest.raises(RuntimeError):
        M.migrate(spark, db, home)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    assert _v(spark, db) == 1 + 1 + 10 + 100
    cleared = M.clear_journal(spark, db)
    assert cleared == 3  # stmts 0..2 were journaled
    M.clear_claims(spark, db)
    assert M.migrate(spark, db, home) == 1
    # journal cleared → full re-execution (0..2 applied twice, 3..4 once)
    assert _v(spark, db) == 1 + 2 * (1 + 10 + 100) + 1000 + 10000


def test_recover_cow_live_table_reconciliation_action(
    spark, db, tmp_path, monkeypatch
):
    """Crash after the swap's RENAME but before the journal append: the
    live table wears the markers; recover_cow journals late, pops the
    markers, and reports journaled:V<n>."""
    home, _ = _setup(spark, db, tmp_path)
    _arm(monkeypatch, "after_stmt", 2)
    with pytest.raises(RuntimeError):
        M.migrate(spark, db, home)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    props = M._table_props(spark, f"`{db}`.jt")
    assert props.get(M._COW_VERSION_PROP) == "3"
    assert props.get(M._COW_STMT_PROP) == "2"
    actions = M.recover_cow(spark, db)
    assert actions == {"jt": "journaled:V3"}
    props = M._table_props(spark, f"`{db}`.jt")
    assert all(k not in props for k in M._COW_MARKER_PROPS)
    # the late-journaled row makes the rerun resume AFTER stmt 2
    M.clear_claims(spark, db)
    assert M.migrate(spark, db, home) == 1
    assert _v(spark, db) == EXPECTED


def test_recover_cow_after_journal_crash_does_not_duplicate_row(
    spark, db, tmp_path, monkeypatch
):
    home, _ = _setup(spark, db, tmp_path)
    _arm(monkeypatch, "after_journal", 1)
    with pytest.raises(RuntimeError):
        M.migrate(spark, db, home)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    M.recover_cow(spark, db)
    jq = f"`{db}`.`{M.JOURNAL}`"
    spark.catalog.refreshTable(jq)
    rows = (
        spark.table(jq)
        .filter((F.col("version") == 3) & (F.col("stmt_index") == 1))
        .count()
    )
    assert rows == 1  # reconciliation saw the row and only unset markers
    M.clear_claims(spark, db)
    assert M.migrate(spark, db, home) == 1
    assert _v(spark, db) == EXPECTED


def test_pre_journal_orphan_falls_back_to_disclosure(spark, db, tmp_path):
    """An orphan temp from a pre-journal build (version marker only, no
    stmt/md5): recover_cow completes the rename and keeps the r9
    disclosure semantics — completed:V<n>, rerun re-executes."""
    M.execute_statement(
        spark, "CREATE TABLE old_t (v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.old_t VALUES (5)")
    # hand-build the crashed state: target dropped, temp carries only
    # the version marker (old stamp format)
    spark.sql(f"CREATE TABLE `{db}`.`__cow_old_t` AS SELECT v + 1 AS v FROM `{db}`.old_t")
    spark.sql(
        f"ALTER TABLE `{db}`.`__cow_old_t` SET TBLPROPERTIES "
        f"('{M._COW_VERSION_PROP}' = '9')"
    )
    spark.sql(f"DROP TABLE `{db}`.old_t")
    actions = M.recover_cow(spark, db)
    assert actions == {"old_t": "completed:V9"}
    assert spark.table(f"`{db}`.old_t").collect()[0].v == 6
    # no journal row was invented for the unknown statement index
    jq = f"`{db}`.`{M.JOURNAL}`"
    spark.catalog.refreshTable(jq)
    assert spark.table(jq).filter(F.col("version") == 9).count() == 0


def test_journal_rows_keyed_by_md5_not_just_version(spark, db, tmp_path):
    """_journaled_stmts honors only rows whose md5 matches the current
    script body; rows from a different body are reported stale."""
    jq = f"`{db}`.`{M.JOURNAL}`"
    M._append_journal_row(spark, jq, 4, 0, "aaa", "o1")
    M._append_journal_row(spark, jq, 4, 1, "aaa", "o1")
    M._append_journal_row(spark, jq, 4, 0, "bbb", "o2")
    done, stale = M._journaled_stmts(spark, jq, 4, "aaa")
    assert done == {0, 1} and stale is True
    done, stale = M._journaled_stmts(spark, jq, 4, "ccc")
    assert done == set() and stale is True
    done, stale = M._journaled_stmts(spark, jq, 5, "aaa")
    assert done == set() and stale is False
