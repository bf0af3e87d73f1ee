"""Migration-runner behavior, mirroring the reference's 8-test suite
(`/root/reference/tests/test_clickhouse_migration.py` — see SURVEY.md §5):
4 diff-planner cases, 2 end-to-end runs, 2 sequential-DML count checks."""

from __future__ import annotations

import gzip
import os
import uuid

import pytest
from pyspark.sql import Row, functions as F

from clickhouse_migrator_spark import migrate as M

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def db(spark):
    name = "testdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    yield name
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def _ledger_insert(spark, db, version, md5, script):
    spark.sql(
        f"INSERT INTO `{db}`.schema_versions VALUES "
        f"({version}, '{md5}', '{script}', current_timestamp())"
    )


def _manifest(spark, rows):
    return spark.createDataFrame([Row(version=v, script=s, md5=m) for v, s, m in rows], M.MANIFEST_SCHEMA)


# ── diff planner (reference tests :27-59) ───────────────────────────────────


def test_empty_ledger_returns_all_incoming(spark, db):
    inc = _manifest(spark, [(1, "a.sql", "m1"), (2, "b.sql", "m2")])
    out = M.migrations_to_apply(spark, db, inc)
    assert sorted(r.version for r in out.collect()) == [1, 2]


def test_deleted_migration_raises(spark, db):
    _ledger_insert(spark, db, 1, "m1", "a.sql")
    _ledger_insert(spark, db, 2, "m2", "b.sql")
    inc = _manifest(spark, [(1, "a.sql", "m1"), (3, "c.sql", "m3")])
    with pytest.raises(AssertionError, match="deleted"):
        M.migrations_to_apply(spark, db, inc)


def test_missing_migration_count_raises(spark, db):
    _ledger_insert(spark, db, 1, "m1", "a.sql")
    _ledger_insert(spark, db, 2, "m2", "b.sql")
    inc = _manifest(spark, [(1, "a.sql", "m1")])
    with pytest.raises(AssertionError, match="missing"):
        M.migrations_to_apply(spark, db, inc)


def test_edited_migration_raises(spark, db):
    _ledger_insert(spark, db, 1, "m1", "a.sql")
    inc = _manifest(spark, [(1, "a.sql", "EDITED")])
    with pytest.raises(AssertionError, match="edit"):
        M.migrations_to_apply(spark, db, inc)


def test_pending_set_is_anti_join(spark, db):
    _ledger_insert(spark, db, 1, "m1", "a.sql")
    inc = _manifest(spark, [(1, "a.sql", "m1"), (2, "b.sql", "m2"), (3, "c.sql", "m3")])
    out = M.migrations_to_apply(spark, db, inc)
    assert sorted(r.version for r in out.collect()) == [2, 3]
    assert set(out.columns) == {"version", "script", "md5"}


# ── end-to-end (reference tests :62-89) ─────────────────────────────────────


def test_e2e_sql_only(spark, db):
    n = M.migrate(spark, db, f"{FIXTURES}/migrations_sql", create_db_if_no_exists=False)
    assert n == 1
    assert M.show_tables(spark, db) == ["schema_versions", "widgets"]
    # idempotent rerun: nothing pending
    assert M.migrate(spark, db, f"{FIXTURES}/migrations_sql", create_db_if_no_exists=False) == 0


def test_e2e_mixed_sql_and_json(spark, db):
    n = M.migrate(spark, db, f"{FIXTURES}/migrations_mixed", create_db_if_no_exists=False)
    assert n == 2
    assert M.show_tables(spark, db) == [
        "schema_versions",
        "shapes1",
        "shapes2",
        "shapes3",
        "widgets",
    ]
    ledger = spark.table(f"`{db}`.schema_versions")
    assert [r.version for r in ledger.orderBy("version").collect()] == [1, 2]
    assert ledger.filter(F.col("created_at").isNull()).count() == 0


# ── sequential DML semantics (reference tests :91-138) ──────────────────────


N_ROWS = 10_000


def _score(i: int) -> int:
    return (i * 7919) % 10_000


@pytest.fixture()
def seq_csv(tmp_path):
    p = tmp_path / "metrics.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("id,score\n")
        for i in range(1, N_ROWS + 1):
            f.write(f"{i},{_score(i)}\n")
    return str(p)


@pytest.mark.parametrize("queue_exec", [True, False])
def test_sequential_dmls_via_runner(spark, db, seq_csv, queue_exec):
    """Dependent UPDATE chain: enabled=0 WHERE score>3000, then guard
    derived from enabled.  In the reference this is racy without the
    mutation barrier (its `queue_exec=False` test asserts *divergence*);
    Spark's synchronous execution makes BOTH paths correct — the
    documented, intentional divergence (SURVEY.md §2.C C4)."""
    expected_hi = sum(1 for i in range(1, N_ROWS + 1) if _score(i) > 3000)
    home = f"{FIXTURES}/migrations_seq"
    spark.catalog.setCurrentDatabase(db)
    try:
        manifest = M.manifest_df(spark, M.scan_migrations(home))
        pending = M.migrations_to_apply(spark, db, manifest)
        # stage 1: V1 creates the empty table
        M.apply_migration(spark, db, pending.filter(F.col("version") == 1), queue_exec=queue_exec)
        assert M.ingest_csv(spark, seq_csv, f"`{db}`.metrics", schema="id BIGINT, score BIGINT") == N_ROWS
        # stage 2: the diff now sees only V2 pending → dependent DMLs
        pending2 = M.migrations_to_apply(spark, db, manifest)
        assert [r.version for r in pending2.collect()] == [2]
        M.apply_migration(spark, db, pending2, queue_exec=queue_exec)
        t = spark.table(f"`{db}`.metrics")
        assert t.filter("enabled = 0").count() == expected_hi
        assert t.filter("guard = 0").count() == expected_hi
        assert t.filter("guard = 1").count() == N_ROWS - expected_hi
        assert t.filter("guard = -1").count() == 0
        ledger = spark.table(f"`{db}`.schema_versions")
        assert [r.version for r in ledger.orderBy("version").collect()] == [1, 2]
    finally:
        spark.catalog.setCurrentDatabase("default")


def test_sequential_dmls_full_flow(spark, db, seq_csv):
    """Reference flow order: create table → ingest CSV → run dependent
    DMLs → assert exact counts (reference tests :91-118)."""
    expected_hi = sum(1 for i in range(1, N_ROWS + 1) if _score(i) > 3000)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE IF NOT EXISTS metrics (id UInt32, score UInt32) "
            "ENGINE = MergeTree PARTITION BY tuple() ORDER BY tuple(id)",
        )
        assert M.ingest_csv(spark, seq_csv, f"`{db}`.metrics", schema="id BIGINT, score BIGINT") == N_ROWS
        for stmt in [
            "ALTER TABLE metrics ADD COLUMN enabled UInt32 DEFAULT 1",
            "ALTER TABLE metrics ADD COLUMN guard UInt32 DEFAULT -1",
            "ALTER TABLE metrics UPDATE enabled = 0 WHERE score > 3000",
            "ALTER TABLE metrics UPDATE guard = 0 WHERE enabled = 0",
            "ALTER TABLE metrics UPDATE guard = 1 WHERE enabled = 1",
        ]:
            M.execute_statement(spark, stmt)
        t = spark.table(f"`{db}`.metrics")
        assert t.count() == N_ROWS
        assert t.filter("enabled = 0").count() == expected_hi
        assert t.filter("guard = 0").count() == expected_hi
        assert t.filter("guard = 1").count() == N_ROWS - expected_hi
        assert t.filter("guard = -1").count() == 0
    finally:
        spark.catalog.setCurrentDatabase("default")


def test_duplicate_versions_rejected(tmp_path):
    (tmp_path / "V1__a.sql").write_text("SELECT 1")
    (tmp_path / "V1_b.json").write_text('["SELECT 1"]')
    with pytest.raises(AssertionError, match="Duplicate"):
        M.scan_migrations(str(tmp_path))


def test_cow_delete(spark, db):
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(spark, "CREATE TABLE t (id UInt32) ENGINE = MergeTree ORDER BY tuple()")
        spark.sql(f"INSERT INTO `{db}`.t VALUES (1), (2), (3), (4)")
        M.execute_statement(spark, "ALTER TABLE t DELETE WHERE id > 2")
        assert sorted(r.id for r in spark.table(f"`{db}`.t").collect()) == [1, 2]
    finally:
        spark.catalog.setCurrentDatabase("default")


def test_ctas_executes_end_to_end(spark):
    import uuid as _uuid

    from clickhouse_migrator_spark import migrate as M

    db = "ctasdb_" + _uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark, "CREATE TABLE src (id UInt64, v UInt64) ENGINE = MergeTree ORDER BY (id)"
        )
        spark.sql("INSERT INTO src VALUES (1, 10), (2, 20), (3, 30)")
        M.execute_statement(
            spark,
            "CREATE TABLE derived ENGINE = MergeTree ORDER BY (id) "
            "AS SELECT id, v * 2 AS v2 FROM src WHERE v >= 20",
        )
        rows = {r.id: r.v2 for r in spark.table("derived").collect()}
        assert rows == {2: 40, 3: 60}
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_alter_column_ops_end_to_end(spark):
    import uuid as _uuid

    from clickhouse_migrator_spark import migrate as M

    db = "alterdb_" + _uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE t (id UInt64, v UInt32, junk String) "
            "ENGINE = MergeTree ORDER BY (id)",
        )
        spark.sql("INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y')")
        M.execute_statement(spark, "ALTER TABLE t DROP COLUMN junk")
        assert spark.table("t").columns == ["id", "v"]
        M.execute_statement(spark, "ALTER TABLE t MODIFY COLUMN v Float64")
        assert dict(spark.table("t").dtypes)["v"] == "double"
        M.execute_statement(spark, "ALTER TABLE t RENAME COLUMN v TO value")
        rows = {r.id: r.value for r in spark.table("t").collect()}
        assert rows == {1: 10.0, 2: 20.0}
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_exchange_tables_swaps_contents(spark):
    import uuid as _uuid

    from clickhouse_migrator_spark import migrate as M

    db = "xchgdb_" + _uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark, "CREATE TABLE live (v UInt64) ENGINE = MergeTree ORDER BY tuple()"
        )
        M.execute_statement(
            spark, "CREATE TABLE staged (v UInt64) ENGINE = MergeTree ORDER BY tuple()"
        )
        spark.sql("INSERT INTO live VALUES (1)")
        spark.sql("INSERT INTO staged VALUES (2)")
        M.execute_statement(spark, "EXCHANGE TABLES live AND staged")
        assert spark.table("live").collect()[0].v == 2
        assert spark.table("staged").collect()[0].v == 1
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_comment_column_rewritten(spark):
    from clickhouse_migrator_spark.ddl import translate

    st = translate("ALTER TABLE t COMMENT COLUMN v 'the value'")
    assert st.kind == "passthrough"
    assert st.sql == "ALTER TABLE t ALTER COLUMN v COMMENT 'the value'"


def test_ingest_jsoneachrow(spark, tmp_path):
    import uuid as _uuid

    db = "jsondb_" + _uuid.uuid4().hex[:8]
    prev = spark.catalog.currentDatabase()
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE j (id UInt64, name String) ENGINE = MergeTree ORDER BY (id)",
        )
        p = tmp_path / "rows.jsonl"
        p.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
        assert M.ingest_jsoneachrow(spark, str(p), "j") == 2
        assert {r.id: r.name for r in spark.table("j").collect()} == {1: "a", 2: "b"}
    finally:
        spark.catalog.setCurrentDatabase(prev)
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_unsigned_default_wraps_two_complement(spark, db):
    """ClickHouse reinterprets a negative DEFAULT on an unsigned column
    as two's-complement (UInt32 DEFAULT -1 → 4294967295 — the value the
    reference's V1_sequential_dmls.json relies on before its UPDATEs
    overwrite it).  UInt64 stays signed (wrap would overflow BIGINT;
    documented divergence)."""
    from clickhouse_migrator_spark.ddl import _wrap_unsigned_default

    assert _wrap_unsigned_default("UInt32", "-1") == "4294967295"
    assert _wrap_unsigned_default("UInt16", "-1") == "65535"
    assert _wrap_unsigned_default("UInt8", "-2") == "254"
    assert _wrap_unsigned_default("UInt32", "7") == "7"
    assert _wrap_unsigned_default("UInt64", "-1") == "-1"
    assert _wrap_unsigned_default("Int32", "-1") == "-1"
    assert _wrap_unsigned_default("UInt32", None) is None

    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE uw (id UInt32) ENGINE = MergeTree ORDER BY tuple()",
        )
        spark.sql(f"INSERT INTO `{db}`.uw VALUES (1), (2)")
        M.execute_statement(
            spark, "ALTER TABLE uw ADD COLUMN guard UInt32 DEFAULT -1"
        )
        vals = {r.guard for r in spark.table(f"`{db}`.uw").collect()}
        assert vals == {4294967295}
    finally:
        spark.catalog.setCurrentDatabase("default")


# ── mid-script failure / rerun semantics (VERDICT r6 #2) ────────────────────


def _write_migrations(d, files):
    for name, content in files.items():
        (d / name).write_text(content)
    return str(d)


def test_mid_script_failure_rerun_semantics(spark, db, tmp_path):
    """Reference contract (`/root/reference/README.md:58`): a failure
    stops the run and no further version files execute.  SURVEY §4
    caveat: a multi-statement script is NOT atomic — statements before
    the failing one are applied but unrecorded, and a rerun after
    fixing the script re-executes the script from statement 1."""
    import json as _json

    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {
            "V1__create.sql": "CREATE TABLE t_mid (v Int64) ENGINE = MergeTree ORDER BY tuple()",
            "V2_inserts.json": _json.dumps(
                [
                    f"INSERT INTO `{db}`.t_mid VALUES (1)",
                    "THIS IS NOT SQL AT ALL (",
                    f"INSERT INTO `{db}`.t_mid VALUES (3)",
                ]
            ),
        },
    )
    with pytest.raises(Exception):
        M.migrate(spark, db, str(home), create_db_if_no_exists=False)
    # statement 1 of V2 persisted (applied-but-unrecorded), statement 3
    # never ran, the ledger records only V1
    vals = sorted(r.v for r in spark.table(f"`{db}`.t_mid").collect())
    assert vals == [1]
    ledger = [r.version for r in spark.table(f"`{db}`.schema_versions").collect()]
    assert ledger == [1]
    # a failed (never-recorded) script MAY be edited — the edited-guard
    # only protects recorded migrations
    (home / "V2_inserts.json").write_text(
        _json.dumps(
            [
                f"INSERT INTO `{db}`.t_mid VALUES (1)",
                f"INSERT INTO `{db}`.t_mid VALUES (2)",
                f"INSERT INTO `{db}`.t_mid VALUES (3)",
            ]
        )
    )
    assert M.migrate(spark, db, str(home), create_db_if_no_exists=False) == 1
    # statement 1 re-executed: the value 1 appears TWICE — the exact
    # non-atomicity surface SURVEY §4 documents
    vals = sorted(r.v for r in spark.table(f"`{db}`.t_mid").collect())
    assert vals == [1, 1, 2, 3]
    ledger = sorted(
        r.version for r in spark.table(f"`{db}`.schema_versions").collect()
    )
    assert ledger == [1, 2]


def test_fail_stop_skips_later_versions(spark, db, tmp_path):
    """A failing V2 must prevent V3 from ever executing (fail-stop in
    version order), and the claim taken for V2 is released so the rerun
    is not blocked."""
    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {
            "V1__create.sql": "CREATE TABLE t_fs (v Int64) ENGINE = MergeTree ORDER BY tuple()",
            "V2__boom.sql": "SELECT * FROM `nonexistent_db_xyz`.`no_such_table`",
            "V3__later.sql": f"INSERT INTO `{db}`.t_fs VALUES (30)",
        },
    )
    with pytest.raises(Exception):
        M.migrate(spark, db, str(home), create_db_if_no_exists=False)
    assert spark.table(f"`{db}`.t_fs").count() == 0  # V3 never ran
    assert [r.version for r in spark.table(f"`{db}`.schema_versions").collect()] == [1]
    # claim released on failure: no stale LIVE claims (releases are
    # append-only tombstones now — the raw table keeps claim+release
    # row pairs; what must be empty is the live view)
    assert M._live_claims(spark, f"`{db}`.`{M.CLAIMS}`").count() == 0


# ── concurrent-runner guard (VERDICT r6 #3) ─────────────────────────────────


def test_concurrent_runners_exactly_one_applies(spark, db, tmp_path):
    """Two runners racing on the SAME pending set: the claims protocol
    must let exactly one apply each script (the loser either raises
    ConcurrentMigrationError or skips an already-applied version)."""
    import threading

    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {
            "V1__create.sql": (
                "CREATE TABLE t_race (v Int64) ENGINE = MergeTree ORDER BY tuple()"
            ),
            "V2__insert.sql": f"INSERT INTO `{db}`.t_race VALUES (42)",
        },
    )
    # both runners compute the SAME pending set first (the worst-case
    # interleaving), then race through apply_migration
    manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
    pending = M.migrations_to_apply(spark, db, manifest).collect()
    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def run(name):
        sess = spark.newSession()
        sess.catalog.setCurrentDatabase(db)
        pend = sess.createDataFrame(pending, M.MANIFEST_SCHEMA)
        barrier.wait()
        try:
            results[name] = M.apply_migration(sess, db, pend)
        except M.ConcurrentMigrationError as e:
            results[name] = e

    ts = [threading.Thread(target=run, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    applied = [v for v in results.values() if isinstance(v, int)]
    errs = [v for v in results.values() if isinstance(v, M.ConcurrentMigrationError)]
    # exactly one runner made progress; the other refused (or skipped
    # everything after the winner finished: applied == 0)
    assert sum(v for v in applied) + 0 == 2 or (applied and errs), results
    # the real invariants: single ledger row per version, single effect
    spark.catalog.refreshTable(f"`{db}`.schema_versions")
    spark.catalog.refreshTable(f"`{db}`.t_race")
    spark.catalog.refreshTable(f"`{db}`.`{M.CLAIMS}`")
    ledger = spark.table(f"`{db}`.schema_versions")
    versions = [r.version for r in ledger.orderBy("version").collect()]
    assert versions == [1, 2], versions  # no duplicates, both applied overall
    assert spark.table(f"`{db}`.t_race").count() == 1  # INSERT ran exactly once
    # all claims released: live view empty (raw rows are append-only
    # claim+tombstone pairs)
    assert M._live_claims(spark, f"`{db}`.`{M.CLAIMS}`").count() == 0


def test_stale_claim_blocks_and_clear_claims_recovers(spark, db, tmp_path):
    """A claim left behind by a crashed runner blocks the version; the
    documented operator recovery is clear_claims()."""
    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {"V1__create.sql": "CREATE TABLE t_stale (v Int64) ENGINE = MergeTree ORDER BY tuple()"},
    )
    spark.sql(
        f"INSERT INTO `{db}`.`{M.CLAIMS}` "
        "VALUES (1, 'deadbeef', current_timestamp(), false, 'stale1')"
    )
    with pytest.raises(M.ConcurrentMigrationError, match="clear_claims"):
        M.migrate(spark, db, str(home), create_db_if_no_exists=False)
    assert M.clear_claims(spark, db) >= 1
    assert M.migrate(spark, db, str(home), create_db_if_no_exists=False) == 1


# ── copy-on-write crash recovery (VERDICT r7 #1) ────────────────────────────


def _raw_tables(spark, db):
    return {
        r.tableName
        for r in spark.sql(f"SHOW TABLES IN `{db}`").collect()
        if not r.isTemporary
    }


def test_cow_crash_in_drop_rename_window_recovers_forward(
    spark, db, tmp_path, monkeypatch, request
):
    """A crash between the swap's DROP and RENAME leaves the user table
    gone from the catalog but the complete post-mutation table (data +
    carried clickhouse.* properties) durable under __cow_<t>.
    recover_cow() must COMPLETE the rename, losslessly."""
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    M.execute_statement(
        spark,
        f"CREATE TABLE t_cowf (v Int64) ENGINE = ReplacingMergeTree ORDER BY (v)",
    )
    spark.sql(f"INSERT INTO `{db}`.t_cowf VALUES (1), (2)")

    def boom(stage):
        if stage == "after_drop":
            raise RuntimeError("injected crash")

    monkeypatch.setattr(M, "_crash_point", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.execute_statement(
            spark, f"ALTER TABLE t_cowf UPDATE v = v + 10 WHERE v > 0"
        )
    names = _raw_tables(spark, db)
    assert "t_cowf" not in names and "__cow_t_cowf" in names
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    actions = M.recover_cow(spark, db)
    assert actions == {"t_cowf": "completed"}
    assert sorted(r.v for r in spark.table(f"`{db}`.t_cowf").collect()) == [11, 12]
    # layout/engine properties survived the crash + recovery
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.t_cowf").collect()
    }
    assert props.get("clickhouse.engine") == "ReplacingMergeTree"
    assert "__cow_t_cowf" not in _raw_tables(spark, db)
    # recovery is idempotent / empty on a clean warehouse
    assert M.recover_cow(spark, db) == {}


def test_cow_crash_before_drop_rolls_back(spark, db, tmp_path, monkeypatch, request):
    """A crash BEFORE the swap's DROP (e.g. mid-write or right after)
    leaves the user-visible table fully intact; recover_cow() must drop
    the orphan temp and the rerun then applies cleanly."""
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    M.execute_statement(
        spark,
        f"CREATE TABLE t_cowb (v Int64) ENGINE = MergeTree ORDER BY tuple()",
    )
    spark.sql(f"INSERT INTO `{db}`.t_cowb VALUES (1), (2)")

    def boom(stage):
        if stage == "before_drop":
            raise RuntimeError("injected crash")

    monkeypatch.setattr(M, "_crash_point", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.execute_statement(
            spark, f"ALTER TABLE t_cowb UPDATE v = v + 10 WHERE v > 0"
        )
    assert {"t_cowb", "__cow_t_cowb"} <= _raw_tables(spark, db)
    # old data untouched
    assert sorted(r.v for r in spark.table(f"`{db}`.t_cowb").collect()) == [1, 2]
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    actions = M.recover_cow(spark, db)
    assert actions == {"t_cowb": "rolled_back"}
    assert "__cow_t_cowb" not in _raw_tables(spark, db)
    # the rerun (reference fail-stop contract: fix and rerun) applies
    M.execute_statement(
        spark, f"ALTER TABLE t_cowb UPDATE v = v + 10 WHERE v > 0"
    )
    assert sorted(r.v for r in spark.table(f"`{db}`.t_cowb").collect()) == [11, 12]


def test_release_preserves_rival_claims(spark, db, tmp_path):
    """Releases are append-only tombstones (ADVICE r7): a rival's claim
    row present while our runner releases its own claims must survive
    physically AND stay live — the old rewrite-based release could
    destroy a rival claim appended during its DROP/RENAME window."""
    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {
            "V1__create.sql": (
                "CREATE TABLE t_keep (v Int64) ENGINE = MergeTree ORDER BY tuple()"
            )
        },
    )
    # a rival holds a claim for a DIFFERENT (future) version
    spark.sql(
        f"INSERT INTO `{db}`.`{M.CLAIMS}` "
        "VALUES (99, 'rival', current_timestamp(), false, 'rival1')"
    )
    assert M.migrate(spark, db, str(home), create_db_if_no_exists=False) == 1
    live = M._live_claims(spark, f"`{db}`.`{M.CLAIMS}`").collect()
    assert [(r.version, r.owner) for r in live] == [(99, "rival")]


def test_cross_process_race_at_most_one_applies(spark, db, tmp_path, monkeypatch):
    """Simulate SEPARATE driver processes (no shared in-process lock) by
    neutralizing _CLAIM_LOCK: the claims protocol alone must guarantee
    AT MOST ONE application (both racers may refuse — the documented
    cross-process outcome), and a serial rerun afterwards must converge
    to exactly-once regardless of which interleaving happened."""
    import threading

    class _NoLock:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(M, "_CLAIM_LOCK", _NoLock())
    home = tmp_path / "mig"
    home.mkdir()
    _write_migrations(
        home,
        {
            "V1__create.sql": (
                "CREATE TABLE t_xrace (v Int64) ENGINE = MergeTree ORDER BY tuple()"
            ),
            "V2__insert.sql": f"INSERT INTO `{db}`.t_xrace VALUES (7)",
        },
    )
    manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
    pending = M.migrations_to_apply(spark, db, manifest).collect()
    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def run(name):
        sess = spark.newSession()
        sess.catalog.setCurrentDatabase(db)
        pend = sess.createDataFrame(pending, M.MANIFEST_SCHEMA)
        barrier.wait()
        try:
            results[name] = M.apply_migration(sess, db, pend)
        except Exception as e:  # ConcurrentMigrationError or swap races
            results[name] = e

    ts = [threading.Thread(target=run, args=(n,)) for n in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # at-most-one invariant in EVERY interleaving: never a duplicate
    # ledger row, never a doubled INSERT
    spark.catalog.refreshTable(f"`{db}`.schema_versions")
    ledger = spark.table(f"`{db}`.schema_versions")
    per_version = (
        ledger.groupBy("version").count().filter(F.col("count") > 1).count()
    )
    assert per_version == 0, results
    if any(
        r.tableName == "t_xrace"
        for r in spark.sql(f"SHOW TABLES IN `{db}`").collect()
    ):
        spark.catalog.refreshTable(f"`{db}`.t_xrace")
        assert spark.table(f"`{db}`.t_xrace").count() <= 1
    # convergence: clear any stale claims from refused/crashed racers,
    # then a serial rerun lands the warehouse in the exactly-once state
    M.clear_claims(spark, db)
    M.migrate(spark, db, str(home), create_db_if_no_exists=False)
    spark.catalog.refreshTable(f"`{db}`.schema_versions")
    versions = sorted(
        r.version for r in spark.table(f"`{db}`.schema_versions").collect()
    )
    assert versions == [1, 2], (versions, results)
    spark.catalog.refreshTable(f"`{db}`.t_xrace")
    assert spark.table(f"`{db}`.t_xrace").count() == 1
