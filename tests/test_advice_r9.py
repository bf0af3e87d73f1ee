"""Round-9 ADVICE regressions (driver advisor findings on the round-8
migration-runner diff):

1. A crash in the copy-on-write DROP→RENAME window DURING
   apply_migration leaves the in-flight script version stamped on the
   temp table; ``recover_cow`` surfaces it as ``"completed:V<n>"`` so
   the operator knows which script's effects are already present before
   the mandatory (re-executing) rerun.  The marker is transient: it
   never survives a successful swap or the recovery itself.
2. Claim-release tombstones are keyed by a per-claim ``claim_id``, not
   (version, owner): a future claim that reuses a tombstoned
   (version, owner) pair must stay LIVE (the old pair-keyed anti-join
   silently shadowed it, degrading the at-most-one guard to
   both-proceed).  Legacy rows (claim_id NULL, pre-widening) keep their
   old (version, owner)-composite semantics.
3. ALTER UPDATE resolves assignment targets CASE-SENSITIVELY like
   ClickHouse: a case-only mismatch is rejected (with a did-you-mean),
   never silently applied to the differently-cased column.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M


@pytest.fixture()
def db(spark):
    name = "testdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    yield name
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def _write_script(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return p


# ── 1: recover_cow knows the in-flight version ──────────────────────────────


def test_cow_crash_during_apply_reports_inflight_version(
    spark, db, tmp_path, monkeypatch, request
):
    """Crash in the DROP→RENAME window while apply_migration is running
    V7: recover_cow completes the rename AND reports "completed:V7".
    Round 10 (statement journal): recovery also writes the statement's
    journal row from the swap's markers, so the rerun RESUMES after the
    completed mutation — exactly-once, no double-apply (this test
    originally pinned the r9 disclosure-only semantics)."""
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    M.execute_statement(
        spark, "CREATE TABLE t_adv9 (v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.t_adv9 VALUES (1), (2)")
    home = tmp_path / "mig"
    home.mkdir()
    _write_script(home, "V7__bump.sql", "ALTER TABLE t_adv9 UPDATE v = v + 10 WHERE v > 0;")
    manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
    pending = M.migrations_to_apply(spark, db, manifest)

    def boom(stage):
        if stage == "after_drop":
            raise RuntimeError("injected crash")

    monkeypatch.setattr(M, "_crash_point", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.apply_migration(spark, db, pending)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    # the crashed runner released nothing durable for the ledger…
    assert (
        spark.table(f"`{db}`.schema_versions").filter(F.col("version") == 7).count()
        == 0
    )
    actions = M.recover_cow(spark, db)
    assert actions == {"t_adv9": "completed:V7"}
    # effects of V7 present, marker gone from the recovered table
    assert sorted(r.v for r in spark.table(f"`{db}`.t_adv9").collect()) == [11, 12]
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.t_adv9").collect()
    }
    assert M._COW_VERSION_PROP not in props
    # crashed claim is stale-but-clearable, exactly the documented path
    M.clear_claims(spark, db)
    # the rerun SKIPS the journaled mutation (exactly-once, VERDICT r9
    # #1) and only records the ledger row: values stay +10, not +20
    pending2 = M.migrations_to_apply(spark, db, manifest)
    assert M.apply_migration(spark, db, pending2) == 1
    assert sorted(r.v for r in spark.table(f"`{db}`.t_adv9").collect()) == [11, 12]
    assert (
        spark.table(f"`{db}`.schema_versions").filter(F.col("version") == 7).count()
        == 1
    )


def test_cow_marker_never_survives_successful_swap(spark, db, tmp_path, request):
    """The in-flight marker is transient: a NON-crashed apply_migration
    run leaves no cow_inflight_version property on the mutated table."""
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    M.execute_statement(
        spark, "CREATE TABLE t_adv9b (v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.t_adv9b VALUES (1)")
    home = tmp_path / "mig"
    home.mkdir()
    _write_script(home, "V1__bump.sql", "ALTER TABLE t_adv9b UPDATE v = v + 1 WHERE v > 0;")
    manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
    assert M.apply_migration(spark, db, M.migrations_to_apply(spark, db, manifest)) == 1
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.t_adv9b").collect()
    }
    assert M._COW_VERSION_PROP not in props
    # direct execute_statement (no runner context) also stays unmarked
    # on the crash-window temp:
    assert getattr(M._INFLIGHT, "version", None) is None


# ── 2: tombstones are claim_id-keyed ─────────────────────────────────────────


def test_tombstone_does_not_shadow_future_claim_with_reused_pair(spark, db):
    """Claim A for (version=5, owner=X) is released (tombstoned by its
    claim_id).  A future claim B reusing the SAME (version, owner) pair
    but a fresh claim_id must be LIVE — under the old (version, owner)
    anti-join it was permanently invisible and two runners could both
    proceed."""
    qual = f"`{db}`.`{M.CLAIMS}`"
    owner = "owner-reused"
    M._append_claim_row(spark, qual, 5, owner, released=False, claim_id="claimA")
    M._append_claim_row(spark, qual, 5, owner, released=True, claim_id="claimA")
    assert M._live_claims(spark, qual).count() == 0
    M._append_claim_row(spark, qual, 5, owner, released=False, claim_id="claimB")
    live = M._live_claims(spark, qual).collect()
    assert len(live) == 1 and live[0].claim_id == "claimB"


def test_legacy_null_claim_id_rows_keep_pair_semantics(spark, db):
    """Rows from a pre-claim_id build (claim_id NULL) are matched by
    their (version, owner) composite — a NULL-id tombstone still
    releases the NULL-id claim, and never touches a claim_id'd row."""
    qual = f"`{db}`.`{M.CLAIMS}`"
    M._append_claim_row(spark, qual, 9, "legacy", released=False, claim_id=None)
    M._append_claim_row(spark, qual, 9, "modern", released=False, claim_id="c1")
    M._append_claim_row(spark, qual, 9, "legacy", released=True, claim_id=None)
    live = M._live_claims(spark, qual).collect()
    assert len(live) == 1 and live[0].owner == "modern"


def test_claims_schema_widens_claim_id_in_place(spark):
    """A claims table created by an older build (no claim_id column) is
    widened on _init_claims; existing rows read claim_id NULL (legacy
    semantics)."""
    name = "testdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    try:
        spark.sql(
            f"CREATE TABLE `{name}`.`{M.CLAIMS}` "
            "(version BIGINT, owner STRING, started_at TIMESTAMP, "
            "released BOOLEAN) USING PARQUET"
        )
        spark.sql(
            f"INSERT INTO `{name}`.`{M.CLAIMS}` VALUES "
            "(1, 'old', current_timestamp(), false)"
        )
        M._init_claims(spark, name)
        qual = f"`{name}`.`{M.CLAIMS}`"
        cols = {f.name for f in spark.table(qual).schema.fields}
        assert "claim_id" in cols
        rows = spark.table(qual).collect()
        assert len(rows) == 1 and rows[0].claim_id is None
        assert M._live_claims(spark, qual).count() == 1
    finally:
        spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_apply_releases_use_fresh_claim_ids(spark, db, tmp_path, request):
    """End-to-end: a two-script run leaves every claim tombstoned and
    each claim row carries a distinct non-null claim_id whose tombstone
    matches it exactly."""
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    home = tmp_path / "mig"
    home.mkdir()
    _write_script(home, "V1__a.sql", "CREATE TABLE adv9_t1 (v Int64) ENGINE = Log;")
    _write_script(home, "V2__b.sql", "CREATE TABLE adv9_t2 (v Int64) ENGINE = Log;")
    manifest = M.manifest_df(spark, M.scan_migrations(str(home)))
    assert M.apply_migration(spark, db, M.migrations_to_apply(spark, db, manifest)) == 2
    qual = f"`{db}`.`{M.CLAIMS}`"
    assert M._live_claims(spark, qual).count() == 0
    rows = spark.table(qual).collect()
    claims = [r for r in rows if not (r.released or False)]
    tombs = [r for r in rows if (r.released or False)]
    assert all(r.claim_id for r in rows)
    assert len({r.claim_id for r in claims}) == len(claims) == 2
    assert {r.claim_id for r in tombs} == {r.claim_id for r in claims}


# ── 3: ALTER UPDATE is case-sensitive like ClickHouse ───────────────────────


def test_alter_update_rejects_case_mismatched_column(spark, db, request):
    spark.catalog.setCurrentDatabase(db)
    request.addfinalizer(lambda: spark.catalog.setCurrentDatabase("default"))
    M.execute_statement(
        spark,
        "CREATE TABLE t_case (value Int64, k Int64) ENGINE = MergeTree ORDER BY tuple()",
    )
    spark.sql(f"INSERT INTO `{db}`.t_case VALUES (1, 1)")
    with pytest.raises(ValueError, match=r"unknown column 'Value'.*did you mean 'value'"):
        M.execute_statement(spark, "ALTER TABLE t_case UPDATE Value = 0 WHERE k = 1")
    # untouched — the reject happened before any write
    assert spark.table(f"`{db}`.t_case").collect()[0].value == 1
    # exact-case spelling still applies
    M.execute_statement(spark, "ALTER TABLE t_case UPDATE value = 7 WHERE k = 1")
    assert spark.table(f"`{db}`.t_case").collect()[0].value == 7
