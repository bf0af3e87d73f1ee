"""Round-12 ADVICE regressions (driver advisor findings on the round-11
diff) plus the staged-insert fallback-scope pins (VERDICT r11 #2).

1. (high) ``_local_parquet_location`` engaged for PARTITIONED (and
   bucketed) parquet catalog tables: the stage clone is flat and the
   publish renames data files into the target's ROOT directory, which
   partition-aware listing never reads — the migration reported success
   while the inserted rows stayed invisible.  Round 12 first scoped
   those targets to the direct-execution fallback; later in the round
   partitioned targets became FIRST-CLASS staged (partition-mirroring
   stage + per-partition registration, ``tests/test_staged_partitioned``)
   — only bucketed targets still fall back (the bucket id lives in the
   data file NAME, which a rename-based publish can't preserve).
2. (low) ``sim_ivf_recall_audit`` counted hits as join rows, so a
   duplicated (query_id, cand_id) in the approx top-k fanned out and
   inflated n_hit — full_probe_recall_is_1 could pass under exactly the
   duplicated-vector list-layout bug it exists to catch.  The approx
   side is deduplicated before the join.
3. (VERDICT #2) the fallback path's rerun semantics are PINNED: a
   crash after a fallback INSERT's effects but before its journal row
   duplicates the insert on rerun — the documented at-least-once
   window, scoped in the README, never silent corruption.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M


@pytest.fixture()
def db(spark, request):
    name = "a12_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    M.init_db(spark, name)
    prev = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase(name)

    def fin():
        spark.catalog.setCurrentDatabase(prev)
        spark.sql(f"DROP DATABASE `{name}` CASCADE")

    request.addfinalizer(fin)
    return name


def _mig(tmp_path, stmts, version=3):
    home = tmp_path / "mig_a12"
    home.mkdir(exist_ok=True)
    (home / f"V{version}__a.json").write_text(json.dumps(stmts))
    return str(home)


# ── 1. bucketed targets must NOT stage; partitioned ones now do ──────────────


def test_local_parquet_location_refuses_bucketed_accepts_partitioned(spark, db):
    spark.sql(
        f"CREATE TABLE `{db}`.pt (k BIGINT, v BIGINT, d STRING) "
        "USING PARQUET PARTITIONED BY (d)"
    )
    spark.sql(
        f"CREATE TABLE `{db}`.bt (k BIGINT, v BIGINT) "
        "USING PARQUET CLUSTERED BY (k) INTO 4 BUCKETS"
    )
    spark.sql(f"CREATE TABLE `{db}`.ft (k BIGINT, v BIGINT) USING PARQUET")
    assert M._local_parquet_location(spark, f"`{db}`.`pt`") is not None
    assert M._local_parquet_location(spark, f"`{db}`.`bt`") is None
    assert M._local_parquet_location(spark, f"`{db}`.`ft`") is not None
    assert M._partition_columns(spark, f"`{db}`.`pt`") == ["d"]
    assert M._partition_columns(spark, f"`{db}`.`ft`") == []


def test_runner_insert_into_partitioned_table_rows_visible(spark, db, tmp_path):
    """The r11 regression shape: INSERT through the runner into a
    PARTITIONED BY parquet table.  Rows must be visible afterwards (the
    staged flat-rename publish made them invisible) and land in real
    partition directories."""
    spark.sql(
        f"CREATE TABLE `{db}`.pt (k BIGINT, v BIGINT, d STRING) "
        "USING PARQUET PARTITIONED BY (d)"
    )
    home = _mig(
        tmp_path,
        [
            "INSERT INTO pt VALUES (1, 10, 'a'), (2, 20, 'b')",
            "INSERT INTO pt VALUES (3, 30, 'a')",
        ],
    )
    assert M.migrate(spark, db, home) == 1
    got = sorted((r.k, r.v, r.d) for r in spark.table(f"`{db}`.pt").collect())
    assert got == [(1, 10, "a"), (2, 20, "b"), (3, 30, "a")]
    # partition pruning actually works on the written layout
    assert (
        spark.table(f"`{db}`.pt").filter(F.col("d") == "a").count() == 2
    )
    loc = M._table_location(spark, f"`{db}`.`pt`")
    assert loc and os.path.isdir(os.path.join(loc, "d=a"))
    # and no stage-table garbage
    leftovers = [
        r["tableName"]
        for r in spark.sql(f"SHOW TABLES IN `{db}`").collect()
        if r["tableName"].startswith(M._STAGE_PREFIX)
    ]
    assert leftovers == []


def test_runner_insert_into_bucketed_table_rows_visible(spark, db, tmp_path):
    spark.sql(
        f"CREATE TABLE `{db}`.bt (k BIGINT, v BIGINT) "
        "USING PARQUET CLUSTERED BY (k) INTO 4 BUCKETS"
    )
    home = _mig(tmp_path, ["INSERT INTO bt VALUES (1, 10), (2, 20)"], version=4)
    assert M.migrate(spark, db, home) == 1
    got = sorted((r.k, r.v) for r in spark.table(f"`{db}`.bt").collect())
    assert got == [(1, 10), (2, 20)]


# ── 3. fallback rerun semantics pinned (VERDICT r11 #2) ──────────────────────


def test_fallback_insert_crash_documented_at_least_once(
    spark, db, tmp_path, monkeypatch
):
    """A fallback-path INSERT (bucketed target → direct execution; the
    partitioned case graduated to the staged exactly-once path) crashed
    after its effects but before the journal row: the rerun re-executes
    it and the rows DUPLICATE — the documented at-least-once fallback
    window (README), not silent corruption: every written row is a
    faithful copy of the statement's rows."""
    spark.sql(
        f"CREATE TABLE `{db}`.pf (k BIGINT, v BIGINT, d STRING) "
        "USING PARQUET CLUSTERED BY (k) INTO 2 BUCKETS"
    )
    home = _mig(tmp_path, ["INSERT INTO pf VALUES (1, 10, 'a')"], version=5)
    fired = {"n": 0}

    def boom(s):
        if s == "after_stmt" and fired["n"] == 0:
            fired["n"] += 1
            raise RuntimeError("injected crash")

    monkeypatch.setattr(M, "_crash_point", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.migrate(spark, db, home)
    monkeypatch.setattr(M, "_crash_point", lambda s: None)
    # fallback = direct execution: the first attempt's rows ARE visible
    assert spark.table(f"`{db}`.pf").count() == 1
    M.clear_claims(spark, db)
    assert M.migrate(spark, db, home) == 1
    got = sorted((r.k, r.v, r.d) for r in spark.table(f"`{db}`.pf").collect())
    assert got == [(1, 10, "a"), (1, 10, "a")]  # documented duplicate
    assert M.migrate(spark, db, home) == 0  # and converged thereafter
    assert spark.table(f"`{db}`.pf").count() == 2


def test_readme_scopes_exactly_once_claim():
    """README's exactly-once section must carry the scope qualifier:
    flat local parquet only; partitioned/bucketed/non-local targets
    fall back to at-least-once direct execution."""
    with open(os.path.join(os.path.dirname(__file__), "..", "README.md")) as f:
        txt = f.read().lower()
    assert "exactly-once" in txt
    assert "at-least-once" in txt
    assert "partitioned" in txt and "bucketed" in txt


# ── 2. IVF recall audit is dedup-robust ──────────────────────────────────────


def test_ivf_recall_audit_catches_duplicated_candidate(spark):
    """Tamper the full-probe approx result with the exact list-layout
    bug the audit documents: one candidate duplicated, another
    displaced.  Join-fanout used to let n_hit reach k (recall 1.0);
    with the dedup, the displaced candidate is genuinely missing and
    full_probe_recall_is_1 must come out False."""
    from clickhouse_migrator_spark.operators import similarity as S

    sf_dir = "/root/testdata/sf0.001"
    real = S.ivf_kmeans_topk

    def tampered(spark_, sf_dir_, nprobe):
        df = real(spark_, sf_dir_, nprobe=nprobe)
        rows = df.select("query_id", "vec_id").collect()
        q0 = rows[0].query_id
        q0_rows = [r for r in rows if r.query_id == q0]
        assert len(q0_rows) >= 2
        keep = [(r.query_id, r.vec_id) for r in rows]
        # displace q0's last candidate with a duplicate of its first
        keep.remove((q0, q0_rows[-1].vec_id))
        keep.append((q0, q0_rows[0].vec_id))
        return spark_.createDataFrame(keep, "query_id BIGINT, vec_id BIGINT")

    S.ivf_kmeans_topk, orig = tampered, S.ivf_kmeans_topk
    try:
        row = S.sim_ivf_recall_audit(spark, sf_dir).collect()[0]
    finally:
        S.ivf_kmeans_topk = orig
    assert row.full_probe_recall_is_1 is False


def test_ivf_recall_audit_green_untampered(spark):
    from clickhouse_migrator_spark.operators import similarity as S

    row = S.sim_ivf_recall_audit(spark, "/root/testdata/sf0.001").collect()[0]
    assert row.mean_recall_ge_floor is True
    assert row.full_probe_recall_is_1 is True
