"""TTL surface: CREATE/MODIFY TTL recorded as properties (never leaked
into order_by or the Spark DDL), apply_ttl enforces retention."""

from __future__ import annotations

import uuid

import pytest

from clickhouse_migrator_spark import migrate as M
from clickhouse_migrator_spark.ddl import translate


def test_create_with_ttl_settings_parses_clean():
    st = translate(
        "CREATE TABLE t (id UInt64, ts DateTime) ENGINE = MergeTree "
        "ORDER BY (id) TTL ts + INTERVAL 30 DAY SETTINGS index_granularity = 8192"
    )
    assert st.kind == "create_table"
    assert st.order_by == "(id)"  # regression: TTL/SETTINGS once bled in
    assert st.ttl == "ts + INTERVAL 30 DAY"
    assert "TTL" not in st.sql and "SETTINGS" not in st.sql


def test_modify_ttl_classified():
    st = translate("ALTER TABLE t MODIFY TTL ts + INTERVAL 7 DAY")
    assert st.kind == "set_ttl"
    assert st.table == "t"
    assert st.ttl == "ts + INTERVAL 7 DAY"


def test_apply_ttl_removes_expired_rows(spark):
    db = "ttldb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE logs (id UInt64, ts DateTime) ENGINE = MergeTree "
            "ORDER BY (id) TTL ts + INTERVAL 30 DAY",
        )
        spark.sql(
            "INSERT INTO logs VALUES "
            "(1, TIMESTAMP '2000-01-01 00:00:00'), "  # long expired
            "(2, TIMESTAMP '2001-01-01 00:00:00'), "  # long expired
            "(3, current_timestamp())"  # fresh
        )
        assert M.apply_ttl(spark, "logs") == 2
        assert [r.id for r in spark.table("logs").collect()] == [3]
        assert M.apply_ttl(spark, "logs") == 0  # idempotent
        # MODIFY TTL updates the recorded policy
        M.execute_statement(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 1 HOUR")
        props = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.logs").collect()
        }
        assert props["clickhouse.ttl"] == "ts + INTERVAL 1 HOUR"
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_apply_ttl_without_policy_is_noop(spark):
    db = "ttldb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark, "CREATE TABLE plain (id UInt64) ENGINE = MergeTree ORDER BY tuple()"
        )
        spark.sql("INSERT INTO plain VALUES (1)")
        assert M.apply_ttl(spark, "plain") == 0
        assert spark.table("plain").count() == 1
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_apply_ttl_rejects_unsupported_expression(spark):
    db = "ttldb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE weird (id UInt64, ts DateTime) ENGINE = MergeTree "
            "ORDER BY (id)",
        )
        spark.sql(
            f"ALTER TABLE `{db}`.weird SET TBLPROPERTIES "
            "('clickhouse.ttl' = 'toStartOfDay(ts)')"
        )
        with pytest.raises(ValueError, match="unsupported TTL"):
            M.apply_ttl(spark, "weird")
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")
