"""CREATE TABLE records the ClickHouse physical-layout intent
(ORDER BY / PARTITION BY) as table properties."""

from __future__ import annotations

import uuid

import pytest

from clickhouse_migrator_spark import migrate as M


def test_order_by_recorded_as_tblproperty(spark):
    db = "propdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE evts (id UInt64, day Date, val Float64) "
            "ENGINE = MergeTree PARTITION BY day ORDER BY (id)",
        )
        props = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.evts").collect()
        }
        assert props.get("clickhouse.order_by") == "(id)"
        assert props.get("clickhouse.partition_by") == "day"
        # tuple() layouts are noise, not intent — not recorded
        M.execute_statement(
            spark,
            "CREATE TABLE plain (id UInt64) ENGINE = MergeTree "
            "PARTITION BY tuple() ORDER BY tuple()",
        )
        props2 = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.plain").collect()
        }
        assert "clickhouse.order_by" not in props2
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP DATABASE `{db}` CASCADE")
