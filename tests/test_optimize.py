"""OPTIMIZE TABLE semantics: Replacing-engine key dedupe and plain
compaction, driven through the migration runner's statement executor."""

from __future__ import annotations

import uuid

from clickhouse_migrator_spark import migrate as M


def _fresh_db(spark):
    db = "optdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, db)
    spark.catalog.setCurrentDatabase(db)
    return db


def _drop(spark, db):
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE `{db}` CASCADE")


def test_optimize_replacing_dedupes_on_order_by_key(spark):
    db = _fresh_db(spark)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE kv (id UInt64, v UInt64, note String) "
            "ENGINE = ReplacingMergeTree ORDER BY (id)",
        )
        spark.sql(
            "INSERT INTO kv VALUES (1, 10, 'a'), (1, 30, 'b'), (1, 20, 'z'), "
            "(2, 5, 'only'), (3, 7, 'x'), (3, 7, 'x')"
        )
        M.execute_statement(spark, "OPTIMIZE TABLE kv FINAL")
        rows = {r.id: (r.v, r.note) for r in spark.table("kv").collect()}
        assert len(rows) == 3
        # survivor is the max of the non-key struct (deterministic)
        assert rows[1] == (30, "b")
        assert rows[2] == (5, "only")
        assert rows[3] == (7, "x")
    finally:
        _drop(spark, db)


def test_optimize_deduplicate_clause_on_plain_engine(spark):
    db = _fresh_db(spark)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE ev (id UInt64, v UInt64) ENGINE = MergeTree ORDER BY (id)",
        )
        spark.sql("INSERT INTO ev VALUES (1, 1), (1, 1), (2, 2), (1, 9)")
        M.execute_statement(spark, "OPTIMIZE TABLE ev FINAL DEDUPLICATE")
        rows = {r.id: r.v for r in spark.table("ev").collect()}
        assert rows == {1: 9, 2: 2}
    finally:
        _drop(spark, db)


def test_optimize_plain_compacts_preserving_rows_and_props(spark):
    db = _fresh_db(spark)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE big (id UInt64, v UInt64) ENGINE = MergeTree ORDER BY (id)",
        )
        spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(16).write.mode(
            "append"
        ).insertInto(f"`{db}`.big")
        M.execute_statement(spark, "OPTIMIZE TABLE big")
        assert spark.table("big").count() == 1000
        # sum unchanged — compaction must not alter data
        assert spark.table("big").selectExpr("sum(v)").collect()[0][0] == 999 * 1000
        props = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.big").collect()
        }
        assert props.get("clickhouse.order_by") == "(id)"
        assert props.get("clickhouse.engine") == "MergeTree"
    finally:
        _drop(spark, db)


def test_props_survive_mutation_then_optimize_dedupes(spark):
    # regression: ADD COLUMN / UPDATE go through the copy-on-write swap,
    # which must carry clickhouse.* properties so OPTIMIZE still knows
    # the engine + ORDER BY key afterwards
    db = _fresh_db(spark)
    try:
        M.execute_statement(
            spark,
            "CREATE TABLE rkv (id UInt64, v UInt64) "
            "ENGINE = ReplacingMergeTree ORDER BY (id)",
        )
        spark.sql("INSERT INTO rkv VALUES (1, 1), (1, 2), (2, 3)")
        M.execute_statement(spark, "ALTER TABLE rkv ADD COLUMN flag UInt8 DEFAULT 0")
        M.execute_statement(spark, "ALTER TABLE rkv UPDATE flag = 1 WHERE v >= 2")
        props = {
            r.key: r.value
            for r in spark.sql(f"SHOW TBLPROPERTIES `{db}`.rkv").collect()
        }
        assert props.get("clickhouse.engine") == "ReplacingMergeTree"
        assert props.get("clickhouse.order_by") == "(id)"
        M.execute_statement(spark, "OPTIMIZE TABLE rkv FINAL")
        rows = {r.id: (r.v, r.flag) for r in spark.table("rkv").collect()}
        assert rows == {1: (2, 1), 2: (3, 1)}
    finally:
        _drop(spark, db)
