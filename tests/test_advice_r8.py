"""Round-8 ADVICE regressions (driver advisor findings on the round-7
literal-opacity diff):

1. ``_string_mask`` / ``ddl._split_top`` / ``ddl._LITERAL_RE`` must
   honor BACKSLASH escapes (``'it\\'s …'`` is one literal — ClickHouse's
   default escaping style), not only the ``''`` doubling.
2. ``_rewrite_limit_by``'s tail regex must parse literal-masked text:
   a ``' LIMIT 9 BY '`` spelling inside a string literal after the
   ORDER BY anchor is data.
3. ``_rewrite_dictget``'s balanced-paren argument scan must skip
   literal positions (``dictGet('d', 'x', concat(k, ')'))``).
4. Claim release is append-only (tombstones): a rival's claim appended
   while a release is in flight is never destroyed, and there is no
   DROP/RENAME read window.
5. ``migrate._split_top_commas`` (PARTITION BY / partition-value
   matching) is quote-aware like its ddl/select_funcs siblings.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import ddl
from clickhouse_migrator_spark import migrate as M
from clickhouse_migrator_spark.functions.select_funcs import (
    _string_mask,
    rewrite_functions,
)


# ── 1: backslash escapes are part of the literal ────────────────────────────


def test_string_mask_backslash_quote_stays_inside_literal():
    q = r"SELECT 'it\'s data SETTINGS max_threads = 1' AS note, v FROM t"
    mask = _string_mask(q)
    lit_start = q.index("'")
    lit_end = q.index("' AS") + 1
    assert all(mask[i] for i in range(lit_start, lit_end))
    assert not mask[q.index(" AS note") + 1]


def test_settings_strip_is_backslash_literal_opaque():
    q = r"SELECT 'it\'s data SETTINGS max_threads = 1' AS note, v FROM t"
    assert M._rewrite_clauses(q) == q
    assert rewrite_functions(q) == q


def test_ddl_split_top_backslash_literal():
    parts = ddl._split_top(r"a = 'x\',y', b = 2")
    assert len(parts) == 2
    assert parts[0].strip() == r"a = 'x\',y'"
    assert parts[1].strip() == "b = 2"


def test_ddl_literal_mask_backslash_roundtrip():
    sql = r"CREATE TABLE t (s String DEFAULT 'it\'s a UInt32, ORDER BY x')"
    masked, lits = ddl._mask_literal_contents(sql)
    # the whole escaped literal collapsed into ONE slot — no stray
    # fragment of the literal remains visible to keyword scans
    assert "UInt32" not in masked and "ORDER BY x" not in masked
    assert ddl._unmask_literal_contents(masked, lits) == sql


def test_map_types_backslash_literal_content_untouched():
    sql = r"s String DEFAULT 'keep UInt32 \' Nullable(Int8)'"
    out = ddl.map_types(sql)
    assert r"'keep UInt32 \' Nullable(Int8)'" in out
    assert out.startswith("s STRING")


# ── 2: LIMIT BY tail parse on literal-masked text ───────────────────────────


def test_limit_by_spelling_inside_literal_after_order_by_is_data():
    q = "SELECT id, v FROM t ORDER BY v, 'a LIMIT 9 BY z'"
    assert M._rewrite_limit_by(q) == q


def test_real_limit_by_with_literal_decoy_in_sort_key():
    q = (
        "SELECT id, g, v FROM t "
        "ORDER BY if(s = 'x LIMIT 9 BY y', 0, 1), v LIMIT 2 BY g"
    )
    out = M._rewrite_limit_by(q)
    # the window partitions on the REAL BY column and keeps the decoy
    # literal intact inside the sort key
    assert "PARTITION BY g" in out
    assert "'x LIMIT 9 BY y'" in out
    assert "__rn <= 2" in out


def test_limit_by_execution_with_literal_decoy(spark):
    pdf_view = "advice8_lb"
    spark.createDataFrame(
        [(i, i % 3, (i * 7) % 11, "x" if i % 2 else "y") for i in range(30)],
        "id int, g int, v int, s string",
    ).createOrReplaceTempView(pdf_view)
    try:
        out = M.execute_and_inflate(
            spark,
            f"SELECT id, g, v, s FROM {pdf_view} "
            "ORDER BY if(s = 'x LIMIT 9 BY y', 0, 1), v, id LIMIT 2 BY g",
        ).collect()
        assert len(out) == 6  # 3 groups × 2
        per_g = {}
        for r in out:
            per_g.setdefault(r.g, []).append(r)
        assert all(len(v) == 2 for v in per_g.values())
    finally:
        spark.catalog.dropTempView(pdf_view)


# ── 3: dictGet argument scan skips literal parens ───────────────────────────


@pytest.fixture()
def dict_db(spark):
    name = "advice8db_" + uuid.uuid4().hex[:8]
    prev = spark.catalog.currentDatabase()
    M.create_db(spark, name)
    spark.catalog.setCurrentDatabase(name)
    yield name
    spark.catalog.setCurrentDatabase(prev)
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_dictget_literal_paren_arg(spark, dict_db):
    M.execute_statement(
        spark,
        "CREATE TABLE kv (k String, val String) ENGINE = MergeTree ORDER BY (k)",
    )
    spark.sql("INSERT INTO kv VALUES ('a)', 'closed'), ('b', 'plain')")
    M.execute_statement(
        spark,
        "CREATE DICTIONARY d8 (k String, val String) PRIMARY KEY k "
        "SOURCE(CLICKHOUSE(TABLE 'kv')) LAYOUT(HASHED()) LIFETIME(300)",
    )
    # the key expression contains a ')' INSIDE a literal — the old
    # depth scan closed the call there and mis-split the args
    rows = M.execute_and_inflate(
        spark,
        "SELECT dictGet('d8', 'val', concat('a', ')')) AS v",
    ).collect()
    assert [r.v for r in rows] == ["closed"]


# ── 5: partition-expression comma split is quote-aware ──────────────────────


def test_migrate_split_top_commas_quote_aware():
    assert M._split_top_commas("if(k = 'a,b', 0, 1), c") == [
        "if(k = 'a,b', 0, 1)",
        "c",
    ]
    assert M._split_top_commas("'x,y'") == ["'x,y'"]


def test_partition_cond_with_literal_comma(spark):
    view = "advice8_part"
    spark.createDataFrame(
        [("a,b", 1), ("z", 2)], "k string, v int"
    ).createOrReplaceTempView(view)
    try:
        cond = M._partition_cond("(if(k = 'a,b', 0, 1))", "0")
        kept = spark.table(view).filter(cond).collect()
        assert [r.k for r in kept] == ["a,b"]
    finally:
        spark.catalog.dropTempView(view)
