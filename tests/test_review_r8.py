"""Round-8 code-review regressions (session-diff review findings):

1. ``utrim`` anchors with ``\\z``, not ``$`` — Java's ``$`` also
   matches before a FINAL line terminator, so a Zs run preceding a
   trailing newline was stripped while DuckDB's trim (stopping at the
   non-Zs newline) kept it.
2. ``ALTER UPDATE`` must REJECT an unknown assignment column (the
   simultaneous-projection rewrite would otherwise silently no-op it
   and record the migration as applied) and duplicate assignments.
3. Mixed NULL/non-NULL map keys render in the same order both engines
   (Spark struct sort is NULLS FIRST; oracles say so explicitly).
4. ``_table_location`` percent-decodes the Hadoop URI so warehouse
   paths with spaces survive the atomic claim append.
"""

from __future__ import annotations

import uuid

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark import migrate as M
from clickhouse_migrator_spark.hashsafe import utrim


@pytest.mark.parametrize(
    "text",
    [
        "hello \n",       # Zs before a FINAL newline — $ stripped it
        "hello\xa0\r",
        "a \n b ",        # trailing Zs at true end — still stripped
        "\xa0lead",
    ],
)
def test_utrim_final_line_terminator_parity(spark, text):
    got = (
        spark.createDataFrame([(text,)], "t string")
        .select(utrim(F.col("t")).alias("x"))
        .collect()[0]
        .x
    )
    want = duckdb.execute("SELECT trim(?)", [text]).fetchone()[0]
    assert got == want, (repr(text), repr(got), repr(want))


def test_utrim_btrim_equals_regex_spec_on_all_zs(spark):
    """The r9 btrim fast path must equal the anchored \\p{Zs} regex
    SPEC character-for-character: every Zs codepoint alone and layered
    with non-Zs whitespace (tab/newline stay, exactly like DuckDB),
    verified against DuckDB trim() itself in the same sweep."""
    from clickhouse_migrator_spark.hashsafe import _UNICODE_WS_EDGES, _ZS_CHARS

    assert len(_ZS_CHARS) == 17
    cases = []
    for z in _ZS_CHARS:
        cases.extend(
            [
                f"{z}x{z}",
                f"{z}{z}a b{z}\n",   # Zs then final newline: newline survives
                f"\t{z}mid{z}\t",    # tab is NOT Zs: survives on both ends
                f"{z}",
                f"x{z}y",            # interior Zs untouched
            ]
        )
    cases.extend(["", "\n", "   　 ", "no-ws"])
    df = spark.createDataFrame([(c,) for c in cases], "t string").select(
        F.col("t"),
        utrim(F.col("t")).alias("fast"),
        F.regexp_replace(F.col("t"), _UNICODE_WS_EDGES, "").alias("spec"),
    )
    for r in df.collect():
        assert r.fast == r.spec, repr(r.t)
        want = duckdb.execute("SELECT trim(?)", [r.t]).fetchone()[0]
        assert r.fast == want, (repr(r.t), repr(r.fast), repr(want))


@pytest.fixture()
def db(spark):
    name = "reviewdb_" + uuid.uuid4().hex[:8]
    M.create_db(spark, name)
    spark.catalog.setCurrentDatabase(name)
    yield name
    spark.catalog.setCurrentDatabase("default")
    spark.sql(f"DROP DATABASE `{name}` CASCADE")


def test_alter_update_unknown_column_raises(spark, db):
    M.execute_statement(
        spark, "CREATE TABLE t_rv (v Int64) ENGINE = MergeTree ORDER BY tuple()"
    )
    spark.sql(f"INSERT INTO `{db}`.t_rv VALUES (1)")
    with pytest.raises(ValueError, match="unknown column"):
        M.execute_statement(spark, "ALTER TABLE t_rv UPDATE tpyo = 0 WHERE v > 0")
    with pytest.raises(ValueError, match="twice"):
        M.execute_statement(
            spark, "ALTER TABLE t_rv UPDATE v = 1, v = 2 WHERE v > 0"
        )
    # case-only mismatch is rejected with a did-you-mean (ClickHouse
    # column names are case-sensitive — ADVICE r9 superseded the r8
    # case-insensitive resolution)
    with pytest.raises(ValueError, match="did you mean 'v'"):
        M.execute_statement(spark, "ALTER TABLE t_rv UPDATE V = v + 1 WHERE v > 0")
    M.execute_statement(spark, "ALTER TABLE t_rv UPDATE v = v + 1 WHERE v > 0")
    assert spark.table(f"`{db}`.t_rv").collect()[0].v == 2


def test_mixed_null_map_keys_render_consistently(spark, tmp_path):
    """agg_summap_user_values on a user with a NULL-typed event: keys
    skip the NULL (concat_ws), values keep it FIRST — identical to the
    oracle's NULLS FIRST ordering."""
    import __spark_entry__ as e

    events = spark.createDataFrame(
        [
            (1, None, 1, None, 10.0, None),
            (2, None, 1, "click", 5.0, None),
            (3, None, 1, "view", 2.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    events.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    row = e.queries()["agg_summap_user_values"](spark, sf).collect()[0]
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob its part files for DuckDB
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = con.sql(e.oracle_sql()["agg_summap_user_values"]).fetchone()
    assert (row.user_id, row.map_keys, row.map_values) == want
    assert row.map_keys == "click,view"
    assert row.map_values.split(",")[0] == "10.00"  # NULL key's sum first


def test_table_location_unquotes_percent_escapes(spark, tmp_path, monkeypatch):
    # faked DESCRIBE output must carry the section header: since the
    # r12 section-aware parse, a Location row is only metadata when it
    # appears AFTER '# Detailed Table Information' (a data column named
    # 'Location' no longer shadows it)
    def _row(name, dtype):
        r = type("_Row", (), {})()
        r.col_name, r.data_type = name, dtype
        return r

    rows = [
        _row("k", "bigint"),
        _row("# Detailed Table Information", ""),
        _row("Location", "file:/tmp/Application%20Support/wh/t"),
    ]
    monkeypatch.setattr(
        M.SparkSession, "sql", lambda self, q: _FakeDF(rows), raising=False
    )

    class _FakeDF:
        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    assert (
        M._table_location(spark, "`x`.`t`")
        == "/tmp/Application Support/wh/t"
    )
