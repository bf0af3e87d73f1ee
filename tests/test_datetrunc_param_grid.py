"""date_trunc unit grid vs DuckDB — week-start and quarter semantics
are classic cross-engine divergences; the registered queries pin a
couple of units.  Values compared as ISO date strings (Spark returns
timestamps, DuckDB dates — same instants)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from clickhouse_migrator_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"
UNITS = ["year", "quarter", "month", "week", "day"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return con


@pytest.mark.parametrize("unit", UNITS)
def test_date_trunc_unit_grid(spark, ddb, unit):
    got = {
        (r.k, str(r.t)[:10])
        for r in table(spark, SF_DIR, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.date_trunc(unit, "o_orderdate").alias("t"),
        )
        .collect()
    }
    want = {
        (k, str(t)[:10])
        for k, t in ddb.sql(
            f"SELECT o_orderkey, date_trunc('{unit}', o_orderdate) FROM orders"
        ).fetchall()
    }
    assert got == want
