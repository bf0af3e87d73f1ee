"""Exact-quantile q-grid vs DuckDB.

Spark's ``percentile`` and DuckDB's ``quantile_cont`` use the same
linear-interpolation definition; the registered queries pin a handful
of q values, and this sweeps a finer grid (including non-representable
thirds) globally and per group, on a price double and an integer
column — interpolation-formula drift or off-by-one rank handling would
surface as a bit mismatch.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from clickhouse_migrator_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"
QS = [0.01, 0.1, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 0.9, 0.99]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    return con


@pytest.mark.parametrize("col", ["l_extendedprice", "l_quantity"])
def test_global_quantile_grid_bit_exact(spark, ddb, col):
    got = [
        float(v)
        for v in table(spark, SF_DIR, "lineitem")
        .agg(*[F.expr(f"percentile({col}, {q!r})").alias(f"q{i}") for i, q in enumerate(QS)])
        .first()
    ]
    want = [
        float(v)
        for v in ddb.sql(
            "SELECT "
            + ",".join(f"quantile_cont(CAST({col} AS DOUBLE), {q!r})" for q in QS)
            + " FROM lineitem"
        ).fetchone()
    ]
    assert got == want


def test_grouped_quantile_grid_bit_exact(spark, ddb):
    got = {
        r[0]: [float(v) for v in r[1:]]
        for r in table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {q!r})").alias(f"q{i}")
                for i, q in enumerate(QS)
            ]
        )
        .collect()
    }
    want = {
        r[0]: [float(v) for v in r[1:]]
        for r in ddb.sql(
            "SELECT l_returnflag, "
            + ",".join(
                f"quantile_cont(CAST(l_extendedprice AS DOUBLE), {q!r})" for q in QS
            )
            + " FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    }
    assert got == want
