"""Window-frame parameter grid vs DuckDB: rows-frame bounds, ntile
bucket counts, and lag/lead offsets are classic off-by-one territory,
and the registered queries each pin a single operating point.  All
aggregates run on integer columns (exact under any evaluation order)
with a unique total order, so equality is bit-exact by construction.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from clickhouse_migrator_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"
ORDER = "o_orderkey"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    return con


@pytest.mark.parametrize("lo,hi", [(-1, 1), (-3, 0), (0, 2), (-5, -1), (2, 4)])
def test_rows_frame_bounds_grid(spark, ddb, lo, hi):
    got = {
        (r.k, r.s)
        for r in table(spark, SF_DIR, "orders")
        .select(
            F.col(ORDER).alias("k"),
            F.sum(F.col("o_custkey") + 1)
            .over(
                Window.partitionBy("o_orderstatus")
                .orderBy(ORDER)
                .rowsBetween(lo, hi)
            )
            .alias("s"),
        )
        .collect()
    }

    def bound(n: int, side: str) -> str:
        if n == 0:
            return "CURRENT ROW"
        return f"{abs(n)} {'PRECEDING' if n < 0 else 'FOLLOWING'}"

    want = {
        tuple(r)
        for r in ddb.sql(
            f"""
            SELECT {ORDER} AS k,
                   sum(o_custkey + 1) OVER (
                     PARTITION BY o_orderstatus ORDER BY {ORDER}
                     ROWS BETWEEN {bound(lo, 'lo')} AND {bound(hi, 'hi')}) AS s
            FROM orders
            """
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("n", [2, 3, 7, 16, 100])
def test_ntile_grid(spark, ddb, n):
    got = {
        (r.k, r.t)
        for r in table(spark, SF_DIR, "orders")
        .select(
            F.col(ORDER).alias("k"),
            F.ntile(n)
            .over(Window.partitionBy("o_orderstatus").orderBy(ORDER))
            .alias("t"),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in ddb.sql(
            f"""
            SELECT {ORDER} AS k,
                   ntile({n}) OVER (PARTITION BY o_orderstatus ORDER BY {ORDER}) AS t
            FROM orders
            """
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("off", [1, 2, 5, 17])
def test_lag_lead_offset_grid(spark, ddb, off):
    got = {
        (r.k, r.lg, r.ld)
        for r in table(spark, SF_DIR, "orders")
        .select(
            F.col(ORDER).alias("k"),
            F.lag(ORDER, off)
            .over(Window.partitionBy("o_orderstatus").orderBy(ORDER))
            .alias("lg"),
            F.lead(ORDER, off)
            .over(Window.partitionBy("o_orderstatus").orderBy(ORDER))
            .alias("ld"),
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in ddb.sql(
            f"""
            SELECT {ORDER} AS k,
                   lag({ORDER}, {off}) OVER w AS lg,
                   lead({ORDER}, {off}) OVER w AS ld
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus ORDER BY {ORDER})
            """
        ).fetchall()
    }
    assert got == want
