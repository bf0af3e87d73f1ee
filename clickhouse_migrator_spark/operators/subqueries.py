"""Subquery surface: scalar, IN, correlated EXISTS, DISTINCT,
LIMIT/OFFSET (SURVEY.md §2.D — the spark.sql() path of the engine; the
DataFrame equivalents of semi/anti live in :mod:`.joins`).

Catalyst rewrites these into the same physical joins the DataFrame API
produces (scalar subquery → broadcast, IN → left semi, EXISTS →
left semi with correlation), so the scale notes of :mod:`.joins` apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import register_views


@register(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "subquery_in_1997_buyers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        """
    )


@register(
    "subquery_exists_shipped_parts",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00')
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_partkey = p_partkey
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00')
        """
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import table

    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY round(o_totalprice, 2) DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM orders
        ORDER BY round(o_totalprice, 2) DESC, o_orderkey
        LIMIT 10 OFFSET 5
        """
    )
