"""Set-operation pack: UNION [ALL] / INTERSECT / EXCEPT (SURVEY.md §2.D;
absent from the reference — its exhaustiveness statement lists "no set
operations").

Scale notes: UNION ALL is a free concatenation (no shuffle); the
DISTINCT variants shuffle on the full row — keep projections narrow
before them (done here: key-only projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table


def _parties(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("kind"),
    )
    return c, s


@register(
    "setop_union_all_parties",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name, c_nationkey AS nationkey,
           'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_nationkey, 'supplier' FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = _parties(spark, sf_dir)
    return c.unionByName(s)


@register(
    "setop_union_distinct_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set) semantics, not EXCEPT ALL


@register(
    "setop_intersect_all_flag_bags",
    oracle="""
    SELECT l_returnflag AS flag, count(*) AS n
    FROM (SELECT l_returnflag FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          INTERSECT ALL
          SELECT l_returnflag FROM lineitem
          WHERE l_quantity >= 25)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (per-value multiplicity =
    min of the two sides), distinct from the set INTERSECT above.
    Planned as an aggregate of per-side counts, not a pairwise join."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    ).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") >= 25).select(F.col("l_returnflag").alias("flag"))
    return (
        a.intersectAll(b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("flag")
    )


@register(
    "setop_except_all_flag_bags",
    oracle="""
    SELECT l_returnflag AS flag, count(*) AS n
    FROM (SELECT l_returnflag FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          EXCEPT ALL
          SELECT l_returnflag FROM lineitem
          WHERE l_quantity >= 45)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicity = left minus
    right, floored at zero)."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(
        F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    ).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_quantity") >= 45).select(F.col("l_returnflag").alias("flag"))
    return (
        a.exceptAll(b)
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("flag")
    )
