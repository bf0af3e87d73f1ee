"""TPC-H-style analytics over the driver's star schema (SURVEY.md §2.D M3).

The reference engine's own compute surface stops at COUNT(*) pass-through
(`/root/reference/clickhouse_migrate/migrate.py` — see SURVEY.md §2.C C6);
these queries are the driver-mandated analytics extension, expressed as
declarative DataFrame plans so Catalyst does pushdown/pruning/broadcast.

Scale notes per query are in each docstring.  Common rules:
- aggregates are rounded *in-engine* (both Spark and the DuckDB oracle)
  so cross-engine float drift cannot flip the value hash;
- every top-k orders by the rounded measure with a unique tie-break key,
  so LIMIT selects the same rows in both engines;
- small dimensions (region/nation/supplier/customer at these SFs) are
  explicitly broadcast where the 100 TB plan would want it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..hashsafe import oracle_round_quotient, round_quotient
from ..registry import register
from ..tables import table


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)                                    AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)                               AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2)            AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,8))) AS DOUBLE), 2) AS sum_charge,
           {oracle_round_quotient("sum(CAST(l_quantity AS DECIMAL(18,2)))", "count(l_quantity)", 4)} AS avg_qty,
           {oracle_round_quotient("sum(CAST(l_extendedprice AS DECIMAL(18,2)))", "count(l_extendedprice)", 4)} AS avg_price,
           {oracle_round_quotient("sum(CAST(l_discount AS DECIMAL(18,2)))", "count(l_discount)", 4)} AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy partial-aggregation benchmark.

    Scale: single scan + hash aggregate on a 6-value grouping key —
    map-side partial agg reduces the shuffle to #groups×#tasks rows; the
    shipdate filter is pushed to the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # each decimal cast is hoisted into ONE projection (repeating the
    # cast inside every aggregate is not CSE'd across aggregate
    # expressions — measured 2.0 s → 1.3 s at sf0.1).  Decimal (not an
    # integer money grid): a bigint cents/micros grid overflows 2⁶³ for
    # the charge sum at roughly SF100 per group — the decimal's 128-bit
    # widened sum is the representation that survives 100 TB.
    proj = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,2)").alias("_q"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("_p"),
        disc_price.cast("decimal(18,6)").alias("_dp"),
        (disc_price * (1 + F.col("l_tax"))).cast("decimal(18,8)").alias("_ch"),
        F.col("l_discount").cast("decimal(18,2)").alias("_dc"),
    )
    return (
        proj.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("_q").cast("double"), 2).alias("sum_qty"),
            F.round(F.sum("_p").cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum("_dp").cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum("_ch").cast("double"), 2).alias("sum_charge"),
            round_quotient(F.sum("_q"), F.count("_q"), 4).alias("avg_qty"),
            round_quotient(F.sum("_p"), F.count("_p"), 4).alias("avg_price"),
            round_quotient(F.sum("_dc"), F.count("_dc"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → fact join → top-k.

    Scale: the filtered customer side is small → broadcast to avoid a
    fact-table shuffle; lineitem⨝orders is the one real shuffle join
    (both sides partitioned on orderkey); TakeOrderedAndProject does the
    distributed top-k (no global sort).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double"), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: five-way join with a region filter.

    Scale: region/nation/supplier/customer are dimensions → broadcast
    them all; only lineitem⨝orders shuffles.  Catalyst prunes unused
    columns from every scan.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double"), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate is
    pushdown-eligible (shows up as PushedFilters in the scan node)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY round(o_totalprice, 2) DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-subquery membership → semi-join on the fact key.

    Scale: the qualifying-orders set is produced by one aggregation of
    lineitem and semi-joined back on l_orderkey — both sides partition
    on the same key, so AQE can reuse the exchange; top-k via
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 150)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(big_orders.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc(F.round(F.col("totalprice"), 2)), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
             min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size >= 30
    )
    SELECT DISTINCT p_partkey, s_suppkey, s_name,
           round(s_acctbal, 2) AS acctbal, n_name
    FROM costs WHERE s_acctbal = min_bal
    ORDER BY p_partkey, s_suppkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a dimension join (the
    correlated-subquery formulation rewritten as a window min — one
    shuffle on p_partkey instead of a per-row subquery)."""
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
           round(any_value(c_acctbal), 2) AS c_acctbal,
           any_value(n_name) AS n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking (join + group + top-k).

    Scale: nation broadcast; group key is c_custkey so the orders⨝
    lineitem output re-shuffles once; top-20 via TakeOrderedAndProject.
    (`any_value` on functionally-dependent columns avoids widening the
    grouping key — same trick both engines.)
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double"), 2).alias(
                "revenue"
            ),
            F.round(F.any_value(F.col("c_acctbal")), 2).alias("c_acctbal"),
            F.any_value(F.col("n_name")).alias("n_name"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
