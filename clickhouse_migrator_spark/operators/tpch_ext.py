"""Extended TPC-H pack: the remaining classic queries, adapted to the
driver fixtures (SURVEY.md §2.D M3).

The fixtures omit ``partsupp`` and several TPC-H columns
(``l_shipmode/l_commitdate/l_receiptdate``, ``o_comment``, ``c_phone``,
``p_container``), so queries that depend on them are *adapted*: the join
topology, aggregation shape, and subquery style of the original are
preserved while predicates use available columns.  Each docstring notes
the adaptation.  q21 (multi-lineitem waiting-supplier logic) is the one
query with no faithful adaptation — it requires commit/receipt dates.

Scale rules follow :mod:`.tpch`: dimension sides broadcast, rounded
aggregates computed identically in both engines, deterministic
tie-breaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..hashsafe import oracle_round_quotient, round_quotient
from ..registry import register
from ..tables import table


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: `l_commitdate < l_receiptdate` → shipped more
    than 60 days after order date).  EXISTS → left-semi join with a
    non-equi residual; the equi part (orderkey) still drives a hash
    join, so the fact tables co-partition on the same key."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year between two nations.

    Scale: nation joined twice under different aliases (supplier side /
    customer side), both broadcast; the OR-pair predicate is applied
    after both nation names are in scope, and Catalyst pushes the
    derivable single-nation IN-filters down each side."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume").cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           {oracle_round_quotient(
               "sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)",
               "sum(volume)", 4, den_scale=6, num_scale=6)} AS mkt_share
    FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted: p_type literal 'ECONOMY' — fixture types are
    single words): one nation's supplier share of regional revenue per
    year, via conditional aggregation over an 8-way join.  All
    dimension sides broadcast; lineitem⨝orders is the only shuffle."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            round_quotient(
                F.sum(
                    F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ),
                F.sum("volume"),
                4,
                den_scale=6,
                # volume is decimal(18,6): the true numerator scale is 6,
                # not k+den_scale=10 — this sizes the pre-multiply cast to
                # 1e20 of integer headroom instead of 1e16 (ADVICE r5 #1)
                num_scale=6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
    FROM (SELECT n_name AS nation,
                 EXTRACT(year FROM o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - p_retailprice * 0.1 * l_quantity AS DECIMAL(18,6)) AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no ``partsupp`` fixture, so supply cost is
    proxied as 10% of ``p_retailprice``): profit by supplier nation and
    order year for parts matching a name pattern.  The LIKE filter
    shrinks part before its broadcast; only lineitem⨝orders shuffles."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: no ``l_shipmode``/``l_receiptdate`` — groups
    by ``l_linestatus`` and defines "late" as shipped >90 days after
    the order date): priority mix of late shipments, the classic
    conditional two-counter aggregation."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: no ``o_comment`` filter): histogram of
    orders-per-customer.  Two-level aggregation; the second groupBy is
    over a tiny domain (distinct counts), so the second shuffle is
    negligible.  ``count(o_orderkey)`` counts non-null keys only, which
    makes customers with zero orders land in bucket 0 — same semantics
    both engines."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT {oracle_round_quotient(
               "sum(CASE WHEN p_type = 'PROMO'"
               "     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
               "     ELSE 0 END) * 100",
               "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))",
               4, den_scale=6, num_scale=6)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (adapted: ``p_type = 'PROMO'`` literal instead of
    ``LIKE 'PROMO%'`` — fixture types are single words): promotional
    revenue share for one month.  Part is broadcast; the month filter
    is pushed to the lineitem scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # decimal(18,6) holds the 4-dp product exactly: the share is an
    # exact rational, rounded engine-invariantly (hashsafe.round_quotient)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            round_quotient(
                # otherwise() must stay decimal: a 0.0 double literal
                # coerces the branch to DOUBLE and the sum goes float
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                )
                * 100,
                F.sum(rev),
                4,
                den_scale=6,
                # numerator = promo sum × 100, still scale 6: sized cast
                # gives the raw sum 1e18 headroom after the ×100 (was 1e14)
                num_scale=6,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue.

    Scale: the revenue view is one aggregation of lineitem
    (#suppliers rows); the global max is a single-row aggregate
    broadcast back — NOT a Window over one giant partition, which
    would funnel every supplier through one task at 100 TB."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double"), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: no ``partsupp`` — supplier/part
    relationships come from observed lineitem pairs; no comment-based
    complaint filter): distinct-supplier counts per part descriptor.
    count(DISTINCT) over the join expands to a two-phase aggregate
    (dedup then count) planned by Catalyst — no manual dropDuplicates
    needed."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted: no ``p_container`` filter): revenue lost to
    small-quantity orders.  The correlated average-quantity subquery is
    decorrelated into one per-part aggregate joined back on partkey —
    one extra shuffle of (partkey, avg) instead of a per-row subquery."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part_avg), li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: no container/shipmode legs in the
    conjuncts): disjunction of brand/size/quantity bands evaluated on
    the joined row.  Catalyst extracts the common join key and pushes
    the derivable brand-IN filter into the part scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")).cast("double"), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q20_promo_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, round(total_qty, 2) AS total_qty
    FROM supplier
    JOIN (SELECT l_suppkey, sum(l_quantity) AS total_qty
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 50) shipped ON s_suppkey = l_suppkey
    ORDER BY s_suppkey
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: no ``partsupp`` availability ledger —
    "excess stock" becomes "shipped more than a threshold quantity of
    PROMO parts in the year"): agg→HAVING→join back to the supplier
    dimension.  The aggregate output (#suppliers rows) is tiny, so the
    final join broadcasts it."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 50)
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(F.broadcast(shipped), supp.s_suppkey == shipped.l_suppkey)
        .select("s_suppkey", "s_name", F.round("raw_qty", 2).alias("total_qty"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT n_name, count(*) AS numcust, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: no ``c_phone`` country codes — grouped by
    nation; "never ordered" relaxed to "no orders since 1999" because
    every fixture customer has ordered): wealthy-but-dormant customers.
    The scalar average is a 1-row aggregate broadcast into the filter;
    NOT EXISTS is a left-anti join against the date-filtered orders."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH natsupp AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'),
    value_by_part AS (
      SELECT l_partkey,
             round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS part_value
      FROM lineitem JOIN natsupp ON l_suppkey = s_suppkey
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, part_value
    FROM value_by_part
    WHERE part_value > (SELECT avg(part_value) * 2 FROM value_by_part)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: no ``partsupp`` fixture — "stock value"
    becomes observed shipped revenue per part from one nation's
    suppliers; threshold relaxed to 2x the mean per-part value, stable across scale factors):
    parts representing an outsized share of a nation's supply value.

    Scale: the nation's supplier keys are a broadcast semi-join into
    the fact scan (no fact shuffle for the filter); one groupBy on
    partkey; the national total is a 1-row aggregate broadcast back
    into the threshold filter — the correlated subquery never becomes
    a per-row recompute."""
    nat = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vals = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(nat), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            # decimal-exact sum (the float sum flipped .005-boundary
            # part values at sf0.1 — the hashsafe float-sum rule)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                2,
            ).alias("part_value")
        )
    )
    thresh = vals.agg((F.avg("part_value") * 2).alias("threshold"))
    return (
        vals.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM flagged GROUP BY l_orderkey),
    waiting AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey
      FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
      WHERE f.late AND p.n_supp >= 2 AND p.n_late_supp = 1)
    SELECT s_name, count(*) AS numwait
    FROM waiting JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: no ``l_commitdate``/``l_receiptdate`` in the
    fixtures — "kept the order waiting" becomes shipping more than 60
    days after the order date): suppliers who were the SOLE late
    supplier on a multi-supplier finalized order.  The original's
    EXISTS (another supplier) / NOT EXISTS (another late supplier)
    double-correlation is re-expressed as one per-order aggregate
    producing both counts — same topology, one pass.

    Scale: lineitem⨝orders is the one fact-fact shuffle (both sides
    hash on orderkey; the per-order aggregate reuses that exchange);
    supplier is broadcast; the final count is supplier-keyed.  No
    correlated re-scans — the classic Q21 trap at 100 TB."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    flagged = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    waiting = (
        flagged.filter(F.col("late"))
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
