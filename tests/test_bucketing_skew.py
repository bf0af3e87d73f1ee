"""Scale-pattern tests: bucketed co-located joins eliminate the join
shuffle; salted joins are result-identical to plain joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.skew import salted_join
from clickhouse_migrator_spark.plans.inspect import _plan_string
from clickhouse_migrator_spark.sources import read_parquet
from clickhouse_migrator_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"]
    )
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy(
                "o_orderstatus"
            ).agg(F.count(F.lit(1)).alias("n"))
            plan = _plan_string(joined)
            # co-located: SortMergeJoin directly over bucketed scans, no
            # Exchange beneath the join
            join_part = plan.split("SortMergeJoin")[-1]
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            # and it computes the right answer
            plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            assert joined.agg(F.sum("n")).collect()[0][0] == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    customer = read_parquet(spark, f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
