"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 pricing summary) at sf0.001.
``queries()`` / ``oracle_sql()`` — every implemented operator from
SURVEY.md §2, registered in :mod:`clickhouse_migrator_spark.registry`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clickhouse_migrator_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from clickhouse_migrator_spark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in ``queries()`` that is
    SQL-expressible; probabilistic/streaming ops are omitted (rows-only
    check)."""
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
