"""Inspect executed plans: shuffle counts, broadcast usage, parquet
pushdown — the audit loop behind every operator's scale notes."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df: DataFrame) -> str:
    """`explain("formatted")` as a string (unlike plan toString it never
    truncates scan details like ReadSchema/PushedFilters)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan.
    AQE may coalesce partitions at runtime but not remove exchanges;
    fewer is better — every one is a full network rewrite of its
    input."""
    return _plan_string(df).count("Exchange hashpartitioning") + _plan_string(df).count(
        "Exchange rangepartitioning"
    )


def count_broadcasts(df: DataFrame) -> int:
    return _plan_string(df).count("BroadcastExchange")


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet scan (PushedFilters)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", _formatted(df))


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning (a scan reading
    all columns for a narrow projection is a bug)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", _formatted(df))


def plan_report(df: DataFrame) -> str:
    return (
        f"shuffles={count_shuffles(df)} broadcasts={count_broadcasts(df)}\n"
        f"pushed_filters={pushed_filters(df)}\n"
        f"scan_columns={scan_columns(df)}"
    )
