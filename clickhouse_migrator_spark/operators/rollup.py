"""Incremental rollup maintenance (hypertable continuous-aggregate
pattern; NOT-IN-REFERENCE — SURVEY.md §2.D extension surface).

A rollup table holds a bucketed aggregate of a fact table, partitioned
by the bucket date.  ``refresh_rollup`` recomputes ONLY the partitions
touched by a new slice of facts (dynamic partition overwrite), so the
maintenance cost is O(new data), not O(history) — the property that
makes an hourly rollup affordable when the fact table is 100 TB and a
day of late events is a few GB.

The same declarative aggregate serves both the initial backfill and
every refresh, so the rollup can never drift from its definition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

AggFn = Callable[[DataFrame], DataFrame]


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """The canonical aggregate: hourly per-type counts/sums with the
    partition-date column derived from the bucket."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("total_value"),
        )
        .withColumn("day", F.to_date("bucket"))
    )


def init_rollup(
    spark: SparkSession,
    events: DataFrame,
    table: str,
    agg: AggFn = hourly_event_rollup,
) -> None:
    """Full backfill: one aggregation pass, written partitioned by day
    so later refreshes can replace single days."""
    agg(events).write.mode("overwrite").format("parquet").partitionBy(
        "day"
    ).saveAsTable(table)


def refresh_rollup(
    spark: SparkSession,
    new_events: DataFrame,
    events_all: DataFrame,
    table: str,
    agg: AggFn = hourly_event_rollup,
) -> list[str]:
    """Incrementally refresh ``table`` for the days present in
    ``new_events``.

    The affected-day set is computed from the new slice (tiny), the
    aggregate is recomputed from ``events_all`` restricted to those
    days (partition-pruned scan), and ``partitionOverwriteMode=dynamic``
    replaces exactly those day-partitions — untouched history is never
    rewritten or even read.  Returns the refreshed day strings."""
    days = [
        r.day.isoformat()
        for r in new_events.select(F.to_date(F.date_trunc("hour", "ts")).alias("day"))
        .distinct()
        .collect()
    ]
    if not days:
        return []
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        refreshed = agg(events_all.filter(F.to_date("ts").isin(days)))
        refreshed.write.mode("overwrite").format("parquet").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(days)
