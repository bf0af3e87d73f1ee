"""Incremental rollup refresh: only affected day-partitions change, and
the refreshed table always equals a from-scratch recompute."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.rollup import (
    hourly_event_rollup,
    init_rollup,
    refresh_rollup,
)
from clickhouse_migrator_spark.tables import table as load_table


def _snapshot(spark, tbl):
    return {
        (r.bucket, r.event_type): (r.n_events, r.total_value)
        for r in spark.table(tbl).collect()
    }


def test_refresh_only_touched_days_and_matches_full_recompute(spark, sf_dir):
    db = "rolldb_" + uuid.uuid4().hex[:8]
    spark.sql(f"CREATE DATABASE {db}")
    tbl = f"{db}.hourly"
    try:
        events = load_table(spark, sf_dir, "events")
        day0 = events.select(F.to_date(F.min("ts"))).collect()[0][0]
        base = events.filter(F.to_date("ts") != day0.isoformat())
        late = events.filter(F.to_date("ts") == day0.isoformat())
        assert late.count() > 0

        init_rollup(spark, base, tbl)
        before = _snapshot(spark, tbl)
        assert all(b.date() != day0 for b, _ in before)

        refreshed_days = refresh_rollup(spark, late, events, tbl)
        assert refreshed_days == [day0.isoformat()]

        after = _snapshot(spark, tbl)
        # untouched days identical
        for k, v in before.items():
            assert after[k] == v
        # full recompute equivalence
        expect = {
            (r.bucket, r.event_type): (r.n_events, r.total_value)
            for r in hourly_event_rollup(events).collect()
        }
        assert after == expect
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_refresh_with_no_new_events_is_noop(spark, sf_dir):
    db = "rolldb_" + uuid.uuid4().hex[:8]
    spark.sql(f"CREATE DATABASE {db}")
    tbl = f"{db}.hourly"
    try:
        events = load_table(spark, sf_dir, "events")
        init_rollup(spark, events, tbl)
        before = _snapshot(spark, tbl)
        assert refresh_rollup(spark, events.limit(0), events, tbl) == []
        assert _snapshot(spark, tbl) == before
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")
