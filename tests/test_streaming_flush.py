"""Opt-in trailing-session flush for availableNow drains (VERDICT r10
#5): ``sessionize_with_state(flush_trailing=True)`` appends the
watermark-advancing sentinel internally, so a drain emits sessions whose
last event falls within (watermark delay + pad) of stream end — the
sessions a plain drain provably withholds."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark.streaming.events_stream import (
    FLUSH_SENTINEL_USER_ID,
    run_to_memory,
    sessionize_with_state,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _mk_events(spark):
    """user 1: a CLOSED session (two events, then a >30 min gap) and an
    OPEN one ending at the stream max; user 2: one OPEN session.  Both
    open sessions end within (delay 1 min + pad 60 s) of stream end."""
    rows = [
        (1, T0 + dt.timedelta(minutes=0), 1.0),
        (1, T0 + dt.timedelta(minutes=10), 2.0),
        (1, T0 + dt.timedelta(minutes=60), 4.0),
        (1, T0 + dt.timedelta(minutes=70), 8.0),
        (2, T0 + dt.timedelta(minutes=65), 16.0),
        (2, T0 + dt.timedelta(minutes=70), 32.0),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    d = tempfile.mkdtemp(prefix="flush_events_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return d, df.schema


def _drain(spark, d, schema, **kw):
    stream = spark.readStream.schema(schema).parquet(d)
    name = run_to_memory(sessionize_with_state(stream, **kw), mode="append", timeout_s=120)
    return sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in spark.table(name).collect()
    )


def test_plain_drain_withholds_trailing_sessions(spark):
    d, schema = _mk_events(spark)
    got = _drain(spark, d, schema)
    # only user 1's CLOSED session times out (watermark reaches
    # max - 1 min = T0+69 min > its last event + pad); both trailing
    # sessions stay in state — the documented gap
    assert got == [(1, 2, 3.0)]


def test_flush_trailing_emits_all_sessions(spark):
    d, schema = _mk_events(spark)
    got = _drain(spark, d, schema, flush_trailing=True)
    assert got == [(1, 2, 3.0), (1, 2, 12.0), (2, 2, 48.0)]


def test_flush_trailing_sentinel_row_not_in_output(spark):
    d, schema = _mk_events(spark)
    stream = spark.readStream.schema(schema).parquet(d)
    name = run_to_memory(
        sessionize_with_state(stream, flush_trailing=True),
        mode="append",
        timeout_s=120,
    )
    assert (
        spark.table(name).filter(F.col("user_id") == FLUSH_SENTINEL_USER_ID).count()
        == 0
    )


def test_flush_sentinel_default_is_negative():
    """ADVICE r11: the old positive default (999_999_999) could equal a
    real user id, whose sessions the output filter silently dropped —
    the default must sit outside any non-negative id domain."""
    assert FLUSH_SENTINEL_USER_ID < 0
    assert -(2**31) <= FLUSH_SENTINEL_USER_ID  # int32-castable


def test_flush_sentinel_tempdir_registered_for_cleanup(spark):
    """ADVICE r11: each flush_trailing call creates a sentinel parquet
    dir that must be registered for exit-time cleanup, not leaked."""
    from clickhouse_migrator_spark.streaming import events_stream as ES

    d, schema = _mk_events(spark)
    stream = spark.readStream.schema(schema).parquet(d)
    before = len(ES._SENTINEL_DIRS)
    sessionize_with_state(stream, flush_trailing=True)
    assert len(ES._SENTINEL_DIRS) == before + 1
    import os

    assert os.path.isdir(ES._SENTINEL_DIRS[-1])


def test_flush_trailing_split_backlog_surfaces_misuse(spark):
    """VERDICT r11 #6: flush_trailing + a per-source rate limit splits
    the backlog across triggers; rows after the sentinel's batch are
    silently dropped as late.  The drain must SURFACE that (loud error
    via the counted numRowsDroppedByWatermark metric), not swallow it."""
    d, schema = _mk_events(spark)
    # maxFilesPerTrigger=1 on a multi-file backlog: second file's rows
    # arrive after the sentinel advanced the watermark to ~2100
    rows2 = [(3, T0 + dt.timedelta(minutes=5), 64.0)]
    spark.createDataFrame(
        rows2, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    ).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    with pytest.raises(RuntimeError, match="discarded late rows"):
        run_to_memory(
            sessionize_with_state(stream, flush_trailing=True),
            mode="append",
            timeout_s=120,
            require_no_late_drops=True,
        )


def test_flush_trailing_clean_drain_passes_late_drop_guard(spark):
    """The guard is silent on a correct single-batch drain."""
    d, schema = _mk_events(spark)
    stream = spark.readStream.schema(schema).parquet(d)
    name = run_to_memory(
        sessionize_with_state(stream, flush_trailing=True),
        mode="append",
        timeout_s=120,
        require_no_late_drops=True,
    )
    assert spark.table(name).count() == 3


def test_flush_trailing_requires_timestamp_ts(spark):
    df = spark.createDataFrame(
        [(1, 170000000, 1.0)], "user_id BIGINT, ts BIGINT, value DOUBLE"
    )
    d = tempfile.mkdtemp(prefix="flush_badts_")
    df.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    with pytest.raises(ValueError, match="timestamp-typed ts"):
        sessionize_with_state(stream, flush_trailing=True)
