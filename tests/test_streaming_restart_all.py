"""Checkpoint-restart coverage for ALL FOUR stateful streaming mirrors
(VERDICT r9 #6) — sessions, spend alarm, dedup-within-watermark,
hourly-HLL.  One restart test existed (plain dropDuplicates,
tests/test_streaming_restart.py); these extend the same crash shape —
run 1 drains file A and commits the checkpoint, the query object dies,
file B arrives while the pipeline is down, run 2 resumes from the SAME
checkpoint — to every stateful operator, with data constructed so the
correct answer REQUIRES the restored state:

- sessions: a user's session spans A and B within the gap — one merged
  session iff applyInPandasWithState state survived;
- spend alarm: the threshold-crossing purchase is in B, the running
  total that makes it cross accumulated in A;
- dedup-within-watermark: B repeats half of A's (user, type, minute)
  keys inside the watermark horizon — suppressed iff dedup state
  survived;
- hourly HLL: the same hour's users split across A and B — the
  restored per-window sketch must MERGE, not restart from B alone.

Each final sink is asserted against the batch oracle over A ∪ B.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark.streaming.events_stream import (
    SPEND_ALARM_THRESHOLD,
    sessionize_with_state,
    spend_alarm_with_state,
)


def _one_file(df, dest_path, tmpdir, mtime=None):
    d = f"{tmpdir}/_stage_{uuid.uuid4().hex[:6]}"
    df.coalesce(1).write.mode("overwrite").parquet(d)
    shutil.move(glob.glob(f"{d}/part-*.parquet")[0], dest_path)
    shutil.rmtree(d, ignore_errors=True)
    if mtime is not None:
        os.utime(dest_path, (mtime, mtime))


def _drain(stream_df, out, chk, mode="append", timeout=180):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()


SESS_SCHEMA = "ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def test_sessionizer_state_survives_restart(spark, tmp_path):
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "sink"))
    os.makedirs(src)
    now = time.time()
    # A: user 1 at 10:00 and 10:10 (open session), user 2 at 10:05
    a = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1, 5.0), ("2024-01-01 10:10:00", 1, 7.0),
         ("2024-01-01 10:05:00", 2, 1.0)],
        "ts STRING, user_id BIGINT, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _one_file(a, f"{src}/a.parquet", str(tmp_path), now - 200)

    def run():
        s = (
            spark.readStream.schema(SESS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        # 24 h timeout pad: the availableNow drain's closing batch must
        # NOT flush the open session — it has to live in the CHECKPOINT
        # across the restart (the mirror's default 60 s pad flushes at
        # end-of-run by design; here the restart itself is under test)
        _drain(sessionize_with_state(s, timeout_pad_ms=24 * 3600 * 1000), out, chk)

    run()  # drains A; user 1's session is OPEN in checkpointed state

    # pipeline down; B arrives: user 1 again at 10:20 (within the 30-min
    # gap of 10:10 — same session IFF state survived), then a far-future
    # sentinel to advance the watermark and flush everything
    b = spark.createDataFrame(
        [("2024-01-01 10:20:00", 1, 11.0)], "ts STRING, user_id BIGINT, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sent = spark.createDataFrame(
        [("2030-01-01 00:00:00", 999, 0.0)], "ts STRING, user_id BIGINT, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _one_file(b, f"{src}/b.parquet", str(tmp_path), now - 100)
    _one_file(sent, f"{src}/c_sentinel.parquet", str(tmp_path), now)

    run()  # resumes from checkpoint, merges B, sentinel flushes

    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
        if r.user_id != 999
    }
    # batch oracle over A ∪ B: ONE session for user 1 spanning the
    # restart, one for user 2 — a state loss or an early flush would
    # split user 1 into two rows
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 3, 23.0),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1, 1.0),
    }, f"restart split or lost a session: {got}"


ALARM_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"


def test_spend_alarm_running_total_survives_restart(spark, tmp_path):
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "sink"))
    os.makedirs(src)
    now = time.time()
    thr = SPEND_ALARM_THRESHOLD  # 300.0
    # A: user 7 accumulates 200 (no alarm yet); user 8 accumulates 50
    a = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 7, "purchase", 120.0),
         (2, "2024-01-01 09:05:00", 7, "purchase", 80.0),
         (3, "2024-01-01 09:06:00", 8, "purchase", 50.0)],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _one_file(a, f"{src}/a.parquet", str(tmp_path), now - 100)

    def run():
        s = (
            spark.readStream.schema(ALARM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        _drain(spend_alarm_with_state(s), out, chk)

    run()
    assert not os.path.exists(out) or not [
        f for f in glob.glob(f"{out}/part-*") if os.path.getsize(f) > 0
    ] or spark.read.parquet(out).count() == 0, "alarm fired below threshold"

    # B: user 7's +150 crosses 300 ONLY on top of A's restored total
    b = spark.createDataFrame(
        [(4, "2024-01-01 09:30:00", 7, "purchase", 150.0)],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    _one_file(b, f"{src}/b.parquet", str(tmp_path), now)

    run()
    rows = spark.read.parquet(out).collect()
    got = {(r.user_id, str(r.alarm_ts), r.cum_value) for r in rows}
    assert got == {(7, "2024-01-01 09:30:00", 350.0)}, (
        f"running total lost across restart (threshold {thr}): {got}"
    )


DEDUP_SCHEMA = "user_id BIGINT, event_type STRING, ts TIMESTAMP"


def test_dedup_within_watermark_state_survives_restart(spark, tmp_path):
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "sink"))
    os.makedirs(src)
    now = time.time()

    def mk(users, second):
        return spark.createDataFrame(
            [(u, "view", f"2024-01-01 10:00:{second:02d}") for u in users],
            "user_id BIGINT, event_type STRING, ts STRING",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # A: users 1..10; B repeats 6..10 (same minute bucket, inside the
    # 1 h watermark) and adds 11..15
    _one_file(mk(range(1, 11), 0), f"{src}/a.parquet", str(tmp_path), now - 100)

    def run():
        s = spark.readStream.schema(DEDUP_SCHEMA).parquet(src)
        dedup = (
            s.select(
                "user_id",
                "event_type",
                F.date_trunc("minute", "ts").alias("minute_bucket"),
                "ts",
            )
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_bucket"])
            .select("user_id", "event_type", "minute_bucket")
        )
        _drain(dedup, out, chk)

    run()
    _one_file(mk(range(6, 16), 30), f"{src}/b.parquet", str(tmp_path), now)
    run()

    got = sorted(r.user_id for r in spark.read.parquet(out).collect())
    # batch oracle: DISTINCT keys over A ∪ B = users 1..15 exactly once
    assert got == list(range(1, 16)), (
        "dedup state lost across restart (duplicates re-emitted): " + str(got)
    )


HLL_SCHEMA = "ts TIMESTAMP, user_id BIGINT"


def test_hourly_hll_sketch_merges_across_restart(spark, tmp_path):
    src, chk = (str(tmp_path / d) for d in ("src", "chk"))
    os.makedirs(src)
    now = time.time()

    def mk(users):
        return spark.createDataFrame(
            [("2024-01-01 10:15:00", u) for u in users], "ts STRING, user_id BIGINT"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    # same hour split across the restart: A = users 1..40, B = 31..60
    _one_file(mk(range(1, 41)), f"{src}/a.parquet", str(tmp_path), now - 100)
    name = "hll_restart_" + uuid.uuid4().hex[:6]

    def run():
        s = spark.readStream.schema(HLL_SCHEMA).parquet(src)
        est = (
            s.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("est"))
            .select(F.col("w.start").alias("bucket_start"), "est")
        )
        q = (
            est.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", chk)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        return {str(r.bucket_start): r.est for r in spark.table(name).collect()}

    first = run()
    assert len(first) == 1 and abs(next(iter(first.values())) - 40) <= 2, first

    _one_file(mk(range(31, 61)), f"{src}/b.parquet", str(tmp_path), now)
    second = run()
    est = next(iter(second.values()))
    # batch oracle: 60 exact uniques for the hour.  The restored sketch
    # must MERGE A's state with B's: within 5% of 60, and strictly above
    # what B alone (30 users) could yield
    assert len(second) == 1, second
    assert abs(est - 60) <= 3, f"sketch did not merge across restart: {second}"
    assert est > 45, f"state lost — estimate reflects B alone: {second}"
