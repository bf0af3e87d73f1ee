"""Checkpoint-recovery test: a stateful streaming query stopped and
RESTARTED from its checkpoint must resume exactly — state restored, no
reprocessing, no duplicate output.  This is the fault-tolerance
contract a 100 TB streaming deployment actually relies on (executors
die; the query must pick up where the WAL says it was).

Shape: run 1 sees only file A (availableNow drains it and commits the
checkpoint); file B — containing keys that DUPLICATE file A's — is
added afterwards; run 2 starts from the same checkpoint.  If dedup
state survived the restart, run 2 emits only B's genuinely-new keys;
if state were lost, A's keys would re-emit from B.  The final sink is
compared against the batch DISTINCT oracle over A ∪ B.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F


def _one_parquet_file(df, dest_path, tmpdir):
    d = f"{tmpdir}/_stage"
    df.coalesce(1).write.mode("overwrite").parquet(d)
    shutil.move(glob.glob(f"{d}/part-*.parquet")[0], dest_path)
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_dedup_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    # file A: users 1..20, one event each; file B: users 11..30 — the
    # 11..20 overlap must be suppressed by RESTORED state in run 2
    a = spark.range(1, 21).select(
        F.col("id").alias("user_id"), F.lit("view").alias("event_type")
    )
    b = spark.range(11, 31).select(
        F.col("id").alias("user_id"), F.lit("view").alias("event_type")
    )
    _one_parquet_file(a, f"{src}/a.parquet", str(tmp_path))

    out = str(tmp_path / "sink")

    def run_once():
        stream = (
            spark.readStream.schema("user_id BIGINT, event_type STRING")
            .parquet(src)
            .dropDuplicates(["user_id", "event_type"])
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return sorted(r.user_id for r in spark.read.parquet(out).collect())

    first = run_once()
    assert first == list(range(1, 21))

    # "crash": the first query object is gone; only the checkpoint
    # remains.  New data arrives while the pipeline is down.
    _one_parquet_file(b, f"{src}/b.parquet", str(tmp_path))

    # the sink now holds run 1's output PLUS only the genuinely-new
    # keys (21..30): state for 1..20 was restored from the checkpoint,
    # so B's 11..20 rows are duplicates and never re-emit
    second = run_once()
    assert second == list(range(1, 31)), (
        "restart lost dedup state or reprocessed file A: " + str(second)
    )
