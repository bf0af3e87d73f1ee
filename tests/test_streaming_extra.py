"""More streaming surface: watermark-bounded dedup and foreachBatch
micro-batch sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.events import events_dedup_first_occurrence
from clickhouse_migrator_spark.streaming.events_stream import run_to_memory, stream_events


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark over (user_id, event_type): state
    is bounded by the watermark horizon; with one availableNow batch the
    kept row per key is the batch's first — compare key sets (not ts:
    batch-mode dedup keeps an arbitrary first, which is why the batch
    twin uses row_number for determinism)."""
    s = (
        stream_events(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    name = run_to_memory(s, mode="append")
    got_keys = {
        (r.user_id, r.event_type)
        for r in spark.table(name).select("user_id", "event_type").collect()
    }
    expected_keys = {
        (r.user_id, r.event_type)
        for r in events_dedup_first_occurrence(spark, sf_dir).collect()
    }
    assert got_keys == expected_keys


def test_foreachbatch_sink_writes_parquet(spark, sf_dir, tmp_path):
    """foreachBatch: the escape hatch for sinks without native streaming
    support (e.g. the ClickHouse JDBC writer) — each micro-batch is a
    normal DataFrame handed to a batch writer."""
    out_dir = str(tmp_path / "fb_out")
    batches = []

    def sink(batch_df, batch_id):
        batches.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    agg = (
        stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert batches, "foreachBatch sink was never invoked"
    back = spark.read.parquet(out_dir)
    assert back.agg(F.sum("n")).collect()[0][0] == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()


def test_hourly_hll_error_distribution(spark, sf_dir):
    """The streaming-HLL tolerance flag is 5% (5x the sketch's
    rsd=0.01); this test pins the actual deterministic error
    distribution so a sketch/plumbing regression shows up long before
    the oracle flag would flip: mean relative error well under 1% and
    no bucket beyond 5%.  (Measured at sf0.1: max 2.5%, mean 0.5% —
    the r2 2% flag sat at 2 sigma and genuinely breached there.)"""
    from pyspark.sql import functions as F

    from clickhouse_migrator_spark.tables import table

    e = table(spark, sf_dir, "events")
    g = (
        e.groupBy(F.date_trunc("hour", "ts").alias("b"))
        .agg(
            F.countDistinct("user_id").alias("x"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
        )
        .select((F.abs(F.col("est") - F.col("x")) / F.col("x")).alias("rel"))
    )
    r = g.agg(F.max("rel").alias("mx"), F.avg("rel").alias("mean")).first()
    assert r.mx < 0.05, r
    assert r.mean < 0.01, r
