"""Streaming late-data conformance fuzz (VERDICT r7 #6).

The streaming mirrors are oracle-checked on in-order fixtures plus one
restart test; this fuzz injects OUT-OF-ORDER / LATE events across
micro-batches and asserts the documented watermark policy against a
batch oracle computed per that policy.

Harness: K parquet files with seeded-random event times, later files
containing events older than earlier files' max — some within the
watermark allowance (must be aggregated) and some beyond it (must be
dropped).  ``maxFilesPerTrigger=1`` + increasing mtimes turn each file
into its own micro-batch in a deterministic order, so the watermark
advances BETWEEN files exactly like a live deployment's batches.

Oracle simulation of Spark's documented semantics:

- the watermark is recomputed after every batch as max(prev, max event
  time in batch − delay);
- Spark ≥3.4 carries TWO operator watermarks (probed via query
  progress on this fuzz's first red runs): the LATE-EVENT FILTER for
  batch i uses the watermark as of batch i−1's start (one batch more
  lag), while EVICTION/EMISSION in batch i uses the watermark computed
  from data through batch i−1.  A late row is dropped only when its
  WINDOW end is behind the late-filter watermark — group expiry, not
  raw event time;
- merge happens before eviction within a batch, so a late row can land
  in a window evicted in the same batch and still be counted;
- a late row arriving AFTER its window was evicted (but inside the
  late-filter allowance) recreates state and the window can emit a
  second partial row — the sim models emissions as a multiset;
- availableNow runs one final empty batch, flushing windows behind the
  final watermark; still-open windows are never emitted in append mode.

All generated timestamps carry odd second offsets and the delay is 47
minutes, so no timestamp ever lands exactly on a watermark or window
boundary — the test is insensitive to Spark's <=/< boundary choices by
construction.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

DELAY_MIN = 47
BASE = dt.datetime(2024, 3, 1, 6, 0, 7)


def _gen_files(seed: int) -> list[list[tuple[dt.datetime, str, float]]]:
    rng = random.Random(seed)
    files = []
    frontier = BASE
    for _i in range(5):
        rows = []
        # fresh events advancing the frontier by 20–80 minutes
        for _ in range(rng.randint(3, 7)):
            frontier += dt.timedelta(minutes=rng.randint(4, 18), seconds=13)
            rows.append(
                (frontier, rng.choice(["view", "click"]), rng.randint(1, 9) * 1.0)
            )
        # late events: some within the 47-minute allowance, some far beyond
        for _ in range(rng.randint(1, 4)):
            late_by = rng.choice([10, 25, 40, 90, 200])  # minutes
            ts = frontier - dt.timedelta(minutes=late_by, seconds=26)
            rows.append((ts, rng.choice(["view", "click"]), rng.randint(1, 9) * 1.0))
        rng.shuffle(rows)
        files.append(rows)
    return files


def _wend(ts: dt.datetime) -> dt.datetime:
    return ts.replace(minute=0, second=0, microsecond=0) + dt.timedelta(hours=1)


def _expected(files):
    """Batch oracle per the documented watermark policy (see module
    docstring).  Returns a sorted multiset of emitted rows."""
    epoch = dt.datetime(1970, 1, 1)
    # wm_hist[i] = watermark computed from data through batch i
    wm_hist = []
    wm = epoch
    for rows in files:
        mx = max(r[0] for r in rows)
        wm = max(wm, mx - dt.timedelta(minutes=DELAY_MIN))
        wm_hist.append(wm)
    state: dict[tuple, tuple[int, float]] = {}
    out = []
    n_batches = len(files) + 1  # availableNow's final empty batch
    for i in range(n_batches):
        wm_evict = wm_hist[i - 1] if i >= 1 else epoch
        wm_late = wm_hist[i - 2] if i >= 2 else epoch
        for ts, etype, val in files[i] if i < len(files) else []:
            if _wend(ts) > wm_late:  # group-expiry late filter
                k = (ts.replace(minute=0, second=0, microsecond=0), etype)
                n, s = state.get(k, (0, 0.0))
                state[k] = (n + 1, s + val)
        for k in sorted(state):
            if k[0] + dt.timedelta(hours=1) <= wm_evict:
                n, s = state.pop(k)
                out.append((k[0], k[1], n, s))
    return sorted(out)


def _write_ordered_files(spark, tmp_path, files):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    stage = str(tmp_path / "_stage")
    for i, rows in enumerate(files):
        df = spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        dest = f"{src}/f{i}.parquet"
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dest)
        # file order == batch order: the file source picks oldest first
        t = 1_700_000_000 + i * 10
        os.utime(dest, (t, t))
    shutil.rmtree(stage, ignore_errors=True)
    return src


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_watermark_drop_allow_policy_matches_simulation(spark, tmp_path, seed):
    files = _gen_files(seed)
    src = _write_ordered_files(spark, tmp_path, files)
    name = f"late_fuzz_{seed}"
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", f"{DELAY_MIN} minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("wstart"), "event_type", "n", "total"
        )
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()
        got = sorted(
            (r.wstart, r.event_type, r.n, r.total)
            for r in spark.table(name).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.dropTempView(name)
    want = _expected(files)
    assert got == want, (
        f"seed={seed}: emitted {got} vs policy-simulated {want}"
    )
    # the fuzz must actually exercise the drop branch at least once
    all_rows = [r for rows in files for r in rows]
    emitted_n = sum(r[2] for r in want)
    open_state_n = len(all_rows) - emitted_n
    assert emitted_n < len(all_rows) or open_state_n, "degenerate fuzz case"
