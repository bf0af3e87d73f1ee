"""Monster-series guard for LTTB (VERDICT r3 directive #7): a series
past LTTB_PRE_REDUCE_THRESHOLD rows must be pre-reduced in-engine to
per-bucket extreme points before crossing the Arrow boundary; series at
or under the threshold take the exact path untouched."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from clickhouse_migrator_spark.operators import stats


def _series(spark, n, event_type="a"):
    return spark.range(n).select(
        F.lit(event_type).alias("event_type"),
        (F.col("id") * 1_000_000).alias("x_us"),
        (F.sin(F.col("id").cast("double")) * 100).alias("y"),
        F.col("id").alias("event_id"),
    )


SCHEMA = "event_type string, x_us long, y double, sel_idx int"


def test_small_series_exact_path_unchanged(spark):
    pts = _series(spark, 500)
    out = stats._lttb_route(pts, SCHEMA).collect()
    assert len(out) == stats.LTTB_N_OUT
    xs = sorted(r.x_us for r in out)
    assert xs[0] == 0 and xs[-1] == 499 * 1_000_000  # endpoints pinned


def test_monster_series_is_pre_reduced(spark, monkeypatch):
    monkeypatch.setattr(stats, "LTTB_PRE_REDUCE_THRESHOLD", 1_000)
    monkeypatch.setattr(stats, "_LTTB_SMALL_INPUT_BYTES", 0)
    pts = _series(spark, 5_000).unionByName(_series(spark, 200, "b"))
    out = stats._lttb_route(pts, SCHEMA).collect()
    big = sorted(
        (r for r in out if r.event_type == "a"), key=lambda r: r.sel_idx
    )
    small = [r for r in out if r.event_type == "b"]
    # both series downsample to n_out points with pinned endpoints
    assert len(big) == stats.LTTB_N_OUT
    assert big[0].x_us == 0 and big[-1].x_us == 4_999 * 1_000_000
    assert len(small) == stats.LTTB_N_OUT
    # selected points are real input points (the reduction only drops)
    assert all(r.x_us % 1_000_000 == 0 for r in big)
    # strictly increasing x in selection order
    assert all(a.x_us < b.x_us for a, b in zip(big, big[1:]))


def test_guarded_small_series_bit_identical_to_exact(spark, monkeypatch):
    """Routing must not perturb series at/below the threshold: the
    guarded plan's output for a small series equals the exact path's."""
    pts = _series(spark, 800)
    exact = sorted(tuple(r) for r in stats._lttb_route(pts, SCHEMA).collect())
    monkeypatch.setattr(stats, "_LTTB_SMALL_INPUT_BYTES", 0)  # force routing
    routed = sorted(tuple(r) for r in stats._lttb_route(pts, SCHEMA).collect())
    assert exact == routed
