"""As-of join direction × tolerance grid vs a driver-side global
``pd.merge_asof`` ground truth.

The registered asof queries pin one (direction, tolerance) each; this
sweeps the grid through the DISTRIBUTED path (side-tagged union →
size-derived hash buckets → per-bucket merge_asof) and compares it to
one global merge on the driver — the bucket assignment, suffix
renames, and column plumbing are what can break, and they are exactly
what a per-bucket-vs-global comparison exercises.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from clickhouse_migrator_spark.operators.asof import asof_join
from clickhouse_migrator_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"

GRID = [
    ("backward", None),
    ("forward", None),
    ("nearest", None),
    ("backward", pd.Timedelta("2 days")),
    ("forward", pd.Timedelta("12 hours")),
    ("nearest", pd.Timedelta("1 hour")),
]


@pytest.mark.parametrize("direction,tol", GRID, ids=[f"{d}-{t}" for d, t in GRID])
def test_asof_grid_matches_global_merge_asof(spark, direction, tol):
    e = table(spark, SF_DIR, "events")
    left = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    got = (
        asof_join(left, right, on="ts", by="user_id", direction=direction, tolerance=tol)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = left.toPandas().sort_values("ts", kind="mergesort").reset_index(drop=True)
    rp = (
        right.toPandas()
        .rename(columns={"ts": "ts_right"})
        .sort_values("ts_right", kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lp,
            rp,
            left_on="ts",
            right_on="ts_right",
            by="user_id",
            direction=direction,
            tolerance=tol,
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
