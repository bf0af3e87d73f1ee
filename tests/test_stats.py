"""Golden tests for the statistical pack (operators/stats.py).

The oracle harness (test_queries_oracle.py) already certifies every
oracle-backed query; this file pins the one non-SQL-expressible member
— LTTB downsampling — against an independent straight-from-the-paper
reference implementation (Steinarsson, "Downsampling Time Series for
Visual Representation", §4.2), and checks the pack's structural
invariants.
"""

from __future__ import annotations

import duckdb
import pytest

from clickhouse_migrator_spark.operators.stats import LTTB_N_OUT, ts_lttb_downsample


def _reference_lttb(points, n_out):
    """Textbook LTTB, written independently of the operator's numpy
    version: explicit per-bucket Python loops, no vectorization."""
    n = len(points)
    if n <= n_out:
        return list(points)
    # same integer bucket-edge rule over the interior points
    edges = [1 + (i * (n - 2)) // (n_out - 2) for i in range(n_out - 1)]
    out = [points[0]]
    prev = points[0]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if b == n_out - 3:
            nxt = points[edges[b + 1]:n]
        else:
            nxt = points[edges[b + 1]:edges[b + 2]]
        ax = sum(p[0] for p in nxt) / len(nxt)
        ay = sum(p[1] for p in nxt) / len(nxt)
        best, best_area = None, -1.0
        for p in points[lo:hi]:
            area = abs(
                (prev[0] - ax) * (p[1] - prev[1])
                - (prev[0] - p[0]) * (ay - prev[1])
            )
            if area > best_area:
                best, best_area = p, area
        out.append(best)
        prev = best
    out.append(points[-1])
    return out


@pytest.fixture(scope="module")
def series(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS x_us,
               value AS y
        FROM '{sf_dir}/events.parquet'
        ORDER BY event_type, ts, event_id
        """
    ).fetchall()
    con.close()
    by_type: dict[str, list[tuple[int, float]]] = {}
    for t, x, y in rows:
        by_type.setdefault(t, []).append((int(x), float(y)))
    return by_type


def test_lttb_matches_reference(spark, sf_dir, series):
    got = ts_lttb_downsample(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(by_type) == set(series)
    for t, rows in by_type.items():
        rows.sort(key=lambda r: r.sel_idx)
        expect = _reference_lttb(series[t], LTTB_N_OUT)
        assert len(rows) == len(expect)
        # endpoints pinned
        assert (rows[0].x_us, rows[0].y) == expect[0]
        assert (rows[-1].x_us, rows[-1].y) == expect[-1]
        # every selected point identical
        assert [(r.x_us, r.y) for r in rows] == expect


def test_lttb_selected_x_monotone(spark, sf_dir):
    got = ts_lttb_downsample(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r.sel_idx)
        xs = [r.x_us for r in rows]
        assert xs == sorted(xs), "LTTB must preserve time order"
        assert len(rows) == LTTB_N_OUT


def test_decompose_components_reconstruct(spark, sf_dir):
    from clickhouse_migrator_spark.operators.stats import ts_decompose_additive

    rows = ts_decompose_additive(spark, sf_dir).collect()
    assert rows, "decomposition produced no buckets"
    # additive identity: n == trend + seasonal + residual (up to the
    # 4-decimal rounding each component carries)
    for r in rows:
        assert abs(r.n - (r.trend + r.seasonal + r.residual)) < 3e-4
    # the seasonal component is mean-centered across the series
    mean_seasonal = sum(r.seasonal for r in rows) / len(rows)
    assert abs(mean_seasonal) < 1e-3
