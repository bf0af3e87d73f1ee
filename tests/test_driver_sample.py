"""The grading driver oracle-checks the FIRST 50 ``queries()`` entries
every round.  Through round 11 that window was the same 50
registration-order names, leaving 300+ queries permanently invisible to
the driver's own gate (VERDICT r11 #4) — ``all_specs()`` now rotates the
(sorted) registry by 50 positions per round, keyed off the repo's own
committed ``CORRECTNESS_r{N}.json`` artifacts, so consecutive driver
rounds sweep the whole registry.

Pinned here:
* the rotation is deterministic (same tree → same order);
* the per-round windows tile the registry — ceil(n/50) consecutive
  rounds cover every query;
* the CURRENT round's window keeps the driver-sample safety contract:
  every oracle in it emits hash-safe output types.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from clickhouse_migrator_spark.registry import (
    DRIVER_SAMPLE,
    all_specs,
    current_round,
    rotated_names,
)


def test_rotation_deterministic():
    a = list(all_specs())
    b = list(all_specs())
    assert a == b
    names = sorted(a)
    assert rotated_names(names, 12) == rotated_names(names, 12)
    assert list(all_specs()) == rotated_names(names, current_round())


def test_rotation_changes_per_round():
    names = sorted(all_specs())
    w12 = rotated_names(names, 12)[:DRIVER_SAMPLE]
    w13 = rotated_names(names, 13)[:DRIVER_SAMPLE]
    assert w12 != w13
    # and round 12's window differs from the registration-order-era
    # window the driver saw in rounds 1-11 (rotation offset is nonzero)
    assert rotated_names(names, 12)[0] != names[0]


def test_windows_tile_full_registry_in_ceil_rounds():
    names = sorted(all_specs())
    n = len(names)
    rounds_needed = -(-n // DRIVER_SAMPLE)  # ceil
    covered: set[str] = set()
    for rnd in range(12, 12 + rounds_needed):
        covered.update(rotated_names(names, rnd)[:DRIVER_SAMPLE])
    assert covered == set(names), sorted(set(names) - covered)


def test_current_round_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROTATION_ROUND", "7")
    assert current_round() == 7
    monkeypatch.delenv("SPARK_GRAFT_ROTATION_ROUND")
    # artifact-derived: CORRECTNESS_r11.json is committed → round ≥ 12
    assert current_round() >= 12


def test_current_window_oracle_output_types_hash_safe(sf_dir):
    """Round-5 contract, applied to THIS round's rotated window: the
    driver collects oracle results through pandas, so DuckDB output
    types outside the allowlist (HUGEINT → float64, DATE → datetime64,
    widened DECIMAL, …) hash-diverge from bit-equal Spark values.  The
    full-inventory sweep lives in tools/schema_sweep.py; this pins the
    driver's actual sample window inside the test suite.  Rows-only
    entries (no oracle) are legitimate window members now — the driver
    records its documented weaker rows-only check for them."""
    import duckdb

    from clickhouse_migrator_spark.tables import TABLES
    from tools.schema_sweep import _ORACLE_SAFE_TYPES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = []
    for name, spec in list(all_specs().items())[:DRIVER_SAMPLE]:
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        offenders += [
            f"{name}.{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if t not in _ORACLE_SAFE_TYPES
        ]
    assert not offenders, offenders
