"""Property tests for the exact cross-engine quotient rounding
(`hashsafe.round_quotient` / `oracle_round_quotient`) — the r3 fix for
the r1/r2 driver-red rows.

Ground truth is Python `fractions.Fraction` + `decimal` HALF_UP (exact
rational arithmetic, no floats anywhere): for random exact decimal
numerators/denominators, both the Spark expression and the DuckDB twin
must produce the double nearest the HALF_UP-rounded rational.
"""

from __future__ import annotations

import decimal
from decimal import Decimal
from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_migrator_spark.hashsafe import (
    oracle_round_quotient,
    round_quotient,
)


def _truth(num: Decimal, den: Decimal, k: int) -> float:
    """HALF_UP round of the exact rational num/den to k digits, as the
    nearest double — via Fraction + decimal, no float arithmetic."""
    frac = Fraction(num) / Fraction(den)
    with decimal.localcontext() as ctx:
        ctx.prec = 60
        d = Decimal(frac.numerator) / Decimal(frac.denominator)
        q = d.quantize(Decimal(1).scaleb(-k), rounding=decimal.ROUND_HALF_UP)
    return float(q)


# exact 2-decimal numerators (money grid), positive and negative,
# including values engineered to sit near halfway points
_num = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)
_den = st.integers(min_value=1, max_value=10_000)
_k = st.integers(min_value=2, max_value=6)


@settings(max_examples=60, deadline=None)
@given(num=_num, den=_den, k=_k)
def test_oracle_round_quotient_matches_fraction_truth(num, den, k):
    con = duckdb.connect()
    sql = oracle_round_quotient(f"CAST('{num}' AS DECIMAL(18,2))", str(den), k)
    got = con.sql(f"SELECT {sql} AS v").fetchone()[0]
    assert got == _truth(num, Decimal(den), k), (num, den, k)


@settings(max_examples=60, deadline=None)
@given(num=_num, den=_den, k=_k)
def test_oracle_negative_denominator(num, den, k):
    con = duckdb.connect()
    sql = oracle_round_quotient(
        f"CAST('{num}' AS DECIMAL(18,2))", str(-den), k
    )
    got = con.sql(f"SELECT {sql} AS v").fetchone()[0]
    assert got == _truth(num, Decimal(-den), k), (num, den, k)


@pytest.mark.parametrize("k", [2, 4, 6])
def test_spark_matches_fraction_truth_on_halfway_grid(spark, k):
    """Exercise the Spark expression on a grid dense in exact halfway
    points (num = i cents, den = 8: i/8 dollars has a terminating
    3-decimal expansion → every k=2 round is a halfway decision)."""
    rows = [(Decimal(i) / 100, 8) for i in range(-400, 401, 7)]
    df = spark.createDataFrame(rows, "num decimal(18,2), den int")
    q2 = Decimal("0.01")
    got = {
        Decimal(r.num).quantize(q2): r.v
        for r in df.select(
            "num",
            round_quotient(F.col("num"), F.col("den"), k).alias("v"),
        ).collect()
    }
    for num, den in rows:
        assert got[num.quantize(q2)] == _truth(num, Decimal(den), k), (num, k)


def test_spark_and_oracle_agree_on_random_batch(spark):
    """One batched Spark run against the DuckDB twin over mixed-sign
    numerators and denominators at k=4."""
    rows = [
        (Decimal(n) / 100, d)
        for n, d in [
            (123456, 7), (-123456, 7), (555, 2), (-555, 2), (1, 3),
            (99999, 16), (-99999, 16), (250, 1000), (-250, 1000), (0, 5),
        ]
    ]
    df = spark.createDataFrame(rows, "num decimal(18,2), den int")
    spark_vals = [
        r.v
        for r in df.select(
            round_quotient(F.col("num"), F.col("den"), 4).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.sql(
            "SELECT "
            + oracle_round_quotient(f"CAST('{num}' AS DECIMAL(18,2))", str(den), 4)
        ).fetchone()[0]
        for num, den in rows
    ]
    assert spark_vals == duck_vals
    for (num, den), v in zip(rows, spark_vals):
        assert v == _truth(num, Decimal(den), 4)

def test_bigint_numerator_no_int64_wrap(spark):
    """ADVICE r4 #1 regression: the power-of-ten multiply must run in
    decimal, not int64.  With num = 5e17 and k = 4 the scaled
    numerator is 5e21 — far past the int64 ceiling; the pre-round-5
    shape silently wrapped on Spark and raised Out of Range on DuckDB."""
    num, den, k = 500_000_000_000_000_000, 3, 4
    got = (
        spark.range(1)
        .select(round_quotient(F.lit(num), F.lit(den), k).alias("v"))
        .collect()[0]
        .v
    )
    con = duckdb.connect()
    duck = con.sql(
        "SELECT " + oracle_round_quotient(str(num), str(den), k)
    ).fetchone()[0]
    # the HASH property: both engines render the identical double
    assert got == duck
    # and it is the two-step double rendering of the exact integer
    # (CAST(scaled AS DOUBLE)/10^k can differ from the nearest double
    # of the rational by 1 ulp at this magnitude — identically on both
    # engines, which is what the value hash needs)
    want = _truth(Decimal(num), Decimal(den), k)
    assert abs(got - want) <= abs(want) * 1e-15


def test_headroom_guard_raises_on_ns10_default(spark):
    """ADVICE r5 #1: k+den_scale=10 with the default num_scale leaves
    only 1e16 of numerator headroom — below the 1e18 floor; both the
    Spark helper and the oracle twin must refuse at plan-construction
    time instead of overflowing silently at 100 TB."""
    with pytest.raises(ValueError, match="headroom"):
        round_quotient(F.lit(1), F.lit(1), 4, den_scale=6)
    with pytest.raises(ValueError, match="headroom"):
        oracle_round_quotient("1", "1", 4, den_scale=6)
    with pytest.raises(ValueError, match="num_scale"):
        round_quotient(F.lit(1), F.lit(1), 4, den_scale=2, num_scale=7)


@settings(max_examples=40, deadline=None)
@given(
    num=st.decimals(
        min_value=Decimal("-9999.999999"),
        max_value=Decimal("9999.999999"),
        places=6,
        allow_nan=False,
        allow_infinity=False,
    ),
    den=st.decimals(
        min_value=Decimal("0.000001"),
        max_value=Decimal("9999.999999"),
        places=6,
        allow_nan=False,
        allow_infinity=False,
    ),
)
def test_oracle_num_scale6_ns10_matches_fraction_truth(num, den):
    """The TPC-H q8/q14 shape: k=4, den_scale=6, num_scale=6 — the
    sized-cast path must still be exact HALF_UP on the rational."""
    con = duckdb.connect()
    sql = oracle_round_quotient(
        f"CAST('{num}' AS DECIMAL(18,6))",
        f"CAST('{den}' AS DECIMAL(18,6))",
        4,
        den_scale=6,
        num_scale=6,
    )
    got = con.sql(f"SELECT {sql} AS v").fetchone()[0]
    assert got == _truth(num, den, 4), (num, den)


def test_num_scale6_ns10_large_magnitude_both_engines(spark):
    """100 TB design point for the den_scale=6 sites: a 1e17-magnitude
    6-decimal numerator (past the old 1e16 cliff, inside the new 1e20
    headroom) must round identically on both engines — the pre-fix
    casts returned NULL on Spark and raised on DuckDB here."""
    num = Decimal("123456789012345678.654321")  # ~1.2e17, scale 6
    den = Decimal("3456789.000007")
    df = spark.createDataFrame([(num, den)], "num decimal(28,6), den decimal(18,6)")
    got = (
        df.select(
            round_quotient(
                F.col("num"), F.col("den"), 4, den_scale=6, num_scale=6
            ).alias("v")
        )
        .collect()[0]
        .v
    )
    assert got is not None
    con = duckdb.connect()
    duck = con.sql(
        "SELECT "
        + oracle_round_quotient(
            f"CAST('{num}' AS DECIMAL(28,6))",
            f"CAST('{den}' AS DECIMAL(18,6))",
            4,
            den_scale=6,
            num_scale=6,
        )
    ).fetchone()[0]
    assert got == duck
    want = _truth(num, den, 4)
    assert abs(got - want) <= abs(want) * 1e-15


def test_union_128_halfway_case(spark):
    """The Jaccard shape from ADVICE r4 #3: inter/union quotients with
    union a power of two land on exact x…x5 points at k=6 (e.g.
    116/128 = 0.90625 → HALF_UP 0.906250 exactly representable;
    115/128 = 0.8984375 → 0.898438).  Exact integer rounding must get
    every halfway decision right on both engines."""
    cases = [(i, 128) for i in range(1, 128)] + [(116, 128), (115, 128)]
    df = spark.createDataFrame(cases, "inter long, un long")
    got = [
        r.v
        for r in df.select(
            round_quotient(F.col("inter"), F.col("un"), 6).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    for (inter, un), v in zip(cases, got):
        assert v == _truth(Decimal(inter), Decimal(un), 6), (inter, un)
        duck = con.sql(
            "SELECT " + oracle_round_quotient(str(inter), str(un), 6)
        ).fetchone()[0]
        assert duck == v, (inter, un)
