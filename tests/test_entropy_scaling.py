"""Fixed-entropy constants audit (VERDICT r9 #2).

The round-8 sf1 bench caught `join_fuzzy_entity_match`'s constant
block key going n² (63× on 10× data).  Round 9 made block-key entropy
DATA-DRIVEN there and in the embedding sign-LSH; these tests pin the
scaling LAW itself — candidate-pair counts across a synthetic decade —
so the trap cannot silently re-arm at the next scale-up, plus the
anti-rot check on the registry every other constant now lives in.

The pair counts are computed from block-size aggregates (Σ |c_blk|·|s_blk|),
not by materializing the joins, so the decade sweep runs in seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.dedup import (
    N_SIGN_BANDS,
    SIGN_BUCKET_TARGET,
    sign_band_dims,
)
from clickhouse_migrator_spark.operators.joins import (
    FUZZY_BLOCK_TARGET,
    fuzzy_block_len,
)
from clickhouse_migrator_spark.plans.entropy_constants import (
    ENTROPY_CONSTANTS,
    check as entropy_check,
)


# ── the laws themselves ──────────────────────────────────────────────────────


def test_fuzzy_block_len_law():
    # digits(ceil(n_distinct/100)), floored at 2 — one more digit per decade
    assert fuzzy_block_len(150) == 2
    assert fuzzy_block_len(1_500) == 2
    assert fuzzy_block_len(15_000) == 3
    assert fuzzy_block_len(150_000) == 4
    assert fuzzy_block_len(1_500_000) == 5
    assert fuzzy_block_len(0) == 2  # empty corpus: harmless floor


def test_sign_band_dims_law():
    # bits(ceil(n/64)), floored at 8, capped at dim/2
    assert sign_band_dims(500, 64) == 8
    assert sign_band_dims(2_000, 64) == 8
    assert sign_band_dims(100_000, 64) == 11
    assert sign_band_dims(1_000_000, 64) == 14
    assert sign_band_dims(10_000_000, 64) == 18
    assert sign_band_dims(10_000_000, 16) == 8  # dim cap wins


def _spark_fuzzy_k(spark, n):
    """The law as the PLAN computes it (must equal the Python mirror):
    distinct-NAME count, the real blocking-entropy measure (r9 sf10
    catch: row count overcounts duplicate-heavy corpora)."""
    names = spark.range(n).select(
        F.format_string("Customer#%09d", F.col("id")).alias("c_name")
    )
    return (
        names.agg(
            F.greatest(
                F.lit(2),
                F.length(
                    F.ceil(F.countDistinct("c_name") / F.lit(100.0))
                    .cast("long")
                    .cast("string")
                ),
            ).alias("k")
        )
        .collect()[0]
        .k
    )


def test_fuzzy_law_spark_matches_python_mirror(spark):
    for n in (150, 1_500, 15_000, 150_000):
        assert _spark_fuzzy_k(spark, n) == fuzzy_block_len(n)


# ── candidate-pair growth stays ~linear across decades ──────────────────────


def _fuzzy_pairs(spark, n_c: int) -> int:
    """Σ over blocks of |customers_blk|·|suppliers_blk| under the
    data-driven key — the exact fan-out of the blocked equi-join,
    without materializing it.  TPC-H name shape (9-digit suffix)."""
    k = fuzzy_block_len(n_c)
    c = spark.range(n_c).select(
        F.expr(f"right(format_string('Customer#%09d', id), {k})").alias("blk")
    )
    s = spark.range(max(1, n_c // 10)).select(
        F.expr(f"right(format_string('Supplier#%09d', id), {k})").alias("blk")
    )
    cc = c.groupBy("blk").agg(F.count(F.lit(1)).alias("nc"))
    ss = s.groupBy("blk").agg(F.count(F.lit(1)).alias("ns"))
    row = (
        cc.join(ss, "blk")
        .agg(F.sum(F.col("nc") * F.col("ns")).alias("pairs"))
        .collect()[0]
    )
    return int(row.pairs or 0)


def test_fuzzy_join_pairs_linear_across_decades(spark):
    """The r8 catch, pinned as a law: with the data-driven key, total
    candidate pairs grow ≤ ~12× per 10× corpus (a CONSTANT key grows
    them ~100×/decade once saturated) and never exceed ~12 pairs per
    customer."""
    sizes = (1_500, 15_000, 150_000)
    pairs = {n: _fuzzy_pairs(spark, n) for n in sizes}
    for n in sizes:
        assert pairs[n] <= 12 * n, (n, pairs[n])
    for a, b in zip(sizes, sizes[1:]):
        ratio = pairs[b] / max(pairs[a], 1)
        assert ratio <= 15.0, (a, b, pairs)


def _sign_lsh_pairs(spark, n: int, dim: int = 32) -> int:
    """Σ over (band, bucket) of C(sz, 2) with uniform ±1 sign bits —
    the bucket self-join fan-out under the data-driven band width."""
    k = sign_band_dims(n, dim)
    v = spark.range(n)
    buckets = []
    for b in range(N_SIGN_BANDS):
        sig = F.concat_ws(
            "",
            *[
                F.when(F.xxhash64("id", F.lit(b * k + i)) % 2 == 0, "1").otherwise("0")
                for i in range(k)
            ],
        )
        buckets.append(
            v.select(F.lit(b).alias("band"), sig.alias("bucket"))
        )
    allb = buckets[0]
    for other in buckets[1:]:
        allb = allb.unionByName(other)
    row = (
        allb.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pairs"))
        .collect()[0]
    )
    return int(row.pairs or 0)


def test_sign_lsh_pairs_linear_across_decades(spark):
    """Bucket self-join pairs under the data-driven band width: the
    LINEAR LAW is the absolute bound pairs ≤ bands·B·n at EVERY scale
    (a fixed 8-bit width blows through it one decade after saturation:
    n=409600 would give ~650·n).  Decade-over-decade ratios wobble with
    bit granularity and the 8-bit floor — the 4k→41k step exits the
    floor regime (measured 25×, still under the absolute bound); once
    the law is active the ratio settles ≤ ~15×."""
    sizes = (4_096, 40_960, 409_600)
    pairs = {n: _sign_lsh_pairs(spark, n) for n in sizes}
    for n in sizes:
        assert pairs[n] <= N_SIGN_BANDS * SIGN_BUCKET_TARGET * n, (n, pairs[n])
    # floor-exit decade: bounded but granularity-slack allowed
    assert pairs[sizes[1]] / max(pairs[sizes[0]], 1) <= 30.0, pairs
    # law-active decade: ~linear
    assert pairs[sizes[2]] / max(pairs[sizes[1]], 1) <= 15.0, pairs


# ── registry anti-rot ────────────────────────────────────────────────────────


def test_entropy_registry_healthy():
    assert entropy_check() == []
    # every registered kind is one of the documented classes
    kinds = {"scaling-law", "bounded-cap", "structural", "quality-knob"}
    assert {ec.kind for ec in ENTROPY_CONSTANTS.values()} <= kinds
    # the two r9 scaling-law conversions are present
    assert "joins.FUZZY_BLOCK_TARGET" in ENTROPY_CONSTANTS
    assert "dedup.SIGN_BUCKET_TARGET" in ENTROPY_CONSTANTS


def test_constants_match_registry_docs():
    assert FUZZY_BLOCK_TARGET == 100
    assert SIGN_BUCKET_TARGET == 64
