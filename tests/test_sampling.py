"""Deterministic-sampling invariants: uniformity on adversarial
(sequential) keys, stability under repartitioning, and split
disjointness — the properties ``df.sample`` cannot give."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.sampling import _P, hash_bucket


def test_uniform_on_sequential_keys(spark):
    # Sequential ids are the worst case for weak mixers: one LCG round
    # maps them monotonically into a narrow band.
    df = spark.range(1, 20_001).select(hash_bucket(F.col("id")).alias("b"))
    n = df.count()
    for rate in (0.1, 0.5, 0.8):
        frac = df.filter(F.col("b") < _P * rate).count() / n
        assert abs(frac - rate) < 0.02, (rate, frac)


def test_stable_under_repartitioning(spark):
    base = spark.range(1, 5_001)
    a = base.filter(hash_bucket(F.col("id")) < _P * 0.2)
    b = base.repartition(17).filter(hash_bucket(F.col("id")) < _P * 0.2)
    assert sorted(r.id for r in a.collect()) == sorted(r.id for r in b.collect())


def test_splits_disjoint_and_exhaustive(spark):
    df = spark.range(1, 10_001).select(
        "id", hash_bucket(F.col("id")).alias("b")
    )
    train = df.filter(F.col("b") < _P * 0.8)
    valid = df.filter((F.col("b") >= _P * 0.8) & (F.col("b") < _P * 0.9))
    test = df.filter(F.col("b") >= _P * 0.9)
    assert train.count() + valid.count() + test.count() == df.count()
    assert train.join(valid, "id").count() == 0
    assert train.join(test, "id").count() == 0


def test_composite_key_changes_bucket(spark):
    df = spark.range(1, 1_001).select(
        hash_bucket(F.col("id")).alias("single"),
        hash_bucket(F.col("id"), F.lit(1)).alias("composite"),
    )
    assert df.filter(F.col("single") == F.col("composite")).count() < 5
