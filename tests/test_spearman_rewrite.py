"""Float-hash proof for the r13 single-scan Spearman rewrite (VERDICT
r12 next-round #4): the joint-grid + exact-integer-moment formulation
must round (6 digits) bit-identically to the previous corr-of-avg-ranks
formulation — on the fixture AND on adversarial synthetic data with
heavy ties (ties are where the avg-rank arithmetic and the closed-form
moments could diverge if either were wrong)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from clickhouse_migrator_spark.operators.stats import agg_rank_corr_spearman

SF_DIR = "/root/testdata/sf0.001"


def _old_formula(li):
    """The pre-r13 shape: corr() of tie-averaged float ranks attached
    to the fact rows (kept verbatim as the reference implementation)."""

    def grid_ranks(col, out):
        g = li.groupBy("l_returnflag", col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return g.select(
            "l_returnflag",
            col,
            (F.sum("c").over(w) - F.col("c") + (F.col("c") + 1) / 2.0).alias(out),
        )

    ranked = li.join(
        grid_ranks("l_quantity", "rx"), ["l_returnflag", "l_quantity"]
    ).join(grid_ranks("l_extendedprice", "ry"), ["l_returnflag", "l_extendedprice"])
    return ranked.groupBy("l_returnflag").agg(
        F.round(F.corr("rx", "ry"), 6).alias("spearman_rho")
    )


def _rows(df):
    return {r.l_returnflag: r.spearman_rho for r in df.collect()}


def test_fixture_equivalence(spark):
    new = _rows(agg_rank_corr_spearman(spark, SF_DIR))
    old = _rows(
        _old_formula(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .filter(
                F.col("l_quantity").isNotNull()
                & F.col("l_extendedprice").isNotNull()
            )
            .select("l_returnflag", "l_quantity", "l_extendedprice")
        )
    )
    assert new == old and len(new) >= 1


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_synthetic_tied_data_equivalence(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = [
        (
            rng.choice("ANR"),
            # heavy ties on x (8 distinct), mixed ties on y
            float(rng.randint(1, 8)),
            round(rng.uniform(1, 50), 1 if rng.random() < 0.7 else 6),
        )
        for _ in range(4000)
    ]
    d = str(tmp_path / f"lineitem_{seed}")
    li = spark.createDataFrame(
        rows, "l_returnflag STRING, l_quantity DOUBLE, l_extendedprice DOUBLE"
    )
    li.write.parquet(f"{d}/lineitem.parquet")
    new = _rows(agg_rank_corr_spearman(spark, d))
    old = _rows(_old_formula(li))
    assert new == old
