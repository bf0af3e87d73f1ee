"""Skew-mitigation primitives (SURVEY.md §2.D scale hygiene).

Two layers of defense for skewed join keys at 100 TB:

1. **AQE skew-join splitting** — on by default in the engine
   (`spark.sql.adaptive.skewJoin.enabled`, session.py): oversized
   shuffle partitions are split at runtime.  Zero code.
2. **Salting** (:func:`salted_join`) — for the pathological case AQE
   can't fix (one key so hot a single *row group* of it overflows a
   task): explode the small side into N salt replicas, scatter the big
   side uniformly across salts, join on (key, salt).  The shuffle key
   becomes (key, salt) so the hot key spreads over N tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    ``small`` is replicated ``n_salts``× (explode — keep it the
    dimension side), ``big`` rows are scattered by a uniform
    deterministic salt; the join key becomes (key, salt).  Result is
    row-identical to ``big.join(small, on, how)``.
    """
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # deterministic uniform scatter (no rand(): keeps retries/stage
    # re-execution consistent, which nondeterministic salts break)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
