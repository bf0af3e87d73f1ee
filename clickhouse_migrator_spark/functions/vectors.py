"""Vector math over ARRAY<DOUBLE> columns using higher-order functions
(`zip_with` + `aggregate`) — whole-stage-codegen'd, no Python UDFs.

These are the primitives behind :mod:`..operators.similarity` and the
embedding-cosine dedup; kept here so pipelines can compose them.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(x: Column, y: Column) -> Column:
    """Σ xᵢ·yᵢ (double accumulator)."""
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, z: a + z)


def l2_norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


def cosine_similarity(x: Column, y: Column) -> Column:
    return dot(x, y) / (l2_norm(x) * l2_norm(y))


def euclidean_distance(x: Column, y: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda a, z: a + z,
        )
    )
