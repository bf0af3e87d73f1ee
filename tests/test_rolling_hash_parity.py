"""Character-for-character equivalence of the Arrow-vectorized rolling
hash (`rolling_hash_batch`) against the pure-JVM fold spec
(`jvm_rolling_hash`) — the r9 swap of text_rolling_hash's hot path.

The two implementations must agree on every char-model edge: astral
(surrogate-pair) chars, the JVM split("","")→[""] empty-string
artifact, combining marks, NULLs, long strings (int64 headroom), and
the normalized (lower+utrim) inputs the registered query feeds."""

from __future__ import annotations

import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import given, settings
from pyspark.sql import functions as F

from clickhouse_migrator_spark.hashsafe import utrim
from clickhouse_migrator_spark.operators.text import (
    jvm_rolling_hash,
    rolling_hash_batch,
)

EDGES = [
    None,
    "",
    "a",
    "abc def",
    "a\U0001f600b",          # astral: one code point, not two surrogates
    "\U0001f600" * 5,
    "héllo wörld",
    "é́",               # combining mark
    "日本語テキスト",
    "  leading Zs  ",
    "line\nbreaks\tand\ttabs",
    "x" * 5000,               # long: exercises the power table + reduceat
    "\x00nul",
]


def _jvm(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    return [r.h for r in df.select(jvm_rolling_hash(F.col("t")).alias("h")).collect()]


def test_edge_corpus_parity(spark):
    got = rolling_hash_batch(pd.Series(EDGES, dtype="object"))
    want = _jvm(spark, EDGES)
    for v, g, w in zip(EDGES, got, want):
        g = None if pd.isna(g) else int(g)
        assert g == w, (repr(v), g, w)


def test_normalized_input_parity(spark):
    """Through the registered query's exact input expression."""
    vals = ["  MiXeD Case ", "UPPER", None, " only zs "]
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    norm = [
        r.n
        for r in df.select(F.lower(utrim(F.col("t"))).alias("n")).collect()
    ]
    got = rolling_hash_batch(pd.Series(norm, dtype="object"))
    want = _jvm(spark, norm)
    for v, g, w in zip(norm, got, want):
        g = None if pd.isna(g) else int(g)
        assert g == w, (repr(v), g, w)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),  # no lone surrogates
                ),
                max_size=300,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_hypothesis_parity(spark, vals):
    got = rolling_hash_batch(pd.Series(vals, dtype="object"))
    want = _jvm(spark, vals)
    for v, g, w in zip(vals, got, want):
        g = None if pd.isna(g) else int(g)
        assert g == w, (repr(v), g, w)


def test_registered_query_runs(spark, sf_dir):
    from clickhouse_migrator_spark.operators.text import text_rolling_hash

    rows = text_rolling_hash(spark, sf_dir).limit(5).collect()
    assert rows and all(r.roll_hash is not None for r in rows)
