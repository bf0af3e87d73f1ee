"""Property tests for the dedup substrate's load-bearing helpers:
the shifted-slice k-gram builder (feeds the shingle substrate, the
shared-passage audit, the leakage gram stream, and three text queries)
and the small-graph union-find (the hybrid CC fast path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_migrator_spark.operators.dedup import (
    _component_labels_local,
    kgrams,
)

tokens_st = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=12
)


def _py_kgrams(toks: list[str], k: int) -> list[str]:
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(tokens_st, min_size=1, max_size=8), st.integers(2, 5))
def test_kgrams_matches_python_reference(spark, docs, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id INT, toks ARRAY<STRING>"
    )
    got = {
        r.doc_id: list(r.g)
        for r in df.select("doc_id", kgrams(F.col("toks"), k).alias("g")).collect()
    }
    want = {i: _py_kgrams(t, k) for i, t in enumerate(docs)}
    assert got == want


edges_st = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    # edge relaxation to fixpoint: the component minimum reaches every
    # member because the component is connected — no union-find needed
    comp = {n: n for e in edges for n in e}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(comp[a], comp[b])
            if comp[a] != m or comp[b] != m:
                comp[a] = comp[b] = m
                changed = True
    return comp


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(edges_st)
def test_union_find_matches_brute_closure(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {r.doc_id: r.component for r in _component_labels_local(spark, pairs).collect()}
    want = _brute_components(edges)
    assert got == want
