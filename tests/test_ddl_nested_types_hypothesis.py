"""Hypothesis fuzz for  :func:`ddl.map_types` over NESTED ClickHouse
type trees (round-6 regression class: parenthesized inner types inside
Nullable/LowCardinality/Array/Map/Tuple emitted invalid Spark DDL).

Property: for any randomly composed CH type tree, the mapped type must
(a) contain no ClickHouse spellings and (b) be accepted by Spark's DDL
schema parser — the ground truth a CREATE TABLE would hit."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from clickhouse_migrator_spark.ddl import map_types

_SCALARS = [
    "UInt8", "UInt64", "Int32", "Float64", "String", "Bool", "Date",
    "DateTime", "DateTime64(3)", "FixedString(16)", "Decimal(10, 2)",
    "UUID",
]

_CH_TOKENS = (
    "Nullable", "LowCardinality", "Array(", "Map(", "Tuple(", "UInt",
    "Int8", "Int16", "Float32", "FixedString", "DateTime", "Decimal64",
)


def _types(depth: int):
    base = st.sampled_from(_SCALARS)
    if depth == 0:
        return base
    inner = _types(depth - 1)
    return st.one_of(
        base,
        inner.map(lambda t: f"Nullable({t})"),
        inner.map(lambda t: f"LowCardinality({t})"),
        inner.map(lambda t: f"Array({t})"),
        st.tuples(st.sampled_from(["String", "UInt64"]), inner).map(
            lambda kv: f"Map({kv[0]}, {kv[1]})"
        ),
        st.lists(inner, min_size=1, max_size=3).map(
            lambda ts: "Tuple(" + ", ".join(ts) + ")"
        ),
    )


@settings(max_examples=120, deadline=None)
@given(t=_types(3))
def test_mapped_type_parses_as_spark_ddl(spark, t):
    from pyspark.sql.types import _parse_datatype_string

    mapped = map_types(t)
    for tok in _CH_TOKENS:
        assert tok not in mapped, (t, mapped)
    # Spark's own DDL parser is the acceptance oracle
    _parse_datatype_string(mapped)


@settings(max_examples=60, deadline=None)
@given(ts=st.lists(_types(2), min_size=1, max_size=4))
def test_column_lists_do_not_cross_match(spark, ts):
    """Multiple columns on one line: the nested-paren-tolerant inner
    pattern must never swallow a neighbouring column's type."""
    from pyspark.sql.types import _parse_datatype_string

    cols = ", ".join(f"c{i} {t}" for i, t in enumerate(ts))
    mapped = map_types(cols)
    _parse_datatype_string(mapped)  # parses as a full struct field list
