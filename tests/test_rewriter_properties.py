"""Property-based tests (hypothesis) for the ClickHouse-SQL rewriter —
the rewriter is a string transformation, so its safety invariants
(idempotency, quoted-literal preservation, passthrough of unknown
spellings, bracket balance) must hold on ARBITRARY well-formed input,
not just the hand-picked examples in test_select_functions.py."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from clickhouse_migrator_spark.functions.select_funcs import (
    _string_mask,
    rewrite_functions,
)

# building blocks for random-but-balanced SQL expressions
_IDENTS = st.sampled_from(
    ["x", "y", "col1", "tbl.c", "value", "ts", "user_id", "`quoted col`"]
)
_CH_FUNCS = st.sampled_from(
    ["countIf", "sumIf", "uniq", "argMax", "toInt32", "arrayMap", "position",
     "multiIf", "toStartOfMonth", "unknownFunc", "my_udf", "lower"]
)
_LITERALS = st.sampled_from(
    ["'plain'", "'countIf(x)'", "'it''s'", "'[1,2]'", "'-- no comment'",
     "42", "3.14", "'argMax(a, b)'"]
)


@st.composite
def sql_exprs(draw, depth: int = 2) -> str:
    kind = draw(st.integers(0, 4 if depth > 0 else 2))
    if kind == 0:
        return draw(_IDENTS)
    if kind == 1:
        return draw(_LITERALS)
    if kind == 2:
        a = draw(_IDENTS)
        b = draw(_LITERALS)
        return f"{a} + {b}"
    if kind == 3:
        inner = draw(st.lists(sql_exprs(depth=depth - 1), min_size=0, max_size=3))
        fn = draw(_CH_FUNCS)
        return f"{fn}({', '.join(inner)})"
    inner = draw(st.lists(sql_exprs(depth=depth - 1), min_size=1, max_size=3))
    return "[" + ", ".join(inner) + "]"


@st.composite
def sql_statements(draw) -> str:
    exprs = draw(st.lists(sql_exprs(), min_size=1, max_size=4))
    stmt = "SELECT " + ", ".join(exprs) + " FROM t"
    if draw(st.booleans()):
        stmt += f" WHERE {draw(sql_exprs(depth=1))} > 0"
    return stmt


@given(sql_statements())
@settings(max_examples=300, deadline=None)
def test_rewrite_is_idempotent(sql):
    once = rewrite_functions(sql)
    assert rewrite_functions(once) == once


@given(sql_statements())
@settings(max_examples=300, deadline=None)
def test_quoted_literals_survive_verbatim(sql):
    out = rewrite_functions(sql)
    # every single-quoted literal of the input must appear in the output
    # (rewrites never reach inside quotes, and rules only copy args)
    for lit in re.findall(r"'(?:[^']|'')*'", sql):
        assert lit in out, (lit, out)


@given(sql_statements())
@settings(max_examples=300, deadline=None)
def test_brackets_stay_balanced(sql):
    out = rewrite_functions(sql)
    mask = _string_mask(out)
    depth = 0
    for i, ch in enumerate(out):
        if mask[i]:
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        assert depth >= 0, out
    assert depth == 0, out


@given(st.sampled_from(["unknownFunc", "my_udf", "weird_name_2"]),
       st.lists(_IDENTS, min_size=0, max_size=3))
@settings(max_examples=100, deadline=None)
def test_unknown_functions_pass_through(name, args):
    sql = f"SELECT {name}({', '.join(args)}) FROM t"
    assert rewrite_functions(sql) == sql
