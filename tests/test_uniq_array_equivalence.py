"""Property test: the two uniqArray rewrite forms are EXACTLY
equivalent (VERDICT r5 #3 follow-through).

The context-aware structural rewrite (explode_outer + count(DISTINCT))
and the buffering fallback template (size∘array_distinct∘flatten∘
collect_set∘array_distinct∘array_compact) must agree on every corpus —
including NULL elements, NULL arrays, empty arrays, duplicate-heavy
rows, and groups whose arrays are ALL empty (the explode_outer
retention case)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from clickhouse_migrator_spark.functions.select_funcs import rewrite_functions

_elem = st.one_of(st.none(), st.integers(min_value=0, max_value=9))
_arr = st.one_of(st.none(), st.lists(_elem, max_size=6))
_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), _arr),
    min_size=0,
    max_size=25,
)


def _python_truth(rows):
    """Per-group distinct non-null element count, every group kept."""
    out: dict[int, set] = {}
    for g, arr in rows:
        out.setdefault(g, set()).update(
            x for x in (arr or []) if x is not None
        )
    return {g: len(s) for g, s in out.items()}


@settings(max_examples=25, deadline=None)
@given(rows=_rows)
def test_grouped_forms_agree_with_set_truth(spark, rows):
    df = spark.createDataFrame(
        rows or [(0, None)], "g INT, arr ARRAY<INT>"
    )
    df.createOrReplaceTempView("t_ua_prop")
    explode_form = rewrite_functions(
        "SELECT g, uniqArray(arr) AS ua FROM t_ua_prop GROUP BY g"
    )
    assert "explode_outer" in explode_form
    # force the buffering template by riding along a second aggregate
    template_form = rewrite_functions(
        "SELECT g, uniqArray(arr) AS ua, count(*) AS n FROM t_ua_prop GROUP BY g"
    )
    assert "collect_set" in template_form
    got_e = {r.g: r.ua for r in spark.sql(explode_form).collect()}
    got_t = {r.g: r.ua for r in spark.sql(template_form).collect()}
    want = _python_truth(rows or [(0, None)])
    assert got_e == want
    assert got_t == want
