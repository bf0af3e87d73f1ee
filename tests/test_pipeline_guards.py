"""Regression guards for pipeline operator edge cases (ADVICE r4 #2).

Spark's ``sequence(0, -1)`` is the DESCENDING two-element series
``[0, -1]`` while DuckDB's ``generate_series(0, -1)`` is empty — so a
document whose token array is empty must contribute ZERO span rows,
not two bogus ones.  ``pipeline_span_dedup_c4`` guards the sequence
with an empty-array branch; this pins the expression shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_migrator_spark.operators.pipeline import SPAN_TOKENS


def _span_rows(spark, tokens_rows):
    toks = F.col("toks")
    n_spans_expr = F.ceil(F.size(toks) / float(SPAN_TOKENS)).cast("bigint")
    span_idx = F.when(
        n_spans_expr > 0, F.sequence(F.lit(0), n_spans_expr - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    df = spark.createDataFrame(tokens_rows, "doc_id long, toks array<string>")
    return (
        df.select(
            "doc_id",
            F.explode(
                F.transform(
                    span_idx,
                    lambda i: F.concat_ws(
                        " ", F.slice(toks, i * SPAN_TOKENS + 1, SPAN_TOKENS)
                    ),
                )
            ).alias("span"),
        )
        .groupBy("doc_id")
        .count()
        .collect()
    )


def test_empty_token_array_yields_zero_spans(spark):
    rows = _span_rows(
        spark,
        [
            (1, []),                                # the ADVICE case
            (2, ["a"] * SPAN_TOKENS),               # exactly one span
            (3, ["a"] * (SPAN_TOKENS + 1)),         # spills into two
        ],
    )
    by_id = {r.doc_id: r["count"] for r in rows}
    assert 1 not in by_id, "empty token array must produce no span rows"
    assert by_id[2] == 1
    assert by_id[3] == 2


def test_sequence_without_guard_would_emit_descending_series(spark):
    """Documents WHY the guard exists: bare sequence(0, n-1) with n=0
    yields [0, -1] on Spark (two elements), not an empty series."""
    got = (
        spark.range(1)
        .select(F.sequence(F.lit(0), F.lit(-1)).alias("s"))
        .collect()[0]
        .s
    )
    assert got == [0, -1]
