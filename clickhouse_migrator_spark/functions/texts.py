"""Text primitives shared by the dedup/text-analysis packs."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col: str | Column = "text") -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingle list (space-joined)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def hex_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash via md5 — reproducible across
    engines (DuckDB: ``('0x'||substr(md5(x),1,15))::UBIGINT``), unlike
    xxhash64 which only Spark provides."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def bag_of_words_fingerprint(col: str | Column = "text") -> Column:
    """Order-insensitive content fingerprint: md5 of sorted distinct
    tokens."""
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(tokens(col)))))
