"""ClickHouse-vocabulary scalar helpers, re-expressed as native Spark
column expressions (SURVEY.md §2.D — dialect-parity surface; the
reference itself delegates all scalar evaluation to the ClickHouse
server, `/root/reference/clickhouse_migrate/migrate.py:52`).

Everything here returns a plain ``Column`` built from built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, usable in
any DataFrame expression.  A user migrating ClickHouse SQL can map
``toStartOfFiveMinutes(ts)`` → :func:`to_start_of_interval`,
``IPv4NumToString(n)`` → :func:`ipv4_num_to_string`, etc.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_start_of_interval(ts: Column | str, minutes: int) -> Column:
    """``toStartOfInterval(ts, INTERVAL n MINUTE)`` /
    ``toStartOfFiveMinutes`` family: floor an event time to its
    n-minute bucket start.  Pure epoch arithmetic — no UDF, survives
    whole-stage codegen, and agrees with DuckDB ``time_bucket``."""
    c = F.col(ts) if isinstance(ts, str) else ts
    secs = minutes * 60
    return F.timestamp_seconds(
        (F.unix_timestamp(c) - (F.unix_timestamp(c) % secs))
    ).cast("timestamp_ntz")


def ipv4_num_to_string(n: Column | str) -> Column:
    """``IPv4NumToString(n)``: uint32 → dotted-quad string."""
    c = F.col(n) if isinstance(n, str) else n
    return F.concat_ws(
        ".",
        (F.shiftright(c, 24) % 256).cast("string"),
        (F.shiftright(c, 16) % 256).cast("string"),
        (F.shiftright(c, 8) % 256).cast("string"),
        (c % 256).cast("string"),
    )


def ipv4_string_to_num(s: Column | str) -> Column:
    """``IPv4StringToNum(s)``: dotted-quad string → uint32 (BIGINT —
    Spark has no unsigned types, SURVEY.md §1.2)."""
    c = F.col(s) if isinstance(s, str) else s
    part = lambda i: F.split(c, r"\.").getItem(i).cast("bigint")  # noqa: E731
    return part(0) * 16777216 + part(1) * 65536 + part(2) * 256 + part(3)
