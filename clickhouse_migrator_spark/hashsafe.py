"""Driver-hash-safe output encoding helpers.

The driver's correctness gate collects Spark results through pandas and
hashes every cell; three output shapes break that comparison even when
the values are semantically identical:

* ``array<...>`` / ``map<...>`` columns → numpy ndarrays → unhashable
  (``TypeError`` in the driver, CORRECTNESS r01 "err" rows);
* ``decimal(p,s)`` columns → ``Decimal`` objects whose repr differs
  from DuckDB's differently-widened sums → hash mismatch;
* ``round(sum(<double>), k)`` → the float sum's partial-aggregation
  order differs run to run, so a value sitting near a rounding
  boundary flips between runs (observed: ``agg_conditional_returnflag_mix``).

The safe output surface is: string, boolean, integral, double, date,
timestamp — with any rounded double derived from an EXACT (decimal or
integer-grid) numerator.

Cross-engine contract (verified): Spark ``CAST(decimal(p,s) AS STRING)``
and DuckDB ``CAST(decimal(p,s) AS VARCHAR)`` render identically
(fixed-point, full scale, no exponent, ``-0.0`` normalized), and both
engines cast an exact decimal to the same nearest double.  So:

* arrays → ``concat_ws(',')`` of string-rendered elements (sorted
  first when the collection order is unspecified), mirrored by DuckDB
  ``array_to_string(list(...), ',')``;
* money/doubles → sum a ``decimal``-cast column (exact, associative,
  order-insensitive), then ``CAST(... AS DOUBLE)`` before any round.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec_str(col: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Render a numeric column as a fixed-point string, identically to
    DuckDB's ``CAST(x AS DECIMAL(p,s))::VARCHAR``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})").cast("string")


def arr_str(arr: Column, sep: str = ",") -> Column:
    """Join an array of STRING elements into one deterministic string.
    Caller is responsible for element order (sort unordered sets)."""
    return F.concat_ws(sep, arr)


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive exact sum of a fixed-point-valued double
    column, returned as DOUBLE.  Oracle twin:
    ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum divided by non-null
    count, as DOUBLE.  Oracle twin:
    ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / count(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
