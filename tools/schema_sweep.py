"""Sweep every registered query's OUTPUT SCHEMA for driver-hash-unsafe columns.

The driver's correctness gate collects Spark results through pandas and
hashes each row; array/map/struct columns become numpy ndarrays
(unhashable -> err) and DecimalType columns hash as ``Decimal`` objects
whose repr differs from DuckDB's widened decimals (-> hash_match=false).
FloatType (32-bit) round-trips through pandas differently than DuckDB's
doubles.  The only safe output surface is: string, boolean, integral,
double, date, timestamp.

Usage:  python tools/schema_sweep.py [sf_dir]
Prints one line per offending query: ``name: col:type, col:type``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import types as T  # noqa: E402

from clickhouse_migrator_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SAFE = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.NullType,
)


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
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
