"""Readers: parquet / CSV(+gzip) / JSON with explicit schemas.

The reference's only ingest is a shelled-out `gunzip | clickhouse-client
… FORMAT CSVWithNames` pipeline in its tests
(`/root/reference/tests/test_clickhouse_migration.py:101,130`); here the
equivalent is a declarative `spark.read` (codec inferred from the
extension, schema explicit — never inferSchema in production: it
double-scans and type-drifts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import ensure_runtime_confs


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV/CSV.gz reader (gzip handled transparently by extension)."""
    ensure_runtime_confs(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")  # dev convenience only
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines reader; explicit schema keeps it single-pass."""
    ensure_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
