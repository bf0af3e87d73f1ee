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


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source (the read half of the ClickHouse-JDBC migration
    pattern; sink half in :mod:`.sinks`).

    Scale: WITHOUT ``partition_column`` a JDBC read is ONE connection
    on one executor — a non-starter for a large table.  Supplying a
    numeric ``partition_column`` + bounds splits the read into
    ``num_partitions`` range-predicated queries executed in parallel;
    Spark pushes filters and column pruning into the generated SQL.
    ``table`` may be a subquery alias (``"(select ...) t"``) to push
    arbitrary server-side preprocessing."""
    ensure_runtime_confs(spark)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — ClickHouse ingests/emits ORC via ``FORMAT ORC``
    (docs: Input/Output formats); Spark's native ORC source gives the
    same columnar properties as parquet here (column pruning, predicate
    pushdown, vectorized scan)."""
    ensure_runtime_confs(spark)
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-binary ingestion (`binaryFile` source) — the entry point
    of the multimodal pipeline: each file becomes one row of
    (path, modificationTime, length, content BINARY), ready for the
    `operators.multimodal` decode/feature UDF stages.

    Scale notes: binary files don't split, so parallelism = #files;
    at 100 TB pack media into a few-MB-per-object layout (or tar-shard
    into parquet binary columns first) rather than millions of tiny
    files that drown the driver in listing. `pathGlobFilter` prunes at
    listing time — cheaper than a post-read filter on `path`."""
    ensure_runtime_confs(spark)
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
