"""Sinks: catalog tables, partitioned parquet, ClickHouse JDBC.

BASELINE.json names "DataFrame read from source + write to ClickHouse
JDBC" as the canonical migration pattern; :func:`write_clickhouse_jdbc`
implements it, gated on a JDBC driver being present (none ships in this
container, so callers get a clear error instead of a classpath crash —
the plan/options construction is still real and unit-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Partitioned parquet write.  ``partition_by`` → directory
    partitioning (partition pruning on read); ``sort_by`` →
    sortWithinPartitions (run-length/dictionary-friendly row order —
    the Spark analog of ClickHouse's ``ORDER BY`` clause, which the DDL
    translator records; see :mod:`clickhouse_migrator_spark.ddl`)."""
    out = df.sortWithinPartitions(*sort_by) if sort_by else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def insert_into(df: DataFrame, table: str) -> None:
    """Positional append into an existing catalog table (the reference's
    ledger INSERT shape, `migrate.py:54`)."""
    df.write.mode("append").insertInto(table)


def overwrite_table(df: DataFrame, table: str) -> None:
    df.write.mode("overwrite").format("parquet").saveAsTable(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (hash-bucketed by ``bucket_cols``).

    The co-located-join primitive: two tables bucketed the same way
    join WITHOUT any exchange — at 100 TB this turns the fact⨝fact
    shuffle (the single most expensive stage) into a local zip of
    pre-sorted buckets.  Asserted in tests/test_bucketing.py."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


CLICKHOUSE_JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def write_clickhouse_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 100_000,
    num_partitions: int | None = None,
    driver: str = CLICKHOUSE_JDBC_DRIVER,
    **options: str,
) -> None:
    """DataFrame → ClickHouse over JDBC (url like
    ``jdbc:clickhouse://host:8123/db``).

    Scale: ``batchsize`` keeps inserts block-sized for MergeTree;
    ``num_partitions`` caps concurrent connections (each partition
    opens one).  Raises a clear error when no driver jar is on the
    classpath.  ``driver`` is overridable so the identical option
    plumbing/batching/mode path is integration-tested against the
    embedded Derby that ships in Spark's classpath
    (tests/test_sources.py) — no ClickHouse server exists in this
    environment."""
    jvm_df = df
    if num_partitions:
        jvm_df = df.coalesce(num_partitions)
    writer = (
        jvm_df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "NONE")  # ClickHouse has no transactions
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
    except Exception as e:  # surface a actionable message for missing driver
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise RuntimeError(
                "ClickHouse JDBC driver not on the Spark classpath; add "
                "com.clickhouse:clickhouse-jdbc via spark.jars.packages"
            ) from e
        raise


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC writer (the ``FORMAT ORC`` egress path; see
    :func:`..sources.readers.read_orc`)."""
    df.write.mode(mode).orc(path)
