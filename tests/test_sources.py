"""Readers/sinks: CSV+gzip roundtrip, JSON, partitioned parquet write,
JDBC error surface."""

from __future__ import annotations

import gzip
import json

import pytest

from clickhouse_migrator_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    write_clickhouse_jdbc,
    write_parquet,
)


def test_csv_gzip_roundtrip(spark, tmp_path):
    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("id,name\n1,100\n2,200\n")
    df = read_csv(spark, str(p), schema="id BIGINT, name BIGINT")
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, 100), (2, 200)]


def test_json_reader(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({"id": i, "tag": f"t{i}"}) + "\n")
    df = read_json(spark, str(p), schema="id BIGINT, tag STRING")
    assert df.count() == 3


def test_partitioned_parquet_write_prunes(spark, sf_dir, tmp_path):
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_part")
    write_parquet(orders, out, partition_by=["o_orderstatus"], sort_by=["o_orderdate"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: the filter must land in PartitionFilters (file
    # listing), and the pruned read must touch strictly fewer files
    filtered = back.filter("o_orderstatus = 'F'")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    part_section = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderstatus" in part_section
    from pyspark.sql import functions as F

    all_files = back.select(F.input_file_name()).distinct().count()
    pruned_files = filtered.select(F.input_file_name()).distinct().count()
    assert 0 < pruned_files < all_files


def test_jdbc_missing_driver_raises_actionable(spark):
    df = spark.range(3)
    with pytest.raises(Exception) as ei:
        write_clickhouse_jdbc(df, "jdbc:clickhouse://localhost:8123/db", "t")
    assert "ClassNotFound" in str(ei.value) or "classpath" in str(ei.value)


def test_jdbc_reader_requires_bounds_with_partition_column(spark):
    from clickhouse_migrator_spark.sources import read_jdbc

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark,
            "jdbc:clickhouse://localhost:8123/db",
            "t",
            partition_column="id",
        )


def test_jdbc_reader_missing_driver_raises(spark):
    from clickhouse_migrator_spark.sources import read_jdbc

    with pytest.raises(Exception) as ei:
        read_jdbc(
            spark,
            "jdbc:clickhouse://localhost:8123/db",
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
        ).count()
    assert "driver" in str(ei.value).lower() or "ClassNotFound" in str(ei.value)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from clickhouse_migrator_spark.sources.readers import read_orc
    from clickhouse_migrator_spark.sources.sinks import write_orc
    from clickhouse_migrator_spark.tables import table

    nation = table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_orc")
    write_orc(nation, out)
    back = read_orc(spark, out)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_binary_file_reader(spark, tmp_path):
    from clickhouse_migrator_spark.sources.readers import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload")
    (tmp_path / "b.bin").write_bytes(b"\xff" * 16)
    (tmp_path / "skip.txt").write_text("not binary")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"].length == 9 and bytes(rows["a.bin"].content)[2:] == b"payload"
    assert df.schema["content"].dataType.typeName() == "binary"


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path):
    """Full JDBC writer round-trip against the embedded Derby database
    that ships on Spark's classpath: the SAME code path (option
    plumbing, batchsize, isolationLevel, mode handling, driver wiring)
    a ClickHouse target would take — only the driver/url differ.
    Covers append mode accumulating batches and the overwrite path."""
    from clickhouse_migrator_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    df = spark.range(100).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS dbl", "CAST(id AS STRING) AS s"
    )
    write_clickhouse_jdbc(
        df, url, "t_roundtrip", mode="overwrite", batchsize=10,
        num_partitions=2, driver=DERBY_DRIVER,
    )
    back = read_jdbc(spark, url, "t_roundtrip", driver=DERBY_DRIVER)
    rows = sorted((r.id, r.dbl, r.s) for r in back.collect())
    assert len(rows) == 100
    assert rows[3] == (3, 6.0, "3")

    # append accumulates
    write_clickhouse_jdbc(
        df.limit(5), url, "t_roundtrip", mode="append", driver=DERBY_DRIVER
    )
    assert read_jdbc(spark, url, "t_roundtrip", driver=DERBY_DRIVER).count() == 105

    # partitioned parallel read over the same table
    part = read_jdbc(
        spark, url, "t_roundtrip",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, driver=DERBY_DRIVER,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 105
