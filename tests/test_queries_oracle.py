"""Every registered query vs its DuckDB oracle at sf0.001 (fast local
mirror of the driver's t2 gate; the driver runs the same comparison at
sf0.01)."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pytest

from clickhouse_migrator_spark.registry import all_specs
from clickhouse_migrator_spark.tables import TABLES


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


SPECS = sorted(all_specs().items())


@pytest.mark.parametrize("name", [n for n, _ in SPECS])
def test_query_matches_oracle(name, spark, sf_dir, ducks):
    spec = dict(SPECS)[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: runs, stable schema, deterministic
        again = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
        assert _rowset(sdf.columns, srows) == _rowset(sdf.columns, again)
        return
    rel = ducks.sql(spec.oracle)
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount spark={len(srows)} duckdb={len(drows)}"
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert _rowset(sdf.columns, srows) == _rowset(rel.columns, drows)
