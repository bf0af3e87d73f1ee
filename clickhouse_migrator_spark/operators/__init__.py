"""Operator packs. Importing this package registers every query in
:mod:`clickhouse_migrator_spark.registry`."""

from . import (  # noqa: F401
    aggregates,
    asof,
    dedup,
    dialect,
    events,
    graph,
    joins,
    multimodal,
    pipeline,
    sampling,
    scalars,
    setops,
    similarity,
    stats,
    subqueries,
    text,
    tpch,
    tpch_ext,
    windows,
)
