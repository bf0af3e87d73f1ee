"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator module registers its public queries here with an optional
DuckDB oracle SQL string.  Queries without an oracle are genuinely
non-SQL-expressible (probabilistic LSH candidate generation, streaming
state machines) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB-runnable SQL, or None → rows-only check


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY and not os.environ.get("SPARK_GRAFT_ALLOW_REREGISTER"):
            # duplicate names would silently shadow an oracle pairing;
            # the env knob exists only for importlib.reload() in
            # interactive profiling sessions (tools/profile_query.py)
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: registration) and return
    the full registry."""
    from . import operators, streaming  # noqa: F401  (imports register queries)

    return dict(_REGISTRY)
