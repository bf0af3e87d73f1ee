"""Source/sink surface (SURVEY.md §2.D "Scans/sinks")."""

from .readers import read_csv, read_jdbc, read_json, read_parquet  # noqa: F401
from .sinks import (  # noqa: F401
    insert_into,
    overwrite_table,
    write_clickhouse_jdbc,
    write_parquet,
)
