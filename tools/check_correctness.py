"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet fixtures, then compares row count, sorted
column names, and order-insensitive values.  Use while iterating:

    python tools/check_correctness.py [--pandas] [sf_dir] [query ...]
    python tools/check_correctness.py --json GATE_r2.json [sf_dir]

``--json FILE`` additionally writes the full per-query result table in
the driver's CORRECTNESS_r{N}.json row format, committed per round so
the builder-gate and driver-sample can be diffed without re-running.

``--pandas`` switches to the DRIVER-FAITHFUL collection path: Spark
results through ``toPandas()`` and oracle results through DuckDB
``rel.df()``, normalized DTYPE-SENSITIVELY.  The default ``fetchall()``
path hands both sides to Python ints, which structurally cannot see
the divergence the driver's pandas hash sees — e.g. a DuckDB HUGEINT
sum becomes float64 ``6.0`` in pandas while Spark emits int64 ``6``
(VERDICT r4 "what's wrong #2", red for three rounds).  Run the close
gate BOTH ways.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

from clickhouse_migrator_spark.session import get_spark  # noqa: E402
from clickhouse_migrator_spark.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — queries are expected to round in-engine
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _norm_pandas(v):
    """Dtype-sensitive cell normalization for the --pandas path: int64
    and float64 cells must hash DIFFERENTLY (``6`` vs ``6.0``), exactly
    as they do through the driver's pandas collection."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm_pandas(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(_norm_pandas(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def _pandas_rows(df):
    """(columns, row tuples) from a pandas frame, cells left as the
    numpy scalars pandas hands out (dtype is the point)."""
    cols = list(df.columns)
    return cols, [tuple(row) for row in df.itertuples(index=False, name=None)]


def _rowset(cols, rows, norm=_norm):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    pandas_mode = False
    if argv and argv[0] == "--pandas":
        pandas_mode = True
        argv = argv[1:]
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--pandas":
        pandas_mode = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(cpus=8, shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if pandas_mode:
                scols, srows = _pandas_rows(sdf.toPandas())
            else:
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": f"spark: {e}"[:300]}
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, no oracle)")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": None,
                             "rows_only": True}
            continue
        try:
            rel = con.sql(oracles[name])
            if pandas_mode:
                dcols, drows = _pandas_rows(rel.df())
            else:
                dcols = [c for c in rel.columns]
                drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(srows),
                             "oracle_rows": None, "err": f"duckdb: {e}"[:300]}
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            norm = _norm_pandas if pandas_mode else _norm
            s, d = _rowset(scols, srows, norm), _rowset(dcols, drows, norm)
            if s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
        results[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": None,
        }

    if json_out:
        # provenance stamp: records WHICH tree generated the artifact, so
        # a byte-identical regeneration on a later tree still produces a
        # new committed blob — without it, close_check's per-file
        # freshness rule (last commit touching the artifact must postdate
        # the last code commit) can never be satisfied by an honest
        # regeneration whose per-query results did not change
        try:
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True,
            ).stdout.strip()
        except Exception:
            head = None
        # CONVENTION (ADVICE r12 #4): keys starting with "_" are
        # artifact metadata, not query rows — any consumer iterating
        # this file as {query: row} must skip them.  n_queries counts
        # the real rows; kept a sibling (not a nested format change)
        # so earlier rounds' GATE files stay shape-compatible.
        results["_meta"] = {
            "generated_on_commit": head or "unknown",
            "sf_dir": sf_dir,
            "mode": "pandas" if pandas_mode else "fetchall",
            "n_queries": len(results),
            "n_failures": len(failed),
        }
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        n_rows = sum(1 for k in results if not k.startswith("_"))
        print(f"wrote {json_out} ({n_rows} rows + _meta)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
