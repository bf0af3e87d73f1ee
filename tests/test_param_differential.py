"""Parameterized differential tests: the registered oracles pin the
engine at FIXED operator parameters (k = 3 shingles, τ = 0.8, the
default df cap); these sweep the parameter grid against dynamically
generated DuckDB SQL so parameter-dependent bugs (off-by-one window
bounds, cap boundary, threshold comparison direction) cannot hide
behind the fixtures' single operating point.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from clickhouse_migrator_spark.operators.dedup import (
    _exact_jaccard_pairs,
    shingles,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return con


def _ddb_shingles_sql(k: int) -> str:
    # DuckDB list slices are 1-based and end-inclusive: the k-window at
    # position i is w[i : i+k-1], for i in [1, len(w)-k+1]
    return f"""
    WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                  FROM documents)
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - {k - 2}, 1)),
               i -> array_to_string(w[i:i + {k - 1}], ' ')))) AS shingle
    FROM toks WHERE len(w) >= {k}
    """


@pytest.mark.parametrize("k", [2, 3, 4, 6])
def test_shingles_match_duckdb_across_k(spark, ddb, k):
    got = {
        (r.doc_id, r.shingle)
        for r in shingles(spark, SF_DIR, k=k, df_cap=None).collect()
    }
    want = {tuple(r) for r in ddb.sql(_ddb_shingles_sql(k)).fetchall()}
    assert got == want


@pytest.mark.parametrize("cap", [1, 2, 5])
def test_df_cap_matches_duckdb_across_caps(spark, ddb, cap):
    """The cap drops shingles with document frequency > cap — swept at
    binding values (the fixture's default cap never binds, by design
    and by test_df_cap_not_binding_at_fixture_scale)."""
    got = {
        (r.doc_id, r.shingle)
        for r in shingles(spark, SF_DIR, k=3, df_cap=cap).collect()
    }
    want = {
        tuple(r)
        for r in ddb.sql(
            f"""
            WITH sh AS ({_ddb_shingles_sql(3)}),
            df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
            SELECT doc_id, sh.shingle FROM sh
            JOIN df ON df.shingle = sh.shingle
            WHERE df.df <= {cap}
            """
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize("tau", [0.35, 0.5, 0.7, 0.9])
def test_jaccard_threshold_grid_matches_duckdb(spark, ddb, tau):
    """Pair counts and rounded Jaccard values across a τ grid — the
    registered queries only exercise τ = 0.8 (near_dup) and the
    2-point threshold_sweep."""
    got = {
        (r.doc_a, r.doc_b, str(r.jaccard_r6))
        for r in _exact_jaccard_pairs(spark, SF_DIR)
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard_r6")
        .collect()
    }
    from clickhouse_migrator_spark.hashsafe import oracle_round_quotient

    want = {
        (a, b, str(j))
        for a, b, j in ddb.sql(
            f"""
            WITH sh AS ({_ddb_shingles_sql(3)}),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pair_inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   {oracle_round_quotient("inter", "sa.n + sb.n - inter", 6)} AS j
            FROM pair_inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE inter / CAST(sa.n + sb.n - inter AS DOUBLE) >= {tau}
            """
        ).fetchall()
    }
    assert got == want
